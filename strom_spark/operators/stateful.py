"""StatefulTransformer: the faithful arity-2 Transformer contract.

Reference: ``fn(event, acc) -> {[events], acc}`` — stateful
flat-map-reduce, the one primitive from which the reference builds
filters, aggregations, windows, re-batching and CEP
(``lib/transformer.ex:44-47,92-101``).  State is kept per input stream
and events are seen in single-stream arrival order.

Spark translation (SURVEY §7.3/§7.4.1): Spark has no global arrival
order across partitions, so order must be explicit.  The contract runs
via ``applyInPandas`` over key groups:

  - ``key_by``: state is held per key (the scalable path — one group
    per key, distributed across executors; mirrors "acc per stream"
    where the key plays the stream's role).  ``key_by=None`` means ONE
    global group = the reference's exact single-stream semantics, but
    serializes that stream through one task — correct, not scalable;
    use only where the algorithm is inherently sequential.
  - ``order_by``: column(s) defining arrival order within the group.

The kernel function receives plain dict events (pandas rows) so user
code looks exactly like the reference's: take an event and the current
acc, return (list-of-events-out, new-acc).

Prefer the declarative components (Filter/FlatMap/Agg/window ops) when
the logic is expressible — Catalyst can't see inside this kernel.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Sequence

import pandas as pd

from pyspark.sql import DataFrame

from ..component import Component
from ..flow import Flow

# fn(event: dict, acc) -> (list[dict], acc)
StatefulFn = Callable[[dict, Any], tuple[list, Any]]


def _run_kernel(
    pdf: pd.DataFrame,
    fn: StatefulFn,
    acc0_factory: Callable[[], Any],
    order_by: Sequence[str],
    flush: Callable[[Any], list] | None,
    on_error: str = "raise",
) -> Iterable[dict]:
    if order_by:
        pdf = pdf.sort_values(list(order_by), kind="mergesort")
    acc = acc0_factory()
    for event in pdf.to_dict("records"):
        if on_error == "skip":
            # the reference's crash semantics, opt-in: a raising UDF
            # drops the poisoned event and continues with the last good
            # acc (crash_test.exs:34-58).  Default is Spark semantics —
            # fail the task, retry, surface the error.
            try:
                out, acc = fn(event, acc)
            except Exception:
                continue
        else:
            out, acc = fn(event, acc)
        for e in out:
            yield e
    if flush is not None:
        # natural end-of-stream replaces the reference's :done sentinel
        # (test/examples/words_count_test.exs:12) — batch inputs are
        # finite, so the engine knows when to flush.
        for e in flush(acc):
            yield e


class StatefulTransformer(Component):
    def __init__(
        self,
        name_or_names: "str | Sequence[str]",
        fn: StatefulFn,
        acc: Any = None,
        *,
        schema: Any,
        key_by: Sequence[str] | None = None,
        order_by: Sequence[str] = (),
        flush: Callable[[Any], list] | None = None,
        on_error: str = "raise",
        label: str | None = None,
    ):
        """``acc`` may be a value (copied per group via deepcopy) or a
        zero-arg factory.  ``flush(acc) -> [events]`` emits trailing
        events at end-of-group (window remainders, final aggregates).
        ``schema`` is the output schema (DDL string or StructType).
        ``on_error='skip'`` opts into the reference's drop-poisoned-
        event-and-continue crash semantics."""
        if on_error not in ("raise", "skip"):
            raise ValueError("on_error must be raise|skip")
        self.names = (name_or_names,) if isinstance(name_or_names, str) else tuple(name_or_names)
        self.fn = fn
        self.acc = acc
        self.schema = schema
        self.key_by = tuple(key_by) if key_by else None
        self.order_by = tuple(order_by)
        self.flush = flush
        self.on_error = on_error
        self.label = label

    def _acc_factory(self) -> Callable[[], Any]:
        acc = self.acc
        if callable(acc):
            return acc
        import copy

        return lambda: copy.deepcopy(acc)

    def transform_df(self, df: DataFrame) -> DataFrame:
        fn, order_by, flush = self.fn, self.order_by, self.flush
        on_error = self.on_error
        acc_factory = self._acc_factory()

        def apply(pdf: pd.DataFrame) -> pd.DataFrame:
            rows = list(_run_kernel(pdf, fn, acc_factory, order_by, flush, on_error))
            return pd.DataFrame(rows)

        if self.key_by:
            return df.groupBy(*self.key_by).applyInPandas(apply, schema=self.schema)
        # single global group: exact reference semantics, sequential.
        # lit(0) grouping funnels every row through one task — documented
        # scalability tradeoff; key_by is the scale path.
        from pyspark.sql import functions as F

        return (
            df.withColumn("__g", F.lit(0))
            .groupBy("__g")
            .applyInPandas(lambda pdf: apply(pdf.drop(columns="__g")), schema=self.schema)
        )

    def transform(self, flow: Flow) -> Flow:
        out = flow
        for name in self.names:
            out = out.with_stream(name, self.transform_df(out[name]))
        return out

    def input_names(self) -> Sequence[str]:
        return self.names

    def output_names(self) -> Sequence[str]:
        return self.names
