"""Streaming stateful operators: the arity-2 Transformer contract on
unbounded input.

``StreamingStatefulTransformer`` runs the same ``fn(event, acc) ->
([events], acc)`` kernel as the batch ``StatefulTransformer``, but over
a streaming DataFrame with keyed state via ``applyInPandasWithState``
— state persists across micro-batches per key (the Spark analog of the
reference's per-stream acc that lives for the process lifetime).

Count-based windows on streams (reference window_test.exs) are the
canonical use: buffer per key until `size` events arrived, emit the
window, carry the remainder.
"""

from __future__ import annotations

import pickle
from typing import Any, Callable, Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..component import Component
from ..flow import Flow

StatefulFn = Callable[[dict, Any], tuple[list, Any]]

#: state is a pickled python object — opaque to Spark, checkpointable
_STATE_SCHEMA = "state binary"


class StreamingStatefulTransformer(Component):
    def __init__(
        self,
        name_or_names: "str | Sequence[str]",
        fn: StatefulFn,
        acc: Any = None,
        *,
        schema: Any,
        key_by: Sequence[str],
        order_by: Sequence[str] = (),
        timeout: str = "NoTimeout",
        label: str | None = None,
    ):
        self.names = (name_or_names,) if isinstance(name_or_names, str) else tuple(name_or_names)
        self.fn = fn
        self.acc = acc
        self.schema = schema
        self.key_by = tuple(key_by)
        self.order_by = tuple(order_by)
        self.timeout = timeout
        self.label = label

    def _acc_factory(self):
        acc = self.acc
        if callable(acc):
            return acc
        import copy

        return lambda: copy.deepcopy(acc)

    def transform_df(self, df: DataFrame) -> DataFrame:
        fn = self.fn
        order_by = list(self.order_by)
        acc_factory = self._acc_factory()

        def kernel(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
            if state.exists:
                acc = pickle.loads(state.get[0])
            else:
                acc = acc_factory()
            rows: list[dict] = []
            for pdf in pdfs:
                if order_by:
                    pdf = pdf.sort_values(order_by, kind="mergesort")
                for event in pdf.to_dict("records"):
                    out, acc = fn(event, acc)
                    rows.extend(out)
            state.update((pickle.dumps(acc),))
            if rows:
                yield pd.DataFrame(rows)

        timeout = getattr(GroupStateTimeout, self.timeout, GroupStateTimeout.NoTimeout)
        return (
            df.groupBy(*self.key_by)
            .applyInPandasWithState(
                kernel,
                outputStructType=self.schema,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=timeout,
            )
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


def count_window_kernel(size: int, value_col: str = "value"):
    """Kernel factory: per-key tumbling count window emitting
    (window_index, n, sum, avg) per full window — the reference's
    count-window example as a streaming stateful op."""

    def fn(event, acc):
        if acc is None:
            acc = {"idx": 0, "buf": []}
        acc["buf"].append(event[value_col])
        if len(acc["buf"]) == size:
            buf = acc["buf"]
            out = [
                {
                    "window_index": acc["idx"],
                    "n": len(buf),
                    "sum_value": float(sum(buf)),
                    "avg_value": float(sum(buf)) / len(buf),
                }
            ]
            return out, {"idx": acc["idx"] + 1, "buf": []}
        return [], acc

    return fn
