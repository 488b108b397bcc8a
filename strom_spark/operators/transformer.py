"""Transformer: THE compute primitive (reference ``lib/transformer.ex``).

The reference has two shapes:
  - arity-1 fn: per-event map (``lib/transformer.ex:53-57``)
  - arity-2 fn ``(event, acc) -> {[events], acc}``: stateful
    flat-map-reduce — filter/flatMap/aggregate/window in one shape
    (``lib/transformer.ex:44-47,92-101``), acc kept per input stream.

Spark-first translation: instead of forcing everything through one
opaque stateful kernel (which would serialize the whole stream through
Python), we expose the shapes Catalyst can optimize as first-class
declarative components and keep the general stateful kernel as the
explicit slow path:

  - ``Transformer`` / ``Map``  — column expressions (JVM, codegen)
  - ``Filter``                 — ``df.filter`` (pushdown-able)
  - ``FlatMap``                — explode of an array expression
  - ``PandasMap``              — vectorized Arrow batches when Python
    logic is genuinely needed
  - ``StatefulTransformer``    — the faithful arity-2 contract, via
    ``applyInPandas`` per key group in explicit row order (see
    ``stateful.py``)

All apply to one or several named streams (reference
``Transformer.new(name_or_names, ...)``), state/plan per stream.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..component import Component
from ..flow import Flow

ColumnLike = "Column | str"


def _as_names(name_or_names: "str | Sequence[str]") -> tuple[str, ...]:
    if isinstance(name_or_names, str):
        return (name_or_names,)
    return tuple(name_or_names)


def _resolve_expr(expr: Any, df: DataFrame) -> Column:
    """Accept a Column, a SQL string, or a callable DataFrame -> Column."""
    if isinstance(expr, Column):
        return expr
    if isinstance(expr, str):
        return F.expr(expr)
    if callable(expr):
        out = expr(df)
        return out if isinstance(out, Column) else F.expr(out)
    raise TypeError(f"cannot interpret expression: {expr!r}")


class _PerStream(Component):
    """Base for components applying the same transformation to each of
    several named streams independently (reference keeps acc per input
    stream, ``lib/transformer.ex:77``)."""

    def __init__(self, name_or_names: "str | Sequence[str]", *, label: str | None = None):
        self.names = _as_names(name_or_names)
        self.label = label

    def transform_df(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def transform(self, flow: Flow) -> Flow:
        out = flow
        for name in self.names:
            out = out.with_stream(name, self.transform_df(out[name]))
        return out

    def input_names(self) -> Sequence[str]:
        return self.names

    def output_names(self) -> Sequence[str]:
        return self.names


class Transformer(_PerStream):
    """Per-event map via named column expressions (arity-1 form).

    ``Transformer("s", value=F.col("value") + 1)`` adds/replaces
    columns; ``Transformer("s", select={...})`` projects exactly the
    given columns.  Expressions are Column/SQL-string/callable.
    """

    def __init__(
        self,
        name_or_names: "str | Sequence[str]",
        select: Mapping[str, Any] | None = None,
        *,
        label: str | None = None,
        **with_columns: Any,
    ):
        super().__init__(name_or_names, label=label)
        if select is not None and with_columns:
            raise ValueError("pass either select= or keyword columns, not both")
        self.select = dict(select) if select is not None else None
        self.with_columns = with_columns

    def transform_df(self, df: DataFrame) -> DataFrame:
        if self.select is not None:
            return df.select(
                *[_resolve_expr(e, df).alias(n) for n, e in self.select.items()]
            )
        out = df
        for n, e in self.with_columns.items():
            out = out.withColumn(n, _resolve_expr(e, out))
        return out


Map = Transformer


class Filter(_PerStream):
    """Predicate filter (the reference expresses this as a stateful
    transformer emitting ``[]`` or a Splitter predicate; we lower to
    ``df.filter`` so Catalyst pushes it to the scan)."""

    def __init__(self, name_or_names: "str | Sequence[str]", predicate: Any, *, label: str | None = None):
        super().__init__(name_or_names, label=label)
        self.predicate = predicate

    def transform_df(self, df: DataFrame) -> DataFrame:
        return df.filter(_resolve_expr(self.predicate, df))


class FlatMap(_PerStream):
    """Emit 0..n events per event from an array expression (the
    reference's emit-many transformer, e.g. String.split -> words at
    ``test/examples/telegram_test.exs:12-15``).

    ``FlatMap("s", F.split("value", " "), alias="value")`` explodes the
    array into one row per element.  ``keep`` selects which original
    columns survive alongside (default: none).
    """

    def __init__(
        self,
        name_or_names: "str | Sequence[str]",
        array_expr: Any,
        *,
        alias: str = "value",
        keep: Sequence[str] = (),
        outer: bool = False,
        label: str | None = None,
    ):
        super().__init__(name_or_names, label=label)
        self.array_expr = array_expr
        self.alias = alias
        self.keep = tuple(keep)
        self.outer = outer

    def transform_df(self, df: DataFrame) -> DataFrame:
        arr = _resolve_expr(self.array_expr, df)
        explode = F.explode_outer if self.outer else F.explode
        return df.select(*self.keep, explode(arr).alias(self.alias))


class PandasMap(_PerStream):
    """Vectorized Python map over Arrow batches — the sanctioned slow
    path when built-ins can't express the logic.  ``fn`` is
    ``pandas.DataFrame -> pandas.DataFrame`` applied per batch via
    ``mapInPandas`` (constant memory, streams batches, scales with
    partitions).

    ``chunk`` re-slices Arrow batches to at most that many rows before
    ``fn`` sees them — the per-component analog of the reference's
    per-operator ``chunk`` opt (``lib/gen_mix.ex:7``); the session
    Arrow setting stays the global transfer bound."""

    def __init__(
        self,
        name_or_names: "str | Sequence[str]",
        fn: Callable,
        schema: Any,
        *,
        chunk: "int | None" = None,
        label: str | None = None,
    ):
        super().__init__(name_or_names, label=label)
        if chunk is not None and chunk < 1:
            raise ValueError(f"chunk must be >= 1 or None, got {chunk}")
        self.fn = fn
        self.schema = schema
        self.chunk = chunk

    def transform_df(self, df: DataFrame) -> DataFrame:
        from ..component import rechunk_batches

        fn = self.fn
        chunk = self.chunk

        def mapper(batches):
            for pdf in rechunk_batches(batches, chunk):
                out = fn(pdf)
                if out is not None and len(out):
                    yield out

        return df.mapInPandas(mapper, schema=self.schema)


class SQL(Component):
    """Run a SQL statement over the flow: every named stream is
    registered as a temp view, the result becomes stream ``output``.
    The escape hatch that makes the engine a full SQL surface (the
    reference has no SQL at all — this is part of the idiomatic
    superset, SURVEY §2.3)."""

    def __init__(self, output: str, query: str, *, label: str | None = None):
        self.output = output
        self.query = query
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        from pyspark.sql import SparkSession

        spark = None
        for name, df in flow.items():
            df.createOrReplaceTempView(name)
            spark = df.sparkSession
        if spark is None:
            spark = SparkSession.getActiveSession()
        return flow.with_stream(self.output, spark.sql(self.query))

    def input_names(self) -> Sequence[str]:
        return ()

    def output_names(self) -> Sequence[str]:
        return (self.output,)


class Agg(Component):
    """Group-by aggregation as a component (the words-count pattern:
    the reference hash-partitions + per-partition map acc + final merge,
    ``test/examples/words_count_test.exs`` — Catalyst's partial/final
    hash aggregate does exactly that automatically, no sentinel needed).

    ``Agg("in", "out", by=["k"], aggs={"n": F.count("*")})``

    ``mode`` selects the grouping shape: ``"groupby"`` (default),
    ``"rollup"`` or ``"cube"`` — hierarchical/cross-dimension subtotal
    rows exactly as SQL ``GROUP BY ROLLUP/CUBE`` (part of the idiomatic
    superset; the physical plan is still one partial+final hash
    aggregate pass, grouping-set rows expanded map-side) — or
    ``"grouping_sets"`` with an explicit ``sets`` list (each a list of
    column names drawn from ``by``), the general form the other two
    desugar to.
    """

    def __init__(
        self,
        input: str,
        output: str | None = None,
        *,
        by: Sequence[Any] = (),
        aggs: Mapping[str, Any],
        mode: str = "groupby",
        sets: "Sequence[Sequence[str]] | None" = None,
        label: str | None = None,
    ):
        if mode not in ("groupby", "rollup", "cube", "grouping_sets"):
            raise ValueError("mode must be groupby|rollup|cube|grouping_sets")
        if (mode == "grouping_sets") != (sets is not None):
            raise ValueError("sets must be given exactly when mode='grouping_sets'")
        self.input = input
        self.output = output or input
        self.by = list(by)
        self.aggs = dict(aggs)
        self.mode = mode
        self.sets = [list(s) for s in sets] if sets is not None else None
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        df = flow[self.input]
        exprs = [_resolve_expr(e, df).alias(n) for n, e in self.aggs.items()]
        if self.mode == "rollup":
            grouped = df.rollup(*self.by)
        elif self.mode == "cube":
            grouped = df.cube(*self.by)
        elif self.mode == "grouping_sets":
            from pyspark.sql import functions as F

            grouped = df.groupingSets(
                [[F.col(c) for c in s] for s in self.sets],
                *[F.col(c) for c in self.by],
            )
        else:
            grouped = df.groupBy(*self.by) if self.by else df.groupBy()
        out = grouped.agg(*exprs)
        return flow.without(self.input).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)


class Join(Component):
    """Binary stream join as a component.  ``broadcast=True`` hints the
    right side — at 100 TB a dimension-table join must not shuffle the
    fact table; Catalyst + AQE pick broadcast automatically under the
    threshold, the hint forces it when statistics lie."""

    def __init__(
        self,
        left: str,
        right: str,
        output: str,
        on: Any,
        how: str = "inner",
        *,
        broadcast: bool = False,
        label: str | None = None,
    ):
        self.left = left
        self.right = right
        self.output = output
        self.on = on
        self.how = how
        self.broadcast = broadcast
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        left, right = flow[self.left], flow[self.right]
        if self.broadcast:
            right = F.broadcast(right)
        out = left.join(right, on=self.on, how=self.how)
        return flow.without(self.left, self.right).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.left, self.right)

    def output_names(self) -> Sequence[str]:
        return (self.output,)
