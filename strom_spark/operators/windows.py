"""Window components: count, sliding(count), and time windows.

Reference builds all three from the stateful Transformer
(``test/examples/window_test.exs``): buffer events in the acc until the
window closes, then emit the batch.  Spark-first versions:

  - **CountWindow** (tumbling, size N): no native count-window in
    Spark.  Batch lowering: ``row_number() over (order)`` then
    ``groupBy(floor((rn-1)/N))`` — fully distributed after the rank.
    The global ``row_number`` needs a total order; with
    ``partition_by`` the numbering (and windows) are per key, which
    scales.  Global (no partition) count windows are inherently
    sequential — a single-partition sort, same as the reference.
  - **SlidingCountWindow** (size N, step S): windows starting every S
    rows.  Lowered via element_at over a collected frame per window
    start... no — lowered as: rn-based window ids for each covered
    window via sequence + explode (each row belongs to up to N/S
    windows), then groupBy window id.  Pure built-ins, no Python.
  - **TimeWindow** (tumbling/sliding over event time): native
    ``F.window(ts, size, step)`` — strictly better than the
    reference's tick-stream trick (event time + watermark on streams).

Each component aggregates per window with user aggs, or emits the
window id for downstream use (``aggs=None``).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..component import Component
from ..flow import Flow
from .transformer import _resolve_expr


def _is_multi_split(df) -> bool:
    """True when the input scan has enough splits that a
    single-partition total-order window would be the bottleneck.  At
    100 TB every scan is multi-split -> the distributed rank always
    engages; a tiny local file (1-4 splits) sorts faster on one core
    than it range-shuffles."""
    return df.rdd.getNumPartitions() > 4


class CountWindow(Component):
    """Tumbling count window: consecutive groups of ``size`` events in
    ``order_by`` order (per ``partition_by`` key if given — the scale
    path).  Adds ``window_id`` (0-based) and aggregates if ``aggs``."""

    def __init__(
        self,
        input: str,
        output: str | None = None,
        *,
        size: int,
        order_by: Sequence[str],
        partition_by: Sequence[str] = (),
        aggs: Mapping[str, Any] | None = None,
        drop_partial: bool = False,
        label: str | None = None,
    ):
        self.input = input
        self.output = output or input
        self.size = size
        self.order_by = tuple(order_by)
        self.partition_by = tuple(partition_by)
        self.aggs = dict(aggs) if aggs else None
        self.drop_partial = drop_partial
        self.label = label

    def _with_window_id(self, df: DataFrame) -> DataFrame:
        if not self.partition_by and not df.isStreaming and _is_multi_split(df):
            # distributed total-order rank — no single-partition window
            from .relational import global_row_number

            df = global_row_number(df, list(self.order_by))
            rn = F.col("__rn")
            return df.withColumn(
                "window_id", ((rn - F.lit(1)) / F.lit(self.size)).cast("bigint")
            ).drop("__rn")
        w = W.partitionBy(*self.partition_by) if self.partition_by else W.partitionBy()
        w = w.orderBy(*[F.col(c) for c in self.order_by])
        rn = F.row_number().over(w)
        return df.withColumn("window_id", ((rn - F.lit(1)) / F.lit(self.size)).cast("bigint"))

    def transform(self, flow: Flow) -> Flow:
        df = self._with_window_id(flow[self.input])
        keys = [*self.partition_by, "window_id"]
        if self.aggs is not None:
            exprs = [_resolve_expr(e, df).alias(n) for n, e in self.aggs.items()]
            if self.drop_partial:
                # completeness rides the user aggregation (same move as
                # SlidingCountWindow, r14): one hash agg + post-filter
                # on count == size instead of an extra sort+window pass
                df = (
                    df.groupBy(*keys)
                    .agg(F.count(F.lit(1)).alias("__wn"), *exprs)
                    .filter(F.col("__wn") == self.size)
                    .drop("__wn")
                )
            else:
                df = df.groupBy(*keys).agg(*exprs)
        elif self.drop_partial:
            counts = F.count("*").over(W.partitionBy(*keys))
            df = df.withColumn("__wn", counts).filter(F.col("__wn") == self.size).drop("__wn")
        return flow.without(self.input).with_stream(self.output, df)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)


class SlidingCountWindow(Component):
    """Sliding count window of ``size`` events advancing by ``step``
    (reference: retain ``size - overlap``; ``step = size - overlap``).

    Lowering: each row with rank ``rn`` (1-based) belongs to windows
    ``w`` where ``w*step < rn <= w*step + size`` — computed as an
    exploded integer sequence, then grouped.  Built-ins only; the fan
    -out factor is ``size/step`` rows, shuffled once.
    Windows are emitted only when complete (the reference emits on
    buffer-full) unless ``keep_partial=True`` emits trailing partials.
    """

    def __init__(
        self,
        input: str,
        output: str | None = None,
        *,
        size: int,
        step: int,
        order_by: Sequence[str],
        partition_by: Sequence[str] = (),
        aggs: Mapping[str, Any] | None = None,
        keep_partial: bool = False,
        label: str | None = None,
    ):
        if step <= 0 or size <= 0:
            raise ValueError("size and step must be positive")
        self.input = input
        self.output = output or input
        self.size = size
        self.step = step
        self.order_by = tuple(order_by)
        self.partition_by = tuple(partition_by)
        self.aggs = dict(aggs) if aggs else None
        self.keep_partial = keep_partial
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        df = flow[self.input]
        if df.isStreaming:
            return flow.without(self.input).with_stream(
                self.output, self._transform_streaming(df)
            )
        size, step = F.lit(self.size), F.lit(self.step)
        # materialize the rank first: explode() cannot nest a window fn
        if not self.partition_by and not df.isStreaming and _is_multi_split(df):
            # distributed total-order rank — no single-partition window
            from .relational import global_row_number

            df = global_row_number(df, list(self.order_by))  # 1-based
        else:
            w = W.partitionBy(*self.partition_by) if self.partition_by else W.partitionBy()
            w = w.orderBy(*[F.col(c) for c in self.order_by])
            df = df.withColumn("__rn", F.row_number().over(w))  # 1-based
        rn = F.col("__rn")
        # window ids w (0-based, start row = w*step+1): ceil((rn-size)/step) <= w <= floor((rn-1)/step)
        lo = F.greatest(F.lit(0), F.ceil((rn - size) / step))
        hi = F.floor((rn - F.lit(1)) / step)
        df = df.withColumn(
            "window_id", F.explode(F.sequence(lo.cast("bigint"), hi.cast("bigint")))
        ).drop("__rn")
        keys = [*self.partition_by, "window_id"]
        if self.aggs is not None:
            exprs = [_resolve_expr(e, df).alias(a) for a, e in self.aggs.items()]
            if not self.keep_partial:
                # completeness check rides the SAME hash aggregate as
                # the user aggs (count == size post-filter) instead of
                # a separate sort+window pass over the exploded frame —
                # one exchange and zero sorts where the old shape paid
                # an extra window sort (r14, guide §2.4: two operations
                # keyed the same way share one exchange).  Identical
                # output: a window is complete iff its row count is
                # exactly ``size``, whether counted before or inside
                # the aggregation.
                df = (
                    df.groupBy(*keys)
                    .agg(F.count(F.lit(1)).alias("__wn"), *exprs)
                    .filter(F.col("__wn") == self.size)
                    .drop("__wn")
                )
            else:
                df = df.groupBy(*keys).agg(*exprs)
        elif not self.keep_partial:
            n = F.count("*").over(W.partitionBy(*keys))
            df = df.withColumn("__wn", n).filter(F.col("__wn") == self.size).drop("__wn")
        return flow.without(self.input).with_stream(self.output, df)

    def _transform_streaming(self, df: DataFrame) -> DataFrame:
        """Streaming lowering: a keyed stateful window assigner
        (``applyInPandasWithState``).  ``row_number`` is unsupported on
        streams, so the rank is per-key KEYED STATE: a counter plus a
        buffer of rows whose windows haven't completed yet.  Each
        micro-batch extends the ranks (rows sorted by ``order_by``
        WITHIN the batch; cross-batch order is arrival order — the
        reference's stream semantics), emits every window that just
        completed as (original columns + window_id) rows, and prunes
        the buffer — state is hard-bounded at ``size + step - 1`` rows
        per key, asserted in the kernel, so memory tracks the window
        geometry, never the stream length.

        Emitted form only (``aggs=None``): count windows carry no event
        time, so a downstream streaming aggregate would never close in
        append mode — aggregate the assignments per micro-batch via
        ``transform_per_batch`` or in batch after a drain.
        ``keep_partial`` is meaningless on an unbounded stream (a
        partial window is just one that hasn't completed YET)."""
        import pickle

        import pandas as pd

        if self.aggs is not None:
            raise ValueError(
                "SlidingCountWindow on a stream emits (row, window_id) "
                "assignments only (aggs=None): count windows carry no "
                "event time, so a downstream streaming agg never closes "
                "in append mode. Aggregate per micro-batch via "
                "transform_per_batch, or in batch after the drain."
            )
        if self.keep_partial:
            raise ValueError(
                "SlidingCountWindow: keep_partial is meaningless on an "
                "unbounded stream — a partial window is one that hasn't "
                "completed yet."
            )
        size, step = self.size, self.step
        order_by = list(self.order_by)
        cols = list(df.columns)
        out_schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
        ) + ", window_id bigint"
        if self.partition_by:
            grouped = df.groupBy(*self.partition_by)
        else:
            # a GLOBAL count window is inherently serial (same as the
            # batch single-partition rank); one constant key routes
            # everything through one state partition
            grouped = df.withColumn("__g", F.lit(0)).groupBy("__g")
        drop_g = not self.partition_by

        def kernel(key, pdfs, state):
            if state.exists:
                n_seen, emitted_w, buf = pickle.loads(state.get[0])
            else:
                n_seen, emitted_w, buf = 0, -1, pd.DataFrame()
            batch = pd.concat(list(pdfs), ignore_index=True)
            if drop_g:
                batch = batch.drop(columns=["__g"])
            if len(batch):
                batch = batch.sort_values(order_by, kind="mergesort").reset_index(
                    drop=True
                )
                batch["__rn"] = range(n_seen + 1, n_seen + len(batch) + 1)
                n_seen += len(batch)
                buf = pd.concat([buf, batch], ignore_index=True) if len(buf) else batch
            # window w (0-based) covers ranks w*step+1 .. w*step+size;
            # complete once n_seen reaches its end
            last_complete = (n_seen - size) // step if n_seen >= size else -1
            out = []
            for w in range(emitted_w + 1, last_complete + 1):
                rows = buf[(buf["__rn"] > w * step) & (buf["__rn"] <= w * step + size)]
                rows = rows.copy()
                rows["window_id"] = w
                out.append(rows)
            emitted_w = max(emitted_w, last_complete)
            # prune: a row's last window is floor((rn-1)/step) — gone
            # once that window has been emitted
            if len(buf):
                buf = buf[(buf["__rn"] - 1) // step > emitted_w].reset_index(drop=True)
            assert len(buf) <= size + step - 1, (
                f"SlidingCountWindow stream state invariant broken: "
                f"{len(buf)} buffered rows > size+step-1={size + step - 1}"
            )
            state.update((pickle.dumps((n_seen, emitted_w, buf)),))
            if out:
                yield pd.concat(out, ignore_index=True).drop(columns=["__rn"])[
                    cols + ["window_id"]
                ]

        from pyspark.sql.streaming.state import GroupStateTimeout

        return grouped.applyInPandasWithState(
            kernel,
            outputStructType=out_schema,
            stateStructType="state binary",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)


class TimeWindow(Component):
    """Event-time window via native ``F.window`` — tumbling when
    ``slide`` is None, else sliding.  Emits ``window_start``/
    ``window_end`` columns (flattened for oracle-friendliness).  On
    streaming inputs pass ``watermark=("ts_col", "10 minutes")`` for
    late-data bounds (the reference has no late-data policy at all —
    user code handles it; watermarks are the idiomatic upgrade)."""

    def __init__(
        self,
        input: str,
        output: str | None = None,
        *,
        ts: str,
        size: str,
        slide: str | None = None,
        partition_by: Sequence[str] = (),
        aggs: Mapping[str, Any],
        watermark: tuple[str, str] | None = None,
        label: str | None = None,
    ):
        self.input = input
        self.output = output or input
        self.ts = ts
        self.size = size
        self.slide = slide
        self.partition_by = tuple(partition_by)
        self.aggs = dict(aggs)
        self.watermark = watermark
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        df = flow[self.input]
        if self.watermark:
            df = df.withWatermark(*self.watermark)
        win = F.window(self.ts, self.size, self.slide) if self.slide else F.window(self.ts, self.size)
        exprs = [_resolve_expr(e, df).alias(n) for n, e in self.aggs.items()]
        out = (
            df.groupBy(win.alias("window"), *self.partition_by)
            .agg(*exprs)
            .withColumn("window_start", F.col("window.start"))
            .withColumn("window_end", F.col("window.end"))
            .drop("window")
        )
        return flow.without(self.input).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)


class SessionWindow(Component):
    """Gap-based session window via native ``F.session_window`` —
    works on batch AND streaming inputs with the same code.  A session
    extends while consecutive events per partition key arrive within
    ``gap`` (boundary INCLUSIVE: an event exactly ``gap`` after the
    previous one extends the session — verified empirically, the
    session closes only when the gap is strictly exceeded); it closes
    ``gap`` after the last event.  Emits flattened
    ``session_start``/``session_end`` plus the aggregates.

    On streams pass ``watermark=``: sessions are keyed state that can
    MERGE when a late event bridges two open sessions — Spark handles
    that natively; the watermark bounds how long sessions stay open
    (state is dropped once the watermark passes session_end + gap).
    The batch ``sessionize_users`` query is the window-function
    lowering of the same semantics (lag + cumulative sum) — this
    operator is the streaming-capable form.
    """

    def __init__(
        self,
        input: str,
        output: str | None = None,
        *,
        ts: str,
        gap: str,
        partition_by: Sequence[str] = (),
        aggs: Mapping[str, Any],
        watermark: tuple[str, str] | None = None,
        label: str | None = None,
    ):
        self.input = input
        self.output = output or input
        self.ts = ts
        self.gap = gap
        self.partition_by = tuple(partition_by)
        self.aggs = dict(aggs)
        self.watermark = watermark
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        df = flow[self.input]
        if self.watermark:
            df = df.withWatermark(*self.watermark)
        exprs = [_resolve_expr(e, df).alias(n) for n, e in self.aggs.items()]
        out = (
            df.groupBy(F.session_window(self.ts, self.gap).alias("session"), *self.partition_by)
            .agg(*exprs)
            .withColumn("session_start", F.col("session.start"))
            .withColumn("session_end", F.col("session.end"))
            .drop("session")
        )
        return flow.without(self.input).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)
