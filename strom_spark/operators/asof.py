"""As-of (backward temporal) join — the time-series primitive Spark's
built-in join set lacks (pandas ``merge_asof`` / kdb ``aj`` / DuckDB
``ASOF JOIN`` semantics): each left row picks the single right row with
the greatest ``right_ts <= left_ts`` for the same key.

Spark-first lowering — the union-marker trick, ONE shuffle total:

    union(right(side=0), left(side=1))
      -> window last(right_cols, ignorenulls) over
           (partition by key order by ts, side rows unbounded..current)
      -> keep side=1 rows

instead of the naive range join (quadratic per key) or a per-key
``applyInPandas`` (Python in the hot path).  Sorting ``side`` after
``ts`` makes a right row at exactly ``left_ts`` visible to that left
row (allow_exact_matches).  At 100 TB this is a single hash shuffle on
the key + an in-partition sort — the same cost as any keyed window;
skewed keys fall to AQE like every other window op.

A ``tolerance`` (seconds) turns matches older than the horizon into
NULLs — the standard attribution-window semantics.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..component import Component
from ..flow import Flow


class AsofJoin(Component):
    """Backward as-of join of ``left`` and ``right`` on ``key``.

    Right rows MUST be unique per (key, right_ts) — pre-aggregate if
    they aren't (the matched row would otherwise be tie-ambiguous in
    every engine).  Output: all left columns, plus each ``value_col``
    from the right (NULL when no right row is at-or-before), plus
    ``matched_ts`` (the matched right timestamp).

    ``direction='forward'`` flips the match to the EARLIEST right row
    at-or-after each left row (pandas merge_asof direction semantics)
    — same one-shuffle lowering over the reversed time order.
    """

    def __init__(
        self,
        left: str,
        right: str,
        output: str,
        *,
        key: "str | Sequence[str]",
        left_ts: str = "ts",
        right_ts: str = "ts",
        value_cols: Sequence[str],
        tolerance_s: float | None = None,
        direction: str = "backward",
        label: str | None = None,
    ):
        if direction not in ("backward", "forward"):
            raise ValueError("direction must be 'backward' or 'forward'")
        self.left = left
        self.right = right
        self.output = output
        self.key = [key] if isinstance(key, str) else list(key)
        self.left_ts = left_ts
        self.right_ts = right_ts
        self.value_cols = list(value_cols)
        self.tolerance_s = tolerance_s
        self.direction = direction
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        left, right = flow[self.left], flow[self.right]
        vcols = self.value_cols
        # Name-collision guard (mirrors RangeJoin): the union-marker
        # lowering would otherwise silently merge a left column that
        # shares a name with a carried right column or an internal
        # marker, and the final select would emit duplicate names.
        reserved = set(vcols) | {"matched_ts", "__ts", "__side"}
        reserved |= {f"__m_{c}" for c in vcols} | {"__m_ts"}
        clashes = sorted(reserved & set(left.columns))
        if clashes:
            raise ValueError(
                f"AsofJoin: left columns {clashes} clash with value_cols/"
                "matched_ts/internal names — rename them before the join"
            )
        if self.tolerance_s is not None:
            ts_types = {
                df.schema[c].dataType.typeName()
                for df, c in ((left, self.left_ts), (right, self.right_ts))
            }
            if not ts_types <= {"timestamp", "timestamp_ntz", "date"}:
                raise ValueError(
                    "AsofJoin: tolerance_s requires timestamp-typed ts "
                    f"columns (got {sorted(ts_types)}); on numeric ts the "
                    "tolerance would be silently interpreted in column "
                    "units — cast to timestamp first"
                )
        # Normalize DATE / TIMESTAMP_NTZ event-time to zoned TIMESTAMP up
        # front: the tolerance gap below does cast('double'), which Spark
        # forbids from DATE and NTZ, and mixed-type unions would widen
        # unpredictably.  In a UTC-pinned session the cast preserves the
        # instant (see io.load_table).
        def _ts(df: DataFrame, col: str):
            c = F.col(col)
            if df.schema[col].dataType.typeName() in ("date", "timestamp_ntz"):
                c = c.cast("timestamp")
            return c

        r = right.select(
            *self.key,
            _ts(right, self.right_ts).alias("__ts"),
            *[F.col(c) for c in vcols],
        ).withColumn("__side", F.lit(0))
        l = left.withColumn("__ts", _ts(left, self.left_ts)).withColumn(
            "__side", F.lit(1)
        )
        u = l.unionByName(r, allowMissingColumns=True)
        # forward direction = the same walk over time REVERSED: sort
        # descending and "last right seen so far" becomes the earliest
        # right row at-or-after each left row.  Side still sorts
        # ascending so an exactly-equal right row is visible.
        ts_order = (
            F.col("__ts").desc() if self.direction == "forward" else F.col("__ts").asc()
        )
        w = (
            Window.partitionBy(*self.key)
            .orderBy(ts_order, F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = [
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"__m_{c}")
            for c in vcols
        ]
        matched_ts = (
            F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
            .over(w)
            .alias("__m_ts")
        )
        out = u.select("*", *carried, matched_ts).filter(F.col("__side") == 1)
        in_window = F.col("__m_ts").isNotNull()
        if self.tolerance_s is not None:
            gap = (
                F.col("__m_ts").cast("double") - F.col("__ts").cast("double")
                if self.direction == "forward"
                else F.col("__ts").cast("double") - F.col("__m_ts").cast("double")
            )
            in_window = in_window & (gap <= F.lit(float(self.tolerance_s)))
        keep = [F.col(c) for c in left.columns]
        keep += [
            F.when(in_window, F.col(f"__m_{c}")).alias(c) for c in vcols
        ]
        keep.append(F.when(in_window, F.col("__m_ts")).alias("matched_ts"))
        out = out.select(*keep)
        return flow.without(self.left, self.right).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.left, self.right)

    def output_names(self) -> Sequence[str]:
        return (self.output,)
