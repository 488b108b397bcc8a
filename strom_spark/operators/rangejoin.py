"""Range join: point-in-interval and interval-overlap joins.

The reference joins streams only on equality of extracted keys
(``lib/transformer.ex`` composition patterns); range predicates are a
beyond-reference capability every event pipeline needs (events x promo
windows, sessions x incidents).  Spark has no native range-join
optimization — a bare ``l.join(r, point_between_start_end)`` plans a
BroadcastNestedLoopJoin or a cartesian product, which is O(|L| x |R|)
and unrunnable at 100 TB.

Lowering used here (the standard bucketized range join):

  1. pick a bucket width ``w`` (ideally ~ the median interval length);
  2. points map to bucket ``floor(p / w)``; intervals EXPLODE to every
     bucket they touch (``sequence(floor(s/w), floor(e/w))``);
  3. equi-join on the bucket id (plus any extra equality keys) — a
     plain shuffled/broadcast hash join Catalyst knows how to plan;
  4. re-apply the exact range predicate to discard same-bucket misses.

A point lives in exactly ONE bucket, so point-mode emits each matching
pair exactly once — no dedup pass.  In overlap mode both sides explode,
so a pair would surface once per shared bucket; instead of a wide
``dropDuplicates`` we keep a pair only in its CANONICAL bucket
``max(floor(l_start/w), floor(r_start/w))`` (the first bucket the two
intervals share), which every overlapping pair hits exactly once —
dedup costs zero extra shuffles.

Cost: |R| inflates by (interval_len / w + 1) exploded rows; the join
itself is an equi-join on a well-distributed long key.  Long intervals
with a tiny ``w`` over-explode — choose ``w`` near the typical interval
length, and lean on AQE for residual bucket skew.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..component import Component
from ..flow import Flow

_B = "__rj_bucket"


def _as_long(df: DataFrame, col: str | Column) -> Column:
    """Numeric view of a point/bound column: timestamps become epoch
    micros (exact longs), numerics pass through."""
    c = F.col(col) if isinstance(col, str) else col
    if isinstance(col, str):
        dtype = dict(df.dtypes).get(col)
        if dtype == "timestamp":
            return F.unix_micros(c)
        if dtype == "timestamp_ntz":
            # unix_micros rejects NTZ; reinterpret as a zoned instant
            # first (exact in a UTC-pinned session, see io.load_table)
            return F.unix_micros(c.cast("timestamp"))
    return c


class RangeJoin(Component):
    """Join ``left`` to ``right`` on a range predicate.

    Point mode (``point=`` given): left rows match right rows with
    ``right_start <= point < right_end`` (``end_inclusive=True`` makes
    the upper bound closed).

    Overlap mode (``left_start``/``left_end`` given): half-open
    interval overlap ``left_start < right_end AND right_start <
    left_end``.

    ``bucket`` is the bucket width in the columns' numeric units
    (micros for timestamps).  When omitted it is AUTO-SIZED at plan
    time from the median interval span (``approx_percentile(end -
    start, 0.5)`` — one distributed aggregate, a one-row collect): the
    width that bounds the per-interval explode factor at ~2-3 exploded
    rows for typical span distributions.  A wildly-wrong manual width
    is the operator's one silent scale trap (tiny bucket x long
    intervals = quadratic fan-out), so prefer the default unless the
    span distribution is known and extreme.  ``extra_on`` adds equality
    keys to the bucket join (e.g. a tenant id), tightening the shuffle
    key.
    """

    def __init__(
        self,
        left: str,
        right: str,
        output: str,
        *,
        right_start: str | Column,
        right_end: str | Column,
        point: str | Column | None = None,
        left_start: str | Column | None = None,
        left_end: str | Column | None = None,
        bucket: int | None = None,
        extra_on: Sequence[str] = (),
        end_inclusive: bool = False,
        label: str | None = None,
    ):
        if (point is None) == (left_start is None):
            raise ValueError("exactly one of point= or left_start=/left_end= required")
        if left_start is not None and left_end is None:
            raise ValueError("left_end= required in overlap mode")
        if bucket is not None and bucket <= 0:
            raise ValueError("bucket width must be positive")
        self.left, self.right, self.output = left, right, output
        self.point, self.left_start, self.left_end = point, left_start, left_end
        self.right_start, self.right_end = right_start, right_end
        self.bucket = None if bucket is None else int(bucket)
        self.extra_on = list(extra_on)
        self.end_inclusive = end_inclusive
        self.label = label

    def _auto_bucket(self, left: DataFrame, right: DataFrame) -> int:
        """Median interval span across the interval-bearing side(s) —
        one distributed approx-percentile aggregate, one scalar back to
        the driver.  Overlap mode pools both sides so the width suits
        the wider distribution (fewer exploded rows)."""
        spans = right.select(
            (_as_long(right, self.right_end) - _as_long(right, self.right_start)).alias(
                "__span"
            )
        )
        if self.left_start is not None:
            spans = spans.unionAll(
                left.select(
                    (_as_long(left, self.left_end) - _as_long(left, self.left_start)).alias(
                        "__span"
                    )
                )
            )
        med = (
            spans.filter(F.col("__span") > 0)
            .agg(F.percentile_approx("__span", F.lit(0.5)).alias("m"))
            .collect()[0]
            .m
        )
        if med is None:
            raise ValueError(
                "RangeJoin: cannot auto-size bucket — no positive-width "
                "intervals found; pass bucket= explicitly"
            )
        return max(1, int(med))

    def _explode_buckets(self, df: DataFrame, start, end, width: int) -> DataFrame:
        s = F.floor(_as_long(df, start) / width)
        e = F.floor(_as_long(df, end) / width)
        # sequence(s, e) with s > e is a DESCENDING array in Spark, not
        # an error — an inverted interval would silently join against
        # wrong buckets.  Guard to an empty array so such rows drop out
        # of the explode entirely (same trap as shingles_of_tokens).
        idx = F.when(e >= s, F.sequence(s, e)).otherwise(F.array().cast("array<bigint>"))
        return df.withColumn(_B, F.explode(idx))

    def transform(self, flow: Flow) -> Flow:
        left, right = flow[self.left], flow[self.right]
        clash = (set(left.columns) & set(right.columns)) - set(self.extra_on)
        if clash:
            raise ValueError(
                "range join requires disjoint column names outside extra_on; "
                f"rename these on one side first: {sorted(clash)}"
            )
        if self.bucket is None and (left.isStreaming or right.isStreaming):
            # auto-sizing runs an eager aggregate at plan time, which a
            # streaming plan cannot execute — fail with the actionable
            # error, not Spark's writeStream.start() AnalysisException
            raise TypeError(
                "RangeJoin: bucket auto-sizing is batch-only (it runs an "
                "eager median aggregate); pass bucket= explicitly for "
                "streaming inputs"
            )
        width = self.bucket if self.bucket is not None else self._auto_bucket(left, right)
        rs, re = _as_long(right, self.right_start), _as_long(right, self.right_end)
        rb = self._explode_buckets(right, self.right_start, self.right_end, width)

        if self.point is not None:
            p = _as_long(left, self.point)
            lb = left.withColumn(_B, F.floor(p / width))
            upper = (p <= re) if self.end_inclusive else (p < re)
            cond = (rs <= p) & upper
        else:
            ls = _as_long(left, self.left_start)
            le = _as_long(left, self.left_end)
            lb = self._explode_buckets(left, self.left_start, self.left_end, width)
            # max(starts) < min(ends) is the half-open overlap predicate
            # that is also correct for empty intervals ([x,x) overlaps
            # nothing); the textbook ls<re AND rs<le form wrongly
            # matches an empty interval strictly inside another.
            # Canonical shared bucket: emit each overlapping pair once.
            cond = (
                (F.greatest(ls, rs) < F.least(le, re))
                & (F.col(_B) == F.greatest(F.floor(ls / width), F.floor(rs / width)))
            )

        out = lb.join(rb, on=[_B, *self.extra_on], how="inner").filter(cond).drop(_B)
        return flow.without(self.left, self.right).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.left, self.right)

    def output_names(self) -> Sequence[str]:
        return (self.output,)
