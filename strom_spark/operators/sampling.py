"""Deterministic, engine-portable sampling for training-data pipelines.

``df.sample()``/``sampleBy()`` are seeded per-engine (Spark's sampler
is not reproducible outside Spark, and resamples on retry/recompute
unless the plan is identical).  At 100 TB a training corpus needs
sampling that is (a) reproducible run-to-run, (b) stable under
repartitioning/retries, (c) auditable from ANY engine.  The standard
trick: hash a stable key to a bucket and threshold the bucket —
membership is then a pure function of the row key + salt.

The hash is the portable 32-bit md5 prefix (functions/text.kgram_hash
uses the same construction): ``conv(substr(md5(salt||key),1,8),16,10)``
in Spark == ``('0x'||substring(md5(salt||key),1,8))::UBIGINT`` in
DuckDB — so every sample decision can be replayed by the oracle.

All three operators are narrow (no shuffle) except GroupCap's one
window shuffle on the group key.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..component import Component
from ..flow import Flow

#: bucket resolution: fractions are exact multiples of 1/10000
BUCKETS = 10_000


def bucket_of(key_col, salt: str):
    """Portable hash bucket in [0, BUCKETS) of salt||key (md5-prefix
    integer — identical in Spark and DuckDB)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(BUCKETS))


class HashSample(Component):
    """Keep a deterministic ``fraction`` of rows by key-hash bucket —
    reproducible, retry-stable, oracle-replayable sampling."""

    def __init__(
        self,
        input: str,
        output: str | None = None,
        *,
        key_col: str,
        fraction: float,
        salt: str = "sample",
        label: str | None = None,
    ):
        if not 0.0 <= fraction <= 1.0:
            raise ValueError("fraction must be in [0, 1]")
        self.input = input
        self.output = output or input
        self.key_col = key_col
        self.fraction = fraction
        self.salt = salt
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        df = flow[self.input]
        # round, not int(): 0.29 * 10000 == 2899.999..., truncation
        # would keep one bucket short of the intended exact multiple
        out = df.filter(bucket_of(self.key_col, self.salt) < round(self.fraction * BUCKETS))
        return flow.without(self.input).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)


class HashSplit(Component):
    """Disjoint deterministic splits (train/val/test) as an added
    ``split`` column: bucket thresholds over the key hash, so every
    row lands in exactly one split, stable across runs and engines.
    ``splits`` maps name -> fraction; fractions must sum to 1."""

    def __init__(
        self,
        input: str,
        output: str | None = None,
        *,
        key_col: str,
        splits: Mapping[str, float],
        salt: str = "split",
        label: str | None = None,
    ):
        total = sum(splits.values())
        if abs(total - 1.0) > 1e-9:
            raise ValueError(f"split fractions must sum to 1, got {total}")
        self.input = input
        self.output = output or input
        self.key_col = key_col
        self.splits = dict(splits)
        self.salt = salt
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        df = flow[self.input]
        b = bucket_of(self.key_col, self.salt)
        expr = None
        cum = 0.0
        names = list(self.splits)
        for name in names[:-1]:
            # round the CUMULATIVE fraction, not each increment — per-
            # increment rounding error compounds and shifts interior
            # boundaries for fractions that aren't multiples of 1/BUCKETS
            cum += self.splits[name]
            lo = round(cum * BUCKETS)
            cond = b < lo
            expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
        out = df.withColumn("split", expr)
        return flow.without(self.input).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)


class GroupCap(Component):
    """Deterministically cap rows per group (balanced downsampling —
    e.g. at most N documents per source/domain): rank group members by
    key-hash (a stable shuffle of each group) and keep the first
    ``n``.  One window shuffle on the group key; ties broken by the
    key itself so the kept set is unique and engine-replayable."""

    def __init__(
        self,
        input: str,
        output: str | None = None,
        *,
        by: "str | Sequence[str]",
        key_col: str,
        n: int,
        salt: str = "cap",
        label: str | None = None,
    ):
        self.input = input
        self.output = output or input
        self.by = [by] if isinstance(by, str) else list(by)
        self.key_col = key_col
        self.n = n
        self.salt = salt
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        df = flow[self.input]
        w = Window.partitionBy(*self.by).orderBy(
            bucket_of(self.key_col, self.salt), F.col(self.key_col)
        )
        out = (
            df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= self.n)
            .drop("__rk")
        )
        return flow.without(self.input).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)


class MixtureSample(Component):
    """Deterministic per-group sampling rates — the data-MIXING
    primitive of a training corpus: downsample each source/domain to a
    target mixture ("web at 30%, books at 100%, boilerplate at 5%")
    with the same portable hash-bucket membership as :class:`HashSample`,
    so the mixture is reproducible run-to-run, stable under retries and
    repartitioning, and replayable by any engine.

    ``rates`` maps a ``group_col`` VALUE to its keep fraction; groups
    not listed use ``default``.  Narrow plan (a CASE over the group
    column thresholding the key-hash bucket), zero shuffle — at 100 TB
    the mixture pass rides the scan.  For an exact per-group row CAP
    instead of a rate, use :class:`GroupCap`."""

    def __init__(
        self,
        input: str,
        output: str | None = None,
        *,
        key_col: str,
        group_col: str,
        rates: Mapping[str, float],
        default: float = 1.0,
        salt: str = "mix",
        label: str | None = None,
    ):
        for g, r in rates.items():
            if not 0.0 <= r <= 1.0:
                raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")
        if not 0.0 <= default <= 1.0:
            raise ValueError(f"default rate must be in [0, 1], got {default}")
        if not rates:
            raise ValueError("rates must name at least one group")
        self.input = input
        self.output = output or input
        self.key_col = key_col
        self.group_col = group_col
        self.rates = dict(rates)
        self.default = default
        self.salt = salt
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        df = flow[self.input]
        thresh = None
        for g, r in self.rates.items():
            cond = F.col(self.group_col) == F.lit(g)
            lo = F.lit(round(r * BUCKETS))
            thresh = F.when(cond, lo) if thresh is None else thresh.when(cond, lo)
        thresh = thresh.otherwise(F.lit(round(self.default * BUCKETS)))
        out = df.filter(bucket_of(self.key_col, self.salt) < thresh)
        return flow.without(self.input).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)


class TemperatureMix(Component):
    """Temperature-based source mixing — the ``n^alpha`` corpus
    flattening used for multi-source / multilingual pretraining
    mixtures: expected kept rows per group become proportional to
    ``n_g ** alpha`` (alpha=1 keeps the natural mixture, alpha=0
    flattens every group to the smallest group's size).

    Rates are derived WITHOUT any cross-group float summation:
    ``rate_g = (n_g / n_min) ** (alpha - 1)`` — the smallest group is
    kept at 100% and larger groups are downsampled toward it, which is
    algebraically the same mixture (kept_g ∝ n_g^alpha) but every
    input to the float math is an exact integer ratio, so Spark and
    the oracle compute bit-identical thresholds (rounding to integer
    BUCKETS adds ulp tolerance on top).  Membership is the same
    portable md5-bucket pure function as :class:`MixtureSample`, so
    the exact kept set replays anywhere.

    Plan: one tiny count agg (rows = #groups), an unpartitioned window
    min over that TINY frame for n_min (never over the input), a
    rates join the runtime broadcasts (AQE — no forced hint per the
    repo doctrine), then the narrow bucket-threshold filter.  Two
    passes over the input, both riding the scan."""

    def __init__(
        self,
        input: str,
        output: str | None = None,
        *,
        key_col: str,
        group_col: str,
        alpha: float = 0.5,
        salt: str = "tmix",
        label: str | None = None,
    ):
        if not 0.0 <= alpha <= 1.0:
            raise ValueError(f"alpha must be in [0, 1], got {alpha}")
        self.input = input
        self.output = output or input
        self.key_col = key_col
        self.group_col = group_col
        self.alpha = float(alpha)
        self.salt = salt
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        from ..component import require_batch

        df = flow[self.input]
        require_batch(
            df, "TemperatureMix", "group sizes come from a counting pass"
        )
        counts = df.groupBy(self.group_col).agg(F.count(F.lit(1)).alias("__n"))
        rates = (
            counts.withColumn(
                "__nmin", F.min("__n").over(Window.partitionBy())
            )
            .withColumn(
                "__thresh",
                F.round(
                    F.pow(
                        F.col("__n").cast("double")
                        / F.col("__nmin").cast("double"),
                        F.lit(self.alpha - 1.0),
                    )
                    * BUCKETS
                ).cast("int"),
            )
            .select(self.group_col, "__thresh")
        )
        # NULL-safe join: groupBy above already counts NULL as its own
        # group, so a plain equi-join would silently DROP NULL-group
        # rows (alpha=1 would not be the identity for them, unlike
        # MixtureSample's CASE-threshold).  eqNullSafe routes them to
        # their own group's rate instead.
        r = rates.withColumnRenamed(self.group_col, "__g")
        out = (
            df.join(r, F.col(self.group_col).eqNullSafe(F.col("__g")))
            .filter(bucket_of(self.key_col, self.salt) < F.col("__thresh"))
            .select(*df.columns)
        )
        return flow.without(self.input).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)
