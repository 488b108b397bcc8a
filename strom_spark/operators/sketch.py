"""Count-Min Sketch: bounded-state approximate frequency counting.

CMS (Cormode & Muthukrishnan 2005, "An improved data stream summary:
the count-min sketch and its applications") keeps a ``depth x width``
counter grid; each key increments one counter per row (seeded hash),
and a point estimate is the MIN over its ``depth`` counters — always
``>= true count`` (one-sided error), with overestimate bounded by
``2N/width`` at confidence ``1 - 2^-depth``.

Why this matters at 100 TB: the sketch is the canonical MERGEABLE
aggregate — ``sum`` by (seed, bucket) merges sketches built on
different partitions, days, or streams, so frequency monitoring over
an unbounded corpus carries ``depth*width`` counters of state instead
of a vocabulary-sized hash map (complementing the Misra-Gries
HeavyHitters in relational.py, which keeps top-k CANDIDATES; CMS
answers point queries for ANY key).  The build is one map-side-
combinable keyed shuffle; estimation broadcasts the tiny counter grid.

Hashes are the repo's PORTABLE recipe — the first 8 hex chars of
``md5(seed || ':' || key)`` as an integer — identical in Spark
(``conv(substr(md5(..),1,8),16,10)``) and DuckDB
(``('0x'||substring(md5(..),1,8))::UBIGINT``), so estimates are
bit-reproducible cross-engine and oracle-checkable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..component import Component
from ..flow import Flow


def _cms_bucket(seed_col, key_col, width: int):
    """Portable bucket hash: md5-prefix integer of 'seed:key' mod width."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", seed_col.cast("string"), key_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width)).cast("int")


class CountMinSketch(Component):
    """Build a CMS over ``key_col`` (optionally weighted): output is
    the counter grid (seed int, bucket int, cnt bigint) — at most
    ``depth * width`` rows, independent of input size.

    Plan: explode ``depth`` seed replicas (map-side), ONE keyed
    shuffle on (seed, bucket) with partial aggregation.  Two grids
    built with the same (depth, width) merge by unioning and summing
    ``cnt`` per (seed, bucket) — the property that makes the sketch a
    per-partition / per-day / per-stream rollup primitive.
    """

    def __init__(
        self,
        input: str,
        output: str,
        *,
        key_col: str,
        weight_col: str | None = None,
        depth: int = 4,
        width: int = 512,
        label: str | None = None,
    ):
        if depth < 1 or width < 1:
            raise ValueError("CountMinSketch: depth and width must be >= 1")
        self.input = input
        self.output = output
        self.key_col = key_col
        self.weight_col = weight_col
        self.depth = depth
        self.width = width
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        df = flow[self.input]
        w = (
            F.col(self.weight_col).cast("bigint")
            if self.weight_col
            else F.lit(1).cast("bigint")
        )
        grid = (
            df.select(F.col(self.key_col).alias("__k"), w.alias("__w"))
            .withColumn("seed", F.explode(F.array(*[F.lit(s) for s in range(self.depth)])))
            .select(
                F.col("seed"),
                _cms_bucket(F.col("seed"), F.col("__k"), self.width).alias("bucket"),
                F.col("__w"),
            )
            .groupBy("seed", "bucket")
            .agg(F.sum("__w").alias("cnt"))
        )
        return flow.without(self.input).with_stream(self.output, grid)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    *,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    out_col: str = "est_count",
) -> DataFrame:
    """Point-estimate counts for ``keys`` against a CMS grid built
    with the SAME (depth, width): per key, min over its ``depth``
    counters; buckets a key never touched read as 0.

    The grid is at most ``depth * width`` rows, so the join side is
    broadcast — estimation is a linear scan of the key set with no
    shuffle of the keys themselves (one keyed agg for the min).
    """
    probes = keys.select(F.col(key_col)).withColumn(
        "seed", F.explode(F.array(*[F.lit(s) for s in range(depth)]))
    )
    probes = probes.withColumn(
        "bucket", _cms_bucket(F.col("seed"), F.col(key_col), width)
    )
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0).cast("bigint")))
        .groupBy(key_col)
        .agg(F.min("cnt").alias(out_col))
    )


def _bloom_pos(seed_col, key_col, m: int, hash: str):
    """Seeded bit position in [0, m).  'md5' is the portable oracle-
    parity recipe (replicable in any SQL engine); 'xxhash64' is the
    PRODUCTION hash — JVM-native, measured ~10x faster per row than
    md5+conv on a fact-table prefilter scan — for flows whose oracle
    does not replicate the filter (e.g. semi-join pruning, where the
    real join downstream makes the result hash-independent)."""
    if hash == "xxhash64":
        # hash the key NATIVELY: casting a bigint key to string costs a
        # per-row allocation + decimal formatting before the hash even
        # runs (r14, measured ~6x on a 600k-row fact-side probe: 2.0 s
        # -> 0.3 s).  Bit positions change vs the old string recipe —
        # fine for the production path, whose contract is build/probe
        # consistency (both call THIS function), not cross-engine
        # replay; the portable md5 recipe below keeps the string form
        # an SQL oracle can replicate.
        h = F.xxhash64(seed_col.cast("string"), key_col)
    else:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", seed_col.cast("string"), key_col.cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
    return F.pmod(h, F.lit(m))


class BloomFilter(Component):
    """Build a Bloom filter over ``key_col`` — the canonical bounded-
    state MEMBERSHIP sketch (Bloom 1970): ``k`` seeded hashes set one
    bit each in an ``m``-bit array; a probe is a member candidate iff
    ALL of its k bits are set.  One-sided like CMS: NO false
    negatives ever, false-positive rate ≈ (1 - e^{-k·n/m})^k.

    At 100 TB this is THE semi-join pruning primitive: build the
    filter over the small side's join keys (one map-side-combinable
    keyed agg; the filter is ``n_words`` longs REGARDLESS of key
    count), broadcast those few KB, and pre-filter the fact table
    before the shuffle join — rows that cannot match never enter the
    exchange.  Two filters built with the same (n_words, k) merge by
    OR-ing their words per index, so per-partition / per-day /
    per-stream filters roll up like CMS grids.

    Word layout: 63 bits per word (bit indices 0..62) — ``1 << 63``
    overflows a signed BIGINT in ANSI engines (DuckDB raises), so the
    63-bit layout keeps every word value identical and portable in
    Spark and the SQL oracle.  Output: (word_idx int, word bigint),
    at most ``n_words`` rows (untouched words are absent = 0).

    Bit positions use the repo's portable md5-prefix hash —
    bit-reproducible cross-engine, so membership results (not just
    invariants) hash-match an oracle exactly.
    """

    def __init__(
        self,
        input: str,
        output: str,
        *,
        key_col: str,
        n_words: int = 512,
        k: int = 4,
        hash: str = "md5",
        label: str | None = None,
    ):
        if n_words < 1 or k < 1:
            raise ValueError("BloomFilter: n_words and k must be >= 1")
        if hash not in ("md5", "xxhash64"):
            raise ValueError("BloomFilter: hash must be 'md5' or 'xxhash64'")
        self.input = input
        self.output = output
        self.key_col = key_col
        self.n_words = n_words
        self.k = k
        self.hash = hash
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        df = flow[self.input]
        m = 63 * self.n_words
        probes = df.select(F.col(self.key_col)).withColumn(
            "__s", F.explode(F.array(*[F.lit(s) for s in range(self.k)]))
        )
        pos = _bloom_pos(F.col("__s"), F.col(self.key_col), m, self.hash)
        out = (
            probes.select(
                (pos / 63).cast("int").alias("word_idx"),
                pos.alias("__pos"),
            )
            .select(
                "word_idx",
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(pmod(__pos, 63) AS INT))"
                ).alias("__bitval"),
            )
            .groupBy("word_idx")
            .agg(F.bit_or("__bitval").alias("word"))
        )
        return flow.without(self.input).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)


def bloom_contains(
    sketch: DataFrame,
    keys: DataFrame,
    *,
    key_col: str,
    n_words: int = 512,
    k: int = 4,
    hash: str = "md5",
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Probe ``keys`` against a Bloom filter built with the SAME
    (n_words, k): per key, recompute its k bit positions, broadcast-
    join the (at most n_words-row) word table, and test every bit —
    ``out_col`` is 1 iff ALL k bits are set (candidate member; never
    0 for a true member).  Linear scan of the key set, no shuffle of
    the keys beyond one keyed agg."""
    m = 63 * n_words
    probes = keys.select(F.col(key_col)).withColumn(
        "__s", F.explode(F.array(*[F.lit(s) for s in range(k)]))
    )
    pos = _bloom_pos(F.col("__s"), F.col(key_col), m, hash)
    probes = probes.select(
        F.col(key_col),
        (pos / 63).cast("int").alias("word_idx"),
        pos.alias("__pos"),
    )
    joined = probes.join(F.broadcast(sketch), "word_idx", "left").withColumn(
        "__w", F.coalesce(F.col("word"), F.lit(0).cast("bigint"))
    )
    bit_set = (
        F.expr("shiftright(__w, CAST(pmod(__pos, 63) AS INT))") % 2 == 1
    ).cast("int")
    return (
        joined.select(F.col(key_col), bit_set.alias("__hit"))
        .groupBy(key_col)
        .agg(
            (F.min("__hit") == 1).cast("bigint").alias(out_col)
        )
    )


def bloom_member_expr(
    words: "dict[int, int]",
    key_col,
    *,
    n_words: int = 512,
    k: int = 4,
    hash: str = "md5",
):
    """PER-ROW membership test against a collected Bloom word table —
    the FACT-SIDE form of :func:`bloom_contains`: where the keyed form
    shuffles the probe set, this builds a pure Column expression (k
    md5 hashes + array lookups against an ``n_words``-long literal),
    evaluated MAP-SIDE inside whole-stage codegen with zero shuffle —
    the semi-join pruning shape for a 100 TB fact table: rows that
    cannot match are dropped before they ever enter an exchange.

    ``words`` is the collected sketch (word_idx -> word), a BOUNDED
    driver materialization of at most n_words longs (the same
    legitimacy class as IVF's probed-centroid-id collect).  False
    positives pass the filter and are eliminated by the real join
    downstream; false negatives cannot occur, so the filtered join is
    EXACTLY equal to the unfiltered join."""
    from pyspark.sql import functions as F

    # ONE parsed array literal (const_long_array), NOT F.lit(list) and
    # NOT F.array(*lits).  Executor side the three are equal after
    # constant folding, but DRIVER side F.lit(list) routes every
    # element through an individual py4j ``lit`` call — measured 2.9 s
    # to build the 4096-word Column (re-paid on every query
    # construction, i.e. every bench run), vs 6 ms for the parser on
    # the same values (r14).  Values are bit-identical: the SQL long
    # literals parse to the same array<bigint> Literal.
    from ..functions.vectors import const_long_array

    arr = const_long_array(int(words.get(i, 0)) for i in range(n_words))
    # shiftright() takes only a literal shift, so the per-row bit test
    # is an AND against a 63-entry powers-of-two literal array instead
    powers = const_long_array(1 << b for b in range(63))
    m = 63 * n_words
    cond = F.lit(True)
    for s in range(k):
        pos = _bloom_pos(F.lit(str(s)), key_col, m, hash)
        word = F.element_at(arr, (pos / 63).cast("int") + 1)
        bitval = F.element_at(powers, F.pmod(pos, F.lit(63)).cast("int") + 1)
        cond = cond & (word.bitwiseAND(bitval) != 0)
    return cond
