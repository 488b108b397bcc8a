"""Testdata table loading.

The driver's synthetic tables are TPC-H-ish parquet; ``events.ts`` has
shipped in two encodings across testdata refreshes:

* parquet TIMESTAMP(NANOS), which Spark's vectorized reader rejects
  ([PARQUET_TYPE_ILLEGAL]) — with
  ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as bigint
  nanoseconds and ``load_table`` rebuilds the timestamp;
* parquet ``timestamp[us]`` without a timezone, which Spark 4 reads as
  TIMESTAMP_NTZ.  Most event-time machinery (``unix_micros``,
  ``withWatermark``, window functions over event time) requires the
  zoned TIMESTAMP type, so ``load_table`` casts NTZ → TIMESTAMP.  The
  session timezone is pinned to UTC first, so the cast reinterprets the
  naive value as the same UTC instant DuckDB sees — values are
  bit-identical to the oracle's.

Normalizing at the single ingest chokepoint keeps every downstream
operator free of per-encoding branches.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the driver may call queries() with its own session: pin UTC so
    # date->timestamp conversions match the oracle regardless of host tz
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        kind = field.dataType.simpleString()
        if field.name == "ts" and kind == "bigint":
            # nanos-as-long era: integer division — double division
            # loses ulps on large ns values
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif kind == "timestamp_ntz":
            # naive micros era: same UTC instant (session tz pinned above)
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def _scan_row_groups(df: DataFrame, threshold: int) -> int | None:
    """Total parquet row groups behind ``df``'s scan, or ``None`` when
    that can't be determined cheaply (non-file source, remote scheme,
    unreadable footer).

    Spark splits a parquet file into byte ranges, but a range only
    produces rows if a row-group START falls inside it — so the number
    of non-empty scan tasks is capped by the row-group count, not the
    split count.  A big single-row-group file therefore arrives as N
    splits with N-1 of them empty.  Footer reads are driver-side and
    ~ms each; we stop as soon as ``threshold`` row groups are proven
    (each file has ≥1, so ≥threshold files short-circuits for free —
    the 100 TB case, where scans have thousands of files)."""
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        # SHUFFLE exchanges only: a BroadcastExchange (small dim side of
        # a BHJ) does not redistribute the probe side, so a single-row-
        # group scan broadcast-joined to a tiny table still rides one
        # task — the exact hazard this probe exists to catch (r14
        # advice).  The negative lookbehind excludes "BroadcastExchange"
        # while matching "Exchange hashpartitioning", "Exchange
        # RoundRobinPartitioning", "Exchange rangepartitioning",
        # "Exchange SinglePartition"; the AQE node names cover plans
        # re-planned at runtime.
        if re.search(r"(?<!Broadcast)Exchange|ShuffleQueryStage|AQEShuffleRead", plan):
            return None  # already shuffle-redistributed; scan layout irrelevant
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    if len(files) >= threshold:
        return len(files)
    from urllib.parse import unquote, urlparse

    import pyarrow.parquet as pq

    total = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("file", ""):
            return None  # remote fs: footer read needs a configured fs
        try:
            total += pq.ParquetFile(unquote(parsed.path)).metadata.num_row_groups
        except Exception:
            return None
        if total >= threshold:
            return total
    return total


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's parallelism when the input can't
    feed enough tasks for heavy per-row compute.  Two hazards, both
    checked (r13 — the second was the round-12 decade wall):

    * too few SPLITS — a small parquet file arrives as ONE split,
      serializing regex/hash/UDF work on one core;
    * too few ROW GROUPS — a big single-row-group file (this repo's
      documents.parquet at every SF) splits into many byte ranges of
      which exactly one is non-empty, so the split count looks healthy
      while all rows ride one task (measured at sf10: 31 splits, 1
      non-empty with all 500k rows; line_dedup_docs 48× for 10× data).

    No-op when the scan genuinely has enough parallelism — at 100 TB
    scans have thousands of files/row groups and the row-group probe
    short-circuits on the file count alone, adding no footer reads and
    no shuffle."""
    if df.isStreaming:
        return df  # partitioning is per-microbatch; no RDD to inspect
    target = df.sparkSession.sparkContext.defaultParallelism

    def _hash_safe(dt) -> bool:
        # Catalyst's HashExpression rejects MapType (and any type
        # containing one) — hashing such a column raises
        # AnalysisException, so it must never reach the partitioning key
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return _hash_safe(dt.elementType)
        if isinstance(dt, StructType):
            return all(_hash_safe(f.dataType) for f in dt.fields)
        return True

    def _rebalance(frame: DataFrame) -> DataFrame:
        # hash-partition, NOT round-robin: repartition(n) uses
        # RoundRobinPartitioning which pays a full local SORT of every
        # row for retry-determinism (spark.sql.execution.
        # sortBeforeRepartition) — measured +35% on the sf1.0 minhash
        # wall when text columns ride the sort.  Key choice (r14
        # advice): prefer an id-like column subset — high-cardinality
        # by construction, so fully-duplicate PAYLOAD rows don't
        # collapse into one partition — falling back to every
        # hash-safe column, and to plain round-robin when nothing is
        # hashable (e.g. a frame of MapType columns).
        hashable = [
            f.name for f in frame.schema.fields if _hash_safe(f.dataType)
        ]
        if not hashable:
            return frame.repartition(target)
        id_like = [
            c for c in hashable if re.search(r"(^|_)(id|key)s?($|_)", c, re.I)
        ]
        cols = id_like or hashable
        return frame.repartition(target, *[F.col(c) for c in cols])

    floor = max(2, target // 2)
    if df.rdd.getNumPartitions() < floor:
        return _rebalance(df)
    row_groups = _scan_row_groups(df, floor)
    if row_groups is not None and row_groups < floor:
        return _rebalance(df)
    return df


def load_flow(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES):
    from .flow import Flow

    return Flow({name: load_table(spark, sf_dir, name) for name in names})
