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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's parallelism when the input has
    too few partitions for heavy per-row compute (a small parquet file
    arrives as ONE split, serializing regex/hash/UDF work on one core).
    No-op when the scan already has enough splits — at 100 TB scans
    have thousands of splits and this never adds a shuffle."""
    if df.isStreaming:
        return df  # partitioning is per-microbatch; no RDD to inspect
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def load_flow(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES):
    from .flow import Flow

    return Flow({name: load_table(spark, sf_dir, name) for name in names})
