"""Data-layout techniques for the 100 TB tier: bucketed co-located
joins (the shuffle is paid ONCE at write time, every subsequent join of
the two fact tables is exchange-free) and partitioned writes with
partition-pruned reads.  Both are plan-ASSERTED, not just run — the
point is the shape, and the shape must not regress.
"""

import contextlib
import io
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from conftest import load


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    """Write orders and lineitem bucketed (and sorted) by the join key
    into warehouse tables; their join must plan as a SortMergeJoin with
    NO shuffle exchange on either side — the layout the nightly 100 TB
    fact-fact join should run on, where the write-time bucketing
    amortizes the shuffle across every downstream join.  Also asserts
    bucket PRUNING: an equality filter on the bucket key scans 1 of the
    8 buckets."""
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_lineitem = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        load(spark, sf_dir, "orders").write.bucketBy(
            8, "o_orderkey"
        ).sortBy("o_orderkey").format("parquet").saveAsTable(t_orders)
        load(spark, sf_dir, "lineitem").write.bucketBy(
            8, "l_orderkey"
        ).sortBy("l_orderkey").format("parquet").saveAsTable(t_lineitem)

        o = spark.table(t_orders)
        l = spark.table(t_lineitem)
        joined = o.join(l, o.o_orderkey == l.l_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = _plan(joined)
        # the join itself must be exchange-free: the ONLY exchange in
        # the whole plan is the one feeding the final groupBy
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, join_section
        # and the answer must match the plain parquet join
        po = load(spark, sf_dir, "orders")
        pl = load(spark, sf_dir, "lineitem")
        expect = {
            (r.o_orderpriority, r.n)
            for r in po.join(pl, po.o_orderkey == pl.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        got = {(r.o_orderpriority, r.n) for r in joined.collect()}
        assert got == expect and got

        # bucket pruning: equality on the bucket key reads one bucket.
        # autoBucketedScan disables bucketed reads for join-less scans
        # (a plain filter doesn't need the clustering), so pin it on to
        # observe the pruning the layout enables
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        try:
            some_key = po.select("o_orderkey").head()[0]
            pruned = _plan(o.filter(F.col("o_orderkey") == some_key))
            assert "SelectedBucketsCount: 1 out of 8" in pruned, pruned
        finally:
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        for t in (t_orders, t_lineitem):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style partitioned parquet write (the events-by-type layout
    a 100 TB event store uses, typically by date) and the matching
    read-side guarantee: a filter on the partition column appears under
    PartitionFilters in the scan — the non-matching directories are
    never opened, so the scan cost is proportional to the SELECTED
    partitions, not the table."""
    out = str(tmp_path / "events_by_type")
    ev = load(spark, sf_dir, "events")
    ev.write.partitionBy("event_type").parquet(out)

    back = spark.read.parquet(out)
    q = back.filter(F.col("event_type") == "click").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = _plan(q)
    assert "PartitionFilters" in plan
    # the pushed partition predicate must actually appear there (not
    # as a post-scan Filter over all partitions)
    pf_line = next(
        line for line in plan.splitlines() if "PartitionFilters" in line
    )
    assert "event_type" in pf_line, pf_line
    assert q.head()[0] == ev.filter("event_type = 'click'").count()
    shutil.rmtree(out, ignore_errors=True)
