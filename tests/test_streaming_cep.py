"""Streaming CEP (the reference parcels problem) with event-time
timers, and state recovery across a checkpoint restart — the two
Spark-native guarantees that replace the reference's tick stream and
supervision tree (SURVEY §3.4, §7.2.5)."""

import shutil
import tempfile

import pandas as pd
import pytest

from strom_spark import Flow
from strom_spark.streaming.cep import StreamingMatchDecide, ALL_SHIPPED, THRESHOLD
from strom_spark.streaming.control import run_available
from strom_spark.streaming.stateful import StreamingStatefulTransformer, count_window_kernel

T0 = pd.Timestamp("2024-01-01 00:00:00")
MIN = pd.Timedelta(minutes=1)


def _write(path, rows):
    pd.DataFrame(
        rows, columns=["order_id", "type", "expected", "ts"]
    ).astype({"order_id": "int64", "expected": "int64", "ts": "datetime64[us]"}).to_parquet(path)


def test_streaming_parcels_decide_with_event_time_timeout(spark):
    d = tempfile.mkdtemp(prefix="strom_cep_")
    try:
        # batch 1: orders 1,2,3,5 + on-time parcels; order 4's parcel
        # arrives BEFORE its order (out-of-order across batches)
        _write(
            f"{d}/f1.parquet",
            [
                (1, "ORDER_CREATED", 2, T0),
                (2, "ORDER_CREATED", 1, T0),
                (3, "ORDER_CREATED", 2, T0),
                (5, "ORDER_CREATED", 1, T0),
                (1, "PARCEL_SHIPPED", 0, T0 + 10 * MIN),
                (1, "PARCEL_SHIPPED", 0, T0 + 20 * MIN),
                (3, "PARCEL_SHIPPED", 0, T0 + 10 * MIN),
                (4, "PARCEL_SHIPPED", 0, T0 + 30 * MIN),
                (5, "PARCEL_SHIPPED", 0, T0 + 15 * MIN),
            ],
        )
        # batch 2: order 4 arrives (completes), order 2's parcel is late
        _write(
            f"{d}/f2.parquet",
            [
                (4, "ORDER_CREATED", 1, T0),
                (2, "PARCEL_SHIPPED", 0, T0 + 120 * MIN),
            ],
        )
        # batch 3: a far-future tick advances the watermark so order 3
        # (missing a parcel forever) times out via its event-time timer
        _write(f"{d}/f3.parquet", [(-1, "TICK", 0, T0 + pd.Timedelta(days=10))])

        schema = "order_id bigint, type string, expected bigint, ts timestamp"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
            .withWatermark("ts", "1 second")
        )
        flow = StreamingMatchDecide(
            "events", "decisions", key="order_id", timeout_s=3600
        )(Flow({"events": stream}))
        run_available(flow["decisions"], query_name="t_cep", output_mode="append")
        got = {
            r.order_id: r.decision for r in spark.sql("SELECT * FROM t_cep").collect()
        }
        assert got == {
            1: ALL_SHIPPED,
            2: THRESHOLD,  # parcel arrived past the 1h deadline
            3: THRESHOLD,  # parcel never arrived: event-time timer fired
            4: ALL_SHIPPED,  # parcel before order: state accumulated
            5: ALL_SHIPPED,
        }
        # the reference's invariant (parcels_test.exs:304)
        assert len(got) == 5
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_rocksdb_state_store_differential(spark):
    """use_state_store('rocksdb') (r11): the keyed CEP state machine
    under the RocksDB provider must produce the exact decision set the
    default (HDFS-backed in-memory) provider does — the toggle is a
    backend swap, never a semantics change.  RocksDB is the
    recommended default for large keyed state (measured -13% at sf1.0,
    SCALE.md)."""
    from strom_spark import use_state_store
    from strom_spark.session import ROCKSDB_PROVIDER

    d = tempfile.mkdtemp(prefix="strom_cep_rocks_")
    try:
        _write(
            f"{d}/f1.parquet",
            [
                (1, "ORDER_CREATED", 2, T0),
                (2, "ORDER_CREATED", 1, T0),
                (1, "PARCEL_SHIPPED", 0, T0 + 10 * MIN),
                (1, "PARCEL_SHIPPED", 0, T0 + 20 * MIN),
                (2, "PARCEL_SHIPPED", 0, T0 + 120 * MIN),
            ],
        )
        _write(f"{d}/f2.parquet", [(-1, "TICK", 0, T0 + pd.Timedelta(days=10))])
        schema = "order_id bigint, type string, expected bigint, ts timestamp"

        def run(name):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(d)
                .withWatermark("ts", "1 second")
            )
            flow = StreamingMatchDecide(
                "events", "decisions", key="order_id", timeout_s=3600
            )(Flow({"events": stream}))
            run_available(flow["decisions"], query_name=name, output_mode="append")
            return {
                r.order_id: r.decision
                for r in spark.sql(f"SELECT * FROM {name}").collect()
            }

        base = run("t_cep_mem")
        use_state_store(spark, "rocksdb")
        try:
            assert (
                spark.conf.get("spark.sql.streaming.stateStore.providerClass")
                == ROCKSDB_PROVIDER
            )
            rocks = run("t_cep_rocks")
        finally:
            use_state_store(spark, "memory")
        assert rocks == base == {1: ALL_SHIPPED, 2: THRESHOLD}
        with pytest.raises(ValueError, match="rocksdb"):
            use_state_store(spark, "bogus")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_stream_join_with_watermark(spark):
    """The reference's order-parcel re-ordering (parcels_test.exs:
    106-142, an explicit force_order stage) is native in Spark: a
    watermarked stream-stream equi-join pairs parcels with their order
    regardless of arrival order."""
    from pyspark.sql import functions as F

    from strom_spark import Flow, Join

    d = tempfile.mkdtemp(prefix="strom_ssj_")
    try:
        import os

        os.makedirs(f"{d}/orders"), os.makedirs(f"{d}/parcels")
        _write(
            f"{d}/orders/f.parquet",
            [(i, "ORDER_CREATED", 1 + i % 3, T0) for i in range(1, 21)],
        )
        _write(
            f"{d}/parcels/f.parquet",
            [(i, "PARCEL_SHIPPED", 0, T0 + (i % 7) * MIN) for i in range(1, 21) for _ in range(1 + i % 3)],
        )
        schema = "order_id bigint, type string, expected bigint, ts timestamp"

        def rs(name):
            return (
                spark.readStream.schema(schema)
                .parquet(f"{d}/{name}")
                .withWatermark("ts", "1 hour")
            )

        orders = rs("orders").select(
            F.col("order_id").alias("o_id"), F.col("expected"), F.col("ts").alias("o_ts")
        )
        parcels = rs("parcels").select("order_id", F.col("ts").alias("p_ts"))
        flow = Join(
            "parcels",
            "orders",
            "matched",
            on=[
                F.col("order_id") == F.col("o_id"),
                F.col("p_ts") >= F.col("o_ts"),
                F.col("p_ts") <= F.col("o_ts") + F.expr("INTERVAL 1 DAY"),
            ],
        )(Flow({"orders": orders, "parcels": parcels}))
        assert flow["matched"].isStreaming
        run_available(flow["matched"], query_name="t_ssj")
        n = spark.sql("SELECT count(*) AS n FROM t_ssj").collect()[0].n
        expected_parcels = sum(1 + i % 3 for i in range(1, 21))
        assert n == expected_parcels
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_feedback_loop(spark):
    """The reference Loop example (loop_test.exs:41-57: numbers cycle
    through +1 until >= 10) as a streaming feedback edge."""
    from pyspark.sql import functions as F

    from strom_spark.streaming.control import feedback_loop

    d = tempfile.mkdtemp(prefix="strom_loop_")
    try:
        seed = spark.createDataFrame([(i,) for i in range(1, 6)], "value long")
        out = feedback_loop(
            spark,
            seed,
            body=lambda df: df.withColumn("value", F.col("value") + 1),
            exit_when=F.col("value") >= 10,
            workdir=d,
        )
        assert [r.value for r in out.collect()] == [10] * 5
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_live_pipeline_edit_via_checkpoint_restart(spark):
    """The reference's live insert-while-running
    (lib/composite/manipulations.ex, insert_components_test.exs:10-47)
    maps to: stop query -> Pipeline.insert(new component) -> restart
    from the same checkpoint.  Keyed state survives the topology edit;
    only post-edit data sees the new component."""
    import os

    from pyspark.sql import functions as F

    from strom_spark import Filter, Pipeline

    d = tempfile.mkdtemp(prefix="strom_edit_")
    try:
        src, out, ckpt = f"{d}/src", f"{d}/out", f"{d}/ckpt"
        os.makedirs(src)
        pd.DataFrame({"k": ["a"] * 7, "value": range(1, 8)}).to_parquet(f"{src}/p1.parquet")

        stateful = StreamingStatefulTransformer(
            "s",
            count_window_kernel(5),
            schema="window_index bigint, n bigint, sum_value double, avg_value double",
            key_by=["k"],
            order_by=["value"],
        )
        pipeline = Pipeline([stateful])

        def run(p):
            stream = spark.readStream.schema("k string, value bigint").parquet(src)
            flow = p(Flow({"s": stream}))
            q = (
                flow["s"]
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run(pipeline)  # window 0 emitted; 6,7 buffered in state
        # LIVE EDIT: drop odd values before the stateful stage
        edited = pipeline.insert(0, Filter("s", F.col("value") % 2 == 0))
        pd.DataFrame({"k": ["a"] * 6, "value": range(8, 14)}).to_parquet(f"{src}/p2.parquet")
        run(edited)  # only evens 8,10,12 reach the kernel: 6,7,8,10,12

        rows = sorted(spark.read.parquet(out).collect(), key=lambda r: r.window_index)
        assert [(r.window_index, r.n, r.sum_value) for r in rows] == [
            (0, 5, 15.0),  # pre-edit: 1+2+3+4+5
            (1, 5, 43.0),  # spans the edit: 6+7 (old state) + 8+10+12
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_checkpoint_restart_carries_state(spark):
    """Stop a stateful query mid-stream, restart from the checkpoint:
    keyed state (a half-full count window) survives — Spark's upgrade
    over the reference's crash semantics, which drop the in-flight
    chunk (crash_test.exs:34-58, SURVEY §7.4.2)."""
    d = tempfile.mkdtemp(prefix="strom_ckpt_")
    try:
        src, out, ckpt = f"{d}/src", f"{d}/out", f"{d}/ckpt"
        import os

        os.makedirs(src)
        pd.DataFrame({"k": ["a"] * 7, "value": range(1, 8)}).to_parquet(f"{src}/p1.parquet")

        def run_once():
            stream = spark.readStream.schema("k string, value bigint").parquet(src)
            flow = StreamingStatefulTransformer(
                "s",
                count_window_kernel(5),
                schema="window_index bigint, n bigint, sum_value double, avg_value double",
                key_by=["k"],
                order_by=["value"],
            )(Flow({"s": stream}))
            q = (
                flow["s"]
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()  # window 0 = values 1..5; 6,7 buffered in state
        pd.DataFrame({"k": ["a"] * 5, "value": range(8, 13)}).to_parquet(f"{src}/p2.parquet")
        run_once()  # restart: state must still hold 6,7 -> window 1 = 6..10

        rows = sorted(spark.read.parquet(out).collect(), key=lambda r: r.window_index)
        assert [(r.window_index, r.n, r.avg_value) for r in rows] == [
            (0, 5, 3.0),
            (1, 5, 8.0),
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_decided_order_is_tombstoned_not_reopened(spark):
    """A late/duplicate event for an already-decided order must not
    re-open it or emit a second (contradictory) decision: the decision
    leaves a tombstone in state, GC'd by its own event-time timer.
    (Without the tombstone, a duplicate ORDER + late parcel would emit
    a second ALL_PARCELS_SHIPPED, and the re-created state would leak
    forever.)"""
    d = tempfile.mkdtemp(prefix="strom_cep_tomb_")
    try:
        # batch 1: order 1 completes -> ALL_SHIPPED decided
        _write(
            f"{d}/f1.parquet",
            [
                (1, "ORDER_CREATED", 1, T0),
                (1, "PARCEL_SHIPPED", 0, T0 + 10 * MIN),
            ],
        )
        # batch 2: duplicate ORDER + another parcel for the decided
        # order — would re-complete (or exceed the threshold) if state
        # had been dropped instead of tombstoned
        _write(
            f"{d}/f2.parquet",
            [
                (1, "ORDER_CREATED", 1, T0),
                (1, "PARCEL_SHIPPED", 0, T0 + 20 * MIN),
            ],
        )
        # batch 3: far-future tick fires every pending timer — a leaked
        # undecided state would now emit a spurious THRESHOLD
        _write(f"{d}/f3.parquet", [(-1, "TICK", 0, T0 + pd.Timedelta(days=10))])

        schema = "order_id bigint, type string, expected bigint, ts timestamp"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
            .withWatermark("ts", "1 second")
        )
        flow = StreamingMatchDecide(
            "events", "decisions", key="order_id", timeout_s=3600
        )(Flow({"events": stream}))
        run_available(flow["decisions"], query_name="t_cep_tomb", output_mode="append")
        rows = spark.sql("SELECT * FROM t_cep_tomb").collect()
        assert [(r.order_id, r.decision) for r in rows] == [(1, ALL_SHIPPED)]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_late_parcel_in_earlier_batch_than_order(spark):
    """The r10 advice scenario: a LATE parcel (ts past what will become
    the deadline) lands in an earlier micro-batch than its
    ORDER_CREATED event.  A raw arrived-counter would credit it when
    the order event sets `expected` and wrongly decide ALL_SHIPPED;
    the kernel must buffer pre-order parcel timestamps and re-classify
    them against the deadline once the order sets it, so the decision
    matches the batch (global event-time order) rule under ANY
    maxFilesPerTrigger split."""
    d = tempfile.mkdtemp(prefix="strom_cep_late_")
    try:
        # batch 1: parcels only — order 10's second parcel is 2h after
        # the order time (deadline will be 1h), order 11's is on time
        _write(
            f"{d}/f1.parquet",
            [
                (10, "PARCEL_SHIPPED", 0, T0 + 10 * MIN),
                (10, "PARCEL_SHIPPED", 0, T0 + 120 * MIN),
                (11, "PARCEL_SHIPPED", 0, T0 + 5 * MIN),
            ],
        )
        # batch 2: the orders arrive AFTER their parcels
        _write(
            f"{d}/f2.parquet",
            [
                (10, "ORDER_CREATED", 2, T0),
                (11, "ORDER_CREATED", 1, T0),
            ],
        )
        # batch 3: far-future tick fires order 10's deadline timer
        _write(f"{d}/f3.parquet", [(-1, "TICK", 0, T0 + pd.Timedelta(days=10))])

        schema = "order_id bigint, type string, expected bigint, ts timestamp"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
            .withWatermark("ts", "1 second")
        )
        flow = StreamingMatchDecide(
            "events", "decisions", key="order_id", timeout_s=3600
        )(Flow({"events": stream}))
        run_available(flow["decisions"], query_name="t_cep_late", output_mode="append")
        got = {
            r.order_id: r.decision
            for r in spark.sql("SELECT * FROM t_cep_late").collect()
        }
        assert got == {
            10: THRESHOLD,  # only 1 of 2 parcels on time — late one must NOT count
            11: ALL_SHIPPED,  # pre-order parcel re-classified as on time
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_relational_flow_path_requires_watermark_delay(spark):
    """The Flow-path transform() must refuse to run without an
    explicit watermark_delay (a silent 1s default would drop any
    real-world late event — r10 advice), and must honor the
    constructor value when given."""
    import pytest
    from strom_spark.streaming.cep import StreamingMatchDecideRelational
    from strom_spark import Flow

    schema = "order_id bigint, type string, expected bigint, ts timestamp"
    stream = spark.readStream.format("rate").load().selectExpr(
        "value AS order_id", "'ORDER_CREATED' AS type",
        "1L AS expected", "timestamp AS ts",
    )
    op = StreamingMatchDecideRelational(
        "events", "decisions", key="order_id",
        timeout_s=3600, span_lb_s=86400,
    )
    with pytest.raises(ValueError, match="watermark_delay"):
        op.transform(Flow({"events": stream}))
    op2 = StreamingMatchDecideRelational(
        "events", "decisions", key="order_id",
        timeout_s=3600, span_lb_s=86400, watermark_delay="10 minutes",
    )
    flow = op2.transform(Flow({"events": stream}))
    assert flow["decisions"].isStreaming


def test_relational_lowering_matches_keyed_state_machine(spark):
    """StreamingMatchDecideRelational (pure-JVM join+window lowering,
    r10) must produce the SAME final decision set as the per-key state
    machine on the canonical fixture — including the late parcel, the
    missing parcel, and the parcel-before-order cases — under a
    multi-batch (maxFilesPerTrigger=1) split.  The tick rides both
    join branches and sits past watermark_delay + span_lb (a
    stream-stream join delays its output watermark by its state
    retention); the tick-key filter happens post-sink because a
    pre-sink filter is pushed below the watermark operator and the
    tick never advances it."""
    from strom_spark.streaming.cep import StreamingMatchDecideRelational

    d = tempfile.mkdtemp(prefix="strom_cep_rel_")
    try:
        _write(
            f"{d}/f1.parquet",
            [
                (1, "ORDER_CREATED", 2, T0),
                (2, "ORDER_CREATED", 1, T0),
                (3, "ORDER_CREATED", 2, T0),
                (1, "PARCEL_SHIPPED", 0, T0 + 10 * MIN),
                (3, "PARCEL_SHIPPED", 0, T0 + 10 * MIN),
                (4, "PARCEL_SHIPPED", 0, T0 + 30 * MIN),  # before its order
            ],
        )
        _write(
            f"{d}/f2.parquet",
            [
                (4, "ORDER_CREATED", 1, T0),
                (1, "PARCEL_SHIPPED", 0, T0 + 20 * MIN),
                (2, "PARCEL_SHIPPED", 0, T0 + 120 * MIN),  # late (1h deadline)
            ],
        )
        _write(f"{d}/f3.parquet", [(-1, "TICK", 1, T0 + pd.Timedelta(days=40))])

        schema = "order_id bigint, type string, expected bigint, ts timestamp"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        op = StreamingMatchDecideRelational(
            "events", "decisions", key="order_id",
            timeout_s=3600, span_lb_s=86400,
        )
        decisions = op.transform_df(stream, "1 second")
        run_available(decisions, query_name="t_cep_rel", output_mode="append")
        got = {
            r.order_id: r.decision
            for r in spark.sql(
                "SELECT * FROM t_cep_rel WHERE order_id >= 0"
            ).collect()
        }
        assert got == {
            1: ALL_SHIPPED,   # both parcels on time (across batches)
            2: THRESHOLD,     # parcel past the deadline never counts
            3: THRESHOLD,     # one of two parcels missing
            4: ALL_SHIPPED,   # parcel before its order still matches
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
