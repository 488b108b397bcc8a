"""Golden workload: windows (reference ``test/examples/window_test.exs``).

The reference's count window test: numbers 1..20, window size 5, avg ->
exact [3.0, 8.0, 13.0, 18.0].  Sliding and time windows likewise with
exact expected values.
"""

from pyspark.sql import functions as F

from strom_spark import CountWindow, Flow, Pipeline, SlidingCountWindow, Source, TimeWindow


def test_count_window_avgs(spark):
    """Reference expected avgs [3.0, 8.0, 13.0, 18.0]
    (test/examples/window_test.exs:30)."""
    flow = Pipeline(
        [
            Source("numbers", list(range(1, 21)), spark=spark),
            CountWindow(
                "numbers",
                "win",
                size=5,
                order_by=["value"],
                aggs={"avg_value": F.avg("value")},
            ),
        ]
    )()
    rows = sorted(flow["win"].collect(), key=lambda r: r.window_id)
    assert [r.avg_value for r in rows] == [3.0, 8.0, 13.0, 18.0]


def test_count_window_partial_and_partitioned(spark):
    flow = Source("n", list(range(1, 8)), spark=spark)()
    out = CountWindow("n", size=5, order_by=["value"], aggs={"n": F.count("*")})(flow)
    rows = {r.window_id: r.n for r in out["n"].collect()}
    assert rows == {0: 5, 1: 2}
    out2 = CountWindow("n", size=5, order_by=["value"], aggs={"n": F.count("*")}, drop_partial=True)(flow)
    assert {r.window_id: r.n for r in out2["n"].collect()} == {0: 5}


def test_sliding_count_window(spark):
    """Reference sliding test: 1..9, size 3, retain 1 (step 2) ->
    windows [1-3],[3-5],[5-7],[7-9] avgs [2.0,4.0,6.0,8.0]
    (test/examples/window_test.exs:36-64)."""
    flow = Source("n", list(range(1, 10)), spark=spark)()
    out = SlidingCountWindow(
        "n", "win", size=3, step=2, order_by=["value"], aggs={"avg_value": F.avg("value")}
    )(flow)
    rows = sorted(out["win"].collect(), key=lambda r: r.window_id)
    assert [r.avg_value for r in rows] == [2.0, 4.0, 6.0, 8.0]


def test_sliding_overlap_full(spark):
    # size 3 step 1 over 1..5 -> [1,2,3],[2,3,4],[3,4,5]
    flow = Source("n", [1, 2, 3, 4, 5], spark=spark)()
    out = SlidingCountWindow(
        "n", "w", size=3, step=1, order_by=["value"], aggs={"s": F.sum("value")}
    )(flow)
    assert [r.s for r in sorted(out["w"].collect(), key=lambda r: r.window_id)] == [6, 9, 12]


def test_complete_window_filter_rides_the_aggregation(spark):
    """r14: with ``aggs`` given, the complete-windows-only filter must
    ride the SAME hash aggregate (count == size post-filter), not a
    second sort+window pass over the exploded frame — exactly one
    Window node (the rank) in the plan, and values unchanged."""
    flow = Source("n", list(range(1, 10)), spark=spark)()
    out = SlidingCountWindow(
        "n", "w", size=3, step=2, order_by=["value"], aggs={"s": F.sum("value")}
    )(flow)["w"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") <= 1, plan
    assert [r.s for r in sorted(out.collect(), key=lambda r: r.window_id)] == [6, 12, 18, 24]
    # keep_partial still emits the trailing partial window
    partial = SlidingCountWindow(
        "n", "w", size=3, step=2, order_by=["value"],
        aggs={"s": F.sum("value")}, keep_partial=True,
    )(flow)["w"]
    assert [r.s for r in sorted(partial.collect(), key=lambda r: r.window_id)] == [6, 12, 18, 24, 9]
    out2 = CountWindow(
        "n", size=5, order_by=["value"], aggs={"n": F.count("*")}, drop_partial=True
    )(flow)["n"]
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Window") <= 1, plan2
    assert {r.window_id: r.n for r in out2.collect()} == {0: 5}


def test_time_window(spark, sf_dir):
    from strom_spark import load_table

    events = load_table(spark, sf_dir, "events")
    flow = Flow({"events": events})
    out = TimeWindow(
        "events",
        "agg",
        ts="ts",
        size="1 hour",
        partition_by=["event_type"],
        aggs={"n": F.count("*"), "sum_value": F.round(F.sum("value"), 4)},
    )(flow)
    df = out["agg"]
    assert set(df.columns) == {"event_type", "n", "sum_value", "window_start", "window_end"}
    total = df.agg(F.sum("n")).collect()[0][0]
    assert total == events.count()


def test_session_window_batch_semantics(spark):
    """SessionWindow (native F.session_window) on batch: gap-based
    grouping, exact-boundary event starts a NEW session (window end is
    exclusive), session_end = last event + gap."""
    import pandas as pd

    from strom_spark import Flow, SessionWindow

    T = pd.Timestamp
    # user 1: two events 10 min apart (one session), then a 31-min gap
    # (new session); user 2: event EXACTLY gap (30 min) after the
    # previous -> MERGED (Spark closes a session only when the gap is
    # strictly exceeded), session extends to 01:00
    pdf = pd.DataFrame({
        "u": [1, 1, 1, 2, 2],
        "ts": [T("2024-01-01 00:00:00"), T("2024-01-01 00:10:00"),
               T("2024-01-01 00:41:00"), T("2024-01-01 00:00:00"),
               T("2024-01-01 00:30:00")],
    })
    out = SessionWindow(
        "e", "s", ts="ts", gap="30 minutes", partition_by=["u"],
        aggs={"n": F.count("*")},
    )(Flow({"e": spark.createDataFrame(pdf)}))["s"]
    got = sorted(
        (r.u, str(r.session_start), str(r.session_end), r.n) for r in out.collect()
    )
    assert got == [
        (1, "2024-01-01 00:00:00", "2024-01-01 00:40:00", 2),
        (1, "2024-01-01 00:41:00", "2024-01-01 01:11:00", 1),
        (2, "2024-01-01 00:00:00", "2024-01-01 01:00:00", 2),
    ]
