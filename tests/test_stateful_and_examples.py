"""Stateful transformer contract + golden workloads: words-count,
telegram re-batching, loop, parcels CEP."""

from pyspark.sql import functions as F

from strom_spark import (
    Agg,
    FlatMap,
    Flow,
    Iterate,
    MatchDecide,
    Pipeline,
    Source,
    StatefulTransformer,
)


def test_stateful_running_sum(spark):
    """Arity-2 contract: (event, acc) -> ([events], acc)."""

    def running(event, acc):
        acc += event["value"]
        return [{"value": event["value"], "total": acc}], acc

    flow = Source("n", [1, 2, 3, 4], spark=spark)()
    out = StatefulTransformer(
        "n", running, 0, schema="value bigint, total bigint", order_by=["value"]
    )(flow)
    rows = sorted(out["n"].collect(), key=lambda r: r.value)
    assert [(r.value, r.total) for r in rows] == [(1, 1), (2, 3), (3, 6), (4, 10)]


def test_stateful_keyed_with_flush(spark):
    """Per-key state (the scale path) + end-of-stream flush replacing
    the reference's :done sentinel."""

    def batcher(event, acc):
        acc.append(event["v"])
        if len(acc) == 2:
            return [{"k": event["k"], "batch_sum": sum(acc)}], []
        return [], acc

    rows = [{"k": "a", "v": 1}, {"k": "a", "v": 2}, {"k": "a", "v": 3}, {"k": "b", "v": 10}]
    flow = Source("s", rows, spark=spark)()
    out = StatefulTransformer(
        "s",
        batcher,
        acc=list,
        schema="k string, batch_sum bigint",
        key_by=["k"],
        order_by=["v"],
        flush=lambda acc: [{"k": None, "batch_sum": sum(acc)}] if acc else [],
    )(flow)
    got = sorted(
        ((r.k, r.batch_sum) for r in out["s"].collect()),
        key=lambda t: (t[0] is not None, t[0] or "", t[1]),
    )
    # a: batch [1,2] -> 3, flush [3] -> 3(k=None); b: flush [10]
    assert got == [(None, 3), (None, 10), ("a", 3)]


def test_words_count(spark, sf_dir):
    """Golden workload: words count (reference
    test/examples/words_count_test.exs) over the documents table —
    hash-partition + partial/final agg is Catalyst's job now."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    flow = Flow({"docs": docs})
    out = Pipeline(
        [
            FlatMap("docs", F.split(F.lower(F.col("text")), r"\s+"), alias="word"),
            Agg("docs", "counts", by=["word"], aggs={"n": F.count("*")}),
        ]
    )(flow)
    counts = {r.word: r.n for r in out["counts"].collect()}
    # cross-check one word against a direct computation
    import re
    from collections import Counter

    expected = Counter()
    for row in docs.select("text").collect():
        expected.update(row.text.lower().split())
    assert counts["the"] == expected["the"]
    assert sum(counts.values()) == sum(expected.values())


def test_telegram_rebatch(spark):
    """Golden workload: re-assemble words into lines <= 30 chars
    (reference test/examples/telegram_test.exs:18-31) via the stateful
    kernel with flush."""
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf"]
    limit = 30

    def rebatch(event, acc):
        w = event["value"]
        candidate = (acc + " " + w).strip()
        if len(candidate) > limit:
            return [{"line": acc}], w
        return [], candidate

    flow = Source("w", [{"idx": i, "value": w} for i, w in enumerate(words)], spark=spark)()
    out = StatefulTransformer(
        "w",
        rebatch,
        "",
        schema="line string",
        order_by=["idx"],
        flush=lambda acc: [{"line": acc}] if acc else [],
    )(flow)
    lines = [r.line for r in out["w"].collect()]
    assert all(len(l) <= limit for l in lines)
    assert " ".join(lines).split() == words


def test_iterate_until_fixpoint(spark):
    """Golden workload: loop numbers through +1 until >= 10 (reference
    test/loop_test.exs:41-57)."""
    flow = Source("n", [1, 5, 9, 10, 12], spark=spark)()
    out = Iterate(
        "n",
        body=lambda df: df.withColumn("value", F.col("value") + 1),
        exit_when=F.col("value") >= 10,
    )(flow)
    assert sorted(r.value for r in out["n"].collect()) == [10, 10, 10, 10, 12]


def test_parcels_cep_batch(spark):
    """Golden workload: parcels CEP decision (reference
    test/examples/parcels_test.exs) — every order decided, shipped +
    threshold == total."""
    import datetime as dt

    base = dt.datetime(2017, 4, 1)
    orders = [
        {"order_number": 1, "occurred_at": base, "parcels_to_ship": 2},
        {"order_number": 2, "occurred_at": base, "parcels_to_ship": 1},
        {"order_number": 3, "occurred_at": base, "parcels_to_ship": 2},
    ]
    parcels = [
        # order 1: all 2 shipped in time
        {"order_number": 1, "occurred_at": base + dt.timedelta(days=1)},
        {"order_number": 1, "occurred_at": base + dt.timedelta(days=2)},
        # order 2: shipped 8 days later -> threshold exceeded
        {"order_number": 2, "occurred_at": base + dt.timedelta(days=8)},
        # order 3: only 1 of 2 shipped -> threshold exceeded
        {"order_number": 3, "occurred_at": base + dt.timedelta(days=1)},
    ]
    flow = Pipeline(
        [
            Source("orders", orders, spark=spark),
            Source("parcels", parcels, spark=spark),
            MatchDecide(
                "orders",
                "parcels",
                "decisions",
                key="order_number",
                expected_col="parcels_to_ship",
                event_ts="occurred_at",
                order_ts="occurred_at",
                timeout_days=7,
            ),
        ]
    )()
    decisions = {r.order_number: r.decision for r in flow["decisions"].collect()}
    assert decisions == {
        1: "ALL_PARCELS_SHIPPED",
        2: "THRESHOLD_EXCEEDED",
        3: "THRESHOLD_EXCEEDED",
    }
