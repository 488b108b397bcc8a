"""Driver contract for the spark-graft builder (PySpark target).

Every query is expressed through the strom_spark Flow/component engine
(the library this repo builds) and has a DuckDB-runnable ANSI-SQL
oracle.  Determinism rules used throughout so Spark and DuckDB hash
identically:

  - money columns are clean 2-decimal doubles -> cast to DECIMAL(18,2)
    before arithmetic (exact in both engines), cast back to DOUBLE at
    the end;
  - averages are ROUND(CAST(SUM(decimal) AS DOUBLE) / COUNT(*), 4) on
    both sides (identical IEEE ops);
  - text hashing is md5 (bit-identical hex in both engines);
  - event timestamps are parquet TIMESTAMP(NANOS): Spark loads them as
    microseconds (see strom_spark/io.py), oracles use epoch_us/
    time_bucket so both sides operate at the same precision;
  - every computed column is explicitly aliased the same on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strom_spark import (
    Agg,
    CosineLSHJoin,
    CosineTopK,
    CountWindow,
    Distinct,
    EmbeddingNearDupPairs,
    ExactDedup,
    Filter,
    FlatMap,
    Flow,
    IVFTopK,
    Iterate,
    Join,
    MatchDecide,
    MediaFeatures,
    MinHashDedup,
    MinHashLSHPairs,
    Mixer,
    NgramJaccardPairs,
    PandasMap,
    Pipeline,
    RowNumber,
    SQL as SQLComponent,
    SetOp,
    SimHash,
    SimHashDedup,
    SimHashPairs,
    SlidingCountWindow,
    Sort,
    Splitter,
    SplitterTree,
    StatefulTransformer,
    TimeWindow,
    TopK,
    TopKPerGroup,
    Transformer,
    WinnowFingerprints,
    load_table,
    spread,
    synthetic_assets,
)
from strom_spark.functions import text as TXT

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


def _sf_tag(sf_dir: str) -> str:
    """Filesystem-safe tag for per-sf artifact paths/table names
    (shared by ivf_index_search and bucketed_join_revenue — keep the
    two scoping schemes in sync)."""
    import re as _re

    return _re.sub(r"\W", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])


def _avg(sum_expr, count_expr=None):
    """CAST(SUM AS DOUBLE)/COUNT — the identical single IEEE division
    on both engines; no rounding (round() tie-breaks differ across
    engines on exact dyadic ties, the raw doubles never do)."""
    count_expr = count_expr if count_expr is not None else F.count("*")
    return sum_expr.cast("double") / count_expr


#: shared oracle CTE fragments (DuckDB SQL)
_NORM_DOCS = r"""
norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS ntext
  FROM documents
),
toks AS (SELECT doc_id, string_split(ntext, ' ') AS w FROM norm)
"""

_SHINGLES = r"""
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM toks, unnest(range(1, greatest(len(w) - 1, 1))) t(i)
)
"""

_JACCARD_PAIRS = r"""
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT da, db, c / (sa.n + sb.n - c) AS jaccard
  FROM inter JOIN sizes sa ON inter.da = sa.doc_id
             JOIN sizes sb ON inter.db = sb.doc_id
)
"""

#: ROW-form simhash (r10): explode tokens once, md5 per token ROW,
#: then one grouped bit vote per (doc, j) — the engine's own shape
#: (dedup.py:_simhash_sig_int).  The previous list form
#: (``sigs, unnest(range(1,33))``) carried each doc's FULL md5-string
#: list through a 32x cross join and re-ran list_filter per copy —
#: tens of GB of transient list payloads at 50k docs (duck OOM even
#: at a 60 GB limit on the r10 corpus); the row form is an 88M-row
#: grouped aggregate duck chews through in seconds.
_SIMHASH = r"""
hrows AS (
  SELECT doc_id, md5(t.tok) AS h
  FROM toks, unnest(w) AS t(tok)
),
bits AS (
  SELECT doc_id, j,
    CASE WHEN 2 * SUM(CASE WHEN substring(h, j, 1) >= '8' THEN 1 ELSE 0 END)
           > COUNT(*)
         THEN '1' ELSE '0' END AS b
  FROM hrows, unnest(range(1, 33)) t(j)
  GROUP BY doc_id, j
),
sh32 AS (
  SELECT doc_id AS id, string_agg(b, '' ORDER BY j) AS simhash
  FROM bits GROUP BY doc_id
)
"""

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def register(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return register


# --------------------------------------------------------------------------
# A. relational / stream core
# --------------------------------------------------------------------------


@_q(
    "q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 adapted to the synthetic schema: scan -> filter
    (pushed to parquet) -> partial/final hash agg.  One shuffle on the
    tiny (flag, status) key."""
    flow = Flow({"lineitem": load_table(spark, sf_dir, "lineitem")})
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    out = Pipeline(
        [
            Filter("lineitem", F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp")),
            Agg(
                "lineitem",
                "q1",
                by=["l_returnflag", "l_linestatus"],
                aggs={
                    "sum_qty": F.sum(_dec("l_quantity")).cast("double"),
                    "sum_base_price": F.sum(_dec("l_extendedprice")).cast("double"),
                    "sum_disc_price": F.sum(disc_price).cast("double"),
                    "sum_charge": F.sum(disc_price * (F.lit(1) + _dec("l_tax"))).cast("double"),
                    "avg_qty": _avg(F.sum(_dec("l_quantity"))),
                    "avg_price": _avg(F.sum(_dec("l_extendedprice"))),
                    "count_order": F.count("*"),
                },
            ),
        ]
    )(flow)
    return out["q1"]


@_q(
    "q3_shipping_priority",
    """
SELECT o.o_orderkey,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate, o.o_orderpriority
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
GROUP BY o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'), o.o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: NO forced broadcast — customer, orders and
    lineitem all grow with SF, so a forced hint would hit the 8 GB
    broadcast hard-limit at cluster scale (hints don't back off; AQE
    does).  Declarative shuffle joins + AQE: at small SF runtime stats
    convert them to broadcast automatically, at 100 TB they stay
    sort-merge/shuffled-hash on the join keys.  Distributed
    TakeOrdered for the top 10."""
    flow = Flow(
        {
            "customer": load_table(spark, sf_dir, "customer"),
            "orders": load_table(spark, sf_dir, "orders"),
            "lineitem": load_table(spark, sf_dir, "lineitem"),
        }
    )
    cutoff = F.lit("1999-01-01 00:00:00").cast("timestamp")
    out = Pipeline(
        [
            Filter("customer", F.col("c_mktsegment") == "BUILDING"),
            Filter("orders", F.col("o_orderdate") < cutoff),
            Filter("lineitem", F.col("l_shipdate") > cutoff),
            Join("orders", "customer", "oc", on=F.expr("o_custkey = c_custkey")),
            Join("lineitem", "oc", "ocl", on=F.expr("l_orderkey = o_orderkey")),
            Agg(
                "ocl",
                "q3",
                by=[
                    F.col("o_orderkey"),
                    F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                    F.col("o_orderpriority"),
                ],
                aggs={
                    "revenue": F.sum(
                        _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
                    ).cast("double")
                },
            ),
            TopK("q3", k=10, order_by=[F.col("revenue").desc(), F.col("o_orderkey")]),
        ]
    )(flow)
    return out["q3"].select("o_orderkey", "revenue", "orderdate", "o_orderpriority")


@_q(
    "q5_region_revenue",
    """
SELECT n.n_name,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: forced broadcast ONLY for the bounded dims
    (region: 5 rows, nation: 25 rows — fixed size at every SF).
    Customer/orders/lineitem/supplier all grow with SF, so their joins
    are declarative shuffle joins on the equi-keys; AQE converts them
    to broadcast at small SF and keeps them exchange-based at 100 TB
    (a forced hint on an orders/lineitem-derived side would OOM the
    8 GB broadcast limit with no fallback)."""
    flow = Flow({t: load_table(spark, sf_dir, t) for t in ("region", "nation", "customer", "orders", "lineitem", "supplier")})
    out = Pipeline(
        [
            Filter("region", F.col("r_name") == "ASIA"),
            Join("nation", "region", "nr", on=F.expr("n_regionkey = r_regionkey"), broadcast=True),
            Join("customer", "nr", "cnr", on=F.expr("c_nationkey = n_nationkey"), broadcast=True),
            Join("orders", "cnr", "ocnr", on=F.expr("o_custkey = c_custkey")),
            Join("lineitem", "ocnr", "locnr", on=F.expr("l_orderkey = o_orderkey")),
            Join(
                "locnr",
                "supplier",
                "all6",
                on=F.expr("s_suppkey = l_suppkey AND s_nationkey = n_nationkey"),
            ),
            Agg(
                "all6",
                "q5",
                by=["n_name"],
                aggs={
                    "revenue": F.sum(
                        _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
                    ).cast("double")
                },
            ),
        ]
    )(flow)
    return out["q5"]


@_q(
    "filter_project_highvalue",
    """
SELECT l_orderkey, l_linenumber,
  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net
FROM lineitem
WHERE l_quantity >= 45 AND l_discount <= 0.02
""",
)
def filter_project_highvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + scalar projection — both pushed into the parquet scan."""
    flow = Flow({"lineitem": load_table(spark, sf_dir, "lineitem")})
    out = Pipeline(
        [
            Filter("lineitem", (F.col("l_quantity") >= 45) & (F.col("l_discount") <= 0.02)),
            Transformer(
                "lineitem",
                select={
                    "l_orderkey": "l_orderkey",
                    "l_linenumber": "l_linenumber",
                    "net": (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast("double"),
                },
            ),
        ]
    )(flow)
    return out["lineitem"]


@_q(
    "words_count",
    f"""
WITH {_NORM_DOCS}
SELECT t.word, COUNT(*) AS n
FROM (SELECT unnest(w) AS word FROM toks) t
WHERE t.word != ''
GROUP BY t.word
""",
)
def words_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's words-count golden workload
    (test/examples/words_count_test.exs) over documents: flatMap ->
    hash agg; Catalyst's partial/final agg replaces the hand-built
    hash-partition + merge + :done sentinel."""
    flow = Flow({"docs": spread(load_table(spark, sf_dir, "documents"))})
    out = Pipeline(
        [
            FlatMap("docs", TXT.tokens("text"), alias="word"),
            Filter("docs", F.col("word") != ""),
            Agg("docs", "counts", by=["word"], aggs={"n": F.count("*")}),
        ]
    )(flow)
    return out["counts"]


@_q(
    "mix_tagged_union",
    """
SELECT src, event_type, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (
  SELECT 'clicks' AS src, event_type, value FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT 'purchases' AS src, event_type, value FROM events WHERE event_type = 'purchase'
) GROUP BY src, event_type
""",
)
def mix_tagged_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Splitter -> tagged Mixer -> agg (the reference's label-and-mix
    pattern, README.md:117-160).  Union is a metadata-only plan node."""
    flow = Flow({"events": load_table(spark, sf_dir, "events")})
    out = Pipeline(
        [
            Splitter(
                "events",
                {
                    "clicks": F.col("event_type") == "click",
                    "purchases": F.col("event_type") == "purchase",
                },
            ),
            Mixer(["clicks", "purchases"], "mixed", tag="src"),
            Agg(
                "mixed",
                "agg",
                by=["src", "event_type"],
                aggs={"n": F.count("*"), "sum_value": F.sum(_dec("value")).cast("double")},
            ),
        ]
    )(flow)
    return out["agg"]


@_q(
    "split_route_counts",
    """
SELECT 'high' AS branch, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events WHERE value >= 100
UNION ALL
SELECT 'low' AS branch, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events WHERE value < 100
UNION ALL
SELECT 'errors' AS branch, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events WHERE event_type = 'error'
""",
)
def split_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Splitter multi-match semantics (an event can reach several
    outputs — reference lib/splitter.ex:73-80): the 'errors' branch
    overlaps 'high'/'low'; per-branch aggregate, re-mixed."""
    flow = Flow({"events": load_table(spark, sf_dir, "events")})
    aggs = {"n": F.count("*"), "sum_value": F.sum(_dec("value")).cast("double")}
    out = Pipeline(
        [
            Splitter(
                "events",
                {
                    "high": F.col("value") >= 100,
                    "low": F.col("value") < 100,
                    "errors": F.col("event_type") == "error",
                },
            ),
            Agg("high", aggs=aggs),
            Agg("low", aggs=aggs),
            Agg("errors", aggs=aggs),
            Mixer(["high", "low", "errors"], "routed", tag="branch"),
        ]
    )(flow)
    return out["routed"].select("branch", "n", "sum_value")


@_q(
    "topk_orders",
    """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k -> distributed TakeOrdered (per-partition top-k +
    driver merge), never a full sort."""
    flow = Flow({"orders": load_table(spark, sf_dir, "orders")})
    out = TopK(
        "orders", k=10, order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")]
    )(flow)
    return out["orders"].select("o_orderkey", "o_custkey", "o_totalprice")


@_q("distinct_event_types", "SELECT DISTINCT event_type FROM events")
def distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    flow = Flow({"events": load_table(spark, sf_dir, "events")})
    out = Pipeline(
        [Transformer("events", select={"event_type": "event_type"}), Distinct("events")]
    )(flow)
    return out["events"]


@_q(
    "latest_event_per_user",
    """
SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
FROM (
  SELECT user_id, event_id, event_type, ts,
    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-by-key with a deterministic keep rule: top-1 per user by
    (ts, event_id) — one shuffle on user_id."""
    flow = Flow({"events": load_table(spark, sf_dir, "events")})
    out = TopKPerGroup(
        "events",
        k=1,
        partition_by=["user_id"],
        order_by=[F.col("ts").desc(), F.col("event_id").desc()],
    )(flow)
    return out["events"].select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )


@_q(
    "count_window_stats",
    """
SELECT CAST(floor((rn - 1) / 100) AS BIGINT) AS window_id, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_total
FROM (SELECT o_totalprice, row_number() OVER (ORDER BY o_orderkey) AS rn FROM orders)
GROUP BY 1
""",
)
def count_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling count window (reference window_test.exs) lowered to
    row_number + groupBy.  Global count windows are inherently a total
    order (same as the reference's single stream); keyed variants
    partition and scale."""
    flow = Flow({"orders": load_table(spark, sf_dir, "orders")})
    out = CountWindow(
        "orders",
        "win",
        size=100,
        order_by=["o_orderkey"],
        aggs={
            "n": F.count("*"),
            "sum_total": F.sum(_dec("o_totalprice")).cast("double"),
            "avg_total": _avg(F.sum(_dec("o_totalprice"))),
        },
    )(flow)
    return out["win"]


@_q(
    "sliding_window_qty",
    """
WITH ranked AS (
  SELECT l_quantity,
    row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_quantity) AS rn
  FROM lineitem
),
assigned AS (
  SELECT l_quantity, w.window_id
  FROM ranked, unnest(range(
      CAST(greatest(0, ceil((rn - 500) / 250.0)) AS BIGINT),
      CAST(floor((rn - 1) / 250.0) AS BIGINT) + 1)) w(window_id)
),
full_windows AS (
  SELECT window_id, COUNT(*) AS n, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s
  FROM assigned GROUP BY window_id HAVING COUNT(*) = 500
)
SELECT window_id, CAST(s AS DOUBLE) AS sum_qty FROM full_windows
""",
)
def sliding_window_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding count window size=500 step=250 over a total order —
    lowered to an exploded window-id sequence (fan-out size/step = 2)
    + group-by; no Python, one shuffle.  l_quantity rides the sort as
    the third key: (l_orderkey, l_linenumber) alone is NOT unique, and
    a rank tie straddling a window boundary would make the window SUM
    engine-dependent — with quantity in the key, any remaining tie is
    quantity-equal, so every window's (count, sum) is deterministic on
    ANY corpus (surfaced by the sf1.0 sweep, round 9)."""
    flow = Flow({"lineitem": load_table(spark, sf_dir, "lineitem")})
    out = SlidingCountWindow(
        "lineitem",
        "win",
        size=500,
        step=250,
        order_by=["l_orderkey", "l_linenumber", "l_quantity"],
        aggs={"sum_qty": F.sum(_dec("l_quantity")).cast("double")},
    )(flow)
    return out["win"]


@_q(
    "time_window_daily",
    """
SELECT CAST(epoch(time_bucket(INTERVAL '1 day', ts)) AS BIGINT) AS day_start,
  event_type, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def time_window_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window via native F.window — the upgrade
    over the reference's tick-stream processing-time trick."""
    flow = Flow({"events": load_table(spark, sf_dir, "events")})
    out = TimeWindow(
        "events",
        "agg",
        ts="ts",
        size="1 day",
        partition_by=["event_type"],
        aggs={"n": F.count("*"), "sum_value": F.sum(_dec("value")).cast("double")},
    )(flow)
    return out["agg"].select(
        F.unix_timestamp("window_start").alias("day_start"), "event_type", "n", "sum_value"
    )


@_q(
    "sessionize_users",
    """
WITH gaps AS (
  SELECT user_id, epoch_us(ts) AS tus,
    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
  FROM events
),
flags AS (
  SELECT user_id,
    CASE WHEN prev IS NULL OR tus - prev > 3600000000 THEN 1 ELSE 0 END AS new_session
  FROM gaps
)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM flags GROUP BY user_id
""",
)
def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag + gap>threshold flag + sum — one shuffle on
    user_id.  (Streaming flavor would be session_window(ts, gap).)"""
    from pyspark.sql import Window as W

    flow = Flow({"events": load_table(spark, sf_dir, "events")})

    def sessionz(df):
        w = W.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
        tus = F.unix_micros("ts")
        prev = F.lag(tus).over(w)
        new_s = F.when(prev.isNull() | ((tus - prev) > 3600000000), 1).otherwise(0)
        return df.withColumn("new_session", new_s)

    flow = flow.with_stream("events", sessionz(flow["events"]))
    out = Agg(
        "events",
        "sessions",
        by=["user_id"],
        aggs={"n_sessions": F.sum("new_session").cast("bigint"), "n_events": F.count("*")},
    )(flow)
    return out["sessions"]


@_q(
    "session_window_stats",
    """
WITH gaps AS (
  SELECT user_id, epoch_us(ts) AS tus, value, event_id,
    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
  FROM events
),
flags AS (
  SELECT user_id, tus, value, event_id,
    CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS new_session
  FROM gaps
),
sess AS (
  SELECT user_id, tus, value,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM flags
)
SELECT user_id,
  MIN(tus) AS sess_start_us,
  MAX(tus) + 1800000000 AS sess_end_us,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM sess GROUP BY user_id, sid
""",
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rows via the native ``F.session_window`` operator
    (SessionWindow component, windows.py) — gap 30 min, keyed by user.
    The SAME component runs on a watermarked stream with merging keyed
    state (tests/test_streaming.py sentinel-watermark differential);
    this batch registration pins its semantics against the classic
    lag + cumulative-sum lowering in the oracle: session boundary is
    STRICTLY-greater-than-gap (an event exactly ``gap`` after the
    previous one extends the session), session_end = last event + gap.
    One shuffle on (user_id); at 100 TB session state is bounded by
    the watermark horizon, not history (reference analog: stateful
    Transformer sessionization, lib/transformer.ex acc form)."""
    from strom_spark import SessionWindow

    flow = Flow({"events": load_table(spark, sf_dir, "events")})
    out = SessionWindow(
        "events",
        "sess",
        ts="ts",
        gap="30 minutes",
        partition_by=["user_id"],
        aggs={
            "n_events": F.count("*"),
            "sum_value": F.sum(_dec("value")).cast("double"),
        },
    )(flow)
    return out["sess"].select(
        "user_id",
        F.unix_micros("session_start").alias("sess_start_us"),
        F.unix_micros("session_end").alias("sess_end_us"),
        "n_events",
        "sum_value",
    )


@_q(
    "cep_order_fulfillment",
    """
WITH per_order AS (
  SELECT l_orderkey, COUNT(*) AS arrived, MAX(l_shipdate) AS last_ship
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderkey,
  CASE WHEN COALESCE(p.arrived, 0) >= 1
        AND NOT COALESCE(p.last_ship > o.o_orderdate + INTERVAL 30 DAY, FALSE)
       THEN 'ALL_PARCELS_SHIPPED' ELSE 'THRESHOLD_EXCEEDED' END AS decision
FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
""",
)
def cep_order_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parcels CEP decision (reference test/examples/parcels) on
    the TPC-H-ish schema: lineitems play parcels; an order is satisfied
    iff at least one parcel arrived and none shipped later than
    orderdate + 30 days.  Batch lowering is a join + group-by decision
    — no state machine needed (SURVEY §2.3)."""
    orders = load_table(spark, sf_dir, "orders").withColumn("expected", F.lit(1))
    flow = Flow({"orders": orders, "lineitem": load_table(spark, sf_dir, "lineitem")})
    li = flow["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey")
    flow = flow.with_stream("lineitem", li)
    out = MatchDecide(
        "orders",
        "lineitem",
        "decisions",
        key="o_orderkey",
        expected_col="expected",
        event_ts="l_shipdate",
        order_ts="o_orderdate",
        timeout_days=30,
    )(flow)
    return out["decisions"]


@_q(
    "cep_decision_invariant",
    """
WITH per_order AS (
  SELECT l_orderkey, COUNT(*) AS arrived, MAX(l_shipdate) AS last_ship
  FROM lineitem GROUP BY l_orderkey
),
dec AS (
  SELECT o.o_orderkey,
    CASE WHEN COALESCE(p.arrived, 0) >= 1
          AND NOT COALESCE(p.last_ship > o.o_orderdate + INTERVAL 30 DAY, FALSE)
         THEN 'ALL_PARCELS_SHIPPED' ELSE 'THRESHOLD_EXCEEDED' END AS decision
  FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
)
SELECT CAST(count(*) AS BIGINT) AS n_decisions,
  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_orders,
  CAST(sum(CASE WHEN decision = 'ALL_PARCELS_SHIPPED' THEN 1 ELSE 0 END) AS BIGINT) AS n_shipped,
  CAST(sum(CASE WHEN decision = 'THRESHOLD_EXCEEDED' THEN 1 ELSE 0 END) AS BIGINT) AS n_threshold
FROM dec
""",
)
def cep_decision_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELF-VERIFYING decade row for the batch CEP decision (r14): at
    sf10 `cep_order_fulfillment`'s 15M-row output exceeds the sweep's
    collect cap, so previous artifacts hand-annotated its cover from
    the external cep_decade probe.  This row aggregates the SAME
    MatchDecide output to one row — total decisions, distinct orders,
    and the per-class decision counts — and the oracle recomputes the
    identical aggregate from the relational form, so the value-hash
    certifies the full decision DISTRIBUTION (one decision per order,
    exact class split) at any SF without collecting row-level output.
    A regression in the join, timeout rule, or decision predicate
    shifts a class count and flips the hash."""
    dec = cep_order_fulfillment(spark, sf_dir)
    return dec.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_decisions"),
        F.count_distinct("o_orderkey").cast("bigint").alias("n_distinct_orders"),
        F.sum(
            (F.col("decision") == "ALL_PARCELS_SHIPPED").cast("int")
        ).cast("bigint").alias("n_shipped"),
        F.sum(
            (F.col("decision") == "THRESHOLD_EXCEEDED").cast("int")
        ).cast("bigint").alias("n_threshold"),
    )


#: drained streaming CEP results per sf_dir — the query is EAGER (it
#: runs a real availableNow streaming drain), so repeated registry
#: sweeps over immutable testdata reuse the first drain
_CEP_STREAM_CACHE: dict[str, DataFrame] = {}


@_q(
    "cep_order_fulfillment_stream",
    """
WITH per_order AS (
  SELECT l_orderkey, COUNT(*) AS arrived, MAX(l_shipdate) AS last_ship
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderkey,
  CASE WHEN COALESCE(p.arrived, 0) >= 1
        AND NOT COALESCE(p.last_ship > o.o_orderdate + INTERVAL 30 DAY, FALSE)
       THEN 'ALL_PARCELS_SHIPPED' ELSE 'THRESHOLD_EXCEEDED' END AS decision
FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
""",
)
def cep_order_fulfillment_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parcels CEP decision AS A REAL STREAM (streaming/cep.py:
    StreamingMatchDecide — applyInPandasWithState + event-time timers,
    the reference's Agent-based decide from
    test/examples/parcels_test.exs:144-201): orders and lineitems ride
    ONE mixed watermarked event stream, keyed state per order decides
    ALL_PARCELS_SHIPPED / THRESHOLD_EXCEEDED, and orders whose parcels
    never arrive are closed by their event-time TIMER when a far-
    future tick advances the watermark (the reference needs an
    explicit tick stream; Spark's timers are native).  The stream is
    drained availableNow and the decisions must HASH-MATCH the batch
    query's oracle exactly — the strongest batch/stream differential
    the driver can certify.

    Mapping invariants that make the hash equality exact: expected =
    greatest(parcel_count, 1) and the state machine decides
    ALL_SHIPPED iff the ON-TIME parcel count (ts <= deadline) reaches
    expected — equivalent to the batch MAX(l_shipdate) rule — with
    THRESHOLD fired by the event-time timer otherwise; parcels that
    land in a micro-batch before their order event buffer their
    timestamps in state and are re-classified against the deadline
    when it becomes known (streaming/cep.py kernel), so the equality
    holds under ANY maxFilesPerTrigger split, not just a single
    availableNow batch (r10 multi-batch differential in
    tests/test_streaming_cep.py).  The 30-day deadline compares exact
    integer-second floats on both sides (date-granular timestamps),
    and the watermark delay exceeds the full event-time span, so
    multi-batch file splits can never drop late-arriving rows as the
    watermark advances."""
    if sf_dir in _CEP_STREAM_CACHE:
        return _CEP_STREAM_CACHE[sf_dir]
    import shutil
    import tempfile

    from strom_spark.streaming.cep import StreamingMatchDecide
    from strom_spark.streaming.control import run_available

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n_parcels = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count("*").alias("__n")
    )
    order_events = (
        orders.join(n_parcels, "o_orderkey", "left")
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.lit("ORDER_CREATED").alias("type"),
            F.greatest(F.coalesce(F.col("__n"), F.lit(0)), F.lit(1)).alias("expected"),
            F.col("o_orderdate").alias("ts"),
        )
    )
    parcel_events = li.select(
        F.col("l_orderkey").alias("order_id"),
        F.lit("PARCEL_SHIPPED").alias("type"),
        F.lit(0).cast("bigint").alias("expected"),
        F.col("l_shipdate").alias("ts"),
    )
    max_ts = orders.agg(F.max("o_orderdate")).collect()[0][0]
    import datetime

    tick = spark.createDataFrame(
        [(-1, "TICK", 0, max_ts + datetime.timedelta(days=3100))],
        "order_id bigint, type string, expected bigint, ts timestamp",
    )
    d = tempfile.mkdtemp(prefix="strom_cep_stream_")
    try:
        order_events.unionByName(parcel_events).write.mode("overwrite").parquet(
            f"{d}/a_events"
        )
        tick.write.mode("overwrite").parquet(f"{d}/z_tick")
        schema = "order_id bigint, type string, expected bigint, ts timestamp"
        # one dir, tick staged newest: availableNow processes oldest
        # files first, so every real event is on or ahead of the
        # watermark when its batch runs; the 3000-day delay covers the
        # whole 1995-2001 event-time span in case files split batches
        stream = (
            spark.readStream.schema(schema)
            .parquet(f"{d}/*")
            .withWatermark("ts", "3000 days")
        )
        flow = StreamingMatchDecide(
            "events", "decisions", key="order_id",
            timeout_s=30 * 86400,
        )(Flow({"events": stream}))
        name = "t_cep_stream_drain"
        run_available(flow["decisions"], query_name=name, output_mode="append")
        out = (
            spark.table(name)
            .filter(F.col("order_id") >= 0)
            .select(F.col("order_id").alias("o_orderkey"), "decision")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    _CEP_STREAM_CACHE[sf_dir] = out
    return out


@_q(
    "cep_order_fulfillment_stream_relational",
    """
WITH per_order AS (
  SELECT l_orderkey, COUNT(*) AS arrived, MAX(l_shipdate) AS last_ship
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderkey,
  CASE WHEN COALESCE(p.arrived, 0) >= 1
        AND NOT COALESCE(p.last_ship > o.o_orderdate + INTERVAL 30 DAY, FALSE)
       THEN 'ALL_PARCELS_SHIPPED' ELSE 'THRESHOLD_EXCEEDED' END AS decision
FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
""",
)
def cep_order_fulfillment_stream_relational(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The parcels CEP decision as a PURE-JVM STREAMING PLAN
    (streaming/cep.py:StreamingMatchDecideRelational) — the r10
    verdict-task-3 answer to the keyed-Python-state lowering's
    throughput floor: stream-stream LEFT OUTER time-interval join
    (order x on-time parcels) chained into a windowed count
    aggregation, decision = CASE(on_time >= expected).  Same mixed
    event stream, same availableNow drain, same oracle, HASH-EQUAL
    decisions — but every stateful operator is a JVM hash join/agg,
    no per-key Python state machines: measured 26.3s vs 445.2s
    (16.9x) at sf1.0's 1.5M orders (SCALE.md r10).

    The per-key agent row (cep_order_fulfillment_stream) stays
    registered: it is the reference-semantics parity surface
    (per-key tombstones, event-time timers, early completion
    emission); this row is the scale path when only the final
    decision set matters.

    Tick/watermark geometry: a stream-stream join delays its OUTPUT
    watermark by its state-retention bound (span_lb), so the closing
    tick sits past max_ts + watermark_delay + span_lb; the
    order_id >= 0 tick filter happens AFTER the memory sink because
    Catalyst pushes a pre-sink filter below the watermark operator
    and the tick never advances it (bisected r10)."""
    cache_key = (sf_dir, "relational")
    if cache_key in _CEP_STREAM_CACHE:
        return _CEP_STREAM_CACHE[cache_key]
    import shutil
    import tempfile

    from strom_spark.streaming.cep import StreamingMatchDecideRelational
    from strom_spark.streaming.control import run_available

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n_parcels = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count("*").alias("__n")
    )
    order_events = (
        orders.join(n_parcels, "o_orderkey", "left")
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.lit("ORDER_CREATED").alias("type"),
            F.greatest(F.coalesce(F.col("__n"), F.lit(0)), F.lit(1)).alias("expected"),
            F.col("o_orderdate").alias("ts"),
        )
    )
    parcel_events = li.select(
        F.col("l_orderkey").alias("order_id"),
        F.lit("PARCEL_SHIPPED").alias("type"),
        F.lit(0).cast("bigint").alias("expected"),
        F.col("l_shipdate").alias("ts"),
    )
    max_ts = orders.agg(F.max("o_orderdate")).collect()[0][0]
    import datetime

    # tick clears watermark_delay (3000d, covers the event-time span
    # under any file split) + span_lb (2600d join retention) + margin
    tick = spark.createDataFrame(
        [(-1, "TICK", 1, max_ts + datetime.timedelta(days=5700))],
        "order_id bigint, type string, expected bigint, ts timestamp",
    )
    d = tempfile.mkdtemp(prefix="strom_cep_rel_")
    try:
        order_events.unionByName(parcel_events).write.mode("overwrite").parquet(
            f"{d}/a_events"
        )
        tick.write.mode("overwrite").parquet(f"{d}/z_tick")
        schema = "order_id bigint, type string, expected bigint, ts timestamp"
        stream = spark.readStream.schema(schema).parquet(f"{d}/*")
        op = StreamingMatchDecideRelational(
            "events", "decisions", key="order_id",
            timeout_s=30 * 86400, span_lb_s=2600 * 86400,
        )
        decisions = op.transform_df(stream, "3000 days")
        name = "t_cep_rel_drain"
        run_available(decisions, query_name=name, output_mode="append")
        out = (
            spark.table(name)
            .filter(F.col("order_id") >= 0)  # post-sink: see docstring
            .select(F.col("order_id").alias("o_orderkey"), "decision")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    _CEP_STREAM_CACHE[cache_key] = out
    return out


@_q(
    "iterate_to_ten",
    """
SELECT event_id,
  CAST(CASE WHEN user_id % 20 >= 10 THEN user_id % 20 ELSE 10 END AS BIGINT) AS final_value
FROM events
""",
)
def iterate_to_ten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's feedback-loop golden workload
    (test/loop_test.exs:41-57): values loop through +1 until >= 10 —
    driver-side fixpoint iteration (Spark DAGs are acyclic)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", (F.col("user_id") % 20).alias("v")
    )
    flow = Flow({"n": ev})
    out = Iterate(
        "n",
        body=lambda df: df.withColumn("v", F.col("v") + 1),
        exit_when=F.col("v") >= 10,
        max_iterations=12,
    )(flow)
    return out["n"].select("event_id", F.col("v").cast("bigint").alias("final_value"))


# --------------------------------------------------------------------------
# B. LLM-data-pipeline operators
# --------------------------------------------------------------------------


@_q(
    "dedup_exact",
    f"""
WITH {_NORM_DOCS}
SELECT md5(ntext) AS fingerprint, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM norm GROUP BY md5(ntext)
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    flow = Flow({"docs": load_table(spark, sf_dir, "documents")})
    return ExactDedup("docs", "dedup")(flow)["dedup"]


@_q(
    "dedup_ngram_jaccard",
    f"""
WITH {_NORM_DOCS}, {_SHINGLES}, {_JACCARD_PAIRS}
SELECT da AS d1, db AS d2, jaccard FROM jac WHERE jaccard >= 0.8
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    flow = Flow({"docs": load_table(spark, sf_dir, "documents")})
    return NgramJaccardPairs("docs", "pairs", threshold=0.8)(flow)["pairs"]


@_q(
    "dedup_minhash_lsh",
    f"""
WITH {_NORM_DOCS}, {_SHINGLES}, {_JACCARD_PAIRS}
SELECT da AS d1, db AS d2, jaccard FROM jac WHERE jaccard >= 0.8
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH candidates, exact-verified — registered on
    the AUTO banding (r12, the production default): (rows, bands)
    resolve from the Jaccard S-curve at target_recall 0.9999 → 18
    bands × 4 rows at threshold 0.8, the sharpest filter inside the
    96-hash budget (96, not more: the signature min-agg must stay
    under Spark's codegen field limit — dedup.py docstring has the
    measured 5x cliff).  P(catch | j ≥ 0.8) ≥ 0.9999 and the corpus's
    true pairs sit near j=1, so the output still equals the exact
    Jaccard pairs (measured EQUAL to the pinned 16×2 output at sf0.01;
    re-verified at each SF in the sweeps) and the oracle stays the
    exact-pairs SQL.  The sharper bands are the sf10 spill fix: the
    16×2 config admitted j≈0.5 pairs as candidates with P≈0.99, and
    those candidates' shingle arrays were what spilled at the heap
    boundary (r11 DECADE2 adjudication)."""
    flow = Flow({"docs": load_table(spark, sf_dir, "documents")})
    return MinHashLSHPairs(
        "docs", "pairs", threshold=0.8, num_hashes=None, rows_per_band=None
    )(flow)["pairs"]


@_q(
    "dedup_simhash",
    f"""
WITH {_NORM_DOCS}, {_SIMHASH}
SELECT id, simhash FROM sh32
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    flow = Flow({"docs": load_table(spark, sf_dir, "documents")})
    return SimHash("docs", "sig")(flow)["sig"]


@_q(
    "simhash_pairs",
    f"""
WITH {_NORM_DOCS}, {_SIMHASH},
isig AS (
  SELECT doc_id AS id,
    SUM(CASE WHEN b = '1' THEN (1::BIGINT << (32 - j)) ELSE 0 END)::BIGINT AS sig
  FROM bits GROUP BY doc_id
)
SELECT a.id AS d1, b.id AS d2,
  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM isig a JOIN isig b ON a.id < b.id
WHERE bit_count(xor(a.sig, b.sig)) <= 4
""",
)
def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 4) via block-split candidate
    generation (exact recall by pigeonhole) + exact verification; the
    oracle brute-forces all pairs — same result, quadratic cost the
    Spark plan avoids.  The oracle's per-pair work is ONE
    bit_count(xor()) on bigint-packed signatures (r10): the previous
    32-slot string-slice list_filter was ~40B string ops at sf1.0 and
    took 1,657 s duck-only; the integer form replays the same hamming
    in the operator's own representation (packing order is irrelevant
    to hamming as long as both sides agree)."""
    flow = Flow({"docs": load_table(spark, sf_dir, "documents")})
    out = SimHashPairs("docs", "pairs", max_distance=4)(flow)["pairs"]
    return out.select("d1", "d2", F.col("hamming").cast("int").alias("hamming"))


def _unrolled_simhash_cc(rounds: int) -> str:
    """Unrolled min-label-propagation CTE chain over the doc→block
    bipartite buckets — the BOUNDED replacement (round 8) for the
    recursive-CTE transitive closure that stalled DuckDB at sf0.1:
    the recursion materialized the DISTINCT doc-doc edge set, which is
    O(cluster²) in duplicate-heavy buckets.  Each unrolled round here
    replays EXACTLY one engine iteration (dedup.py:SimHashDedup):
    bucket min → doc neighbor-min → least() step → pointer jump
    (lab := min(lab, lab[lab])) — four bounded joins over doc-block
    rows, never a pair join.  With pointer jumping the label-chain
    depth halves per round, so `rounds` unrolled rounds converge for
    any component of pointer depth ≤ 2^rounds — the fixpoint (every
    node labelled with its component minimum) is unique, so matching
    the engine needs only convergence, not matched iteration counts.

    Every CTE is MATERIALIZED: DuckDB inlines plain CTEs at each
    reference site, and with two references per round the inlining is
    exponential in `rounds` (first symptom: thousands of re-opened
    parquet scans — "Too many open files")."""
    parts = ["l0 AS MATERIALIZED (SELECT id, id AS lab FROM sh32)"]
    for r in range(1, rounds + 1):
        p = f"l{r-1}"
        parts.append(
            f"bm{r} AS MATERIALIZED (SELECT b.i, b.bk, min(l.lab) AS bmin "
            f"FROM blocks b JOIN {p} l ON l.id = b.id GROUP BY b.i, b.bk)"
        )
        parts.append(
            f"nm{r} AS MATERIALIZED (SELECT b.id, min(m.bmin) AS nlab "
            f"FROM blocks b JOIN bm{r} m ON m.i = b.i AND m.bk = b.bk "
            f"GROUP BY b.id)"
        )
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT l.id, least(l.lab, coalesce(n.nlab, l.lab)) AS lab "
            f"FROM {p} l LEFT JOIN nm{r} n ON n.id = l.id)"
        )
        parts.append(
            f"l{r} AS MATERIALIZED (SELECT s.id, least(s.lab, coalesce(j.lab, s.lab)) AS lab "
            f"FROM s{r} s LEFT JOIN s{r} j ON s.lab = j.id)"
        )
    return ",\n".join(parts)


@_q(
    "dedup_simhash_clusters",
    f"""
WITH {_NORM_DOCS}, {_SIMHASH},
blocks AS MATERIALIZED (
  -- MATERIALIZED (r10): the unrolled rounds reference blocks twice
  -- per round = 16 references; a plain CTE re-inlines the whole
  -- tokenize+md5+bit-vote pipeline per reference and duck OOMs at sf1.0
  SELECT id, i,
    CASE WHEN i < 4 THEN substring(simhash, i*6 + 1, 6)
         ELSE substring(simhash, 25, 8) END AS bk
  FROM sh32, unnest(range(0, 5)) t(i)
),
{_unrolled_simhash_cc(8)}
SELECT id, lab AS keep_id FROM l8
""",
)
def dedup_simhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level dedup: (id, keep_id) per doc via min-label
    propagation over simhash block buckets — linear state, NO pair
    materialization (pairs are O(cluster²): measured 98M pairs on a
    50k-doc 10×-duplicated corpus; this outputs 50k rows).  The oracle
    replays the engine's own iteration (neighbor-min + pointer jump)
    as 8 unrolled bounded CTE rounds — see _unrolled_simhash_cc; the
    previous recursive-CTE closure was all-pairs inside buckets and
    stalled DuckDB at sf0.1."""
    flow = Flow({"docs": load_table(spark, sf_dir, "documents")})
    return SimHashDedup("docs", "keep", max_distance=4)(flow)["keep"]


def _unrolled_pair_cc(rounds: int) -> str:
    """Unrolled min-label propagation over a symmetric PAIR edge table
    (CTEs ``edges(a,b)`` + universe from ``norm``) — the oracle replay
    of ConnectedComponents (graph.py:43) for dedup_minhash_clusters.
    Each round: neighbor-min over edges, least() step, pointer jump
    (lab := min(lab, lab[lab])), so `rounds` rounds converge for any
    component of pointer depth <= 2^rounds; the fixpoint (every node
    labelled its component minimum) is unique, so matching the engine
    needs only convergence.  MATERIALIZED for the same reason as
    _unrolled_simhash_cc: two references per round would inline the
    whole upstream pipeline exponentially."""
    parts = [
        "l0 AS MATERIALIZED (SELECT DISTINCT doc_id AS id, doc_id AS lab FROM norm)"
    ]
    for r in range(1, rounds + 1):
        p = f"l{r-1}"
        parts.append(
            f"nm{r} AS MATERIALIZED (SELECT e.a AS id, min(l.lab) AS nlab "
            f"FROM edges e JOIN {p} l ON l.id = e.b GROUP BY e.a)"
        )
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT l.id, least(l.lab, coalesce(n.nlab, l.lab)) AS lab "
            f"FROM {p} l LEFT JOIN nm{r} n ON n.id = l.id)"
        )
        parts.append(
            f"l{r} AS MATERIALIZED (SELECT s.id, least(s.lab, coalesce(j.lab, s.lab)) AS lab "
            f"FROM s{r} s LEFT JOIN s{r} j ON s.lab = j.id)"
        )
    return ",\n".join(parts)


@_q(
    "dedup_minhash_clusters",
    f"""
WITH {_NORM_DOCS}, {_SHINGLES}, {_JACCARD_PAIRS},
edges AS MATERIALIZED (
  SELECT da AS a, db AS b FROM jac WHERE jaccard >= 0.8
  UNION ALL
  SELECT db AS a, da AS b FROM jac WHERE jaccard >= 0.8
),
{_unrolled_pair_cc(8)}
SELECT id, lab AS keep_id FROM l8
""",
)
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end MinHash cluster dedup: (id, keep_id) per doc,
    keep_id = min id of the doc's connected component in the exact
    Jaccard >= 0.8 pair graph (LSH candidates, exact-verified — every
    merge is a true near-dup, unlike the bucket-superset semantics of
    dedup_simhash_clusters).  The oracle computes the exact pair graph
    quadratically (the same _JACCARD_PAIRS CTE dedup_minhash_lsh
    verifies against — at the 16-band × 2-row config LSH recall at
    j>=0.8 is ≈0.9999 and the pair sets measured EQUAL at all SFs, so
    components are equal too) and replays the min-label fixpoint as 8
    unrolled pointer-jumping rounds (_unrolled_pair_cc)."""
    flow = Flow({"docs": load_table(spark, sf_dir, "documents")})
    return MinHashDedup("docs", "keep", threshold=0.8)(flow)["keep"]


#: Portable SRP-LSH config shared by dedup_embedding and its recall
#: floor: 24 tables x 6 bits over md5-parity Rademacher planes applied
#: to trunc(x*1e6) int64 vectors — integer sign dots are EXACT, so the
#: DuckDB oracle replays every bucket bit-for-bit (similarity.py:
#: _rademacher_planes/_sig_frame).  At this corpus's operating point
#: (threshold 0.3 — the corpus has no pair above cosine ~0.5) the
#: config measures ~0.72 recall while evaluating ~0.33x the all-pairs
#: candidate count; at real near-dup thresholds (>=0.9) the same
#: machinery reaches ~0.94+ recall at production bit-widths (see
#: lsh_recall_floor and SCALE.md's SRP physics table).
_EMB_LSH = dict(threshold=0.3, n_tables=24, bits_per_table=6, dim=64,
                portable=True)

#: r14 (the triangle_doubling_invariant precedent, applied family-wide):
#: every PINNED-config oracle-parity demo row over embeddings is bounded
#: BY REGISTRATION at its design corpus — the first 20k vectors, i.e.
#: the FULL corpus at every SF <= 1.0 where these rows are value-hash
#: certified (max vec_id at sf1.0 is 19999, so the cap is a literal
#: no-op there and below; committed artifacts and bench priors are
#: unchanged).  At sf10+ the cap keeps the pinned config's quadratic
#: candidate volume at its certified sf1.0 size instead of letting
#: fixed-bits/fixed-k physics go quadratic (candidates ~ N²/2^bits at
#: fixed bits; Σcᵢ² = N²/k at fixed k — the r11 DECADE2 walls), so the
#: rows run and hash-verify at ANY SF.  The full-corpus scale path at
#: decade SFs is the AUTO-sized twins (cosine_lsh_prod,
#: lsh_auto_recall_floor, semdedup_dup_floor, minhash_recall_floor),
#: which resolve their config from a corpus count per SF.
_EMB_DEMO_CAP = 20_000

#: shared DuckDB CTE replaying the portable SRP-LSH buckets: planes
#: from md5 parity, signatures from exact integer dots, candidates
#: from the per-table bucket self-join (d1 < d2, DISTINCT across
#: tables) — mirrors CosineLSHJoin(portable=True, **_EMB_LSH)
_EMB_LSH_SQL = """
q AS (
  SELECT vec_id AS id,
         list_transform(embedding::DOUBLE[], x -> trunc(x * 1000000.0)) AS qv
  FROM embeddings WHERE vec_id < 20000
),
planes AS (
  SELECT (i // 6) AS t, (i % 6) AS b,
         list(CASE WHEN ('0x' || substring(md5(CAST(i AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 1))::INT % 2 = 1
                   THEN 1.0 ELSE -1.0 END ORDER BY d) AS pv
  FROM range(144) r1(i), range(64) r2(d)
  GROUP BY i
),
sigs AS (
  SELECT q.id, p.t,
         SUM(CASE WHEN list_dot_product(q.qv, p.pv) >= 0 THEN (1 << (5 - p.b)) ELSE 0 END)::BIGINT AS sig
  FROM q CROSS JOIN planes p
  GROUP BY q.id, p.t
),
cand AS (
  SELECT DISTINCT a.id AS d1, b.id AS d2
  FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig AND a.id < b.id
)
"""


@_q(
    "dedup_embedding",
    f"""
WITH {_EMB_LSH_SQL}
SELECT c.d1, c.d2,
  round(list_cosine_similarity(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]), 6) AS cosine
FROM cand c
JOIN embeddings e1 ON e1.vec_id = c.d1
JOIN embeddings e2 ON e2.vec_id = c.d2
WHERE round(list_cosine_similarity(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]), 6) >= 0.3
""",
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs on the SUB-QUADRATIC bucketed plan
    (similarity.py:CosineLSHJoin, portable mode) — re-registered in
    r10 off the exact all-pairs GEMM, whose compute is O(N²) at any
    tiling (43x wall at 10x data measured at sf1.0) and cannot survive
    100x.  The LSH plan's cost is bucket-bounded: signatures are one
    Arrow-batched integer GEMM per batch (exact, oracle-replayable),
    candidates come from per-table integer equi-joins that never
    materialize all-pairs, and only surviving candidates pay the exact
    cosine verify.  The DuckDB oracle replays the ENTIRE pipeline —
    planes from md5 parity, trunc-quantized integer sign dots, bucket
    join, cosine filter — so the hash check covers the bucketing
    machinery itself, not just the output format.  Recall vs the exact
    op is measured by embedding_dedup_recall_floor (~0.72 at this
    threshold-0.3 operating point; SRP physics: at true near-dup
    thresholds >= 0.9 the same op reaches ~0.94+, see SCALE.md).

    Bounded at the pinned config's design corpus (``_EMB_DEMO_CAP`` —
    a no-op at <= sf1.0, the certified sf1.0 workload at sf10+): at
    fixed 24x6 the candidate volume is ~ n_tables·N²/2^bits, the r11
    DECADE2 wall (75 GB shuffle at 200k vectors).  The full-corpus
    decade path is the AUTO sizing (`cosine_lsh_prod`)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _EMB_DEMO_CAP
    )
    return CosineLSHJoin("emb", "pairs", **_EMB_LSH)(Flow({"emb": emb}))["pairs"]


@_q(
    "embedding_dedup_recall_floor",
    f"""
WITH {_EMB_LSH_SQL},
exact AS (
  SELECT a.vec_id AS d1, b.vec_id AS d2
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE a.vec_id < 20000 AND b.vec_id < 20000
    AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.3
)
SELECT (SELECT COUNT(*) FROM exact)::BIGINT AS n_exact,
       (SELECT COUNT(*) FROM exact e JOIN cand c ON e.d1 = c.d1 AND e.d2 = c.d2)::BIGINT AS n_hit,
       CAST(1 AS BIGINT) AS recall_ok
""",
)
def embedding_dedup_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the registered (sub-quadratic, portable-LSH)
    dedup_embedding plan against the EXACT all-pairs op on the same
    corpus — the r10 verdict's required floor row.  The exact side
    runs EmbeddingNearDupPairs with on_overflow='tile' EXPLICITLY: the
    default is now 'error' above max_broadcast_rows because the exact
    op is O(N²) compute by design; a recall measurement is the one
    sanctioned quadratic run.  ``recall_ok`` flips the row red (vs the
    oracle's constant 1) if fewer than 60% of exact pairs surface —
    measured 71.5%/72.2% at sf0.01/sf0.1, ~8 binomial sigma above the
    floor, so a miss means a real regression in planes, quantization,
    packing, or the bucket join, not noise.

    Bounded at ``_EMB_DEMO_CAP`` (r14): the exact side is the one
    sanctioned quadratic, and the cap fixes it at its certified sf1.0
    size (4e8 dots) at any SF — a no-op at <= sf1.0, decade-runnable
    at sf10+ instead of 4e10 dots."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _EMB_DEMO_CAP
    )
    lsh = CosineLSHJoin("emb", "pairs", **_EMB_LSH)(Flow({"emb": emb}))["pairs"]
    exact = EmbeddingNearDupPairs(
        "emb", "p", threshold=0.3, on_overflow="tile"
    )(Flow({"emb": emb}))["p"]
    ex = exact.select("d1", "d2")
    hits = ex.join(lsh.select("d1", "d2"), ["d1", "d2"], "left_semi")
    n_exact = ex.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    n_hit = hits.agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    # 1-row x 1-row stat attach (the repo's adjudicated crossJoin form)
    return n_exact.crossJoin(n_hit).select(
        "n_exact",
        "n_hit",
        F.when(
            F.col("n_hit") * 100 >= F.col("n_exact") * 60, F.lit(1)
        ).otherwise(F.lit(0)).cast("bigint").alias("recall_ok"),
    )


@_q(
    "knn_topk",
    """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings),
s AS (
  SELECT qid, nid, round(list_cosine_similarity(qv, cv), 6) AS cosine
  FROM q CROSS JOIN c WHERE qid != nid
),
r AS (
  SELECT qid AS query_id, nid AS neighbor_id, cosine,
    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
  FROM s
)
SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5
""",
)
def knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query set, linear
    corpus scan — the correct 100 TB plan for small query sets."""
    emb = load_table(spark, sf_dir, "embeddings")
    flow = Flow({"corpus": emb, "queries": emb.filter(F.col("vec_id") < 10)})
    return CosineTopK("corpus", "queries", "knn", k=5)(flow)["knn"]


#: shared SQ8 quantization CTE (DuckDB) — mirrors ScalarQuantize:
#: round-to-integer is engine-safe (a shortest-repr "N.5" double IS
#: exactly N.5, where HALF_UP and half-away-from-zero agree)
_SQ8 = """
qz AS (
  SELECT vec_id,
    list_transform(embedding::DOUBLE[], x -> CAST(round(x * s) AS BIGINT)) AS q
  FROM (
    SELECT vec_id, embedding,
      CASE WHEN amax > 0 THEN 127.0 / amax ELSE 0.0 END AS s
    FROM (SELECT vec_id, embedding,
            list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS amax
          FROM embeddings)
  )
)
"""


@_q(
    "hard_negative_mining",
    """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, label AS ql FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT qid, ql, vec_id AS nid, label AS nl,
    round(list_cosine_similarity(qv, embedding::DOUBLE[]), 6) AS cosine
  FROM embeddings CROSS JOIN q WHERE vec_id != qid
),
k50 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
    FROM s) WHERE rank <= 50
),
best AS (
  SELECT * FROM (
    SELECT qid, ql, nid, nl, cosine,
      row_number() OVER (PARTITION BY qid, (nl = ql) ORDER BY cosine DESC, nid) AS rn
    FROM k50) WHERE rn = 1
)
SELECT qid AS query_id, CAST(max(ql) AS BIGINT) AS query_label,
  CAST(coalesce(max(CASE WHEN nl = ql THEN nid END), -1) AS BIGINT) AS pos_id,
  coalesce(max(CASE WHEN nl = ql THEN cosine END), 0.0) AS pos_cosine,
  CAST(coalesce(max(CASE WHEN nl != ql THEN nid END), -1) AS BIGINT) AS neg_id,
  coalesce(max(CASE WHEN nl != ql THEN cosine END), 0.0) AS neg_cosine
FROM best GROUP BY qid
""",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query
    vector, the highest-cosine SAME-label candidate (the positive) and
    the highest-cosine DIFFERENT-label candidate (the hard negative —
    the example that actually moves an embedding model, vs easy random
    negatives) from the exact top-50.  Composes the guard-bounded
    CosineTopK scan with a label join and one (query, same-label)
    ranking window; candidates are top-k bounded, so the mining cost
    is fixed per query regardless of corpus size.  Missing-class
    sentinels (-1/0.0) keep the row NULL-free for cross-engine
    hashing.  Beyond-reference: contrastive-training data surface."""
    emb = load_table(spark, sf_dir, "embeddings")
    knn = CosineTopK(
        "corpus", "queries", "knn", k=50,
    )(Flow({"corpus": emb, "queries": emb.filter(F.col("vec_id") < 10)}))["knn"]
    lab = emb.select("vec_id", "label")
    j = (
        knn.join(
            lab.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nl")),
            "neighbor_id",
        )
        .join(
            lab.select(F.col("vec_id").alias("query_id"), F.col("label").alias("ql")),
            "query_id",
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id", F.col("nl") == F.col("ql")).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    best = j.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    same = F.col("nl") == F.col("ql")
    return best.groupBy("query_id").agg(
        F.max("ql").cast("bigint").alias("query_label"),
        F.coalesce(F.max(F.when(same, F.col("neighbor_id"))), F.lit(-1))
        .cast("bigint")
        .alias("pos_id"),
        F.coalesce(F.max(F.when(same, F.col("cosine"))), F.lit(0.0)).alias("pos_cosine"),
        F.coalesce(F.max(F.when(~same, F.col("neighbor_id"))), F.lit(-1))
        .cast("bigint")
        .alias("neg_id"),
        F.coalesce(F.max(F.when(~same, F.col("cosine"))), F.lit(0.0)).alias("neg_cosine"),
    )


@_q(
    "knn_label_accuracy",
    """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, label AS ql FROM embeddings WHERE vec_id < 200),
s AS (
  SELECT qid, ql, vec_id AS nid,
    round(list_cosine_similarity(qv, embedding::DOUBLE[]), 6) AS cosine
  FROM embeddings CROSS JOIN q WHERE vec_id != qid
),
k5 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
    FROM s) WHERE rank <= 5
),
votes AS (
  SELECT k5.qid, k5.ql, e.label AS nl, count(*) AS c
  FROM k5 JOIN embeddings e ON e.vec_id = k5.nid
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT qid, ql, nl AS predicted FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY c DESC, nl) AS rn
    FROM votes) WHERE rn = 1
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
  CAST(5 AS BIGINT) AS k,
  CAST(sum(CAST(predicted = ql AS INT)) AS BIGINT) AS n_correct,
  sum(CAST(predicted = ql AS INT)) / count(*) AS accuracy
FROM pred
""",
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 5-NN classifier accuracy over the embedding
    labels — the standard embedding-quality eval (does cosine
    neighborhood structure predict class?), as a driver-checked flag
    row.  Majority vote with deterministic tie-break (count desc,
    label asc); queries bounded to 200 (the guard-bounded CosineTopK
    broadcast scan), votes and prediction are keyed aggregations over
    the 5-row candidate lists; accuracy is bigint/bigint IEEE
    division.  Beyond-reference: embedding-eval surface."""
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    knn = CosineTopK(
        "corpus", "queries", "knn", k=5,
    )(Flow({"corpus": emb, "queries": emb.filter(F.col("vec_id") < 200)}))["knn"]
    lab = emb.select("vec_id", "label")
    votes = (
        knn.join(
            lab.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nl")),
            "neighbor_id",
        )
        .groupBy("query_id", "nl")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("nl"))
    pred = (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("query_id", F.col("nl").alias("predicted"))
        .join(
            lab.select(F.col("vec_id").alias("query_id"), F.col("label").alias("ql")),
            "query_id",
        )
    )
    correct = (F.col("predicted") == F.col("ql")).cast("int")
    return pred.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.lit(5).cast("bigint").alias("k"),
        F.sum(correct).cast("bigint").alias("n_correct"),
        (F.sum(correct) / F.count(F.lit(1))).alias("accuracy"),
    )


@_q(
    "knn_neighbor_mean",
    """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 200),
s AS (
  SELECT qid, vec_id AS nid,
    round(list_cosine_similarity(qv, embedding::DOUBLE[]), 6) AS cosine
  FROM embeddings CROSS JOIN q WHERE vec_id != qid
),
k5 AS (
  SELECT qid, nid FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
    FROM s) WHERE rank <= 5
),
x AS (
  SELECT k5.qid, t.i - 1 AS dim,
    round(e.embedding[t.i]::DOUBLE, 6) AS c
  FROM k5 JOIN embeddings e ON e.vec_id = k5.nid,
  unnest(range(1, len(e.embedding) + 1)) AS t(i)
)
SELECT qid AS node, CAST(dim AS INT) AS dim,
  CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mean_val,
  CAST(count(*) AS BIGINT) AS n_neighbors
FROM x GROUP BY qid, dim
""",
)
def knn_neighbor_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-mean neighbor aggregation (Hamilton et al. 2017;
    graph.py:NeighborMeanFeatures) over the exact 5-NN graph of 200
    query vectors: per (node, dim), the element-wise mean of the
    neighbors' embedding components — the feature-propagation /
    embedding-smoothing layer as a dataframe op.  Scale shape: the
    neighbor vectors posexplode to (edge x dim) SKINNY rows and one
    keyed agg on (node, dim) — a hot node's load spreads over dim
    keys with map-side partial sums (no per-node vector collect).
    Components are 6dp-rounded and decimal-summed, so the long-form
    output hash-matches the oracle exactly.  Beyond-reference:
    graph-feature surface."""
    from strom_spark import NeighborMeanFeatures

    emb = load_table(spark, sf_dir, "embeddings")
    knn = CosineTopK(
        "corpus", "queries", "knn", k=5,
    )(Flow({"corpus": emb, "queries": emb.filter(F.col("vec_id") < 200)}))["knn"]
    return NeighborMeanFeatures(
        "edges", "feats", "out",
        src="query_id", dst="neighbor_id", directed=True, node_col="node",
    )(Flow({"edges": knn, "feats": emb}))["out"]


@_q(
    "embedding_gram_matrix",
    """
WITH x AS (
  SELECT vec_id, t.i - 1 AS i, embedding[t.i]::DOUBLE AS v
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
),
p AS (
  SELECT a.i AS i, b.i AS j, round(a.v * b.v, 6) AS c
  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
  CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) AS dot,
  CAST(count(*) AS BIGINT) AS n_rows
FROM p GROUP BY i, j
""",
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix X^T X of the embedding corpus
    (similarity.py:GramMatrix) — the dim^2-bounded sufficient
    statistic that makes PCA / covariance / ridge regression a
    DRIVER-side eigensolve over a 64x64 matrix while the data never
    leaves the cluster (the normal-equations pattern for distributed
    linear models).  One posexplode with row ids PINNED by an eager
    localCheckpoint before the self-join (both sides read identical
    materialized ids — immune to the nondeterministic-id mispairing
    hazard) + one keyed agg with map-side partial sums: the shuffle
    is bounded by dim^2 cardinality, never row count.
    Contributions round(x_i*x_j, 6) are decimal-summed (full-mantissa
    float products have 17-digit reprs — no decimal-half boundary),
    so all 2,080 cells hash-match the oracle exactly.
    Beyond-reference: distributed linear-algebra surface."""
    from strom_spark import GramMatrix

    emb = load_table(spark, sf_dir, "embeddings")
    return GramMatrix("e", "gram", id_col="vec_id")(Flow({"e": emb}))["gram"]


@_q(
    "quantized_knn",
    f"""
WITH {_SQ8},
qs AS (SELECT vec_id AS qid, q AS qv FROM qz WHERE vec_id < 10),
srt AS (
  SELECT qid AS query_id, vec_id AS neighbor_id,
    round(list_cosine_similarity(qv::DOUBLE[], q::DOUBLE[]), 6) AS cosine
  FROM qz CROSS JOIN qs WHERE vec_id != qid
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM srt
) WHERE rank <= 5
""",
)
def quantized_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine search over INT8-QUANTIZED vectors (similarity.py:
    ScalarQuantize — FAISS-style SQ8): per-vector symmetric
    quantization preserves direction, so the SAME CosineTopK runs on
    the int arrays unchanged, at 4x less vector memory/bandwidth — the
    knob that matters at 100 TB, where vector BYTES (not arithmetic)
    drive cost.  Every dot/norm term is an exact small integer, so the
    quantized scores are bit-identical cross-engine BY CONSTRUCTION
    (no float-fold ulp budget at all — stronger than the raw-vector
    path).  Hash-verified value-for-value against the oracle's
    replicated quantization.  Beyond-reference: ANN scale path."""
    from strom_spark import ScalarQuantize

    emb = load_table(spark, sf_dir, "embeddings")
    qz = ScalarQuantize("e", "q")(Flow({"e": emb}))["q"]
    flow = Flow({"corpus": qz, "queries": qz.filter(F.col("vec_id") < 10)})
    return CosineTopK("corpus", "queries", "knn", k=5, vec_col="qvec")(flow)["knn"]


@_q(
    "sq8_recall_floor",
    f"""
WITH {_SQ8},
eq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
es AS (
  SELECT qid AS query_id, vec_id AS neighbor_id,
    round(list_cosine_similarity(qv, embedding::DOUBLE[]), 6) AS cosine
  FROM embeddings CROSS JOIN eq WHERE vec_id != qid
),
exact5 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM es) WHERE rank <= 5
),
qq AS (SELECT vec_id AS qid, q AS qv FROM qz WHERE vec_id < 10),
qsims AS (
  SELECT qid AS query_id, vec_id AS neighbor_id,
    round(list_cosine_similarity(qv::DOUBLE[], q::DOUBLE[]), 6) AS cosine
  FROM qz CROSS JOIN qq WHERE vec_id != qid
),
quant5 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM qsims) WHERE rank <= 5
),
tot AS (SELECT count(*) AS n_exact, count(DISTINCT query_id) AS n_queries FROM exact5),
hit AS (SELECT count(*) AS n_overlap FROM exact5 JOIN quant5 USING (query_id, neighbor_id))
SELECT CAST(n_queries AS BIGINT) AS n_queries,
  CAST(5 AS BIGINT) AS k,
  CAST(n_overlap AS BIGINT) AS n_overlap,
  n_overlap / n_exact AS recall,
  CAST(n_overlap / n_exact >= 0.8 AS BIGINT) AS recall_ok
FROM tot CROSS JOIN hit
""",
)
def sq8_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured top-5 recall of int8-quantized search against the
    exact raw-vector CosineTopK, as a driver-checked flag row (the
    ann_recall_floor pattern): both rankings recompute per run, so the
    oracle's constant flag flips red if quantization quality (or
    either ranking path) regresses.  Exact-integer quantized scores
    and 6dp raw scores make both sides engine-deterministic; recall is
    bigint/bigint IEEE division."""
    from strom_spark import ScalarQuantize

    emb = load_table(spark, sf_dir, "embeddings")

    def q():
        return emb.filter(F.col("vec_id") < 10)

    exact = (
        CosineTopK("c", "q", "o", k=5)(Flow({"c": emb, "q": q()}))["o"]
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    qz = ScalarQuantize("e", "q")(Flow({"e": emb}))["q"]
    quant = (
        CosineTopK("c", "q", "o", k=5, vec_col="qvec")(
            Flow({"c": qz, "q": qz.filter(F.col("vec_id") < 10)})
        )["o"]
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    tot = exact.groupBy(F.lit(1).alias("__k")).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count_distinct("query_id").alias("n_queries"),
    )
    hit = exact.join(quant, ["query_id", "neighbor_id"]).groupBy(
        F.lit(1).alias("__k")
    ).agg(F.count(F.lit(1)).alias("n_overlap"))
    return tot.join(hit, "__k", "left").select(
        F.col("n_queries").cast("bigint"),
        F.lit(5).cast("bigint").alias("k"),
        F.coalesce("n_overlap", F.lit(0)).cast("bigint").alias("n_overlap"),
        (F.coalesce("n_overlap", F.lit(0)) / F.col("n_exact")).alias("recall"),
        (F.coalesce("n_overlap", F.lit(0)) / F.col("n_exact") >= 0.8)
        .cast("bigint")
        .alias("recall_ok"),
    )


@_q(
    "triangle_counts",
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey < 1500000),
e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
t AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
),
n AS (
  SELECT a AS part_id FROM t
  UNION ALL SELECT b FROM t
  UNION ALL SELECT c FROM t
)
SELECT part_id, CAST(count(*) AS BIGINT) AS n_triangles FROM n GROUP BY part_id
""",
)
def triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation in the CO-PURCHASE graph (parts
    sharing an order; ~1.2M edges / 1.9M triangles at sf0.1) via
    degree-oriented wedge joins (graph.py:TriangleCount — Suri &
    Vassilvitskii 2011): the orientation bounds wedge fan-out at
    sqrt(2m) per node, so a celebrity part cannot own a last-reducer
    blowup at 100 TB.  Each triangle is generated exactly once (one
    vertex sees both partners as (deg,id)-larger), counts are exact
    integers — the oracle closes wedges with plain id-orientation and
    MUST produce the identical multiset.  Edge build is an equi-join
    keyed on the order (basket <= 17 rows).  Beyond-reference: graph
    analytics surface next to PageRank/ConnectedComponents.

    Bounded at the sf1.0 order keyspace (``l_orderkey < 1.5e6`` — a
    no-op at <= sf1.0 where the row is certified; r14, the
    triangle_doubling_invariant precedent): the FULL sf10 graph's
    wedge volume is Σd² = 3.0e10 with no degree tail (120M edges, max
    degree 273) — pure volume that DNF'd on 78 GB of wedge shuffle and
    now trips TriangleCount's wedge_budget guard by design.  The cap
    keeps exact counting runnable at any SF; unbounded decade graphs
    go through max_degree (triangle_capped_counts) or edge_sample
    (triangle_doulion_floor), and scale growth is certified by
    triangle_doubling_invariant."""
    from strom_spark import TriangleCount

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 1_500_000)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    return TriangleCount(
        "edges", "tri", node_col="part_id", count_col="n_triangles"
    )(Flow({"edges": edges}))["tri"]


@_q(
    "pagerank_mass_invariant",
    """
SELECT CAST(count(*) AS BIGINT) AS n_nodes, CAST(1 AS BIGINT) AS conserved
FROM (SELECT DISTINCT 'o' || CAST(l_orderkey AS VARCHAR) AS n FROM lineitem
      UNION SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) FROM lineitem)
""",
)
def pagerank_mass_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELF-VERIFYING decade row for PageRank (r10 verdict task 2):
    the full pagerank_order_part oracle unrolls 5 CTE rounds and times
    out in DuckDB above ~sf0.1-scale graphs, so the decade sweep
    certifies the INVARIANT instead — fixed-point mass conservation.
    The symmetric bipartite graph has no dangling nodes, so the only
    mass loss is integer floor division: <= 1 scaled unit per directed
    edge per round plus the one-time base floor, bounding the deficit
    by iterations x (N + E) scaled units out of N x 10^12 (relative
    ~4e-11 at sf1.0).  Ranks are recovered as EXACT scaled integers
    (rank x 10^12 rounds to the true bigint: the double's relative
    error ~2e-16 is 12 orders below the 0.5 rounding margin), so the
    conservation test is pure integer arithmetic — `conserved` flips
    the row red against the oracle's constant 1 on any regression in
    the rank loop, degree join, or contribution aggregate.  The
    oracle's n_nodes (distinct order+part nodes) is one cheap
    distinct-union — no iteration replay needed at any SF."""
    from strom_spark import PageRank

    li = load_table(spark, sf_dir, "lineitem")
    # bigint ids + distinct-before-mirror (r14): same isomorphic-graph
    # argument as pagerank_order_part — node identity never reaches
    # this row's output, only the rank distribution, which is
    # bit-identical under the bijection
    pairs = li.select(
        (F.col("l_orderkey") * 2).cast("bigint").alias("src"),
        (F.col("l_partkey") * 2 + 1).cast("bigint").alias("dst"),
    ).distinct()
    edges = pairs.unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pr = PageRank("e", "pr", iterations=5)(Flow({"e": edges}))["pr"]
    # ranks are a probability distribution in units of 10^-12: init =
    # SCALE // N per node, so the exact-arithmetic total is SCALE and
    # the only loss is floor division — deficit D after k rounds obeys
    # D_{k} <= d*D_{k-1} + N + E (one unit per node base + per edge
    # contribution), D_0 <= N, giving D <= k*(N+E) + N
    SCALE = 10**12
    totals = pr.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(
            F.round(F.col("rank") * F.lit(float(SCALE))).cast("bigint")
        ).alias("__units"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).cast("bigint").alias("__e"))
    deficit = F.lit(SCALE).cast("bigint") - F.col("__units")
    return totals.crossJoin(n_edges).select(
        "n_nodes",
        F.when(
            (deficit >= 0)
            & (deficit <= 5 * (F.col("n_nodes") + F.col("__e")) + F.col("n_nodes")),
            F.lit(1),
        ).otherwise(F.lit(0)).cast("bigint").alias("conserved"),
    )


@_q(
    "triangle_doubling_invariant",
    """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
           WHERE l_orderkey % 10 = 0)
SELECT CAST(count(*) AS BIGINT) AS n_edges, CAST(1 AS BIGINT) AS doubling_ok
FROM (SELECT DISTINCT a.l_partkey AS s, c.l_partkey AS d
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey)
""",
)
def triangle_doubling_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELF-VERIFYING decade row for TriangleCount (r10 verdict task
    2): the full triangle_counts oracle's wedge join times out in
    DuckDB above ~200k-edge graphs, so the decade sweep certifies the
    DISJOINT-COPY invariant instead — running the operator on
    G union (G + 10^9 id offset) must reproduce the base per-node
    triangle counts EXACTLY on both the low and the shifted copy
    (zero cross edges by construction; the eac06d0 sf0.1 probe
    pattern, now a registered row runnable at ANY SF).  A wedge-join
    or dedup regression that miscounts under different degree
    orderings/bucket layouts breaks the equality; `doubling_ok` flips
    red against the oracle's constant 1.  The oracle's n_edges is the
    subsampled co-purchase edge count — cheap at every SF.

    The graph is a DETERMINISTIC 1/10-orders subsample (l_orderkey %
    10 = 0 — SQL-replayable and offset-symmetric, unlike a hash coin):
    the co-purchase projection has no degree tail to cap (sf10 max
    degree 273 at 120M edges) — the decade wall is sheer wedge VOLUME
    (Σd² = 3.0e10), and the r11 sf10 run of the full doubled join
    exhausted shuffle disk.  Order-subsampling keeps baskets intact,
    shrinks wedges ~100×, and the r11 compensating run (same 1/10
    subsample, 12M edges, 0 mismatches) is now the REGISTERED
    semantics instead of an exclusion.  Full-graph exactness at
    ≤ sf1.0 stays covered by triangle_counts' value-hash oracle."""
    from strom_spark import TriangleCount

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 10 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    OFF = 10**9
    doubled_edges = edges.unionAll(
        edges.select(
            (F.col("src") + OFF).alias("src"), (F.col("dst") + OFF).alias("dst")
        )
    )
    base = TriangleCount(
        "e", "t", node_col="part_id", count_col="n_triangles"
    )(Flow({"e": edges}))["t"]
    both = TriangleCount(
        "e", "t", node_col="part_id", count_col="n_triangles"
    )(Flow({"e": doubled_edges}))["t"]
    low = both.filter(F.col("part_id") < OFF)
    high = both.filter(F.col("part_id") >= OFF).select(
        (F.col("part_id") - OFF).alias("part_id"),
        F.col("n_triangles").alias("n_hi"),
    )
    mism = (
        base.join(low.withColumnRenamed("n_triangles", "n_lo"), "part_id", "full")
        .join(high, "part_id", "full")
        .agg(
            F.sum(
                (
                    # null-safe: a node present in one run but missing
                    # from another (count regressed to zero -> row
                    # dropped) must count as a mismatch, not NULL->skip
                    (~F.col("n_triangles").eqNullSafe(F.col("n_lo")))
                    | (~F.col("n_triangles").eqNullSafe(F.col("n_hi")))
                ).cast("int")
            ).alias("__bad"),
        )
    )
    n_edges = edges.distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges")
    )
    return n_edges.crossJoin(mism).select(
        "n_edges",
        F.when(F.coalesce(F.col("__bad"), F.lit(1)) == 0, F.lit(1))
        .otherwise(F.lit(0)).cast("bigint").alias("doubling_ok"),
    )


@_q(
    "triangle_capped_counts",
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT n, count(*) AS d
  FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY n
),
ec AS (
  SELECT e.u, e.v FROM e
  JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v
  WHERE du.d <= 128 AND dv.d <= 128
),
t AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM ec e1 JOIN ec e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN ec e3 ON e3.u = e1.v AND e3.v = e2.v
),
n AS (
  SELECT a AS part_id FROM t
  UNION ALL SELECT b FROM t
  UNION ALL SELECT c FROM t
)
SELECT part_id, CAST(count(*) AS BIGINT) AS n_triangles FROM n GROUP BY part_id
""",
)
def triangle_capped_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TriangleCount's DECADE mode (r12 verdict task 2): ``max_degree``
    drops every edge incident to a raw-degree > 128 hub BEFORE the
    wedge join, making the count exact on the induced low-degree
    subgraph — the standard Zipf-tail shear (the full wedge join's
    Σdeg² exhausted 78 GB of shuffle disk at sf10).  The cap predicate
    uses raw canonical degrees, so the DuckDB oracle replays it
    verbatim: this row certifies the capped SEMANTICS, not just a
    floor.  graph.py:TriangleCount(max_degree=...)."""
    from strom_spark import TriangleCount

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    return TriangleCount(
        "edges", "tri", node_col="part_id", count_col="n_triangles",
        max_degree=128,
    )(Flow({"edges": edges}))["tri"]


@_q(
    "triangle_doulion_floor",
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT CAST(count(*) AS BIGINT) AS n_edges, CAST(1 AS BIGINT) AS doulion_ok
FROM (SELECT DISTINCT a.l_partkey AS s, c.l_partkey AS d
      FROM li a JOIN li c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey)
""",
)
def triangle_doulion_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELF-VERIFYING row for TriangleCount's DOULION mode
    (``edge_sample`` — Tsourakakis et al. 2009): a deterministic
    xxhash64 coin keeps each canonical edge w.p. p=0.5, per-node
    counts scale by 1/p³.  The row computes the exact triangle TOTAL
    and the DOULION estimate on the same graph and asserts the
    estimate lands within 15% (p=0.5 keeps 1/8 of triangles in
    expectation; at the ≥10k-triangle co-purchase totals the estimator
    SD is ~1-2%, so 15% is an ~8σ floor, deterministic per seed).
    The sampling coin is Spark xxhash64 — not SQL-replayable — so the
    oracle checks the data-derived edge count plus the constant flag
    (the floor-row pattern: the hash match enforces the flag)."""
    from strom_spark import TriangleCount

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    exact = TriangleCount(
        "e", "t", node_col="part_id", count_col="n_tri"
    )(Flow({"e": edges}))["t"]
    est = TriangleCount(
        "e", "t", node_col="part_id", count_col="n_tri",
        edge_sample=0.5, seed=42,
    )(Flow({"e": edges}))["t"]
    # per-node counts triple-count each triangle on BOTH sides — the
    # ratio of totals is still the DOULION total-estimate ratio
    te = exact.agg(F.sum("n_tri").alias("__t")).select(
        F.lit(1).alias("__k"), F.col("__t")
    )
    td = est.agg(F.sum("n_tri").alias("__e")).select(
        F.lit(1).alias("__k"), F.col("__e")
    )
    n_edges = edges.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct().agg(F.count(F.lit(1)).cast("bigint").alias("n_edges")).select(
        F.lit(1).alias("__k"), F.col("n_edges")
    )
    return n_edges.join(te, "__k").join(td, "__k").select(
        "n_edges",
        F.when(
            F.abs(F.col("__e") / F.col("__t") - 1.0) <= 0.15, F.lit(1)
        ).otherwise(F.lit(0)).cast("bigint").alias("doulion_ok"),
    )


@_q(
    "cc_label_invariant",
    """
SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(1 AS BIGINT) AS edge_consistent_ok,
       CAST(1 AS BIGINT) AS root_ok
FROM embeddings WHERE vec_id < 20000
""",
)
def cc_label_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELF-VERIFYING decade row for ConnectedComponents over the
    embedding near-dup graph (r10 verdict task 2): the full
    embedding_clusters oracle replays min-label propagation as a
    recursive CTE and times out in DuckDB on decade-size pair sets,
    so the sweep certifies the two defining CC invariants instead,
    both exact and cheap Spark-side:

      - edge consistency: every near-dup pair's endpoints carry the
        SAME component label (the partition respects the edge set);
      - root consistency: every label points at a real component root
        (label(label) == label) and labels are min-oriented
        (component <= node), so a pointer-jumping or propagation
        regression cannot hide.

    Self-loop edges for every vector pin the node universe to the
    whole corpus, making the oracle's n_nodes a plain count.

    Bounded at ``_EMB_DEMO_CAP`` (r14): the edge set is the sanctioned
    exact quadratic (EmbeddingNearDupPairs tile); the cap fixes it at
    the certified sf1.0 size at any SF (no-op at <= sf1.0), so the CC
    invariants verify at sf10+ too.  Full-corpus decade CC is
    exercised through dedup_minhash_clusters' verified pair graph."""
    from strom_spark import ConnectedComponents

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _EMB_DEMO_CAP
    )
    pairs = EmbeddingNearDupPairs(
        "emb", "pairs", threshold=0.3, on_overflow="tile"
    )(Flow({"emb": emb}))["pairs"].select("d1", "d2")
    loops = emb.select(
        F.col("vec_id").alias("d1"), F.col("vec_id").alias("d2")
    )
    edges = pairs.unionAll(loops)
    cc = ConnectedComponents("e", "cc", src="d1", dst="d2")(
        Flow({"e": edges})
    )["cc"]
    # one materialization serves all three consumers below
    cc = cc.localCheckpoint(eager=True)
    lab1 = cc.select(F.col("node").alias("d1"), F.col("component").alias("__c1"))
    lab2 = cc.select(F.col("node").alias("d2"), F.col("component").alias("__c2"))
    edge_bad = (
        pairs.join(lab1, "d1").join(lab2, "d2")
        .agg(F.sum((F.col("__c1") != F.col("__c2")).cast("int")).alias("__eb"))
    )
    roots = cc.select(F.col("node").alias("__r"), F.col("component").alias("__rc"))
    root_bad = (
        cc.join(roots, cc.component == F.col("__r"), "left")
        .agg(
            F.sum(
                (
                    F.col("__r").isNull()
                    | (F.col("__rc") != F.col("component"))
                    | (F.col("component") > F.col("node"))
                ).cast("int")
            ).alias("__rb")
        )
    )
    n_nodes = cc.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    return n_nodes.crossJoin(edge_bad).crossJoin(root_bad).select(
        "n_nodes",
        F.when(F.coalesce(F.col("__eb"), F.lit(0)) == 0, F.lit(1))
        .otherwise(F.lit(0)).cast("bigint").alias("edge_consistent_ok"),
        F.when(F.coalesce(F.col("__rb"), F.lit(0)) == 0, F.lit(1))
        .otherwise(F.lit(0)).cast("bigint").alias("root_ok"),
    )


@_q(
    "copurchase_similar_parts",
    """
WITH li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
ok AS (SELECT g FROM li GROUP BY g HAVING count(*) <= 1000),
li2 AS (SELECT li.g, li.i FROM li JOIN ok USING (g)),
sz AS (SELECT i, count(*) AS n FROM li2 GROUP BY i),
pr AS (
  SELECT a.i AS u, b.i AS v, count(*) AS c
  FROM li2 a JOIN li2 b ON a.g = b.g AND a.i < b.i
  GROUP BY 1, 2
),
j AS (
  SELECT u, v, round(c / (su.n + sv.n - c), 6) AS jaccard
  FROM pr JOIN sz su ON su.i = pr.u JOIN sz sv ON sv.i = pr.v
),
b AS (
  SELECT u AS part_id, v AS other, jaccard FROM j
  UNION ALL SELECT v, u, jaccard FROM j
)
SELECT part_id, other, jaccard, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY part_id ORDER BY jaccard DESC, other) AS rank
  FROM b
) WHERE rank <= 3
""",
)
def copurchase_similar_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most similar parts per part by co-purchase Jaccard
    (similarity.py:CoOccurrenceJaccard — item-item collaborative
    filtering, Linden et al. 2003) over the order baskets: the
    transactional twin of the text-side NgramJaccardPairs, showing the
    posting-list discipline generalizes beyond shingles.  Pair fan-out
    is one order-keyed equi-self-join bounded by basket size (<= 17
    here; max_group_size=1000 is the stop-shingle-style cap that
    sheds pathological mega-carts at 100 TB — provably non-binding on
    this corpus); Jaccard is a small-integer ratio rounded 6dp
    (engine-exact), ranks tie-break on the part id.
    Beyond-reference: recommender/analytics surface."""
    from strom_spark import CoOccurrenceJaccard

    li = load_table(spark, sf_dir, "lineitem")
    return CoOccurrenceJaccard(
        "li", "sim",
        group_col="l_orderkey", item_col="l_partkey",
        top_k=3, max_group_size=1000,
    )(Flow({"li": li}))["sim"].select(
        F.col("l_partkey").alias("part_id"), "other", "jaccard", "rank"
    )


@_q(
    "profile_lineitem",
    """
WITH p AS (
  SELECT 'l_orderkey' AS name, count(*) AS n_rows,
    count(*) - count(l_orderkey) AS n_nulls, count(DISTINCT l_orderkey) AS n_distinct,
    CAST(CAST(min(l_orderkey) AS DECIMAL(38,6)) AS VARCHAR) AS min_val,
    CAST(CAST(max(l_orderkey) AS DECIMAL(38,6)) AS VARCHAR) AS max_val
  FROM lineitem
  UNION ALL
  SELECT 'l_quantity', count(*), count(*) - count(l_quantity), count(DISTINCT l_quantity),
    CAST(CAST(min(l_quantity) AS DECIMAL(38,6)) AS VARCHAR),
    CAST(CAST(max(l_quantity) AS DECIMAL(38,6)) AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice), count(DISTINCT l_extendedprice),
    CAST(CAST(min(l_extendedprice) AS DECIMAL(38,6)) AS VARCHAR),
    CAST(CAST(max(l_extendedprice) AS DECIMAL(38,6)) AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'l_discount', count(*), count(*) - count(l_discount), count(DISTINCT l_discount),
    CAST(CAST(min(l_discount) AS DECIMAL(38,6)) AS VARCHAR),
    CAST(CAST(max(l_discount) AS DECIMAL(38,6)) AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag), count(DISTINCT l_returnflag),
    min(l_returnflag), max(l_returnflag) FROM lineitem
  UNION ALL
  SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus), count(DISTINCT l_linestatus),
    min(l_linestatus), max(l_linestatus) FROM lineitem
)
SELECT name AS column, CAST(n_rows AS BIGINT) AS n_rows, CAST(n_nulls AS BIGINT) AS n_nulls,
  CAST(n_distinct AS BIGINT) AS n_distinct, min_val, max_val
FROM p
""",
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass long-form column profile of lineitem (relational.py:
    ProfileColumns — the scalable df.summary()): per-column row/null/
    exact-distinct counts and typed min/max in ONE wide global
    aggregate (partial+final, no keyed shuffle) + a narrow struct
    explode.  Exact multi-column distinct plans through Spark's
    EXPAND — the honest cost of exactness, documented next to the
    'approx' HLL mode that profiles 100 TB in one true pass.  The
    oracle computes the same eight stats per column the pedestrian
    way (one UNION ALL branch each) — shape-independent agreement.
    Beyond-reference: data-quality/profiling surface."""
    from strom_spark import ProfileColumns

    li = load_table(spark, sf_dir, "lineitem")
    return ProfileColumns(
        "li", "prof",
        columns=["l_orderkey", "l_quantity", "l_extendedprice",
                 "l_discount", "l_returnflag", "l_linestatus"],
    )(Flow({"li": li}))["prof"]


#: EWMA weights 0.5^j — dyadic, so every weight has an EXACT finite
#: decimal expansion (<= 19 digits), shipped as DECIMAL(20,19)
#: literals on BOTH sides: value*0.5^k of a 2dp value is exactly a
#: (2+k)-digit decimal, which lands on 7th-decimal halves where
#: double round() diverges between engines — exact decimal products
#: + HALF_UP make the contribution engine-independent (the mmr_rerank
#: lesson applied ahead of the failure this query hit on first run)
from decimal import Decimal as _Dec

_EWMA_W = [_Dec(0.5 ** j).quantize(_Dec("1E-19")) for j in range(20)]
_EWMA_W_SQL = ", ".join(
    f"({j}, CAST('{w:f}' AS DECIMAL(20,19)))" for j, w in enumerate(_EWMA_W)
)
_EWMA_W_DBL = [0.5 ** j for j in range(20)]


@_q(
    "ewma_user_values",
    f"""
WITH w(off, wt) AS (VALUES {_EWMA_W_SQL}),
r AS (
  SELECT event_id, user_id, ts, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
pairs AS (
  SELECT cur.event_id, cur.user_id, cur.rn,
    round(CAST(past.value AS DECIMAL(18,6)) * w.wt, 6) AS c
  FROM r cur
  JOIN r past ON past.user_id = cur.user_id
    AND past.rn BETWEEN cur.rn - 19 AND cur.rn
  JOIN w ON w.off = cur.rn - past.rn
),
s AS (
  SELECT event_id, user_id, rn,
    CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) AS num,
    count(*) AS k
  FROM pairs GROUP BY 1, 2, 3
)
SELECT s.event_id, s.user_id,
  s.num / (2 - wd.wt) AS ewma,
  CAST(s.k AS BIGINT) AS n_window
FROM s JOIN w wd ON wd.off = s.k - 1
""",
)
def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's event
    values (alpha=0.5, 20-event horizon, normalized) at every event —
    the standard smoothing/anomaly-baseline signal per entity.

    Oracle-exactness by construction: alpha=0.5 makes every weight a
    POWER OF TWO shipped as a literal (no libm pow in either engine),
    contributions are rounded 6dp and summed as DECIMAL (shuffle-order
    independent), and the normalizer 2 - 0.5^(k-1) is exact double
    arithmetic — so the Spark window-array shape and the oracle's
    row_number self-join shape must agree bit-for-bit.  Plan: ONE
    window shuffle on user_id (collect_list over a 20-row frame),
    then narrow array math — no self-join on the Spark side."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    win = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(-19, 0)
    )
    wlit = F.array(*[F.lit(x) for x in _EWMA_W])  # decimal(20,19) literals
    wdbl = F.array(*[F.lit(x) for x in _EWMA_W_DBL])
    arr = F.collect_list("value").over(win)
    out = ev.select("event_id", "user_id", arr.alias("__a"))
    n = F.size("__a")
    contribs = F.transform(
        "__a",
        lambda x, i: F.round(
            x.cast("decimal(18,6)") * F.element_at(wlit, n - i), 6
        ).cast("decimal(18,6)"),
    )
    # exact DECIMAL fold (re-cast keeps the accumulator type stable
    # under decimal-addition widening) == the oracle's decimal SUM
    num = F.aggregate(
        contribs,
        F.lit(0).cast("decimal(18,6)"),
        lambda acc, x: (acc + x).cast("decimal(18,6)"),
    ).cast("double")
    denom = F.lit(2.0) - F.element_at(wdbl, n)
    return out.select(
        "event_id",
        "user_id",
        (num / denom).alias("ewma"),
        n.cast("bigint").alias("n_window"),
    )


@_q(
    "event_transition_probs",
    """
WITH s AS (
  SELECT user_id, event_type,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
c AS (
  SELECT event_type AS cur_type, nxt AS next_type, count(*) AS n
  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
),
t AS (SELECT cur_type, sum(n) AS total FROM c GROUP BY 1)
SELECT c.cur_type, c.next_type, CAST(c.n AS BIGINT) AS n,
  CAST(t.total AS BIGINT) AS total,
  c.n / t.total AS prob
FROM c JOIN t USING (cur_type)
""",
)
def event_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    stream: P(next | current) from lead() pairs in event-time order
    (ties broken on event_id in both engines).  One window shuffle on
    user_id, one keyed count, a type-count-sized totals join —
    transition matrices are |types|^2 rows regardless of corpus size,
    the right shape for behavioral modeling at 100 TB.  Probability is
    bigint/bigint IEEE division — hash-exact.  Beyond-reference:
    sequence-analytics surface."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    from pyspark import StorageLevel

    # the transition-count table is |types|^2-bounded and consumed by
    # the totals agg AND the final join — pin it (small-intermediate
    # persist rule) so the window+count pipeline runs once
    c = (
        s.groupBy(
            F.col("event_type").alias("cur_type"), F.col("nxt").alias("next_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    t = c.groupBy("cur_type").agg(F.sum("n").alias("total"))
    return c.join(t, "cur_type").select(
        "cur_type",
        "next_type",
        F.col("n").cast("bigint"),
        F.col("total").cast("bigint"),
        (F.col("n") / F.col("total")).alias("prob"),
    )


@_q(
    "retention_cohorts",
    """
WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
c AS (SELECT user_id, min(d) AS cohort FROM act GROUP BY 1),
r AS (
  SELECT c.cohort, date_diff('day', c.cohort, a.d) AS off, a.user_id
  FROM act a JOIN c ON a.user_id = c.user_id
),
sz AS (SELECT cohort, count(DISTINCT user_id) AS cohort_size FROM r WHERE off = 0 GROUP BY 1),
ret AS (
  SELECT cohort, off, count(DISTINCT user_id) AS retained
  FROM r WHERE off IN (1, 7, 30) GROUP BY 1, 2
)
SELECT strftime(ret.cohort, '%Y-%m-%d') AS cohort_day,
  CAST(ret.off AS BIGINT) AS day_offset,
  CAST(ret.retained AS BIGINT) AS retained,
  CAST(sz.cohort_size AS BIGINT) AS cohort_size,
  ret.retained / sz.cohort_size AS retention
FROM ret JOIN sz ON ret.cohort = sz.cohort
""",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic D1/D7/D30 retention cohort matrix over the events
    stream: cohort = a user's first active day; for each (cohort,
    offset) the distinct retained users and the retention rate.  Two
    keyed aggs + one keyed join — the canonical product-analytics
    query every event pipeline serves, expressed declaratively so
    Catalyst fuses the distinct-day projection into both aggregations.
    Retention is bigint/bigint IEEE division — hash-exact cross-
    engine.  Beyond-reference: product-analytics surface."""
    from pyspark import StorageLevel

    ev = load_table(spark, sf_dir, "events")
    # (user, active-day) distinct is BOUNDED (users x days, not
    # events) and consumed by the cohort agg AND the offset join;
    # the offset table r feeds both sz and ret — pin both (the
    # small-intermediate persist rule), or the plan re-scans events 4x
    act = (
        ev.select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    c = act.groupBy("user_id").agg(F.min("d").alias("cohort"))
    r = (
        act.join(c, "user_id")
        .select("user_id", "cohort", F.datediff("d", "cohort").alias("off"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sz = (
        r.filter(F.col("off") == 0)
        .groupBy("cohort")
        .agg(F.count_distinct("user_id").alias("cohort_size"))
    )
    ret = (
        r.filter(F.col("off").isin(1, 7, 30))
        .groupBy("cohort", "off")
        .agg(F.count_distinct("user_id").alias("retained"))
    )
    return ret.join(sz, "cohort").select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
        F.col("off").cast("bigint").alias("day_offset"),
        F.col("retained").cast("bigint"),
        F.col("cohort_size").cast("bigint"),
        (F.col("retained") / F.col("cohort_size")).alias("retention"),
    )


@_q(
    "text_stats",
    rf"""
WITH {_NORM_DOCS},
scored AS (
  SELECT t.doc_id,
    CAST(len(list_filter(w, x -> x != '')) AS BIGINT) AS n_tokens,
    CAST(len(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe,
    len(list_filter(w, x -> list_contains(['the','and','of','to','in','is','a'], x))) AS s_en,
    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht'], x))) AS s_de,
    len(list_filter(w, x -> list_contains(['le','la','les','et','est','une'], x))) AS s_fr,
    len(list_filter(w, x -> list_contains(['el','los','las','y','es','una'], x))) AS s_es,
    md5(n.ntext) AS fingerprint
  FROM toks t JOIN norm n ON t.doc_id = n.doc_id JOIN documents d ON t.doc_id = d.doc_id
)
SELECT doc_id, n_tokens, n_bpe,
  CASE WHEN s_en > 0 AND s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
       WHEN s_de > 0 AND s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
       WHEN s_fr > 0 AND s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
       WHEN s_es > 0 AND s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
       ELSE 'und' END AS lang,
  fingerprint
FROM scored
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    flow = Flow({"docs": spread(load_table(spark, sf_dir, "documents"))})
    out = Transformer(
        "docs",
        select={
            "doc_id": "doc_id",
            "n_tokens": TXT.token_count("text").cast("bigint"),
            "n_bpe": TXT.bpe_token_count("text").cast("bigint"),
            "lang": TXT.lang_id("text"),
            "fingerprint": TXT.fingerprint("text"),
        },
    )(flow)
    return out["docs"]


@_q(
    "text_quality",
    rf"""
WITH {_NORM_DOCS},
feats AS (
  SELECT t.doc_id,
    length(d.text) AS n_chars,
    len(list_filter(w, x -> x != '')) AS n_tok,
    len(regexp_extract_all(d.text, '[^A-Za-z0-9\s]')) AS n_punct,
    len(list_filter(w, x -> list_contains(['the','a','an','and','or','of','to','in','is','it'], x))) AS n_stop,
    len(list_distinct(w)) AS n_uniq,
    length(array_to_string(w, '')) AS sum_len
  FROM toks t JOIN documents d ON t.doc_id = d.doc_id
)
SELECT doc_id,
  CAST(n_chars AS BIGINT) AS n_chars,
  CAST(n_tok AS BIGINT) AS n_tokens,
  sum_len / greatest(n_tok, 1) AS avg_token_len,
  n_punct / greatest(n_chars, 1) AS punct_ratio,
  n_stop / greatest(n_tok, 1) AS stopword_ratio,
  n_uniq / greatest(n_tok, 1) AS uniq_token_ratio,
  0.3 * least(n_tok / 100.0, 1.0)
      + 0.25 * least((n_stop / greatest(n_tok, 1)) * 5, 1.0)
      + 0.25 * (1.0 - least((n_punct / greatest(n_chars, 1)) * 10, 1.0))
      + 0.2 * (n_uniq / greatest(n_tok, 1)) AS quality_score
FROM feats
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    flow = Flow({"docs": spread(load_table(spark, sf_dir, "documents"))})
    feats = TXT.quality_features("text")
    out = Transformer("docs", select={"doc_id": "doc_id", **feats})(flow)
    return out["docs"]


@_q(
    "gopher_quality_flags",
    r"""
WITH g AS (
  SELECT doc_id, coalesce(text, '') AS text,
    list_filter(string_split(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')), ' '), x -> x != '') AS w,
    string_split(coalesce(text, ''), chr(10)) AS lines
  FROM documents
),
m AS (
  SELECT doc_id,
    len(w) AS n,
    greatest(len(w), 1) AS sn,
    -- array_to_string of an EMPTY list is NULL in DuckDB (Spark's
    -- concat_ws gives ''): coalesce, or every zero-word doc's rules
    -- go NULL and the cross-engine hash diverges
    coalesce(length(array_to_string(w, '')), 0) AS sum_len,
    len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.')) AS n_sym,
    greatest(len(lines), 1) AS n_lines,
    len(list_filter(lines, l -> starts_with(trim(l), '-') OR starts_with(trim(l), '*') OR starts_with(trim(l), '•'))) AS n_bullet,
    len(list_filter(lines, l -> ends_with(trim(l), '...'))) AS n_ellipsis,
    len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
    len(list_filter(['the','be','to','of','and','that','have','with'], s -> list_contains(w, s))) AS n_stop
  FROM g
),
f AS (
  SELECT doc_id, n, sum_len / sn AS mean_wl,
    CAST(n >= 50 AND n <= 100000 AS INT)
      + CAST(sum_len / sn >= 3.0 AND sum_len / sn <= 10.0 AS INT)
      + CAST(n_sym / sn <= 0.1 AS INT)
      + CAST(n_bullet / n_lines < 0.9 AS INT)
      + CAST(n_ellipsis / n_lines < 0.3 AS INT)
      + CAST(n_alpha / sn >= 0.8 AS INT)
      + CAST(n_stop >= 2 AS INT) AS n_passed
  FROM m
)
SELECT doc_id,
  CAST(n AS BIGINT) AS n_words,
  round(mean_wl, 6) AS mean_word_len,
  CAST(n_passed AS BIGINT) AS n_rules_passed,
  CAST(n_passed = 7 AS BIGINT) AS gopher_pass
FROM f
""",
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher pre-training quality gates (Rae et al.
    2021, A1.1; functions/text.py:gopher_rules) per document: word
    count, mean word length, symbol ratio, bullet/ellipsis line
    fractions, alphabetic-word fraction, stop-word presence — the
    documented rule set FineWeb-class curation pipelines start from.
    Pure Column HOFs (one narrow scan, zero shuffle, zero Python);
    every fraction is the same int/int IEEE division in both engines,
    so the flags hash-match without tolerance.  Beyond-reference:
    training-data curation surface.

    Corpus note: the SYNTHETIC testdata vocabulary contains none of
    the 8 Gopher stop words, so r_stop_words (and hence gopher_pass)
    is 0 for every doc by construction — the discrimination the
    driver row certifies comes from n_rules_passed (5 vs 6 split on
    word count at sf0.1); per-rule both-ways coverage is in
    tests/test_llm_ops.py over a handcrafted corpus."""
    flow = Flow({"docs": spread(load_table(spark, sf_dir, "documents"))})
    g = TXT.gopher_rules("text")
    out = Transformer(
        "docs",
        select={
            "doc_id": "doc_id",
            "n_words": g["n_words"],
            "mean_word_len": g["mean_word_len"],
            "n_rules_passed": g["n_rules_passed"],
            "gopher_pass": g["gopher_pass"],
        },
    )(flow)
    return out["docs"]


@_q(
    "c4_quality_flags",
    r"""
WITH g AS (
  SELECT doc_id, coalesce(text, '') AS text,
    string_split(coalesce(text, ''), chr(10)) AS lines
  FROM documents
),
k AS (
  SELECT doc_id, text, len(lines) AS n_lines,
    coalesce(array_to_string(list_filter(lines, l ->
      (ends_with(trim(l), '.') OR ends_with(trim(l), '!')
       OR ends_with(trim(l), '?') OR ends_with(trim(l), '"'))
      AND len(list_filter(string_split(trim(regexp_replace(l, '\s+', ' ', 'g')), ' '), x -> x != '')) >= 5
      AND NOT contains(lower(l), 'javascript')
    ), chr(10)), '') AS kept_text,
    len(list_filter(lines, l ->
      (ends_with(trim(l), '.') OR ends_with(trim(l), '!')
       OR ends_with(trim(l), '?') OR ends_with(trim(l), '"'))
      AND len(list_filter(string_split(trim(regexp_replace(l, '\s+', ' ', 'g')), ' '), x -> x != '')) >= 5
      AND NOT contains(lower(l), 'javascript')
    )) AS n_kept
  FROM g
)
SELECT doc_id,
  CAST(n_lines AS BIGINT) AS n_lines,
  CAST(n_kept AS BIGINT) AS n_kept_lines,
  CAST(len(regexp_extract_all(kept_text, '[.!?]')) AS BIGINT) AS n_sentences,
  CAST(length(kept_text) AS BIGINT) AS kept_chars,
  CAST(contains(lower(text), 'lorem ipsum') AS BIGINT) AS has_lorem_ipsum,
  CAST(contains(text, '{') AS BIGINT) AS has_curly_brace,
  CAST(len(regexp_extract_all(kept_text, '[.!?]')) >= 3
       AND NOT contains(lower(text), 'lorem ipsum')
       AND NOT contains(text, '{') AS BIGINT) AS c4_keep
FROM k
""",
)
def c4_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published C4 cleaning heuristics (Raffel et al. 2020 §2.2;
    functions/text.py:c4_rules) per document: terminal-punctuation /
    ≥5-word / no-javascript line filter, ≥3-sentence page gate,
    lorem-ipsum and curly-brace page drops — the other canonical
    rule set (besides Gopher) large-scale curation pipelines start
    from.  Pure Column HOFs, one narrow scan, zero shuffle, zero
    Python; every comparison is integer, so the flags hash-match
    cross-engine without tolerance.  Per-rule both-ways coverage over
    a handcrafted corpus is in tests/test_llm_ops.py.
    Beyond-reference: training-data curation surface."""
    flow = Flow({"docs": spread(load_table(spark, sf_dir, "documents"))})
    c4 = TXT.c4_rules("text")
    out = Transformer(
        "docs",
        select={
            "doc_id": "doc_id",
            "n_lines": c4["n_lines"],
            "n_kept_lines": c4["n_kept_lines"],
            "n_sentences": c4["n_sentences"],
            "kept_chars": c4["kept_chars"],
            "has_lorem_ipsum": c4["has_lorem_ipsum"],
            "has_curly_brace": c4["has_curly_brace"],
            "c4_keep": c4["c4_keep"],
        },
    )(flow)
    return out["docs"]


@_q(
    "bloom_prefilter_join",
    """
SELECT c.c_mktsegment,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_acctbal < 0
GROUP BY c.c_mktsegment
""",
)
def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom SEMI-JOIN PRUNING end-to-end (sketch.py:bloom_member_expr)
    — the pattern that saves a 100 TB fact scan's shuffle: the order
    keys of negative-balance customers build a 4096-word Bloom filter
    (one keyed agg, bounded output), the collected words become a
    PURE COLUMN expression (k seeded probes + literal-array lookups,
    whole-stage codegen, ZERO shuffle), and the lineitem fact table is
    pre-filtered MAP-SIDE before its join — rows that cannot match
    never enter the exchange.  False positives pass the filter and die
    in the real join; false negatives cannot exist, so the result is
    EXACTLY the plain 3-way join the oracle runs — which is also why
    this flow uses the PRODUCTION xxhash64 hash (JVM-native) rather
    than the portable md5 recipe: no oracle replicates the filter,
    the downstream join makes the result hash-independent (the
    oracle-parity md5 path stays in bloom_membership).  A free
    driver-side saturation check (popcount of the collected words)
    flips the row red if the filter ever stops pruning.
    Beyond-reference: sketch-driven join pruning."""
    from strom_spark import BloomFilter, bloom_contains  # noqa: F401
    from strom_spark.operators.sketch import bloom_member_expr

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    neg = cust.filter(F.col("c_acctbal") < 0)

    # consumed by the sketch build AND the final join: pin the small
    # (neg-customer orders) side once (shared-lineage rule).  Eager
    # localCheckpoint, NOT persist: the sketch is collected at query-
    # CONSTRUCTION time, so a persist here outlives the query object in
    # the session cache registry (one pinned copy per sweep invocation,
    # never unpersisted).  Checkpoint blocks are owned by the RDD and
    # freed by the ContextCleaner when this DataFrame is GC'd.
    neg_orders = orders.join(
        neg.select("c_custkey", "c_mktsegment"),
        orders.o_custkey == F.col("c_custkey"),
    ).select("o_orderkey", "c_mktsegment").localCheckpoint(eager=True)
    sk = BloomFilter("m", "s", key_col="o_orderkey", n_words=4096, k=4,
                     hash="xxhash64")(
        Flow({"m": neg_orders})
    )["s"]
    words = {r.word_idx: r.word for r in sk.collect()}  # bounded: <= 4096 longs
    # pruning-power assert, FREE (driver-side popcount of the collected
    # words): a saturated filter is exactly the failure mode where the
    # pre-filter silently stops pruning — flip the row red instead.
    bits_set = sum(bin(w).count("1") for w in words.values())
    frac = bits_set / (63 * 4096)
    if frac > 0.9:
        raise AssertionError(
            f"bloom_prefilter_join: filter is saturated ({frac:.2%} bits "
            "set) — the map-side pre-filter no longer prunes; grow n_words"
        )
    pre = li.filter(
        bloom_member_expr(words, F.col("l_orderkey"), n_words=4096, k=4,
                          hash="xxhash64")
    )
    return (
        pre.join(neg_orders, pre.l_orderkey == neg_orders.o_orderkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).cast("double").alias("revenue"),
        )
    )


@_q(
    "bloom_membership",
    """
WITH seeds AS (SELECT unnest(range(4)) AS s),
members AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0),
mpos AS (
  SELECT ('0x' || substring(md5(s || ':' || c_custkey), 1, 8))::UBIGINT % 4032 AS pos
  FROM members CROSS JOIN seeds
),
bits AS (
  SELECT CAST(pos // 63 AS INT) AS word_idx,
         bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS word
  FROM mpos GROUP BY 1
),
probes AS (
  SELECT c_custkey, CAST(pos // 63 AS INT) AS word_idx, CAST(pos % 63 AS INT) AS bit
  FROM (
    SELECT c_custkey,
      ('0x' || substring(md5(s || ':' || c_custkey), 1, 8))::UBIGINT % 4032 AS pos
    FROM customer CROSS JOIN seeds
  )
),
hits AS (
  SELECT p.c_custkey,
         CAST(min((coalesce(b.word, 0) >> p.bit) & 1) = 1 AS BIGINT) AS bloom_hit
  FROM probes p LEFT JOIN bits b USING (word_idx) GROUP BY 1
)
SELECT c.c_custkey, CAST(c.c_acctbal < 0 AS BIGINT) AS is_member, h.bloom_hit
FROM customer c JOIN hits h USING (c_custkey)
""",
)
def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership (operators/sketch.py:BloomFilter —
    Bloom 1970), the bounded-state MEMBERSHIP sketch next to CMS's
    frequency grid: negative-balance customers build a 64-word
    (63 bits/word, portable-signed) filter in ONE map-side-combinable
    keyed agg; every customer then probes it via a broadcast of those
    64 longs.  Per-key output (is_member, bloom_hit) is fully
    DETERMINISTIC cross-engine (md5-prefix bit positions), so the
    driver hash-certifies the sketch's one-sided contract directly:
    bloom_hit >= is_member on every row (no false negatives ever),
    false positives appear exactly where the math puts them (the
    filter is deliberately small — m=4032 bits — so the FP path is
    exercised at sf>=0.1, not just asserted).  At 100 TB this is the
    semi-join pruning primitive: broadcast a few KB of filter built
    from the small side's keys and drop non-matching fact rows BEFORE
    the shuffle join.  Beyond-reference: sketch surface."""
    from strom_spark import BloomFilter, bloom_contains

    cust = load_table(spark, sf_dir, "customer")
    members = cust.filter(F.col("c_acctbal") < 0)
    sk = BloomFilter("m", "s", key_col="c_custkey", n_words=64, k=4)(
        Flow({"m": members})
    )["s"]
    hits = bloom_contains(sk, cust, key_col="c_custkey", n_words=64, k=4)
    return cust.join(hits, "c_custkey").select(
        "c_custkey",
        (F.col("c_acctbal") < 0).cast("bigint").alias("is_member"),
        "bloom_hit",
    )


@_q(
    "doc_entropy_stats",
    rf"""
WITH {_NORM_DOCS},
tw AS (SELECT doc_id, list_filter(w, x -> x != '') AS w FROM toks),
t AS (SELECT doc_id, unnest(w) AS t FROM tw),
pw AS (SELECT doc_id, t, count(*) AS c FROM t GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_types FROM pw GROUP BY 1),
contrib AS (
  SELECT pw.doc_id, round(-(pw.c / n.n) * ln(pw.c / n.n), 6) AS e
  FROM pw JOIN n USING (doc_id)
)
SELECT n.doc_id,
  n.n AS n_tokens,
  n.n_types,
  n.n_types / n.n AS type_token_ratio,
  CAST(SUM(CAST(e AS DECIMAL(18,6))) AS DOUBLE) AS unigram_entropy
FROM contrib JOIN n ON contrib.doc_id = n.doc_id
GROUP BY n.doc_id, n.n, n.n_types
""",
)
def doc_entropy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram entropy + type/token ratio — the
    ``rps_doc_unigram_entropy`` quality signal RedPajama-V2 publishes
    (functions/text.py:unigram_entropy_stats): low word-type entropy
    flags keyword-stuffed / template pages the repetition RATIOS miss
    when repeats are spread across positions.  One exploded (doc,
    word) keyed count, a window sum on the already-shuffled rows, one
    final keyed agg; per-type contributions rounded 6dp and summed as
    DECIMAL so the entropy is shuffle-order independent and
    hash-matches the oracle.  Beyond-reference: training-data
    curation surface."""
    from strom_spark.functions.text import unigram_entropy_stats

    docs = spread(load_table(spark, sf_dir, "documents"))
    return unigram_entropy_stats(docs, "doc_id", "text")


@_q(
    "cms_user_counts",
    """
WITH seeds AS (SELECT unnest(range(4)) AS seed),
grid AS (
  SELECT seed,
    ('0x' || substring(md5(seed || ':' || user_id), 1, 8))::UBIGINT % 512 AS bucket,
    count(*) AS cnt
  FROM events CROSS JOIN seeds
  GROUP BY 1, 2
),
truth AS (SELECT user_id, count(*) AS true_count FROM events GROUP BY user_id),
est AS (
  SELECT t.user_id, min(g.cnt) AS est_count
  FROM truth t CROSS JOIN seeds s
  JOIN grid g ON g.seed = s.seed
   AND g.bucket = ('0x' || substring(md5(s.seed || ':' || t.user_id), 1, 8))::UBIGINT % 512
  GROUP BY 1
)
SELECT t.user_id, e.est_count, t.true_count,
  CAST(e.est_count >= t.true_count AS BIGINT) AS overestimate
FROM truth t JOIN est e USING (user_id)
""",
)
def cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch point estimates (Cormode & Muthukrishnan 2005;
    operators/sketch.py) of per-user event counts, joined against the
    exact counts: the CMS invariant ``est >= true`` is emitted as a
    per-key ``overestimate`` flag the driver hash-certifies.

    The sketch is THE mergeable bounded-state frequency primitive for
    100 TB monitoring: depth*width (4*512) counters regardless of
    cardinality, built in ONE map-side-combinable keyed shuffle,
    merged across partitions/days/streams by summing — where an exact
    per-key count would carry vocabulary-sized state.  Buckets use the
    repo's portable md5-prefix hash, so every counter (and therefore
    every estimate) is bit-identical in the DuckDB oracle."""
    from strom_spark import CountMinSketch, cms_estimate

    ev = load_table(spark, sf_dir, "events")
    sk = CountMinSketch("ev", "sk", key_col="user_id", depth=4, width=512)(
        Flow({"ev": ev})
    )["sk"]
    truth = ev.groupBy("user_id").agg(F.count("*").alias("true_count"))
    est = cms_estimate(sk, truth, key_col="user_id", depth=4, width=512)
    return truth.join(est, "user_id").select(
        "user_id",
        "est_count",
        "true_count",
        (F.col("est_count") >= F.col("true_count")).cast("bigint").alias("overestimate"),
    )


@_q(
    "fineweb_quality_flags",
    r"""
WITH l AS (
  SELECT doc_id, unnest(string_split(coalesce(text, ''), chr(10))) AS line
  FROM documents
),
lc AS (
  SELECT doc_id, line, count(*) AS c, length(line) AS len,
    CAST(ends_with(trim(line), '.') OR ends_with(trim(line), '!')
      OR ends_with(trim(line), '?') OR ends_with(trim(line), '"') AS INT) AS is_punct,
    CAST(length(line) < 30 AS INT) AS is_short
  FROM l GROUP BY doc_id, line
),
m AS (
  SELECT doc_id,
    sum(c) AS n_lines,
    greatest(sum(c), 1) AS sn,
    sum(c * is_punct) AS n_punct,
    sum(c * is_short) AS n_short,
    sum(c * len) AS total_chars,
    sum(CASE WHEN c >= 2 THEN c * len ELSE 0 END) AS dup_chars
  FROM lc GROUP BY doc_id
),
f AS (
  SELECT doc_id, n_lines,
    n_punct / sn AS punct_ratio,
    dup_chars / greatest(total_chars, 1) AS dup_frac,
    n_short / sn AS short_ratio
  FROM m
)
SELECT doc_id,
  CAST(punct_ratio > 0.12 AS BIGINT) AS r_line_punct,
  CAST(dup_frac < 0.1 AS BIGINT) AS r_dup_line_chars,
  CAST(short_ratio < 0.67 AS BIGINT) AS r_short_lines,
  CAST(n_lines AS BIGINT) AS n_lines,
  round(punct_ratio, 6) AS line_punct_ratio,
  round(dup_frac, 6) AS dup_line_char_frac,
  round(short_ratio, 6) AS short_line_ratio,
  CAST(CAST(punct_ratio > 0.12 AS INT) + CAST(dup_frac < 0.1 AS INT)
       + CAST(short_ratio < 0.67 AS INT) AS BIGINT) AS n_rules_passed,
  CAST(punct_ratio > 0.12 AND dup_frac < 0.1 AND short_ratio < 0.67 AS BIGINT) AS fineweb_keep
FROM f
""",
)
def fineweb_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three published FineWeb custom filters (Penedo et al. 2024
    §3.6; functions/text.py:fineweb_rules) per document:
    terminal-punctuation line fraction, duplicated-line char fraction,
    short-line fraction — the gates FineWeb adds on top of its
    Gopher/C4 baseline.  Pure Column HOFs: the duplicated-line scan is
    array_sort + sorted-neighbor equality INSIDE the row (zero
    shuffle), where the oracle uses a per-(doc,line) GROUP BY — two
    shapes, same counts.  Every ratio is long/long IEEE division, so
    flags hash-match cross-engine without tolerance.

    Corpus note: the SYNTHETIC testdata is single-line docs with no
    terminal punctuation, so r_line_punct = 0 and fineweb_keep = 0 for
    every doc by construction (the paper's rules target multi-line web
    pages); the driver row certifies the ratio arithmetic via
    short_line_ratio/n_lines variation, and per-rule both-ways
    coverage is in tests/test_llm_ops.py over a handcrafted corpus.
    Beyond-reference: training-data curation surface."""
    flow = Flow({"docs": spread(load_table(spark, sf_dir, "documents"))})
    fw = TXT.fineweb_rules("text")
    out = Transformer(
        "docs",
        select={
            "doc_id": "doc_id",
            "r_line_punct": fw["r_line_punct"],
            "r_dup_line_chars": fw["r_dup_line_chars"],
            "r_short_lines": fw["r_short_lines"],
            "n_lines": fw["n_lines"],
            "line_punct_ratio": fw["line_punct_ratio"],
            "dup_line_char_frac": fw["dup_line_char_frac"],
            "short_line_ratio": fw["short_line_ratio"],
            "n_rules_passed": fw["n_rules_passed"],
            "fineweb_keep": fw["fineweb_keep"],
        },
    )(flow)
    return out["docs"]


@_q(
    "readability_scores",
    r"""
WITH m AS (
  SELECT doc_id,
    list_filter(string_split(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')), ' '), x -> x != '') AS w,
    greatest(len(regexp_extract_all(coalesce(text, ''), '[.!?]')), 1) AS n_sent,
    len(regexp_extract_all(lower(coalesce(text, '')), '[aeiouy]+')) AS vg
  FROM documents
),
f AS (
  SELECT doc_id, len(w) AS n_words, n_sent,
    vg + len(list_filter(w, x -> NOT regexp_matches(x, '[aeiouy]'))) AS n_syl
  FROM m
),
r AS (
  SELECT doc_id, n_words, n_sent, n_syl,
    round(n_words / n_sent, 6) AS r1,
    round(n_syl / greatest(n_words, 1), 6) AS r2
  FROM f
)
SELECT doc_id,
  CAST(n_words AS BIGINT) AS n_words,
  CAST(n_sent AS BIGINT) AS n_sentences,
  CAST(n_syl AS BIGINT) AS n_syllables,
  CAST(round(CAST(206.835 AS DECIMAL(9,3))
           - CAST(1.015 AS DECIMAL(9,3)) * CAST(r1 AS DECIMAL(18,6))
           - CAST(84.6 AS DECIMAL(9,3)) * CAST(r2 AS DECIMAL(18,6)), 6) AS DOUBLE) AS flesch
FROM r
""",
)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch Reading Ease per document (Flesch 1948; functions/
    text.py:flesch_reading_ease) with deterministic engine-portable
    stand-ins (terminal-mark sentences floored at 1, vowel-group
    syllables with a >=1-per-word floor).  Ratios are int/int IEEE
    rounded 6dp; the published constants combine in EXACT DECIMAL so
    no double product lands on a decimal half.  Pure Column HOFs —
    one narrow scan, zero shuffle.  Corpus note: the synthetic docs
    have no terminal punctuation, so n_sentences = 1 and scores go
    deeply negative — the driver row certifies the arithmetic, the
    per-rule behavior is pytest-covered on a handcrafted corpus.
    Beyond-reference: training-data curation surface."""
    flow = Flow({"docs": spread(load_table(spark, sf_dir, "documents"))})
    fr = TXT.flesch_reading_ease("text")
    out = Transformer(
        "docs",
        select={
            "doc_id": "doc_id",
            "n_words": fr["n_words"],
            "n_sentences": fr["n_sentences"],
            "n_syllables": fr["n_syllables"],
            "flesch": fr["flesch"],
        },
    )(flow)
    return out["docs"]


@_q(
    "quality_percentiles",
    rf"""
WITH {_NORM_DOCS},
feats AS (
  SELECT t.doc_id,
    length(d.text) AS n_chars,
    len(list_filter(w, x -> x != '')) AS n_tok,
    len(regexp_extract_all(d.text, '[^A-Za-z0-9\s]')) AS n_punct,
    len(list_filter(w, x -> list_contains(['the','a','an','and','or','of','to','in','is','it'], x))) AS n_stop,
    len(list_distinct(w)) AS n_uniq
  FROM toks t JOIN documents d ON t.doc_id = d.doc_id
),
scored AS (
  SELECT doc_id,
    0.3 * least(n_tok / 100.0, 1.0)
      + 0.25 * least((n_stop / greatest(n_tok, 1)) * 5, 1.0)
      + 0.25 * (1.0 - least((n_punct / greatest(n_chars, 1)) * 10, 1.0))
      + 0.2 * (n_uniq / greatest(n_tok, 1)) AS quality_score
  FROM feats
),
n AS (SELECT count(*) AS n FROM scored),
rk AS (
  SELECT doc_id, quality_score,
    row_number() OVER (ORDER BY quality_score, doc_id) AS rank
  FROM scored
)
SELECT doc_id, quality_score, CAST(rank AS BIGINT) AS rank,
  (rank - 1) / greatest(n.n - 1, 1) AS pct_rank
FROM rk CROSS JOIN n
""",
)
def quality_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of the quality score: every document's
    corpus PERCENTILE rank — the threshold-free form of quality
    filtering ("drop the bottom 20%" survives any score-distribution
    drift, a fixed cutoff does not).  The global total-order rank runs
    through ``global_row_number`` (range repartition + pinned split +
    broadcast prefix offsets — NO single-partition window), the corpus
    count attaches as a 1-row broadcast, and pct = (rank-1)/(n-1) is
    bigint/bigint IEEE division.  Scores are bit-identical
    cross-engine (the text_quality formula), so ranking on the raw
    double with the doc_id tie-break is deterministic.
    Beyond-reference: training-data curation surface."""
    from strom_spark.operators.relational import global_row_number

    docs = spread(load_table(spark, sf_dir, "documents"))
    scored = docs.select(
        "doc_id",
        TXT.quality_features("text")["quality_score"].alias("quality_score"),
    )
    ranked = global_row_number(
        scored, ["quality_score", "doc_id"], rn_col="rank"
    )
    tot = ranked.agg(F.count(F.lit(1)).alias("__n"))
    return ranked.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "quality_score",
        F.col("rank").cast("bigint").alias("rank"),
        (
            (F.col("rank") - 1) / F.greatest(F.col("__n") - 1, F.lit(1))
        ).alias("pct_rank"),
    )


@_q(
    "langid_counts",
    f"""
WITH {_NORM_DOCS},
scored AS (
  SELECT doc_id,
    len(list_filter(w, x -> list_contains(['the','and','of','to','in','is','a'], x))) AS s_en,
    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht'], x))) AS s_de,
    len(list_filter(w, x -> list_contains(['le','la','les','et','est','une'], x))) AS s_fr,
    len(list_filter(w, x -> list_contains(['el','los','las','y','es','una'], x))) AS s_es
  FROM toks
)
SELECT CASE WHEN s_en > 0 AND s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
       WHEN s_de > 0 AND s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
       WHEN s_fr > 0 AND s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
       WHEN s_es > 0 AND s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
       ELSE 'und' END AS lang, COUNT(*) AS n
FROM scored GROUP BY 1
""",
)
def langid_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    flow = Flow({"docs": spread(load_table(spark, sf_dir, "documents"))})
    out = Pipeline(
        [
            Transformer("docs", select={"lang": TXT.lang_id("text")}),
            Agg("docs", "counts", by=["lang"], aggs={"n": F.count("*")}),
        ]
    )(flow)
    return out["counts"]


@_q(
    "media_features",
    """
SELECT doc_id AS asset_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image'
       WHEN doc_id % 3 = 1 THEN 'audio'
       ELSE 'video' END AS media_type,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS content_hash
FROM documents
""",
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing over a binary asset table derived from
    ``documents`` (content = UTF-8 bytes of the text): the full
    mapInPandas decode pipeline runs — JVM-side hash/size, Arrow
    batches, feature UDF — and the EXACT columns (n_bytes,
    content_hash) are hash-checked against DuckDB.  The decoded
    ``feat`` column is byte-derived here (generic-media stand-in);
    the REAL pure-python WAV decoder (``strom_spark.wav_decode``) is
    exercised with decode_fn in tests/test_llm_ops.py."""
    docs = load_table(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
    )
    flow = Flow({"assets": assets})
    out = MediaFeatures("assets", "features")(flow)["features"]
    return out.select("asset_id", "media_type", "n_bytes", "content_hash")


@_q(
    "audio_features",
    """
SELECT doc_id AS asset_id,
  CAST(1 AS DOUBLE) AS n_channels,
  CAST(8000 AS DOUBLE) AS sample_rate,
  CAST(160 + (doc_id % 50) * 2 AS DOUBLE) AS n_frames,
  CAST(160 + (doc_id % 50) * 2 AS DOUBLE) / 8.0 AS duration_ms,
  CAST(1000 + (doc_id % 20) * 100 AS DOUBLE) AS peak_abs,
  CAST(0 AS DOUBLE) AS mean_amp,
  CAST(1000 + (doc_id % 20) * 100 AS DOUBLE) AS rms,
  CAST(160 + (doc_id % 50) * 2 - 1 AS DOUBLE) AS zero_crossings
FROM documents
""",
)
def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end (operators/multimodal.py
    wav_decode — stdlib ``wave``+``struct``, no native codecs): one
    synthetic square-wave PCM-16 WAV per document id is generated
    executor-side (wav_synth), decoded through the MediaFeatures
    mapInPandas pipeline, and every decoded feature — channel count,
    sample rate, frame count, duration, peak, mean, RMS, zero
    crossings — is hash-checked against its CLOSED-FORM value in the
    oracle (the square wave makes them all exact: see wav_synth's
    docstring).  A header-parse or PCM-unpack regression flips the
    row red.  Fills the brief's 'multimodal columns' with a real
    decode path, not plumbing: no reference analog."""
    from strom_spark import wav_decode, wav_synth

    @F.pandas_udf("binary")
    def _synth(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda i: wav_synth(int(i)))

    docs = load_table(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("audio").alias("media_type"),
        _synth("doc_id").alias("content"),
    )
    out = MediaFeatures("assets", "features", decode_fn=wav_decode)(
        Flow({"assets": assets})
    )["features"]
    f = F.col("feat")
    return out.select(
        "asset_id",
        F.element_at(f, 1).alias("n_channels"),
        F.element_at(f, 2).alias("sample_rate"),
        F.element_at(f, 3).alias("n_frames"),
        F.element_at(f, 4).alias("duration_ms"),
        F.element_at(f, 5).alias("peak_abs"),
        F.element_at(f, 6).alias("mean_amp"),
        F.element_at(f, 7).alias("rms"),
        F.element_at(f, 8).alias("zero_crossings"),
    )


@_q(
    "video_frame_stats",
    """
WITH f AS (SELECT doc_id, 8 + (doc_id % 5) AS total FROM documents),
fi AS (SELECT doc_id, total, CAST(t.i AS INT) AS i FROM f, range(0, 4) t(i))
SELECT doc_id AS asset_id,
  i AS frame_idx,
  CAST((total * 40 * i) // 4 AS BIGINT) AS frame_ts_ms,
  CAST((doc_id * 7 + ((i * total) // 4) * 11) % 256 AS DOUBLE) AS mean_y
FROM fi
""",
)
def video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode end-to-end (operators/multimodal.py
    y4m_parse/y4m_frames — YUV4MPEG2, the uncompressed interchange
    format every ffmpeg pipeline can emit, stdlib-only): one synthetic
    Y4M clip per document id (8x6 C420, 8..12 frames, each frame's Y
    plane a distinct constant), fed through FrameSample's mapInPandas
    explode with frame_fn=y4m_frames (4 evenly spaced frames per
    clip), then each sampled frame's mean luma is computed from its Y
    plane.  The oracle states every row in closed form: the sampled
    source index is i*total//4, its luma constant is
    (id*7 + j*11) % 256, and the frame timestamp is dur*i//4 — so a
    regression in the Y4M header parse, FRAME walking, even-spacing
    arithmetic, or the timestamp math flips the row red.  This retires
    FrameSample's 'codec is a documented fake' residue: the fake
    remains only as the decode_fn=None fallback for formats that
    genuinely need native codecs.  No reference analog."""
    from strom_spark import FrameSample, y4m_frames, y4m_synth

    @F.pandas_udf("binary")
    def _synth(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda i: y4m_synth(int(i)))

    y_plane = 8 * 6  # synth geometry: Y plane is the first 48 bytes

    @F.pandas_udf("double")
    def _mean_y(frames: pd.Series) -> pd.Series:
        return frames.apply(lambda b: sum(b[:y_plane]) / float(y_plane))

    docs = load_table(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        _synth("doc_id").alias("content"),
        ((8 + F.col("doc_id") % 5) * 40).cast("bigint").alias("duration_ms"),
    )
    out = FrameSample(
        "assets", "frames", n_frames=4, frame_fn=y4m_frames
    )(Flow({"assets": assets}))["frames"]
    return out.select(
        "asset_id",
        "frame_idx",
        "frame_ts_ms",
        _mean_y("frame").alias("mean_y"),
    )


@_q(
    "bmp_features",
    """
SELECT doc_id AS asset_id,
  CAST(5 + (doc_id % 6) AS DOUBLE) AS width,
  CAST(3 + (doc_id % 4) AS DOUBLE) AS height,
  CAST((5 + (doc_id % 6)) * (3 + (doc_id % 4)) AS DOUBLE) AS n_pixels,
  CAST(5 + (doc_id % 6) - 1 AS DOUBLE) / 2.0 AS mean_r,
  CAST(doc_id % 256 AS DOUBLE) AS mean_g,
  CAST(3 + (doc_id % 4) - 1 AS DOUBLE) / 2.0 AS mean_b,
  0.587 * CAST(doc_id % 256 AS DOUBLE) AS topleft_luma,
  0.299 * (CAST(5 + (doc_id % 6) - 1 AS DOUBLE) / 2.0)
    + 0.587 * CAST(doc_id % 256 AS DOUBLE)
    + 0.114 * (CAST(3 + (doc_id % 4) - 1 AS DOUBLE) / 2.0) AS mean_luma
FROM documents
""",
)
def bmp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end #2 (operators/multimodal.py
    bmp_decode — stdlib ``struct``, no native codecs): one synthetic
    24-bit BI_RGB BMP per document id, generated executor-side
    (bmp_synth) with per-axis gradients, decoded through the same
    MediaFeatures mapInPandas pipeline as audio/PPM, every feature
    hash-checked against its closed form.  The BMP quirks are the
    point: ``topleft_luma`` goes red if the decoder forgets the
    bottom-up row flip, and widths of 5..10 make most rows carry
    4-byte stride padding, so an off-by-stride parse corrupts the
    channel means.  No reference analog (training-data superset)."""
    from strom_spark import bmp_decode, bmp_synth

    @F.pandas_udf("binary")
    def _synth(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda i: bmp_synth(int(i)))

    docs = load_table(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        _synth("doc_id").alias("content"),
    )
    out = MediaFeatures("assets", "features", decode_fn=bmp_decode)(
        Flow({"assets": assets})
    )["features"]
    f = F.col("feat")
    return out.select(
        "asset_id",
        F.element_at(f, 1).alias("width"),
        F.element_at(f, 2).alias("height"),
        F.element_at(f, 3).alias("n_pixels"),
        F.element_at(f, 4).alias("mean_r"),
        F.element_at(f, 5).alias("mean_g"),
        F.element_at(f, 6).alias("mean_b"),
        F.element_at(f, 7).alias("topleft_luma"),
        F.element_at(f, 8).alias("mean_luma"),
    )


# --------------------------------------------------------------------------
# C. relational superset, routing, ordered-merge, re-batching
# --------------------------------------------------------------------------


@_q(
    "json_props_extract",
    """
SELECT event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
""",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column parse + aggregate (SURVEY §2.3's 'idiomatic
    superset': the reference has no JSON functions).  get_json_object
    is JVM-side; at scale prefer from_json with an explicit schema so
    the parse happens once per row."""
    flow = Flow({"events": load_table(spark, sf_dir, "events")})
    out = Pipeline(
        [
            Transformer(
                "events",
                select={
                    "event_type": "event_type",
                    "k": F.get_json_object("props", "$.k").cast("bigint"),
                },
            ),
            Agg(
                "events",
                "agg",
                by=["event_type"],
                aggs={"n": F.count("*"), "avg_k": _avg(F.sum("k")), "max_k": F.max("k")},
            ),
        ]
    )(flow)
    return out["agg"]


@_q(
    "order_price_percentiles",
    """
SELECT o_orderkey, o_orderpriority,
  percent_rank() OVER w AS pct_rank,
  cume_dist() OVER w AS cume
FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
)
def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist analytic windows (superset ops beside
    ntile/row_number): both are exact integer-ratio doubles
    ((rank-1)/(n-1), rank/n) so the values are engine-identical with no
    rounding; the deterministic (price, orderkey) order makes ranks
    unambiguous.  One shuffle on the partition key, like any keyed
    window; the date filter is pushed to the parquet scan."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
    )


@_q(
    "cube_lineitem_flags",
    """
SELECT l_returnflag, l_linestatus,
  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE (cross-dimension subtotals — the superset op next
    to rollup_revenue's hierarchy) with `grouping_id` disambiguating
    subtotal NULLs from data NULLs, exactly as DuckDB's GROUPING bitmask
    does (same bit order: first grouping column is the high bit).  One
    hash-agg pass with grouping-set expansion — no extra shuffle vs the
    plain groupBy."""
    flow = Flow({"lineitem": load_table(spark, sf_dir, "lineitem")})
    out = Agg(
        "lineitem",
        "agg",
        by=["l_returnflag", "l_linestatus"],
        mode="cube",
        aggs={
            "gid": F.grouping_id().cast("bigint"),
            "n": F.count("*"),
            "sum_qty": F.sum(_dec("l_quantity")).cast("double"),
        },
    )(flow)
    return out["agg"].select(
        "l_returnflag", "l_linestatus", "gid", "n", "sum_qty"
    )


@_q(
    "rollup_revenue",
    """
SELECT r.r_name, n.n_name,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP subtotals (superset op).  Only the bounded
    nation/region dims carry broadcast hints; the customer-derived
    side (SF-growing) is left to AQE, which converts it to broadcast
    at small SF from runtime stats and keeps it exchange-based at
    100 TB (a forced hint never backs off and would hit the 8 GB
    broadcast hard limit).  The rollup is one hash-agg pass with
    grouping-set expansion — no extra shuffle vs the plain groupBy."""
    flow = Flow(
        {
            "orders": load_table(spark, sf_dir, "orders"),
            "customer": load_table(spark, sf_dir, "customer"),
            "nation": load_table(spark, sf_dir, "nation"),
            "region": load_table(spark, sf_dir, "region"),
        }
    )
    out = Pipeline(
        [
            Join("customer", "nation", "cn", on=F.col("c_nationkey") == F.col("n_nationkey"), broadcast=True),
            Join("cn", "region", "cnr", on=F.col("n_regionkey") == F.col("r_regionkey"), broadcast=True),
            Join("orders", "cnr", "ocnr", on=F.col("o_custkey") == F.col("c_custkey")),
            Agg(
                "ocnr",
                "agg",
                by=["r_name", "n_name"],
                mode="rollup",
                aggs={
                    "revenue": F.sum(_dec("o_totalprice")).cast("double"),
                    "n_orders": F.count("*"),
                },
            ),
        ]
    )(flow)
    return out["agg"]


@_q(
    "top3_customers_per_nation",
    """
WITH spend AS (
  SELECT n.n_name, c.c_custkey,
    CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, c_custkey, spend, rnk FROM (
  SELECT n_name, c_custkey, spend,
    row_number() OVER (PARTITION BY n_name ORDER BY spend DESC, c_custkey) AS rnk
  FROM spend
) WHERE rnk <= 3
""",
)
def top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window (superset op) via TopKPerGroup: one shuffle on
    the group key, per-group heap — never a global sort.  Only the
    25-row nation dim is hinted; the customer side shuffles on its
    key (AQE broadcasts it at small SF, exchange at 100 TB)."""
    flow = Flow(
        {
            "orders": load_table(spark, sf_dir, "orders"),
            "customer": load_table(spark, sf_dir, "customer"),
            "nation": load_table(spark, sf_dir, "nation"),
        }
    )
    out = Pipeline(
        [
            Join("customer", "nation", "cn", on=F.col("c_nationkey") == F.col("n_nationkey"), broadcast=True),
            Join("orders", "cn", "ocn", on=F.col("o_custkey") == F.col("c_custkey")),
            Agg(
                "ocn",
                "spend",
                by=["n_name", "c_custkey"],
                aggs={"spend": F.sum(_dec("o_totalprice")).cast("double")},
            ),
            TopKPerGroup(
                "spend",
                "top",
                k=3,
                partition_by=["n_name"],
                order_by=[F.col("spend").desc(), F.col("c_custkey")],
                rank_col="rnk",
            ),
        ]
    )(flow)
    return out["top"]


@_q(
    "set_ops_repeat_buyers",
    """
SELECT o_custkey FROM orders WHERE o_orderdate < DATE '1998-01-01'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '1998-01-01'
""",
)
def set_ops_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT as a component (superset op — the reference has no
    set ops beyond union).  Both sides prune to one column before the
    shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    split = F.col("o_orderdate") < F.lit("1998-01-01").cast("date")
    flow = Flow(
        {
            "early": orders.filter(split).select("o_custkey"),
            "late": orders.filter(~split).select("o_custkey"),
        }
    )
    out = SetOp("intersect", "early", "late", "both")(flow)
    return out["both"]


@_q(
    "except_all_surplus_views",
    """
WITH surplus AS (
  SELECT user_id FROM events WHERE event_type = 'view' AND user_id IS NOT NULL
  EXCEPT ALL
  SELECT user_id FROM events WHERE event_type = 'click' AND user_id IS NOT NULL
)
SELECT user_id, COUNT(*) AS n_surplus
FROM surplus GROUP BY user_id ORDER BY user_id
""",
)
def except_all_surplus_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — BAG semantics (superset op next to the DISTINCT
    family): a user with m views and n clicks survives max(m - n, 0)
    times, so the grouped output is each user's view SURPLUS over
    clicks — the multiset algebra a DISTINCT except cannot express.
    Catalyst lowers exceptAll to a summed-multiplicity aggregate +
    generate (one shuffle on the row value), not a join per occurrence."""
    events = load_table(spark, sf_dir, "events")
    views = events.filter(
        (F.col("event_type") == "view") & F.col("user_id").isNotNull()
    ).select("user_id")
    clicks = events.filter(
        (F.col("event_type") == "click") & F.col("user_id").isNotNull()
    ).select("user_id")
    out = SetOp("except_all", "views", "clicks", "surplus")(
        Flow({"views": views, "clicks": clicks})
    )["surplus"]
    return (
        out.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_surplus"))
        .orderBy("user_id")
    )


@_q(
    "round_robin_pairs",
    """
WITH o AS (
  SELECT event_id, row_number() OVER (ORDER BY event_id) AS rn
  FROM events WHERE event_id % 2 = 1
),
e AS (
  SELECT event_id, row_number() OVER (ORDER BY event_id) AS rn
  FROM events WHERE event_id % 2 = 0
)
SELECT o.rn AS pair_no, o.event_id AS odd_id, e.event_id AS even_id
FROM o JOIN e ON o.rn = e.rn
""",
)
def round_robin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's round-robin merge (README.md:117-160,
    simple_numbers_test.exs:50-105): split, number each side in stream
    order, pair by position.  The total-order rank uses the
    distributed range-partition + prefix-offset pattern (RowNumber /
    global_row_number) — never a single-partition window."""
    flow = Flow({"events": load_table(spark, sf_dir, "events")})
    out = Pipeline(
        [
            Splitter(
                "events",
                {"odd": F.col("event_id") % 2 == 1, "even": F.col("event_id") % 2 == 0},
            ),
            RowNumber("odd", order_by=["event_id"]),
            RowNumber("even", order_by=["event_id"]),
            Transformer("odd", select={"odd_id": "event_id", "rn": "rn"}),
            Transformer("even", select={"even_id": "event_id", "rn": "rn"}),
            Join("odd", "even", "pairs", on="rn"),
        ]
    )(flow)
    return out["pairs"].select(
        F.col("rn").alias("pair_no"), "odd_id", "even_id"
    )


@_q(
    "hash_route_counts",
    """
WITH b AS (
  SELECT ('0x' || substring(md5(user_id::VARCHAR), 1, 8))::UBIGINT % 4 AS bucket
  FROM events
)
SELECT 'p' || bucket::VARCHAR AS route, COUNT(*) AS n FROM b GROUP BY 1
""",
)
def hash_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SplitterTree :hash routing (reference lib/splitter_tree.ex:56-68
    — :erlang.phash2(event, n)) with an engine-portable md5-derived
    bucket.  Each route is an independent filter over the same scan;
    per-route aggregate, re-mixed with the route tag."""
    flow = Flow({"events": load_table(spark, sf_dir, "events")})
    bucket = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    routes = [f"p{i}" for i in range(4)]
    comps = [SplitterTree("events", routes, mode="hash", partition_expr=bucket)]
    comps += [Agg(r, aggs={"n": F.count("*")}) for r in routes]
    comps += [Mixer(routes, "counts", tag="route")]
    out = Pipeline(comps)(flow)
    return out["counts"].select("route", "n")


@_q(
    "rebatch_lines",
    rf"""
WITH RECURSIVE {_NORM_DOCS},
words AS (
  SELECT doc_id, i::INT AS i, w[i] AS word
  FROM toks, unnest(range(1, len(w) + 1)) t(i)
),
rec AS (
  SELECT doc_id, i, 1 AS line_no, word AS line FROM words WHERE i = 1
  UNION ALL
  SELECT w.doc_id, w.i,
    CASE WHEN length(r.line) + 1 + length(w.word) <= 100 THEN r.line_no ELSE r.line_no + 1 END,
    CASE WHEN length(r.line) + 1 + length(w.word) <= 100 THEN r.line || ' ' || w.word ELSE w.word END
  FROM rec r JOIN words w ON w.doc_id = r.doc_id AND w.i = r.i + 1
)
SELECT r.doc_id, r.line_no, r.line
FROM rec r LEFT JOIN words nxt ON nxt.doc_id = r.doc_id AND nxt.i = r.i + 1
WHERE nxt.i IS NULL OR length(r.line) + 1 + length(nxt.word) > 100
""",
)
def rebatch_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The telegram golden workload (reference
    test/examples/telegram_test.exs:18-31): split text into words,
    greedily re-batch into lines <= 100 chars.  Inherently sequential
    per document; lowered as one mapInPandas pass over (doc_id, token
    array) rows — thousands of docs per Arrow batch, so the per-doc
    Python loop amortizes (the per-event StatefulTransformer form is
    semantically identical and tested in
    tests/test_stateful_and_examples.py::test_telegram_rebatch, but
    pays per-group Arrow overhead on 50-word groups).  The oracle
    replays the same greedy fold as a recursive CTE."""
    import pandas as pd

    def pack_docs(pdf):
        out_doc, out_no, out_line = [], [], []
        for doc_id, toks in zip(pdf["doc_id"], pdf["toks"]):
            ln, cur = 1, None
            for w in toks:
                if cur is None:
                    cur = w
                elif len(cur) + 1 + len(w) <= 100:
                    cur = cur + " " + w
                else:
                    out_doc.append(doc_id)
                    out_no.append(ln)
                    out_line.append(cur)
                    ln += 1
                    cur = w
            if cur is not None:
                out_doc.append(doc_id)
                out_no.append(ln)
                out_line.append(cur)
        return pd.DataFrame({"doc_id": out_doc, "line_no": out_no, "line": out_line})

    flow = Flow({"docs": spread(load_table(spark, sf_dir, "documents"))})
    out = Pipeline(
        [
            Transformer("docs", select={"doc_id": "doc_id", "toks": TXT.tokens("text")}),
            PandasMap("docs", pack_docs, schema="doc_id bigint, line_no int, line string"),
        ]
    )(flow)
    return out["docs"]


@_q(
    "q6_forecast_revenue",
    """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-agg — every predicate pushes to the
    parquet scan, zero joins, one scalar aggregate."""
    flow = Flow({"lineitem": load_table(spark, sf_dir, "lineitem")})
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    out = Pipeline(
        [
            Filter(
                "lineitem",
                (F.col("l_shipdate") >= lo)
                & (F.col("l_shipdate") < hi)
                & F.col("l_discount").between(0.05, 0.07)
                & (F.col("l_quantity") < 24),
            ),
            Agg(
                "lineitem",
                "q6",
                aggs={"revenue": F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double")},
            ),
        ]
    )(flow)
    return out["q6"]


@_q(
    "brand_revenue",
    """
SELECT p.p_brand,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
)
def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ part -> brand rollup.  part grows linearly with SF
    (20k rows at sf0.1 → billions at 100 TB), so it carries NO forced
    broadcast hint: AQE converts the join to broadcast at small SF
    from runtime stats and falls back to a shuffled hash join at
    scale, where a forced hint would abort at the 8 GB limit."""
    flow = Flow(
        {
            "lineitem": load_table(spark, sf_dir, "lineitem"),
            "part": load_table(spark, sf_dir, "part"),
        }
    )
    out = Pipeline(
        [
            Join("lineitem", "part", "lp", on=F.col("l_partkey") == F.col("p_partkey")),
            Agg(
                "lp",
                "agg",
                by=["p_brand"],
                aggs={
                    "revenue": F.sum(
                        _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
                    ).cast("double"),
                    "n_lines": F.count("*"),
                },
            ),
        ]
    )(flow)
    return out["agg"]


@_q(
    "supplier_balance_by_region",
    """
SELECT r.r_name,
  COUNT(*) AS n_suppliers,
  CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def supplier_balance_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier dimension rollup through the nation/region snowflake —
    covers the supplier table; all joins broadcast."""
    flow = Flow(
        {
            "supplier": load_table(spark, sf_dir, "supplier"),
            "nation": load_table(spark, sf_dir, "nation"),
            "region": load_table(spark, sf_dir, "region"),
        }
    )
    out = Pipeline(
        [
            Join("supplier", "nation", "sn", on=F.col("s_nationkey") == F.col("n_nationkey"), broadcast=True),
            Join("sn", "region", "snr", on=F.col("n_regionkey") == F.col("r_regionkey"), broadcast=True),
            Agg(
                "snr",
                "agg",
                by=["r_name"],
                aggs={
                    "n_suppliers": F.count("*"),
                    "total_balance": F.sum(_dec("s_acctbal")).cast("double"),
                },
            ),
        ]
    )(flow)
    return out["agg"]


@_q(
    "funnel_click_purchase",
    """
WITH seq AS (
  SELECT user_id, ts, event_type,
    min(CASE WHEN event_type = 'click' THEN ts END) OVER (PARTITION BY user_id) AS first_click
  FROM events
)
SELECT user_id,
  CAST(epoch_us(min(ts)) AS BIGINT) AS first_purchase_after_click_us
FROM seq
WHERE event_type = 'purchase' AND first_click IS NOT NULL AND ts > first_click
GROUP BY user_id
""",
)
def funnel_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel (click -> later purchase per user): the CEP
    ordering pattern as one keyed window + filter — a single shuffle on
    user_id, no self-join."""
    from pyspark.sql import Window as W

    flow = Flow({"events": load_table(spark, sf_dir, "events")})
    first_click = F.min(F.when(F.col("event_type") == "click", F.col("ts"))).over(
        W.partitionBy("user_id")
    )
    out = Pipeline(
        [
            Transformer(
                "events",
                select={
                    "user_id": "user_id",
                    "ts": "ts",
                    "event_type": "event_type",
                    "first_click": first_click,
                },
            ),
            Filter(
                "events",
                (F.col("event_type") == "purchase")
                & F.col("first_click").isNotNull()
                & (F.col("ts") > F.col("first_click")),
            ),
            Agg(
                "events",
                "funnel",
                by=["user_id"],
                aggs={"first_purchase_after_click_us": F.unix_micros(F.min("ts"))},
            ),
        ]
    )(flow)
    return out["funnel"]


@_q(
    "customer_balance_quartiles",
    """
WITH q AS (
  SELECT c_custkey, c_nationkey,
    ntile(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS quartile
  FROM customer
)
SELECT c_nationkey, quartile, COUNT(*) AS n FROM q GROUP BY 1, 2
""",
)
def customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing per nation (ranking-window superset op) — one
    shuffle on the partition key; tie-broken for determinism."""
    from pyspark.sql import Window as W

    flow = Flow({"customer": load_table(spark, sf_dir, "customer")})
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    out = Pipeline(
        [
            Transformer(
                "customer",
                select={
                    "c_nationkey": "c_nationkey",
                    "quartile": F.ntile(4).over(w),
                },
            ),
            Agg(
                "customer",
                "q",
                by=["c_nationkey", "quartile"],
                aggs={"n": F.count("*")},
            ),
        ]
    )(flow)
    return out["q"]


@_q(
    "q10_returned_revenue",
    """
WITH rev AS (
  SELECT c.c_custkey, c.c_name, n.n_name,
    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE l.l_returnflag = 'R'
  GROUP BY 1, 2, 3
)
SELECT c_custkey, c_name, n_name, revenue FROM rev
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue ranking over returned items —
    filter pushed to the lineitem scan; only the bounded nation dim
    (25 rows) carries a forced broadcast hint.  The customer- and
    orders-derived sides shuffle on their keys (AQE broadcasts them at
    small SF; at 100 TB a forced hint would blow the broadcast limit).
    Distributed TakeOrdered top-20."""
    flow = Flow(
        {
            "customer": load_table(spark, sf_dir, "customer"),
            "orders": load_table(spark, sf_dir, "orders"),
            "lineitem": load_table(spark, sf_dir, "lineitem"),
            "nation": load_table(spark, sf_dir, "nation"),
        }
    )
    out = Pipeline(
        [
            Filter("lineitem", F.col("l_returnflag") == "R"),
            Join("customer", "nation", "cn", on=F.col("c_nationkey") == F.col("n_nationkey"), broadcast=True),
            Join("orders", "cn", "ocn", on=F.col("o_custkey") == F.col("c_custkey")),
            Join("lineitem", "ocn", "locn", on=F.col("l_orderkey") == F.col("o_orderkey")),
            Agg(
                "locn",
                "rev",
                by=["c_custkey", "c_name", "n_name"],
                aggs={
                    "revenue": F.sum(
                        _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
                    ).cast("double")
                },
            ),
            TopK("rev", "top", k=20, order_by=[F.col("revenue").desc(), F.col("c_custkey")]),
        ]
    )(flow)
    return out["top"]


@_q(
    "daily_active_users",
    """
SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_us,
  COUNT(DISTINCT user_id) AS dau,
  COUNT(*) AS n_events
FROM events GROUP BY 1
""",
)
def daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users: event-time bucketing + exact distinct — the
    standard engagement rollup (two-level agg: distinct expands then
    collapses; at extreme scale swap approx_count_distinct)."""
    flow = Flow({"events": load_table(spark, sf_dir, "events")})
    out = Pipeline(
        [
            Transformer(
                "events",
                select={
                    "day_us": F.unix_micros(F.date_trunc("day", F.col("ts"))),
                    "user_id": "user_id",
                },
            ),
            Agg(
                "events",
                "dau",
                by=["day_us"],
                aggs={"dau": F.countDistinct("user_id"), "n_events": F.count("*")},
            ),
        ]
    )(flow)
    return out["dau"]


@_q(
    "rolling_7d_revenue",
    """
SELECT o_orderkey, o_custkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS rev_7d
FROM orders
""",
)
def rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (rolling 7-day revenue per customer) —
    the frame-based sliding window the reference can only emulate with
    an acc (window_test.exs); one shuffle on the partition key, frames
    evaluated with a sliding aggregate, no self-join."""
    from pyspark.sql import Window as W

    flow = Flow({"orders": load_table(spark, sf_dir, "orders")})
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-604800, 0)
    )
    out = Transformer(
        "orders",
        select={
            "o_orderkey": "o_orderkey",
            "o_custkey": "o_custkey",
            "rev_7d": F.sum(_dec("o_totalprice")).over(w).cast("double"),
        },
    )(flow)
    return out["orders"]


@_q(
    "cosine_lsh_pairs",
    """
SELECT a.vec_id AS d1, b.vec_id AS d2,
  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < 500 AND b.vec_id < 500
  AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.3
""",
)
def cosine_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-quadratic cosine near-dup pairs via sign-LSH buckets with
    exact verification — the embedding-side scale path (SCALE.md).
    Run here in a recall-1 demo config so the full LSH machinery —
    seeded hyperplanes, per-table signatures, bucket equi-join,
    first-match-table dedup, exact verify — produces the exact pair
    set and is hash-checked against the DuckDB all-pairs oracle.

    Config honesty (revised after the sf0.1 robustness sweep): the r4
    config (48 tables × 4 bits, full table) measured zero misses at
    500 vectors but missed 10/14,922 pairs at 2,000 — seeded-LSH
    recall at θ=0.3 is only ~1-5e-3 per near-threshold pair short of
    certain.  Because the driver regenerates testdata between rounds,
    the registered artifact now (a) fixes the corpus at 500 vectors
    (`vec_id < 500`, both engines) and (b) doubles tables to 96×4,
    putting the expected miss count near 5e-3 on ANY regenerated
    corpus rather than relying on one seed's luck.  Full-table LSH at
    production thresholds is benched as `cosine_lsh_prod`; sparser
    configs are recall-tested in tests/test_llm_ops.py."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    flow = Flow({"emb": emb})
    return CosineLSHJoin("emb", "pairs", dim=64, threshold=0.3, n_tables=96, bits_per_table=4)(
        flow
    )["pairs"]


@_q(
    "cosine_lsh_prod",
    """
WITH uni AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 10000000 AS vec_id,
         list_transform(embedding::DOUBLE[], x -> x * 2.0) AS v
  FROM embeddings WHERE vec_id < 10
)
SELECT a.vec_id AS d1, b.vec_id AS d2,
  round(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM uni a JOIN uni b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.9
""",
)
def cosine_lsh_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION CosineLSHJoin config — since r11 the AUTO
    defaults: bits_per_table from one corpus count (bounded bucket
    occupancy — the fixed-bits pinned config DNF'd the sf10 probe on
    75 GB of candidate shuffle), n_tables from the SRP S-curve at the
    0.9 threshold under the 0.9 recall target.  This registered row
    therefore exercises the per-SF auto resolution exactly as a 100-TB
    run would; `cosine_lsh_pairs` keeps the recall-1 demo config
    (48×4, θ=0.3) for exact oracle verification of non-empty output
    from the same machinery.

    Recall-side oracle (r14 — the r13 verdict's task 5): the raw
    corpus has NO pair above cosine 0.6 (measured: max 0.51 at sf0.01,
    0.60 at sf0.1), so the truth set used to be empty and the oracle
    certified precision only.  Both engines now plant ×2.0-SCALED
    copies of the 10 lowest-id vectors under shifted ids: ×2 is a pure
    exponent bump, exact in float32 AND double, so the copy is
    bit-deterministic in both engines, non-identical as a vector, and
    direction-identical — cosine exactly 1.0 ≥ θ and every SRP sign
    bit equal, so each planted pair collides in EVERY table regardless
    of the resolved (n_tables, bits).  The truth set is exactly the 10
    planted pairs at any SF (scaling preserves all other cosines), and
    the full-set hash match now certifies RECALL (all 10 found,
    deterministically) and PRECISION (nothing spurious) in one row.
    A near-threshold plant (cos ≈ 0.92) cannot be registered honestly:
    per-pair SRP collision at the 0.9 recall target is probabilistic
    over the driver-regenerated corpus, so an exact-set oracle would
    be flaky by design — near-threshold recall is covered statistically
    in tests/test_llm_ops.py and by `lsh_auto_recall_floor`."""
    emb = load_table(spark, sf_dir, "embeddings")
    keep = [c for c in emb.columns if c not in ("vec_id", "embedding")]
    planted = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(2.0)).cast("float")
        ).alias("embedding"),
        *keep,
    )
    flow = Flow({"emb": emb.unionByName(planted)})
    return CosineLSHJoin("emb", "pairs", dim=64, threshold=0.9)(flow)["pairs"]


@_q(
    "lsh_auto_recall_floor",
    """
SELECT CAST(20 AS BIGINT) AS n_planted, CAST(20 AS BIGINT) AS n_found,
       CAST(1 AS BIGINT) AS recall_ok
""",
)
def lsh_auto_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-verifying recall row for the AUTO CosineLSHJoin sizing:
    plant 20 identical copies of the lowest-id embeddings under
    shifted ids, run the auto config at θ=0.99, and count how many
    planted (id, id+10⁷) pairs come back.  The count is DETERMINISTIC,
    not probabilistic: an identical vector has every sign bit equal,
    so the pair collides in EVERY table regardless of the resolved
    (n_tables, bits) — recall on exact duplicates is 1.0 by
    construction at any SF, which is what lets the oracle be a
    constant row.  A miss means a real bucketing/verify regression.
    Corpus pairs can't contaminate the count: the planted-pair filter
    (d2 = d1 + 10⁷, d1 < 20) admits only the planted set.

    ``n_planted`` is COUNTED from the planted frame (cross-joined
    1-row stat, the repo's adjudicated form), not hardcoded (r12
    ADVICE): if a future corpus lacks some vec_ids 0..19 the row still
    goes red against the constant-20 oracle, but now n_planted itself
    shows the plant was short — distinguishing a fixture drift from a
    real recall regression."""
    emb = load_table(spark, sf_dir, "embeddings")
    keep = [c for c in emb.columns if c != "vec_id"]
    planted = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), *keep
    )
    pairs = CosineLSHJoin("e", "p", dim=64, threshold=0.99)(
        Flow({"e": emb.unionByName(planted)})
    )["p"]
    n_found = pairs.filter(
        (F.col("d2") == F.col("d1") + 10_000_000) & (F.col("d1") < 20)
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_found"))
    n_planted = planted.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_planted")
    )
    return n_found.crossJoin(n_planted).select(
        "n_planted",
        "n_found",
        F.when(F.col("n_found") == F.col("n_planted"), F.lit(1))
        .otherwise(F.lit(0)).cast("bigint").alias("recall_ok"),
    )


@_q(
    "semdedup_dup_floor",
    """
SELECT CAST(20 AS BIGINT) AS n_planted, CAST(20 AS BIGINT) AS n_flagged,
       CAST(1 AS BIGINT) AS dup_ok
""",
)
def semdedup_dup_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-verifying floor for the AUTO-k SemDeDup (r12): plant 20
    identical copies of the lowest-id embeddings under shifted ids
    (+10⁷), run the PRODUCTION path (kmeans centroids, n_clusters=None
    → k = ⌈N/target_cluster_rows⌉ from one corpus count), and require
    every planted copy to come back ``is_dup``.  The check is
    DETERMINISTIC at any resolved k: an identical vector normalizes
    identically, scores identically against every centroid (round-6
    cosine, first-max tie-break), so original and copy ALWAYS land in
    the same cluster, where their round-6 cosine is exactly 1.0 ≥ any
    threshold and the copy (larger id) is flagged by the strict
    lower-triangle rule.  A miss means a real regression in
    assignment, the per-cluster GEMM, or the auto-k resolution — not
    clustering luck.  This row is what certifies SemDeDup at decade
    SFs where the pinned-pivot ``semdedup_flags`` oracle's in-cluster
    quadratic replay is DuckDB-infeasible (tools/big_sweep.py
    INVARIANT_COVER), and the auto-k it exercises is the fix for the
    Σcᵢ²=N²/k quadratic at fixed k (dedup.py:SemDeDup docstring).
    ``n_planted`` is counted from the planted frame (cross-joined
    1-row stat) so a short plant is distinguishable from a flagging
    regression."""
    from strom_spark import SemDeDup

    emb = load_table(spark, sf_dir, "embeddings")
    keep = [c for c in emb.columns if c != "vec_id"]
    planted = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), *keep
    )
    flags = SemDeDup(
        "e", "f", threshold=0.95, n_clusters=None, centroids="kmeans"
    )(Flow({"e": emb.unionByName(planted)}))["f"]
    n_flagged = flags.filter(
        (F.col("vec_id") >= 10_000_000) & F.col("is_dup")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_flagged"))
    n_planted = planted.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_planted")
    )
    return n_planted.crossJoin(n_flagged).select(
        "n_planted",
        "n_flagged",
        F.when(F.col("n_flagged") == F.col("n_planted"), F.lit(1))
        .otherwise(F.lit(0)).cast("bigint").alias("dup_ok"),
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
"""


@_q("q4_order_priority", _Q4_SQL)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape through the SQL component (the full-SQL escape
    hatch the reference lacks, SURVEY §2.3): the same text runs on
    Spark and the DuckDB oracle.  Catalyst rewrites the correlated
    EXISTS to a left-semi join (shuffle on l_orderkey)."""
    flow = Flow(
        {
            "orders": load_table(spark, sf_dir, "orders"),
            "lineitem": load_table(spark, sf_dir, "lineitem"),
        }
    )
    return SQLComponent("q4", _Q4_SQL)(flow)["q4"]


@_q(
    "ann_ivf",
    """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings),
s AS (
  SELECT qid, nid, round(list_cosine_similarity(qv, cv), 6) AS cosine
  FROM q CROSS JOIN c WHERE qid != nid
),
r AS (
  SELECT qid AS query_id, nid AS neighbor_id, cosine,
    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
  FROM s
)
SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5
""",
)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nearest neighbors — the sub-linear scale path next to
    knn_topk's brute force (SURVEY §7.2.7).  Run here with
    n_probe == n_centroids, where IVF degrades to exact search — the
    full machinery (centroid training, assignment scan, probe join,
    rerank) runs and the result is oracle-checkable.  The approximate
    configs (n_probe < n_centroids) are recall-tested in
    tests/test_superset_ops.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    flow = Flow({"corpus": emb, "queries": emb.filter(F.col("vec_id") < 10)})
    return IVFTopK(
        "corpus", "queries", "ann", k=5, n_centroids=16, n_probe=16
    )(flow)["ann"]


@_q(
    "ann_recall_floor",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
  CAST(10 AS BIGINT) AS k,
  CAST(1 AS BIGINT) AS auto_recall_ok,
  CAST(1 AS BIGINT) AS full_probe_exact
FROM embeddings WHERE vec_id < 20
""",
)
def ann_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN retrieval QUALITY as a driver-checked flag row (the
    determinism rows ann_ivf/knn_topk can't see a recall regression):

    - ``auto_recall_ok``: recall@10 of IVF at the PRODUCTION DEFAULT
      — n_centroids auto-sized to k≈sqrt(N), n_probe ceil(k/4) (25%
      scan fraction), with the r11 small-N guard: below min_ivf_n=1024
      corpus rows auto falls back to exact search (n_probe=k), because
      a few-hundred-vector corpus is one broadcast batch and IVF can't
      win (similarity.py:IVFTopK._resolve) — vs brute-force CosineTopK
      ground truth must be >= 0.55.  The corpus is near-RANDOM
      vectors, the IVF worst case; measured at the auto setting:
      1.0 (sf0.01, 500 rows -> exact via the guard), 0.675 (sf0.1,
      45 lists/12 probes), 0.850 (sf1.0, 141/36) — recall RISES with
      N at a fixed scan fraction because more lists localize
      neighbors better (the r9 curve, SCALE.md), which is why sqrt(N)
      is the production default.  The floor sits ~3.8 binomial sigma
      below the smallest IVF-mode operating point (0.675 at sf0.1,
      sd ≈ 0.033 over 200 gt pairs).  Real embedding corpora cluster,
      which only raises recall.
    - ``full_probe_exact``: n_probe == n_centroids must degrade to
      EXACT search — zero symmetric difference against ground truth
      on (query_id, neighbor_id, cosine, rank).

    Both flags recompute per run, so the oracle's constant 1s flip
    red on any regression in centroid training, probe assignment, or
    the rerank join (similarity.py:133)."""
    emb = load_table(spark, sf_dir, "embeddings")

    def queries():
        return emb.filter(F.col("vec_id") < 20)

    cols = ["query_id", "neighbor_id", "cosine", "rank"]
    # gt feeds the recall join AND both sides of the exceptAll
    # symmetric difference, full feeds both sides — LAZY
    # localCheckpoints pin each tiny (n_queries x k) result so the
    # full-corpus GEMM scan and the IVF rerank run ONCE, not 3x/2x,
    # while plan_report/the topology sweep still see the real
    # pre-checkpoint plan (eager would execute at construction time).
    gt = (
        CosineTopK("c", "q", "o", k=10)(Flow({"c": emb, "q": queries()}))[
            "o"
        ]
        .select(*cols)
        .localCheckpoint(eager=False)
    )
    auto = IVFTopK("c", "q", "o", k=10)(  # production auto defaults
        Flow({"c": emb, "q": queries()})
    )["o"]
    full = (
        IVFTopK("c", "q", "o", k=10, n_centroids=16, n_probe=16)(
            Flow({"c": emb, "q": queries()})
        )["o"]
        .select(*cols)
        .localCheckpoint(eager=False)
    )

    marked = gt.join(
        auto.select("query_id", "neighbor_id").withColumn("__hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    stats = marked.groupBy(F.lit(1).alias("__k")).agg(
        F.count_distinct("query_id").alias("n_queries"),
        (
            F.sum(F.coalesce("__hit", F.lit(0))) / F.count(F.lit(1))
        ).alias("__recall"),
    )
    sym_diff = gt.exceptAll(full).unionAll(full.exceptAll(gt))
    diff_n = sym_diff.groupBy(F.lit(1).alias("__k")).agg(
        F.count(F.lit(1)).alias("__n_diff")
    )
    return stats.join(diff_n, "__k", "left").select(
        F.col("n_queries").cast("bigint"),
        F.lit(10).cast("bigint").alias("k"),
        (F.col("__recall") >= 0.55).cast("bigint").alias("auto_recall_ok"),
        (F.coalesce("__n_diff", F.lit(0)) == 0)
        .cast("bigint")
        .alias("full_probe_exact"),
    )


@_q(
    "ivf_index_search",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
  CAST(10 AS BIGINT) AS k,
  CAST(1 AS BIGINT) AS pruned_ok,
  CAST(1 AS BIGINT) AS matches_inmemory
FROM embeddings WHERE vec_id < 8
""",
)
def ivf_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED IVF index path proven end-to-end (similarity.py
    IVFIndex + ivf_search) — the layout that makes IVF pay at 100 TB:
    assignment is written ONCE, parquet-partitioned by centroid_id,
    and every later query load opens only its probed partitions.

    The fn builds the index at the r10 PRODUCTION DEFAULT — list
    count auto-sized to k≈sqrt(N) (IVFTopK._resolve; 22 lists at
    sf0.01, 45 at sf0.1, 141 at sf1.0), probing ceil(k/4) — searches
    it with 8 queries, and asserts two things that flip the row red
    on regression: (a) the index scan's plan carries a
    PartitionFilters entry on centroid_id naming FEWER than all k
    lists — actual partition pruning, not a full scan; (b) the pruned
    search returns EXACTLY the in-memory IVFTopK result for the same
    (seed, centroids, probes) — zero symmetric difference on
    (query_id, neighbor_id, cosine, rank).  Both are deterministic:
    training is seeded, the normalized vectors round-trip parquet
    float64 exactly, ranks tie-break on neighbor_id."""
    import re as _re

    from strom_spark import IVFIndex
    from strom_spark.operators.similarity import ivf_search

    emb = load_table(spark, sf_dir, "embeddings")
    # the same auto resolution the operator default applies — pinned
    # here so the index build, the search probes, and the in-memory
    # comparison all agree on one (k, n_probe)
    N_CENTROIDS = max(4, int(round(emb.count() ** 0.5)))
    N_PROBE = -(-N_CENTROIDS // 4)
    # ONE fixed per-sf path, overwritten each run (IVFIndex writes
    # mode=overwrite): growth across bench/correctness processes is
    # bounded at one directory per sf, vs the r6 pid-scoped scheme
    # that accumulated a dir per process.  The dir must OUTLIVE this
    # fn — the returned lazy plan scans it at action time — so no
    # mkdtemp+rm.  Concurrent same-sf runs would race on the rewrite;
    # bench and driver runs are sequential per-round, documented.
    path = f"/tmp/strom_spark_ivf_index_{_sf_tag(sf_dir)}"
    import glob as _glob
    import shutil as _shutil

    for legacy in _glob.glob(f"{path}_[0-9]*"):
        # r6 pid-scoped leftovers ONLY: require the suffix after the
        # fixed path to be exactly _<digits> — a bare [0-9]* glob also
        # matches ANOTHER sf's fixed dir when its tag extends ours with
        # digits (e.g. 'sf1' vs 'sf1.2' → _sf1 vs _sf1_2), which would
        # delete a live index out from under that sf's lazy plan
        if _re.fullmatch(r"_\d+", legacy[len(path):]):
            _shutil.rmtree(legacy, ignore_errors=True)
    IVFIndex("corpus", path, n_centroids=N_CENTROIDS)(Flow({"corpus": emb}))

    def queries():
        return emb.filter(F.col("vec_id") < 8)

    cols = ["query_id", "neighbor_id", "cosine", "rank"]
    pruned, probed = ivf_search(
        spark, path, queries(), k=10, n_probe=N_PROBE, return_probed=True
    )
    pruned = pruned.select(*cols)
    if not 0 < len(probed) < N_CENTROIDS:
        raise AssertionError(
            f"probe list covers {len(probed)} of {N_CENTROIDS} index "
            f"partitions — nothing was pruned: {probed}"
        )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    m = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    if not m or "centroid_id" not in m.group(1):
        raise AssertionError(
            "index scan carries no centroid_id partition filter:\n" + plan
        )
    # lazy checkpoints: computed once at first action (both exceptAll
    # branches reuse the persisted blocks), but nothing executes at
    # plan-construction time — plan_report/the topology sweep still
    # see (and audit) the real pre-checkpoint plan.
    pruned = pruned.localCheckpoint(eager=False)
    mem = (
        IVFTopK("c", "q", "o", k=10, n_centroids=N_CENTROIDS, n_probe=N_PROBE)(
            Flow({"c": emb, "q": queries()})
        )["o"]
        .select(*cols)
        .localCheckpoint(eager=False)
    )
    diff = pruned.exceptAll(mem).unionAll(mem.exceptAll(pruned))
    diff_n = diff.groupBy(F.lit(1).alias("__k")).agg(
        F.count(F.lit(1)).alias("__n_diff")
    )
    stats = pruned.groupBy(F.lit(1).alias("__k")).agg(
        F.count_distinct("query_id").alias("n_queries")
    )
    return stats.join(diff_n, "__k", "left").select(
        F.col("n_queries").cast("bigint"),
        F.lit(10).cast("bigint").alias("k"),
        F.lit(1).cast("bigint").alias("pruned_ok"),
        (F.coalesce("__n_diff", F.lit(0)) == 0)
        .cast("bigint")
        .alias("matches_inmemory"),
    )


@_q(
    "lsh_recall_floor",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
  CAST(1 AS BIGINT) AS recall_ok,
  CAST(1 AS BIGINT) AS precision_ok
FROM embeddings WHERE vec_id < 50
""",
)
def lsh_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CosineLSHJoin retrieval QUALITY at a PINNED θ=0.9 config
    (8 tables × 12 bits — the fixed-width demo twin of the auto-sized
    `cosine_lsh_prod`, which since r14 carries its own deterministic
    scaled-copy truth set) as a driver-checked flag row, mirroring
    `ann_recall_floor` for IVF.  This row PLANTS 50 NON-IDENTICAL
    near-duplicates so recall at a near-threshold operating point is
    measured on a non-empty truth set every round:

    - each corpus vector with vec_id < 50 gets a copy (id + 1_000_000)
      perturbed by a DETERMINISTIC pseudo-noise direction d with
      d_i = sin(131·vec_id + 17·i), scaled to 0.2·‖v‖ — true cosine
      (1+εc)/√(1+2εc+ε²) ≈ 0.98 for ε=0.2, |c|≲0.3, far above θ.
      Pure Column HOFs (sequence/transform/zip_with/aggregate), no
      Python in the plant.
    - ``recall_ok``: ≥ 0.80 of the 50 planted pairs must surface.  At
      cosine 0.98 the sign-LSH collision probability is ~0.99 per pair
      (p_bit = 1-θ_angle/π ≈ 0.936, 1-(1-p_bit^12)^8), so expected
      misses ≈ 0.4/50 on ANY regenerated corpus — the floor is ~10
      binomial σ below the mean, failing only on a real regression in
      hyperplane seeding, signature packing, or the bucket join.
    - ``precision_ok``: zero emitted pairs outside the planted set.
      The operator exact-verifies candidates, so an extra pair means
      either a verify regression or a natural ≥0.9 pair (max natural
      cross-similarity vs a planted copy is ≈(0.6+ε)/√(1+ε²) ≈ 0.78).

    The oracle's constants flip the row red on any regression; only
    n_planted is data-derived (count of vec_id < 50).

    Bounded at ``_EMB_DEMO_CAP`` (r14): at the PINNED 8x12 config the
    candidate volume grows ~ N²/2^bits (r12 sf10: 187.3s, decade ratio
    56.9 even after the spread fix), so the corpus is capped at the
    certified sf1.0 size — seeding/packing/bucket-join recall is
    config-local, not corpus-size-local, and the planted pairs (ids
    < 50) are untouched by the cap.  Full-corpus auto-sized recall at
    decade SFs is lsh_auto_recall_floor."""
    N_PLANT, EPS, DIM = 50, 0.2, 64
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _EMB_DEMO_CAP)
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
    )
    d = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda i: F.sin(
            F.col("vec_id").cast("double") * F.lit(131.0)
            + i.cast("double") * F.lit(17.0)
        ),
    )
    sq = lambda acc, x: acc + x * x  # noqa: E731
    scale = (
        F.lit(EPS)
        * F.sqrt(F.aggregate("embedding", F.lit(0.0), sq))
        / F.sqrt(F.aggregate(d, F.lit(0.0), sq))
    )
    planted = emb.filter(F.col("vec_id") < N_PLANT).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.zip_with("embedding", d, lambda x, e: x + scale * e).alias(
            "embedding"
        ),
    )
    # spread: the pinned path does no auto rebalance, and the
    # single-row-group embeddings scan would otherwise run the whole
    # signature GEMM in ONE task at decade SF (r12: 746.7s at sf10 for
    # a 219.7s sf1.0 base; the row-group-aware spread() is the fix)
    corpus = spread(emb.unionByName(planted))
    pairs = CosineLSHJoin(
        "c", "pairs", dim=DIM, threshold=0.9, n_tables=8, bits_per_table=12
    )(Flow({"c": corpus}))["pairs"]
    is_planted = (F.col("d2") == F.col("d1") + 1_000_000) & (
        F.col("d1") < N_PLANT
    )
    pair_stats = pairs.groupBy(F.lit(1).alias("__k")).agg(
        F.sum(is_planted.cast("int")).alias("__hits"),
        F.sum((~is_planted).cast("int")).alias("__extra"),
    )
    planted_n = planted.groupBy(F.lit(1).alias("__k")).agg(
        F.count(F.lit(1)).alias("n_planted")
    )
    return planted_n.join(pair_stats, "__k", "left").select(
        F.col("n_planted").cast("bigint"),
        # floor derived from the ACTUAL planted count, not the
        # requested N_PLANT: a regenerated corpus smaller than N_PLANT
        # plants fewer pairs and a hardcoded 40-hit bar would be
        # unreachable at perfect recall
        (
            F.coalesce("__hits", F.lit(0))
            >= F.ceil(F.lit(0.80) * F.col("n_planted"))
        )
        .cast("bigint")
        .alias("recall_ok"),
        (F.coalesce("__extra", F.lit(0)) == 0)
        .cast("bigint")
        .alias("precision_ok"),
    )


@_q(
    "minhash_recall_floor",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
  CAST(1 AS BIGINT) AS recall_ok,
  CAST(1 AS BIGINT) AS verified_ok
FROM documents
WHERE doc_id < 40 AND array_length(string_split(text, ' ')) >= 60
""",
)
def minhash_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSHPairs retrieval QUALITY as a driver-checked flag row —
    completes the recall-gate trio (`ann_recall_floor` for IVF,
    `lsh_recall_floor` for CosineLSH; dedup.py:MinHashLSHPairs had no
    driver-checked recall row until round 8).  The corpus's natural
    near-dups vary under regeneration, so truth is PLANTED:

    - every document with doc_id < 40 and ≥ 60 space-words gets a copy
      (id + 1_000_000) with three UNIQUE tag words appended
      (`zqa<id> zqb<id> zqc<id>`) — purely additive, so shingle-set
      Jaccard = S/(S+5) ≥ 0.92 for S ≥ 57 3-shingles (the word floor
      guarantees it), comfortably above the 0.8 operator threshold.
      Tags embed the id so planted copies never pair with each other.
    - ``recall_ok``: ≥ 0.80 of planted (orig, copy) pairs must surface
      through the banded LSH — run at the AUTO banding (r12), which
      resolves 18 bands × 4 rows at threshold 0.8: P(catch | J=0.92)
      = 1-(1-0.92⁴)^18 ≈ 1-1.5e-10 — a miss means a real regression in
      shingling, signatures, auto band resolution, or the verify
      join, not sampling luck.
    - ``verified_ok``: every EMITTED pair (planted or natural — the
      corpus contains genuine duplicates) carries exact Jaccard ≥ the
      0.8 threshold: the candidate-verify invariant (no false
      positives can escape the exact verify join).

    Only n_planted is data-derived; both flags are oracle constants
    that flip the driver row red on regression."""
    from strom_spark import MinHashLSHPairs

    N_PLANT, MIN_WORDS, THRESH = 40, 60, 0.8
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wc = F.size(F.split("text", " "))
    base = docs.filter((F.col("doc_id") < N_PLANT) & (wc >= MIN_WORDS))
    planted = base.select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.concat(
            "text",
            F.lit(" zqa"), F.col("doc_id").cast("string"),
            F.lit(" zqb"), F.col("doc_id").cast("string"),
            F.lit(" zqc"), F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    corpus = docs.unionByName(planted)
    pairs = MinHashLSHPairs(
        "c", "pairs", id_col="doc_id", text_col="text", k=3,
        threshold=THRESH, num_hashes=None, rows_per_band=None,
    )(Flow({"c": corpus}))["pairs"]
    is_planted = (F.col("d2") == F.col("d1") + 1_000_000) & (
        F.col("d1") < N_PLANT
    )
    pair_stats = pairs.groupBy(F.lit(1).alias("__k")).agg(
        F.sum(is_planted.cast("int")).alias("__hits"),
        F.min("jaccard").alias("__minj"),
    )
    planted_n = planted.groupBy(F.lit(1).alias("__k")).agg(
        F.count(F.lit(1)).alias("n_planted")
    )
    return planted_n.join(pair_stats, "__k", "left").select(
        F.col("n_planted").cast("bigint"),
        (
            F.coalesce("__hits", F.lit(0))
            >= F.ceil(F.lit(0.80) * F.col("n_planted"))
        )
        .cast("bigint")
        .alias("recall_ok"),
        (F.coalesce("__minj", F.lit(1.0)) >= F.lit(THRESH))
        .cast("bigint")
        .alias("verified_ok"),
    )


def _gopher_rep_oracle() -> str:
    """Monolithic DuckDB replica of functions/text.py:
    gopher_repetition_stats — generated programmatically: one gram/
    count/top or gram/count/dup-cover CTE chain per n, sharing the
    _NORM_DOCS tokenization.  All divisions CAST to DOUBLE (int/int is
    the identical IEEE op both engines); flags evaluate on the
    ROUNDED fractions, matching the Spark side exactly."""
    from strom_spark.functions.text import GOPHER_REPETITION_THRESHOLDS as THR

    parts = [
        "lf AS (SELECT doc_id, line, count(*) AS c "
        "FROM s, unnest(string_split(t, chr(10))) u(line) GROUP BY 1, 2)",
        "lfa AS (SELECT doc_id, "
        "CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dlf, "
        "CAST(sum((c - 1) * length(line)) AS DOUBLE) "
        "/ greatest(sum(c * length(line)), 1) AS dlcf "
        "FROM lf GROUP BY 1)",
        "pf AS (SELECT doc_id, para, count(*) AS c "
        "FROM s, unnest(string_split(t, chr(10) || chr(10))) u(para) "
        "GROUP BY 1, 2)",
        "pfa AS (SELECT doc_id, "
        "CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dpf, "
        "CAST(sum((c - 1) * length(para)) AS DOUBLE) "
        "/ greatest(sum(c * length(para)), 1) AS dpcf "
        "FROM pf GROUP BY 1)",
        "toksf AS (SELECT doc_id, list_filter(w, x -> x != '') AS w FROM toks)",
        "tch AS (SELECT doc_id, "
        "coalesce(length(array_to_string(w, '')), 0) AS tc FROM toksf)",
    ]
    for n in range(2, 11):
        parts.append(
            f"g{n} AS MATERIALIZED (SELECT doc_id, p.p AS p, "
            f"array_to_string(w[p.p + 1 : p.p + {n}], ' ') AS g "
            f"FROM toksf, unnest(range(0, greatest(len(w) - {n} + 1, 0))) p(p))"
        )
        parts.append(
            f"c{n} AS MATERIALIZED "
            f"(SELECT doc_id, g, count(*) AS c FROM g{n} GROUP BY 1, 2)"
        )
    for n in (2, 3, 4):
        parts.append(
            f"t{n} AS (SELECT doc_id, "
            f"CAST(c * (length(g) - {n - 1}) AS DOUBLE) AS topch "
            f"FROM (SELECT doc_id, c, g, row_number() OVER "
            f"(PARTITION BY doc_id ORDER BY c DESC, g) AS rn FROM c{n}) "
            f"WHERE rn = 1)"
        )
    for n in range(5, 11):
        parts.append(
            f"dp{n} AS (SELECT DISTINCT g.doc_id, g.p + o.off AS tp "
            f"FROM g{n} g, c{n} c, unnest(range(0, {n})) o(off) "
            f"WHERE g.doc_id = c.doc_id AND g.g = c.g AND c.c > 1)"
        )
        parts.append(
            f"dc{n} AS (SELECT d.doc_id, "
            f"CAST(sum(length(t.w[d.tp + 1])) AS DOUBLE) AS dch "
            f"FROM dp{n} d JOIN toksf t USING (doc_id) GROUP BY 1)"
        )
    frac_exprs = {
        "dup_line_frac": "round(coalesce(l.dlf, 0), 6)",
        "dup_line_char_frac": "round(coalesce(l.dlcf, 0), 6)",
        "dup_para_frac": "round(coalesce(pp.dpf, 0), 6)",
        "dup_para_char_frac": "round(coalesce(pp.dpcf, 0), 6)",
        **{
            f"top_{n}_gram_char_frac":
            f"round(coalesce(t{n}.topch, 0) / greatest(tch.tc, 1), 6)"
            for n in (2, 3, 4)
        },
        **{
            f"dup_{n}_gram_char_frac":
            f"round(coalesce(dc{n}.dch, 0) / greatest(tch.tc, 1), 6)"
            for n in range(5, 11)
        },
    }
    passed = " + ".join(
        f"CAST({frac_exprs[k]} <= {thr} AS INT)" for k, thr in THR.items()
    )
    sel = ",\n  ".join(f"{e} AS {k}" for k, e in frac_exprs.items())
    joins = (
        "FROM s LEFT JOIN lfa l USING (doc_id) "
        "LEFT JOIN pfa pp USING (doc_id) "
        "JOIN tch USING (doc_id) "
        + " ".join(f"LEFT JOIN t{n} USING (doc_id)" for n in (2, 3, 4))
        + " "
        + " ".join(f"LEFT JOIN dc{n} USING (doc_id)" for n in range(5, 11))
    )
    return (
        f"WITH {_NORM_DOCS},\n"
        "s AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),\n"
        + ",\n".join(parts)
        + f"\nSELECT s.doc_id,\n  {sel},\n"
        f"  CAST({passed} AS BIGINT) AS n_rules_passed,\n"
        f"  CAST(({passed}) = {len(THR)} AS BIGINT) AS repetition_pass\n"
        f"{joins}"
    )


@_q("gopher_repetition_flags", _gopher_rep_oracle())
def gopher_repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete published Gopher REPETITION rule set (Rae et al.
    2021 Table A1; functions/text.py:gopher_repetition_stats) per
    document: duplicate line/paragraph fractions (count + character
    forms), top-{2,3,4}-gram character fractions, and the
    overlap-guarded duplicate-{5..10}-gram character fractions (the
    SubstringDedup covered-position discipline), with the paper's 13
    thresholds folded into n_rules_passed + repetition_pass.
    Completes the Gopher pair: `gopher_quality_flags` is A1.1, this
    is A1's repetition half — together the full published gate.  All
    nine n-gram sizes ride ONE exploded (doc, n, pos, gram) pipeline;
    every shuffle keys on (doc, …).  Beyond-reference: training-data
    curation surface."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return TXT.gopher_repetition_stats(docs, "doc_id", "text")


@_q(
    "intra_doc_line_dedup",
    r"""
WITH g AS (
  SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS lines
  FROM documents
),
l AS (
  SELECT doc_id, lines[i] AS line, i
  FROM g, unnest(range(1, len(lines) + 1)) t(i)
),
f AS (SELECT doc_id, line, min(i) AS p FROM l GROUP BY doc_id, line),
c AS (
  SELECT doc_id, count(*) AS nd,
    coalesce(length(string_agg(line, chr(10) ORDER BY p)), 0) AS cc
  FROM f GROUP BY doc_id
)
SELECT g.doc_id,
  CAST(len(g.lines) AS BIGINT) AS n_lines,
  CAST(c.nd AS BIGINT) AS n_distinct_lines,
  CAST(c.cc AS BIGINT) AS cleaned_chars
FROM g JOIN c USING (doc_id)
""",
)
def intra_doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-LOCAL repeated-line collapse (functions/text.py:
    collapse_repeated_lines): keep the first occurrence of each
    distinct line WITHIN a document — the CCNet-style intra-page
    boilerplate dedup, complementing corpus-level `line_dedup_docs`
    (lines frequent across documents).  One narrow projection, zero
    shuffle, zero Python (`array_distinct` preserves first-occurrence
    order); the oracle replays it positionally (min-pos per line,
    order-preserving re-join).  Beyond-reference: training-data
    curation surface.  Per-line both-ways coverage over multi-line
    corpora is the hypothesis property test (the synthetic corpus is
    single-line, so every doc is a verified no-op here)."""
    flow = Flow({"docs": spread(load_table(spark, sf_dir, "documents"))})
    r = TXT.collapse_repeated_lines("text")
    out = Transformer(
        "docs",
        select={
            "doc_id": "doc_id",
            "n_lines": r["n_lines"],
            "n_distinct_lines": r["n_distinct_lines"],
            "cleaned_chars": r["cleaned_chars"],
        },
    )(flow)
    return out["docs"]


@_q(
    "approx_distinct_users",
    """
SELECT event_type,
  COUNT(DISTINCT user_id) AS exact_users,
  CAST(1 AS BIGINT) AS approx_err_ok
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the constant-memory
    distinct-count at 100 TB (superset op; exact distinct shuffles
    every key).  The HLL++ estimate is engine-specific, so it can never
    hash-match a cross-engine oracle directly; instead the registered
    artifact returns the EXACT per-group count (oracle-matchable) plus
    a flag asserting Spark's deterministic HLL estimate landed within
    the documented 5% relative error — the oracle asserts that flag as
    a constant 1, so a sketch regression flips the driver row red.
    Production use at scale is the sketch alone (see the error-bound
    pytest); the exact column here is the verification harness."""
    flow = Flow({"events": load_table(spark, sf_dir, "events")})
    # rsd=0.01, not the 0.05 default: the flag asserts a 5% bound, so
    # the sketch must run well INSIDE it — at sf0.1 the default-rsd
    # estimate measured 6.7% off (flag red), rsd=0.01 measured 0.47%
    # (a 10x margin).  Found by the sf0.1 robustness sweep; the driver
    # regenerates testdata between rounds, so the margin is what keeps
    # this row deterministic-green on unseen data.
    out = Agg(
        "events",
        "agg",
        by=["event_type"],
        aggs={
            "exact_users": F.countDistinct("user_id"),
            "approx_users": F.approx_count_distinct("user_id", 0.01),
        },
    )(flow)
    return (
        out["agg"]
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            )
            .cast("long")
            .alias("approx_err_ok"),
        )
        .orderBy("event_type")
    )


#: shared winnowing oracle (k=3-gram word hashes, window 4; mirrors
#: functions/text.py winnow() — windows fully inside for n>=w, global
#: min for 1<=n<w, empty otherwise)
_WINNOW_FPS = r"""
grams AS (
  SELECT doc_id, i, array_to_string(w[i:i+2], ' ') AS g
  FROM toks, unnest(range(1, len(w) - 1)) t(i)
  WHERE len(w) >= 3
),
hs AS (
  SELECT doc_id, i, ('0x' || substring(md5(g), 1, 8))::UBIGINT AS h FROM grams
),
counts AS (SELECT doc_id, count(*) AS n FROM hs GROUP BY doc_id),
wins AS (
  SELECT hs.doc_id,
    min(h) OVER (PARTITION BY hs.doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
    i, c.n
  FROM hs JOIN counts c ON hs.doc_id = c.doc_id
),
fps AS (
  SELECT DISTINCT doc_id, CAST(fp AS BIGINT) AS fp
  FROM wins WHERE i <= greatest(n - 3, 1)
)
"""


@_q(
    "winnow_fingerprints",
    rf"""
WITH {_NORM_DOCS},
{_WINNOW_FPS}
SELECT doc_id AS id, fp FROM fps
""",
)
def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (MOSS, SIGMOD'03): ordered
    3-gram hashes -> distinct window-4 minima — the position-robust
    contiguous-match fingerprint (operators/dedup.py
    WinnowFingerprints).  Pure Column expressions; zero Python."""
    flow = Flow({"docs": load_table(spark, sf_dir, "documents")})
    return WinnowFingerprints("docs", "fps", k=3, window=4)(flow)["fps"]


@_q(
    "winnow_overlap_pairs",
    rf"""
WITH {_NORM_DOCS},
{_WINNOW_FPS},
freq AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50
),
posting AS (SELECT doc_id, f.fp FROM fps f JOIN freq USING (fp))
SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
FROM posting a JOIN posting b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= 5
""",
)
def winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous-overlap pairs via shared winnowing fingerprints —
    the plagiarism/boilerplate detector next to the bag-similarity
    dedup family.  Inverted-index self-join on the fingerprint with a
    hot-fingerprint guard (drop fps in > 50 docs — the stop-shingle
    move from NgramJaccardPairs) so bucket sizes stay bounded at any
    corpus size; pairs sharing >= 5 fingerprints survive."""
    flow = Flow({"docs": load_table(spark, sf_dir, "documents")})
    fps = WinnowFingerprints("docs", "fps", k=3, window=4)(flow)["fps"]
    # fps feeds the hot-fp frequency agg AND both posting sides of the
    # self-join: pin the narrow (id, fp) frame once instead of running
    # the tokenize+3-gram-hash+window-min HOF chain per consumer (r14,
    # the shared-lineage rule; plan showed the documents scan 4x)
    from pyspark import StorageLevel

    from strom_spark.cache import track as _cache_track

    fps = fps.persist(StorageLevel.MEMORY_AND_DISK).transform(_cache_track)
    freq_ok = fps.groupBy("fp").agg(F.count("*").alias("__n")).filter(F.col("__n") <= 50).select("fp")
    posting = fps.join(freq_ok, "fp")
    a, b = posting.alias("a"), posting.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("d1"), F.col("b.id").alias("d2"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 5)
    )


@_q(
    "sample_split_counts",
    """
WITH b AS (
  SELECT doc_id, source,
    ('0x' || substring(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000 AS bucket
  FROM documents
),
s AS (
  SELECT source,
    CASE WHEN bucket < 8000 THEN 'train'
         WHEN bucket < 9000 THEN 'val'
         ELSE 'test' END AS split
  FROM b
)
SELECT split, COUNT(*) AS n, COUNT(DISTINCT source) AS n_sources
FROM s GROUP BY split ORDER BY split
""",
)
def sample_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (operators/sampling.py
    HashSplit): membership is a pure function of md5(salt||doc_id) —
    reproducible across runs, retries, repartitions AND engines; the
    oracle replays the identical bucket decision in DuckDB.  Spark's
    seeded sample() can't do any of that."""
    flow = Flow({"docs": load_table(spark, sf_dir, "documents")})
    from strom_spark import HashSplit

    out = HashSplit(
        "docs", "split", key_col="doc_id",
        splits={"train": 0.8, "val": 0.1, "test": 0.1},
    )(flow)["split"]
    return (
        out.groupBy("split")
        .agg(F.count("*").alias("n"), F.countDistinct("source").alias("n_sources"))
        .orderBy("split")
    )


@_q(
    "events_unpivot",
    """
WITH wide AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_us,
    COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
    COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
  FROM events GROUP BY day_us
)
SELECT day_us, event_type, n
FROM wide UNPIVOT (n FOR event_type IN (click, purchase, view))
WHERE n > 0
ORDER BY day_us, event_type
""",
)
def events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long melt, the inverse of events_pivot) via the
    native ``DataFrame.unpivot`` — a metadata-level expand, no shuffle
    beyond the pivot agg itself.  Zero-count cells are dropped on both
    engines (DuckDB's UNPIVOT keeps explicit zeros since the COUNT
    produced them; the WHERE n > 0 makes the long forms identical —
    documenting exactly where the two engines' melt semantics meet)."""
    events = load_table(spark, sf_dir, "events")
    types = ["click", "purchase", "view"]
    wide = (
        events.select(F.unix_micros(F.date_trunc("day", "ts")).alias("day_us"), "event_type")
        .groupBy("day_us")
        .pivot("event_type", types)
        .count()
        .select("day_us", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types])
    )
    return (
        wide.unpivot("day_us", types, "event_type", "n")
        .filter(F.col("n") > 0)
        .orderBy("day_us", "event_type")
    )


@_q(
    "user_event_paths",
    """
SELECT user_id,
  string_agg(event_type, '->' ORDER BY ts, event_id) AS path,
  COUNT(*) AS n_events
FROM events
WHERE user_id IS NOT NULL AND user_id % 10 = 0
GROUP BY user_id ORDER BY user_id
""",
)
def user_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-DETERMINISTIC array aggregation — the engine-parity
    subtlety behind every "user journey" query: collect_list has no
    guaranteed order in a distributed agg, so the sequence is rebuilt
    by collecting (ts, event_id, event_type) STRUCTS, array_sort-ing
    them (struct comparison is lexicographic, so (ts, event_id) is the
    total order), and projecting the event types into a joined path
    string.  The oracle states the same total order declaratively with
    ORDER BY inside string_agg.  One hash shuffle on user_id; the
    user_id % 10 slice keeps the output a bounded sample of journeys."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("user_id").isNotNull() & (F.col("user_id") % 10 == 0))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                "->",
            ).alias("path"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@_q(
    "mixture_sample_counts",
    """
WITH b AS (
  SELECT doc_id, source,
    ('0x' || substring(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000 AS bucket
  FROM documents
),
kept AS (
  SELECT source FROM b
  WHERE bucket < CASE source
    WHEN 'src0' THEN 10000
    WHEN 'src1' THEN 5000
    WHEN 'src2' THEN 2500
    WHEN 'src3' THEN 1000
    ELSE 3000 END
)
SELECT source, COUNT(*) AS n_kept
FROM kept GROUP BY source ORDER BY source
""",
)
def mixture_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-MIXING pass (operators/sampling.py MixtureSample): each
    source sampled at its own deterministic rate (src0 100%, src1 50%,
    src2 25%, src3 10%, everything else 30%) — the downsample-to-target-
    mixture step of corpus assembly.  Membership is the same portable
    md5-bucket pure function the other sampling ops use, so the exact
    kept set replays in the oracle; the plan is a narrow CASE-threshold
    filter on the scan, zero shuffle before the report agg."""
    from strom_spark import MixtureSample

    flow = Flow({"docs": load_table(spark, sf_dir, "documents")})
    out = MixtureSample(
        "docs", "mixed",
        key_col="doc_id", group_col="source",
        rates={"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1},
        default=0.3,
    )(flow)["mixed"]
    return (
        out.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("source")
    )


@_q(
    "temperature_mix_counts",
    """
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
r AS (
  SELECT source,
    CAST(round(pow(CAST(n AS DOUBLE) / CAST((SELECT MIN(n) FROM c) AS DOUBLE),
                   -0.5) * 10000) AS INT) AS thresh
  FROM c
),
b AS (
  SELECT d.source,
    ('0x' || substring(md5('tmix' || CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000 AS bucket,
    r.thresh
  FROM documents d JOIN r ON d.source IS NOT DISTINCT FROM r.source
)
SELECT source, COUNT(*) AS n_kept
FROM b WHERE bucket < thresh
GROUP BY source ORDER BY source
""",
)
def temperature_mix_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixing (operators/sampling.py TemperatureMix,
    alpha=0.5): kept rows per source become proportional to sqrt(n) —
    the standard multilingual/multi-source flattening.  Rates derive
    as (n_g/n_min)^(alpha-1), so the only float math is a power of an
    exact integer ratio (no cross-group sum whose ordering could
    perturb a threshold) and the md5-bucket membership replays exactly
    in the oracle."""
    from strom_spark import TemperatureMix

    flow = Flow({"docs": load_table(spark, sf_dir, "documents")})
    out = TemperatureMix(
        "docs", "mixed", key_col="doc_id", group_col="source", alpha=0.5
    )(flow)["mixed"]
    return (
        out.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("source")
    )


@_q(
    "balanced_source_cap",
    """
WITH b AS (
  SELECT doc_id, source,
    ('0x' || substring(md5('cap' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000 AS bucket
  FROM documents
),
r AS (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source ORDER BY bucket, doc_id) AS rk
  FROM b
)
SELECT doc_id, source, rk FROM r WHERE rk <= 10
""",
)
def balanced_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced downsampling (operators/sampling.py GroupCap): at most
    10 documents per source, chosen by a deterministic hash-shuffle of
    each group — the per-domain cap every web-scale corpus applies,
    replayable by the oracle.  One window shuffle on the group key."""
    from strom_spark import GroupCap
    from strom_spark.operators.sampling import bucket_of

    flow = Flow({"docs": load_table(spark, sf_dir, "documents")})
    out = GroupCap("docs", "capped", by="source", key_col="doc_id", n=10)(flow)["capped"]
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(bucket_of("doc_id", "cap"), F.col("doc_id"))
    return out.select(
        "doc_id", "source", F.row_number().over(w).alias("rk")
    )


@_q(
    "median_order_value",
    """
WITH ranked AS (
  SELECT o_orderpriority,
    CAST(o_totalprice AS DECIMAL(18,2)) AS price,
    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
    count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
),
mid AS (
  SELECT o_orderpriority, price FROM ranked
  WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT) OR rn = CAST(floor((n + 2) / 2) AS BIGINT)
)
SELECT o_orderpriority,
  CAST(SUM(price) AS DOUBLE) / COUNT(*) AS median_price
FROM mid GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed median per group — not approx_percentile:
    rank rows inside each group (one shuffle on the group key, fully
    parallel), pick the middle one or two, average them as exact
    decimals.  The same rank-then-select algorithm runs as the oracle,
    so the result is engine-portable where each engine's native
    median/percentile interpolation is not."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_orderpriority")
    ranked = orders.select(
        "o_orderpriority",
        _dec("o_totalprice").alias("price"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
    )
    return (
        mid.groupBy("o_orderpriority")
        .agg((F.sum("price").cast("double") / F.count("*")).alias("median_price"))
        .orderBy("o_orderpriority")
    )


@_q(
    "events_pivot",
    """
SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_us,
  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events GROUP BY day_us ORDER BY day_us
""",
)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): day × event-type count matrix via
    ``groupBy().pivot()`` with the value list EXPLICIT — Spark then
    skips the extra distinct-values pass and the plan is one
    partial+final agg, exactly what the conditional-sum oracle runs."""
    events = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        events.select(F.unix_micros(F.date_trunc("day", "ts")).alias("day_us"), "event_type")
        .groupBy("day_us")
        .pivot("event_type", types)
        .count()
    )
    return out.select(
        "day_us", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    ).orderBy("day_us")


@_q(
    "order_gap_days",
    """
SELECT o_custkey, o_orderkey,
  COALESCE(date_diff('day',
    lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
    o_orderdate), -1) AS gap_days
FROM orders
""",
)
def order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG window: days since the customer's previous order (first
    order -> -1 sentinel, keeping the column int64 in both engines).
    One shuffle on the customer key; ties broken by orderkey on both
    sides."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.coalesce(
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)),
            F.lit(-1),
        ).alias("gap_days"),
    )


@_q(
    "asof_next_purchase",
    """
WITH c AS (
  SELECT event_id AS click_id, user_id, ts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, ts, max(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.click_id, c.user_id,
  CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_us,
  COALESCE(p.purchase_id, -1) AS purchase_id,
  CAST(COALESCE(epoch_us(p.ts), -1) AS BIGINT) AS purchase_ts_us
FROM c ASOF LEFT JOIN p
  ON c.user_id = p.user_id AND c.ts <= p.ts
""",
)
def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (operators/asof.py direction='forward'):
    each click matched to the user's EARLIEST purchase at-or-after it —
    the conversion-lag building block, and the driver-checked
    counterpart of `asof_click_attribution`'s backward mode (DuckDB's
    native ASOF with a <= inequality picks the same nearest-after row).
    Same one-shuffle union-marker lowering, over the reversed time
    order."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    from strom_spark import AsofJoin

    out = AsofJoin(
        "clicks", "purchases", "attr",
        key="user_id", value_cols=["purchase_id"], direction="forward",
    )(Flow({"clicks": clicks, "purchases": purchases}))["attr"]
    return out.select(
        "click_id",
        "user_id",
        F.unix_micros("ts").alias("click_ts_us"),
        F.coalesce("purchase_id", F.lit(-1)).alias("purchase_id"),
        F.coalesce(F.unix_micros("matched_ts"), F.lit(-1)).alias("purchase_ts_us"),
    )


@_q(
    "embedding_norm_stats",
    """
SELECT label, COUNT(*) AS n_vecs,
  min(round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6)) AS min_norm,
  max(round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6)) AS max_norm
FROM embeddings GROUP BY label ORDER BY label
""",
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math on the embedding column WITHOUT Python: L2 norm as
    a JVM-side higher-order fold (`F.aggregate` over the double-cast
    array), grouped min/max per label.  Norms are rounded to 6 decimals
    on BOTH engines before the min/max, absorbing summation-order ulp
    differences (the same move the cosine oracles use) while keeping
    the aggregate order-independent.  At 100 TB this is the shape for
    any per-vector scalar: narrow codegen scan, one keyed agg."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    norm = F.round(
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)), 6
    )
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
        )
        .orderBy("label")
    )


@_q(
    "asof_click_attribution",
    """
WITH clicks AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
p AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id,
  CAST(epoch_us(p.ts) AS BIGINT) AS purchase_ts_us,
  COALESCE(c.click_id, -1) AS click_id,
  CAST(COALESCE(epoch_us(c.ts), -1) AS BIGINT) AS click_ts_us
FROM p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward AS-OF join (operators/asof.py): each purchase
    attributed to the user's latest click at-or-before it — checked
    against DuckDB's native ASOF LEFT JOIN.  Spark lowering is the
    union-marker window (one shuffle on user_id), not a range join or
    Python loop."""
    events = load_table(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    from strom_spark import AsofJoin

    out = AsofJoin(
        "purchases", "clicks", "attr",
        key="user_id", value_cols=["click_id"],
    )(Flow({"purchases": purchases, "clicks": clicks}))["attr"]
    # -1 sentinels for the no-match rows keep the nullable-bigint
    # columns int64 in BOTH engines' pandas frames (a NULL would flip
    # one side to float64/object and break the value-hash compare)
    return out.select(
        "purchase_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.coalesce("click_id", F.lit(-1)).alias("click_id"),
        F.coalesce(F.unix_micros("matched_ts"), F.lit(-1)).alias("click_ts_us"),
    )


@_q(
    "corpus_curation",
    rf"""
WITH {_NORM_DOCS},
feats AS (
  SELECT t.doc_id, d.source, md5(n.ntext) AS fp,
    len(list_filter(w, x -> x != '')) AS n_tok,
    len(regexp_extract_all(d.text, '[^A-Za-z0-9\s]')) AS n_punct,
    len(list_filter(w, x -> list_contains(['the','a','an','and','or','of','to','in','is','it'], x))) AS n_stop,
    len(list_distinct(w)) AS n_uniq,
    length(d.text) AS n_chars,
    len(list_filter(w, x -> list_contains(['the','and','of','to','in','is','a'], x))) AS s_en,
    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht'], x))) AS s_de,
    len(list_filter(w, x -> list_contains(['le','la','les','et','est','une'], x))) AS s_fr,
    len(list_filter(w, x -> list_contains(['el','los','las','y','es','una'], x))) AS s_es
  FROM toks t JOIN norm n ON t.doc_id = n.doc_id JOIN documents d ON t.doc_id = d.doc_id
),
scored AS (
  SELECT doc_id, source, fp,
    0.3 * least(n_tok / 100.0, 1.0)
      + 0.25 * least((n_stop / greatest(n_tok, 1)) * 5, 1.0)
      + 0.25 * (1.0 - least((n_punct / greatest(n_chars, 1)) * 10, 1.0))
      + 0.2 * (n_uniq / greatest(n_tok, 1)) AS q,
    CASE WHEN s_en > 0 AND s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
         WHEN s_de > 0 AND s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
         WHEN s_fr > 0 AND s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
         WHEN s_es > 0 AND s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
         ELSE 'und' END AS lang
  FROM feats
),
filt AS (SELECT * FROM scored WHERE lang = 'en' AND q >= 0.4),
keep AS (SELECT min(doc_id) AS doc_id FROM filt GROUP BY fp)
SELECT f.source, COUNT(*) AS n_kept,
  min(f.q) AS min_quality, max(f.q) AS max_quality
FROM filt f JOIN keep k ON f.doc_id = k.doc_id
GROUP BY f.source
ORDER BY f.source
""",
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data curation pipeline as ONE composed
    Flow: language-ID -> quality gate -> exact dedup (keep min id per
    content fingerprint) -> per-source report.  Every stage is a
    reusable component/expression from the library (langid + quality
    features + ExactDedup-style keep), the whole thing is one Catalyst
    plan: scan -> narrow scoring -> one fingerprint shuffle -> one
    source rollup.  min/max quality (order-independent doubles) keep
    the report hash-stable across engines.

    Dedup is a WINDOW (doc_id == min(doc_id) over fp), not the
    agg+semi-join ExactDedup uses for raw rows: here the join input is
    the expensive DERIVED scoring projection, and the self-join shape
    computed (and codegen-compiled) that whole HOF subtree twice —
    measured 9.5s cold / 3.3s warm at sf0.1 vs 3.0s / 2.2s windowed
    (this was r4's 'corpus_curation regression': real, not variance).
    The scored rows are slim (5 narrow columns), so one fp-shuffle of
    them beats recomputing the scoring; ExactDedup's semi-join remains
    right when the payload is wide and the input is a raw scan."""
    from pyspark.sql import Window as W

    flow = Flow({"docs": spread(load_table(spark, sf_dir, "documents"))})
    out = Pipeline(
        [
            Transformer(
                "docs",
                select={
                    "doc_id": "doc_id",
                    "source": "source",
                    "fp": TXT.fingerprint("text"),
                    "lang": TXT.lang_id("text"),
                    "q": TXT.quality_features("text")["quality_score"],
                },
            ),
            Filter("docs", (F.col("lang") == "en") & (F.col("q") >= 0.4)),
        ]
    )(flow)
    filt = out["docs"]
    dedup = filt.withColumn(
        "__min_id", F.min("doc_id").over(W.partitionBy("fp"))
    ).filter(F.col("doc_id") == F.col("__min_id"))
    return (
        dedup.groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("q").alias("min_quality"),
            F.max("q").alias("max_quality"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# D. TPC-H extension pack (shapes over the reduced test schema; no
# partsupp / shipmode / receiptdate columns exist, so Q2/Q9/Q11/Q12/
# Q16/Q20/Q21 are out of reach and Q12/Q22 run as adapted variants)
# --------------------------------------------------------------------------


@_q(
    "q7_nation_volume",
    """
SELECT supp_nation, cust_nation, l_year,
  CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    year(l.l_shipdate) AS l_year,
    CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): the
    bounded nation dim is filtered to the TWO nations and broadcast
    onto supplier/customer BEFORE the fact joins, so the fact side the
    shuffle sees is already 2/25ths of supplier/customer; the
    fact-fact joins carry no hints (AQE adapts)."""
    flow = Flow(
        {
            "supplier": load_table(spark, sf_dir, "supplier"),
            "customer": load_table(spark, sf_dir, "customer"),
            "orders": load_table(spark, sf_dir, "orders"),
            "lineitem": load_table(spark, sf_dir, "lineitem"),
            "n1": load_table(spark, sf_dir, "nation"),
            "n2": load_table(spark, sf_dir, "nation"),
        }
    )
    pair = ("NATION_1", "NATION_2")
    out = Pipeline(
        [
            Filter("n1", F.col("n_name").isin(*pair)),
            Transformer("n1", select={"nk1": "n_nationkey", "supp_nation": "n_name"}),
            Filter("n2", F.col("n_name").isin(*pair)),
            Transformer("n2", select={"nk2": "n_nationkey", "cust_nation": "n_name"}),
            Join("supplier", "n1", "sn", on=F.expr("s_nationkey = nk1"), broadcast=True),
            Join("customer", "n2", "cn", on=F.expr("c_nationkey = nk2"), broadcast=True),
            Join("lineitem", "sn", "lsn", on=F.expr("l_suppkey = s_suppkey")),
            Join("orders", "cn", "ocn", on=F.expr("o_custkey = c_custkey")),
            Join("lsn", "ocn", "all6", on=F.expr("l_orderkey = o_orderkey")),
            Filter("all6", F.col("supp_nation") != F.col("cust_nation")),
            Transformer(
                "all6",
                select={
                    "supp_nation": "supp_nation",
                    "cust_nation": "cust_nation",
                    "l_year": F.year("l_shipdate"),
                    "volume": _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")),
                },
            ),
            Agg(
                "all6",
                "q7",
                by=["supp_nation", "cust_nation", "l_year"],
                aggs={"revenue": F.sum("volume").cast("double")},
            ),
            Sort("q7", "supp_nation", "cust_nation", "l_year"),
        ]
    )(flow)
    return out["q7"]


@_q(
    "q8_market_share",
    """
SELECT o_year,
  CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
     / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM (
  SELECT year(o.o_orderdate) AS o_year,
    CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
    n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
)
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (market share of one supplying nation inside one
    region's customers, PROMO parts): region/nation force-broadcast
    (bounded); part filtered before its join (AQE broadcasts the
    filtered slice at small SF); share = exact decimal sums, one IEEE
    division per year."""
    flow = Flow(
        {
            t: load_table(spark, sf_dir, t)
            for t in ("part", "supplier", "customer", "orders", "lineitem", "region")
        }
        | {"n1": load_table(spark, sf_dir, "nation"), "n2": load_table(spark, sf_dir, "nation")}
    )
    out = Pipeline(
        [
            Filter("region", F.col("r_name") == "AMERICA"),
            Filter("part", F.col("p_type") == "PROMO"),
            Join("n1", "region", "nr", on=F.expr("n_regionkey = r_regionkey"), broadcast=True),
            Transformer("nr", select={"cust_nk": "n_nationkey"}),
            Transformer("n2", select={"supp_nk": "n_nationkey", "supp_nation": "n_name"}),
            Join("customer", "nr", "cn", on=F.expr("c_nationkey = cust_nk"), broadcast=True),
            Join("supplier", "n2", "sn", on=F.expr("s_nationkey = supp_nk"), broadcast=True),
            Join("lineitem", "part", "lp", on=F.expr("l_partkey = p_partkey")),
            Join("lp", "sn", "lps", on=F.expr("l_suppkey = s_suppkey")),
            Join("orders", "cn", "ocn", on=F.expr("o_custkey = c_custkey")),
            Join("lps", "ocn", "all8", on=F.expr("l_orderkey = o_orderkey")),
            Transformer(
                "all8",
                select={
                    "o_year": F.year("o_orderdate"),
                    "volume": _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")),
                    "supp_nation": "supp_nation",
                },
            ),
            Agg(
                "all8",
                "q8",
                by=["o_year"],
                aggs={
                    "mkt_share": (
                        F.sum(
                            F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                            .otherwise(F.lit(0).cast("decimal(18,2)"))
                        ).cast("double")
                        / F.sum("volume").cast("double")
                    ).cast("double")
                },
            ),
            Sort("q8", "o_year"),
        ]
    )(flow)
    return out["q8"]


@_q(
    "q12_late_shipment_priority",
    """
SELECT o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(late) AS BIGINT) AS n_late
FROM (
  SELECT o.o_orderkey, o.o_orderpriority,
    MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS late
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 spirit on the reduced schema (no shipmode/
    receiptdate): per priority class, how many orders had ANY line
    shipped more than 90 days after the order date.  Two-level agg:
    per-order max flag (shuffle on orderkey), then the tiny priority
    rollup."""
    flow = Flow(
        {
            "orders": load_table(spark, sf_dir, "orders"),
            "lineitem": load_table(spark, sf_dir, "lineitem"),
        }
    )
    out = Pipeline(
        [
            Join("orders", "lineitem", "ol", on=F.expr("o_orderkey = l_orderkey")),
            Agg(
                "ol",
                "per_order",
                by=["o_orderkey", "o_orderpriority"],
                aggs={
                    "late": F.max(
                        F.when(
                            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
                            1,
                        ).otherwise(0)
                    )
                },
            ),
            Agg(
                "per_order",
                "q12",
                by=["o_orderpriority"],
                aggs={
                    "n_orders": F.count("*"),
                    "n_late": F.sum("late").cast("bigint"),
                },
            ),
            Sort("q12", "o_orderpriority"),
        ]
    )(flow)
    return out["q12"]


@_q(
    "q13_customer_distribution",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT outer
    join with the filter INSIDE the join condition (customers with
    only urgent orders count as zero), two-level agg — custkey then
    the tiny distribution rollup."""
    flow = Flow(
        {
            "customer": load_table(spark, sf_dir, "customer"),
            "orders": load_table(spark, sf_dir, "orders"),
        }
    )
    out = Pipeline(
        [
            Join(
                "customer",
                "orders",
                "co",
                on=F.expr("c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'"),
                how="left",
            ),
            Agg("co", "per_cust", by=["c_custkey"], aggs={"c_count": F.count("o_orderkey")}),
            Agg("per_cust", "q13", by=["c_count"], aggs={"custdist": F.count("*")}),
            Sort("q13", F.col("custdist").desc(), F.col("c_count").desc(), ascending=True),
        ]
    )(flow)
    return out["q13"]


@_q(
    "q14_promo_revenue",
    """
SELECT CAST(
  100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
      THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
  / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
  AS DOUBLE) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1998-03-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promo revenue share in one month): ship-date
    range pushed to the lineitem scan; part join carries no hint (2k
    rows at sf0.01 — AQE broadcasts; at 100 TB part grows with SF and
    the join shuffles on partkey); exact decimal sums, one division."""
    flow = Flow(
        {
            "lineitem": load_table(spark, sf_dir, "lineitem"),
            "part": load_table(spark, sf_dir, "part"),
        }
    )
    lo = F.lit("1998-03-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-04-01 00:00:00").cast("timestamp")
    disc = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    out = Pipeline(
        [
            Filter("lineitem", (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)),
            Join("lineitem", "part", "lp", on=F.expr("l_partkey = p_partkey")),
            Agg(
                "lp",
                "q14",
                by=[],
                aggs={
                    "promo_revenue": (
                        F.lit(100.0)
                        * F.sum(
                            F.when(F.col("p_type") == "PROMO", disc)
                            .otherwise(F.lit(0).cast("decimal(18,2)"))
                        ).cast("double")
                        / F.sum(disc).cast("double")
                    ).cast("double")
                },
            ),
        ]
    )(flow)
    return out["q14"]


@_q(
    "q17_small_quantity_revenue",
    """
WITH brand_lines AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#23'
),
thresh AS (
  SELECT l_partkey AS pk,
    0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS qty_thresh
  FROM brand_lines GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(b.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
FROM brand_lines b JOIN thresh t ON b.l_partkey = t.pk
WHERE b.l_quantity < t.qty_thresh
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (revenue lost to small-quantity orders): the
    correlated avg-quantity subquery becomes a per-partkey pre-agg
    JOINED back — computed only over the brand's lineitems (the part
    filter semi-reduces lineitem first), so the agg and the self-join
    are candidate-sized at any SF."""
    flow = Flow(
        {
            "lineitem": load_table(spark, sf_dir, "lineitem"),
            "part": load_table(spark, sf_dir, "part"),
        }
    )
    out = Pipeline(
        [
            Filter("part", F.col("p_brand") == "Brand#23"),
            Join("lineitem", "part", "bl", on=F.expr("l_partkey = p_partkey")),
            Transformer(
                "bl",
                select={
                    "l_partkey": "l_partkey",
                    "l_quantity": "l_quantity",
                    "l_extendedprice": "l_extendedprice",
                },
            ),
        ]
    )(flow)
    bl = out["bl"].localCheckpoint(eager=False)
    thresh = (
        bl.groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            (
                F.lit(0.2)
                * (_avg(F.sum(_dec("l_quantity"))))
            ).alias("qty_thresh")
        )
    )
    joined = bl.join(thresh, bl.l_partkey == thresh.pk).filter(
        F.col("l_quantity") < F.col("qty_thresh")
    )
    return joined.agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
        .cast("double")
        .alias("avg_yearly")
    )


@_q(
    "q18_large_orders",
    """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
  strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
  CAST(o.o_totalprice AS DOUBLE) AS totalprice,
  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'), o.o_totalprice
HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 300
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): group on the order key
    with HAVING over the exact decimal quantity sum; distributed
    TakeOrdered for the top 100.

    r14 (guide §2.3 "aggregate before you shuffle"): the HAVING
    predicate depends ONLY on lineitem, so the per-order quantity sum
    runs FIRST — map-side partial aggregation over the two narrowest
    lineitem columns — and the >300 filter prunes the fact table down
    to the qualifying orderkeys BEFORE any join.  orders/customer then
    join a handful of rows instead of the full fact table, and the old
    5-wide-key re-aggregation (strings riding the shuffle as group
    keys) disappears entirely: o_orderkey is unique in orders, so
    attaching customer/order attributes after the agg is equivalent —
    the exact decimal sum per order is computed from the identical row
    set either way, proven against the unchanged DuckDB oracle.  At
    100 TB this is the difference between shuffling the whole fact
    table wide (plus customer attrs) and shuffling (orderkey, qty)
    pairs once."""
    flow = Flow(
        {
            "customer": load_table(spark, sf_dir, "customer"),
            "orders": load_table(spark, sf_dir, "orders"),
            "lineitem": load_table(spark, sf_dir, "lineitem"),
        }
    )
    out = Pipeline(
        [
            Agg(
                "lineitem",
                "oq",
                by=[F.col("l_orderkey")],
                aggs={"sum_qty_dec": F.sum(_dec("l_quantity"))},
            ),
            Filter("oq", F.col("sum_qty_dec") > 300),
            Join("orders", "oq", "ooq", on=F.expr("o_orderkey = l_orderkey")),
            Join("ooq", "customer", "ocl", on=F.expr("o_custkey = c_custkey")),
            TopK(
                "ocl",
                "q18",
                k=100,
                order_by=[
                    F.col("o_totalprice").cast("double").desc(),
                    F.col("o_orderkey"),
                ],
            ),
        ]
    )(flow)
    return out["q18"].select(
        "c_name", "c_custkey", "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("sum_qty_dec").cast("double").alias("sum_qty"),
    )


@_q(
    "q19_disjunctive_revenue",
    """
SELECT CAST(COALESCE(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 0) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunctive brand/size/quantity predicates):
    Catalyst extracts the common l_quantity/p_size bounds as
    scan-level filters and evaluates the OR post-join; the part side
    is pre-filtered to the three brands before joining."""
    flow = Flow(
        {
            "lineitem": load_table(spark, sf_dir, "lineitem"),
            "part": load_table(spark, sf_dir, "part"),
        }
    )
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    out = Pipeline(
        [
            Filter("part", F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")),
            Join("lineitem", "part", "lp", on=F.expr("l_partkey = p_partkey")),
            Filter("lp", cond),
            Agg(
                "lp",
                "q19",
                by=[],
                aggs={
                    "revenue": F.coalesce(
                        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))),
                        F.lit(0).cast("decimal(18,2)"),
                    ).cast("double")
                },
            ),
        ]
    )(flow)
    return out["q19"]


@_q(
    "q22_idle_high_balance",
    """
WITH thresh AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment, COUNT(*) AS numcust,
  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c, thresh t
WHERE c.c_acctbal > t.avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""",
)
def q22_idle_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 spirit on the reduced schema (no phone country
    codes): above-average-balance customers with NO recent orders —
    scalar-subquery threshold as a broadcast 1-row cross join, recent
    orders anti-joined (left_anti shuffles on custkey; the date filter
    is pushed to the orders scan).  Threshold is an exact decimal sum
    with ONE IEEE division, identical in both engines."""
    flow = Flow(
        {
            "customer": load_table(spark, sf_dir, "customer"),
            "orders": load_table(spark, sf_dir, "orders"),
        }
    )
    customer = flow["customer"]
    thresh = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg(_avg(F.sum(_dec("c_acctbal"))).alias("avg_bal"))
    )
    recent = flow["orders"].filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    idle = (
        customer.join(F.broadcast(thresh), F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@_q(
    "q15_top_supplier",
    """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.rev_dec AS DOUBLE) AS total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
WHERE r.rev_dec = (SELECT MAX(rev_dec) FROM rev)
ORDER BY s.s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier by quarterly revenue).  The CREATE VIEW
    of the spec becomes a reused DataFrame; the scalar MAX subquery is
    a 1-row aggregate broadcast-cross-joined back (no second scan of
    lineitem, no global sort).  Revenue equality is tested on the
    EXACT decimal sum — only the output casts to double."""
    flow = Flow(
        {
            "supplier": load_table(spark, sf_dir, "supplier"),
            "lineitem": load_table(spark, sf_dir, "lineitem"),
        }
    )
    q = flow["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = q.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("rev_dec")
    )
    mx = rev.agg(F.max("rev_dec").alias("mx"))
    winners = rev.join(F.broadcast(mx), F.col("rev_dec") == F.col("mx"))
    return (
        flow["supplier"]
        # winners is ~1 row at runtime but supplier-derived (not
        # provably bounded at plan time) — AQE broadcasts it from
        # runtime stats; only the scalar `mx` aggregate keeps a hint
        .join(winners, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", F.col("rev_dec").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@_q(
    "q21_waiting_supplier",
    """
WITH lf AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS is_late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lf l1 ON s.s_suppkey = l1.l_suppkey AND l1.is_late
WHERE EXISTS (
    SELECT 1 FROM lf l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lf l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.is_late)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
""",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting) on the
    reduced schema — lateness proxied by l_shipdate > o_orderdate+60d
    (no commit/receipt dates exist).  The spec's correlated EXISTS /
    NOT-EXISTS pair (two extra shuffled semi/anti joins of lineitem
    against itself) is rewritten as ONE per-order aggregate:

      n_supp      = count(DISTINCT supplier)         -- EXISTS other supp
      n_late_supp = count(DISTINCT supplier, late)   -- NOT EXISTS other late

    A late row waits iff n_supp >= 2 AND n_late_supp == 1 (its own
    supplier is the only late one).  Both the aggregate and the join
    back hash on l_orderkey, so AQE plans one exchange of lf instead
    of three."""
    flow = Flow(
        {
            "supplier": load_table(spark, sf_dir, "supplier"),
            "orders": load_table(spark, sf_dir, "orders"),
            "lineitem": load_table(spark, sf_dir, "lineitem"),
        }
    )
    f_orders = flow["orders"].filter(F.col("o_orderstatus") == "F")
    lf = (
        flow["lineitem"]
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
                "is_late"
            ),
        )
    )
    ord_stats = lf.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    waiting = (
        lf.filter(F.col("is_late"))
        .join(ord_stats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        # supplier grows with SF — no forced hint; AQE broadcasts it at
        # small SF and keeps the join exchange-based at 100 TB
        waiting.join(flow["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@_q(
    "q2_min_cost_supplier",
    """
WITH ps AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
    MIN(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY 1, 2
),
eur AS (
  SELECT ps.pk, ps.sk, ps.cost, s.s_acctbal, s.s_name, n.n_name
  FROM ps JOIN supplier s ON ps.sk = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
mins AS (SELECT pk, MIN(cost) AS mincost FROM eur GROUP BY pk)
SELECT CAST(e.s_acctbal AS DOUBLE) AS s_acctbal, e.s_name, e.n_name,
  p.p_partkey, p.p_brand, CAST(e.cost AS DOUBLE) AS supply_cost
FROM eur e JOIN mins m ON e.pk = m.pk AND e.cost = m.mincost
JOIN part p ON p.p_partkey = e.pk
WHERE p.p_type = 'LARGE'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier per part in a region).
    The schema has no partsupp table, so the part-supplier catalog is
    DERIVED: supply cost := min observed unit price
    (l_extendedprice/l_quantity) per (part, supplier) pair — one
    groupBy over lineitem.  The spec's correlated min-cost subquery
    becomes a window MIN over the region-filtered candidates
    partitioned by part: ONE shuffle on the part key instead of a
    re-evaluated subquery per output row.  Part is pre-filtered to the
    target type before the window so the windowed relation is
    candidate-sized; region/nation are the only forced broadcasts
    (fixed 5/25 rows at every SF), supplier/part joins stay
    declarative for AQE."""
    flow = Flow(
        {
            t: load_table(spark, sf_dir, t)
            for t in ("lineitem", "part", "supplier", "nation", "region")
        }
    )
    ps = (
        flow["lineitem"]
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    nr = flow["nation"].join(
        F.broadcast(flow["region"].filter(F.col("r_name") == "EUROPE")),
        F.expr("n_regionkey = r_regionkey"),
    )
    sup = flow["supplier"].join(F.broadcast(nr), F.expr("s_nationkey = n_nationkey"))
    large = flow["part"].filter(F.col("p_type") == "LARGE")
    eur = ps.join(sup, F.col("sk") == F.col("s_suppkey")).join(
        large, F.col("pk") == F.col("p_partkey")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("pk")
    best = eur.withColumn("mincost", F.min("cost").over(w)).filter(
        F.col("cost") == F.col("mincost")
    )
    out = TopK(
        "best",
        "q2",
        k=100,
        order_by=[
            F.col("s_acctbal").desc(),
            F.col("n_name"),
            F.col("s_name"),
            F.col("p_partkey"),
        ],
    )(Flow({"best": best}))
    return out["q2"].select(
        F.col("s_acctbal").cast("double").alias("s_acctbal"),
        "s_name",
        "n_name",
        "p_partkey",
        "p_brand",
        F.col("cost").cast("double").alias("supply_cost"),
    )


@_q(
    "q11_important_part_value",
    """
WITH asia_lines AS (
  SELECT l.l_partkey,
    CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS val
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'
),
tot AS (SELECT SUM(val) AS total FROM asia_lines)
SELECT l_partkey AS ps_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
FROM asia_lines, tot
GROUP BY l_partkey, tot.total
HAVING SUM(val) * 1000 > ANY_VALUE(tot.total)
""",
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (parts representing a significant fraction of
    total regional value; partsupp value proxied by the lineitem
    revenue of ASIA-supplied lines).  The global scalar subquery is a
    1-row aggregate attached by broadcast cross join — the allowlisted
    bounded-BNLJ scalar pattern — so the HAVING fraction test is a
    map-side filter, not a second pass.  Both the per-part agg and the
    total reuse the same decimal `val` column: comparisons are exact
    (no float threshold knife-edge cross-engine)."""
    flow = Flow(
        {
            t: load_table(spark, sf_dir, t)
            for t in ("lineitem", "supplier", "nation", "region")
        }
    )
    nr = flow["nation"].join(
        F.broadcast(flow["region"].filter(F.col("r_name") == "ASIA")),
        F.expr("n_regionkey = r_regionkey"),
    )
    sup = flow["supplier"].join(F.broadcast(nr), F.expr("s_nationkey = n_nationkey"))
    asia_lines = (
        flow["lineitem"]
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_partkey",
            (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("val"),
        )
    )
    tot = asia_lines.agg(F.sum("val").alias("total"))
    per_part = asia_lines.groupBy("l_partkey").agg(F.sum("val").alias("v"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(F.col("v") * 1000 > F.col("total"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("v").cast("double").alias("part_value"),
        )
    )


@_q(
    "q16_supplier_relationship",
    """
WITH excl AS (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0 OR s_suppkey % 7 = 0
)
SELECT p.p_brand, p.p_type, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#15' AND p.p_type <> 'MEDIUM'
  AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM excl)
GROUP BY 1, 2, 3
""",
)
def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (how many suppliers can supply each part
    class, excluding flagged suppliers; the comment-LIKE complaint
    filter is proxied by acctbal<0 OR suppkey%7=0 — no comment column
    exists).  NOT IN lowers to a LEFT ANTI join (the excluded-supplier
    set is SF-bounded small but left unhinted for AQE); the final
    COUNT(DISTINCT supplier) per (brand,type,size) makes a separate
    pair-dedup pass redundant — Catalyst plans the distinct-agg expand
    itself."""
    flow = Flow(
        {
            "lineitem": load_table(spark, sf_dir, "lineitem"),
            "part": load_table(spark, sf_dir, "part"),
            "supplier": load_table(spark, sf_dir, "supplier"),
        }
    )
    excl = flow["supplier"].filter(
        (F.col("s_acctbal") < 0) | (F.col("s_suppkey") % 7 == 0)
    ).select("s_suppkey")
    fp = flow["part"].filter(
        (F.col("p_brand") != "Brand#15")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    return (
        flow["lineitem"]
        .join(excl, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(fp, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "q20_potential_promotion",
    """
WITH blue AS (
  SELECT l.l_suppkey
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'blue%'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING 2 * SUM(CASE WHEN l.l_shipdate < TIMESTAMP '1998-07-01'
                      THEN CAST(l.l_quantity AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END)
         > SUM(CAST(l.l_quantity AS DECIMAL(18,2)))
)
SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AMERICA' AND s.s_suppkey IN (SELECT l_suppkey FROM blue)
ORDER BY s_name
""",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with surplus stock of a named part
    family; availqty proxied by early-shipped quantity — a (supplier,
    part) pair qualifies when more than half its total shipped
    quantity moved before mid-1998).  The nested IN becomes agg →
    LEFT SEMI join: part is pre-filtered by name BEFORE the lineitem
    join so the grouped relation is family-sized; quantity sums stay
    decimal and the half test is `2*early > total` (exact integer
    doubling, no float threshold).  Region/nation broadcast; the
    qualifying-supplier semi join is unhinted for AQE."""
    flow = Flow(
        {
            t: load_table(spark, sf_dir, t)
            for t in ("lineitem", "part", "supplier", "nation", "region")
        }
    )
    blue_parts = flow["part"].filter(F.col("p_name").like("blue%"))
    zero = F.lit(0).cast("decimal(18,2)")
    qual = (
        flow["lineitem"]
        .join(blue_parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.when(
                    F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp"),
                    _dec("l_quantity"),
                ).otherwise(zero)
            ).alias("early"),
            F.sum(_dec("l_quantity")).alias("total"),
        )
        .filter(F.col("early") * 2 > F.col("total"))
        .select("l_suppkey")
    )
    nr = flow["nation"].join(
        F.broadcast(flow["region"].filter(F.col("r_name") == "AMERICA")),
        F.expr("n_regionkey = r_regionkey"),
    )
    return (
        flow["supplier"]
        .join(F.broadcast(nr), F.expr("s_nationkey = n_nationkey"))
        .join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
        .orderBy("s_name")
    )


@_q(
    "q9_product_profit",
    """
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
    CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%widget%'
)
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation x year) minus the
    partsupp.ps_supplycost term (no partsupp table exists) — profit
    reduces to discounted revenue over name-matched parts.  nation is
    force-broadcast (bounded 25 rows); the p_name LIKE filter prunes
    part BEFORE its fact join so AQE can broadcast the filtered
    slice; fact-fact joins carry no hints."""
    flow = Flow(
        {
            t: load_table(spark, sf_dir, t)
            for t in ("part", "supplier", "orders", "lineitem", "nation")
        }
    )
    out = Pipeline(
        [
            Filter("part", F.col("p_name").like("%widget%")),
            Transformer("nation", select={"supp_nk": "n_nationkey", "nation": "n_name"}),
            Join("supplier", "nation", "sn", on=F.expr("s_nationkey = supp_nk"), broadcast=True),
            Join("lineitem", "part", "lp", on=F.expr("l_partkey = p_partkey")),
            Join("lp", "sn", "lps", on=F.expr("l_suppkey = s_suppkey")),
            Join("lps", "orders", "all9", on=F.expr("l_orderkey = o_orderkey")),
            Transformer(
                "all9",
                select={
                    "nation": "nation",
                    "o_year": F.year("o_orderdate"),
                    "amount": _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")),
                },
            ),
            Agg(
                "all9",
                "q9",
                by=["nation", "o_year"],
                aggs={"sum_profit": F.sum("amount").cast("double")},
            ),
        ]
    )(flow)
    return out["q9"].orderBy("nation", F.desc("o_year"))


@_q(
    "range_join_windows",
    """
WITH w AS (
  SELECT event_id AS win_id, user_id, ts AS ws,
         ts + INTERVAL 30 MINUTE AS we
  FROM events WHERE event_type = 'error'
),
p AS (
  SELECT event_id, user_id, ts, value
  FROM events WHERE event_type IN ('click', 'view')
)
SELECT w.win_id, w.user_id,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM w JOIN p
  ON p.user_id = w.user_id AND p.ts >= w.ws AND p.ts < w.we
GROUP BY w.win_id, w.user_id
""",
)
def range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join (operators/rangejoin.py): each
    error event opens a 30-minute incident window for its user; count
    and sum the user's click/view activity inside the window.  The
    lowering is bucketized (bucket = the window length): intervals
    explode to the <=2 buckets they touch, points land in exactly one,
    and the join is a plain equi-join on (bucket, user_id) — never a
    BroadcastNestedLoopJoin, so the plan survives 100 TB.  Beyond the
    reference surface (it joins only on key equality)."""
    from strom_spark import RangeJoin

    events = load_table(spark, sf_dir, "events")
    wins = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("win_id"),
        "user_id",
        F.col("ts").alias("ws"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("we"),
    )
    pts = events.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
        "value",
    )
    joined = RangeJoin(
        "pts", "wins", "hits",
        point="pts", right_start="ws", right_end="we",
        bucket=30 * 60 * 1_000_000, extra_on=["user_id"],
    )(Flow({"pts": pts, "wins": wins}))["hits"]
    return joined.groupBy("win_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


@_q(
    "range_join_overlap",
    """
WITH s AS (
  SELECT event_id AS sid, user_id, ts AS ss, ts + INTERVAL 2 HOUR AS se
  FROM events WHERE event_type = 'purchase'
),
i AS (
  SELECT event_id AS iid, user_id, ts AS "is", ts + INTERVAL 1 HOUR AS ie
  FROM events WHERE event_type = 'error'
)
SELECT s.sid, i.iid, s.user_id,
  CAST(epoch_us(least(s.se, i.ie)) - epoch_us(greatest(s.ss, i."is")) AS BIGINT)
    AS overlap_us
FROM s JOIN i
  ON s.user_id = i.user_id
 AND greatest(s.ss, i."is") < least(s.se, i.ie)
""",
)
def range_join_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap range join: 2-hour purchase sessions x 1-hour
    error incidents for the same user, one row per overlapping pair
    with the exact overlap length in microseconds.  Exactly-once pair
    emission comes from the canonical-shared-bucket trick (a pair is
    kept only in bucket max(floor(ls/w), floor(rs/w))) — zero dedup
    shuffle, unlike a dropDuplicates pass."""
    from strom_spark import RangeJoin

    events = load_table(spark, sf_dir, "events")
    sess = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("sid"),
        "user_id",
        F.col("ts").alias("ss"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("se"),
    )
    inc = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("iid"),
        F.col("ts").alias("is"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ie"),
        "user_id",
    )
    out = RangeJoin(
        "sess", "inc", "pairs",
        left_start="ss", left_end="se",
        right_start="is", right_end="ie",
        bucket=2 * 3600 * 1_000_000, extra_on=["user_id"],
    )(Flow({"sess": sess, "inc": inc}))["pairs"]
    return out.select(
        "sid",
        "iid",
        "user_id",
        (
            F.least(F.unix_micros("se"), F.unix_micros("ie"))
            - F.greatest(F.unix_micros("ss"), F.unix_micros("is"))
        ).alias("overlap_us"),
    )


@_q(
    "bm25_search",
    rf"""
WITH {_NORM_DOCS},
tw AS (SELECT doc_id, list_filter(w, x -> x != '') AS w FROM toks),
stats AS (SELECT count(*) AS n, avg(len(w)) AS avgdl FROM tw),
tf AS (
  SELECT doc_id, dl, t AS term, count(*) AS tf
  FROM (SELECT doc_id, len(w) AS dl, unnest(w) AS t FROM tw)
  WHERE t IN ('spark', 'window', 'merge')
  GROUP BY 1, 2, 3
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id,
    round(
      ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
      * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)),
      6) AS c
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
)
SELECT doc_id, CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) AS bm25
FROM contrib GROUP BY doc_id
""",
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag of query
    terms (operators/textrank.py:BM25Score).  One explode pass carries
    the doc length as a grouping column (no second full-corpus join);
    corpus stats and per-term df are broadcast; per-(doc,term)
    contributions are rounded and summed as DECIMAL so the score is
    independent of shuffle order.  Beyond-reference: corpus-level term
    statistics for relevance filtering of training data."""
    from strom_spark import BM25Score

    docs = spread(load_table(spark, sf_dir, "documents"))
    return BM25Score(
        "docs", "scored",
        id_col="doc_id", text_col="text",
        terms=["spark", "window", "merge"],
    )(Flow({"docs": docs}))["scored"]


@_q(
    "hybrid_rrf_search",
    rf"""
WITH {_NORM_DOCS},
tw AS (SELECT doc_id, list_filter(w, x -> x != '') AS w FROM toks),
stats AS (SELECT count(*) AS n, avg(len(w)) AS avgdl FROM tw),
tf AS (
  SELECT doc_id, dl, t AS term, count(*) AS tf
  FROM (SELECT doc_id, len(w) AS dl, unnest(w) AS t FROM tw)
  WHERE t IN ('spark', 'window', 'merge')
  GROUP BY 1, 2, 3
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id,
    round(
      ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
      * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)),
      6) AS c
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
),
bm AS (
  SELECT doc_id, CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) AS s
  FROM contrib GROUP BY doc_id
),
bmr AS (SELECT doc_id, row_number() OVER (ORDER BY round(s, 6) DESC, doc_id) AS rank FROM bm),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
cs AS (
  SELECT vec_id AS doc_id, round(list_cosine_similarity(qv, embedding::DOUBLE[]), 6) AS s
  FROM embeddings CROSS JOIN q WHERE vec_id != 0
),
csr AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rank FROM cs),
lists AS (
  SELECT doc_id, rank FROM bmr WHERE rank <= 20
  UNION ALL
  SELECT doc_id, rank FROM csr WHERE rank <= 20
)
SELECT doc_id,
  CAST(SUM(CAST(round(1.0 / (60 + rank), 6) AS DECIMAL(18,6))) AS DOUBLE) AS rrf_score,
  count(*) AS n_lists,
  min(rank) AS best_rank
FROM lists GROUP BY doc_id
""",
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval: Reciprocal Rank Fusion (Cormack et al. 2009;
    operators/similarity.py:RRFFusion) of a lexical BM25 ranking over
    ``documents.text`` and a dense cosine ranking of ``embeddings``
    against one query vector (vec_id 0; ids align 1:1 with doc_id) —
    the standard two-tower retrieval stack fused without score
    calibration, because only RANKS enter ``sum(1/(60+rank))``.

    Scale shape: each list is cut to top-20 by a distributed
    TakeOrderedAndProject (per-partition top-k + k-row merge — no
    global sort), so the ranking window and the fusion group-by only
    ever see <= 2×20 rows regardless of corpus size; the BM25 side
    carries its adjudicated 1-row stat attach and the cosine side the
    guard-bounded single-query broadcast scan (same bounds as
    bm25_search / knn_topk).  Contributions are rounded 6dp and summed
    as DECIMAL so the fused score is shuffle-order independent.
    Beyond-reference: retrieval surface for RAG-style data pipelines."""
    from strom_spark import BM25Score, RRFFusion

    docs = spread(load_table(spark, sf_dir, "documents"))
    emb = load_table(spark, sf_dir, "embeddings")
    bm = BM25Score(
        "docs", "bm", id_col="doc_id", text_col="text",
        terms=["spark", "window", "merge"],
    )(Flow({"docs": docs}))["bm"]
    vec = CosineTopK(
        "corpus", "queries", "vec", k=20,
    )(Flow({"corpus": emb, "queries": emb.filter(F.col("vec_id") == 0)}))["vec"]
    vec = vec.select(F.col("neighbor_id").alias("doc_id"), "cosine")
    return RRFFusion(
        ["bm", "vec"], "fused",
        id_col="doc_id", score_cols=["bm25", "cosine"], k0=60, per_list_k=20,
    )(Flow({"bm": bm, "vec": vec}))["fused"]


def _mmr_oracle(k: int = 5, lam: float = 0.7, n_q: int = 5, top_c: int = 20) -> str:
    """Generate the unrolled MMR greedy oracle: k MATERIALIZED
    selection rounds (DuckDB inlines plain CTEs per-reference —
    exponential here), each picking the argmax of
    round(lam*rel - (1-lam)*max_sim_to_selected, 6) with ties on the
    candidate id — the exact arithmetic MMRRerank's loop performs on
    the same 6dp-rounded cosines.  The combination runs in EXACT
    DECIMAL: lam*rel lands on a decimal half whenever rel is 6dp-
    rounded (0.7*0.371485 = 0.2600395), where double rounding diverges
    across engines; decimal products of 6dp inputs are exact, so
    HALF_UP to 6dp is engine-independent."""
    from decimal import Decimal

    l6 = str(Decimal(str(lam)))
    mu = str(Decimal("1") - Decimal(str(lam)))
    parts = [f"""
WITH qs AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {n_q}),
cs AS (
  SELECT qid, vec_id AS cid, round(list_cosine_similarity(qv, embedding::DOUBLE[]), 6) AS rel
  FROM embeddings CROSS JOIN qs WHERE vec_id != qid
),
c AS MATERIALIZED (
  SELECT qid, cid, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid) AS rn FROM cs
  ) WHERE rn <= {top_c}
),
vv AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
ps AS MATERIALIZED (
  SELECT x.qid, x.cid AS a, y.cid AS b, round(list_cosine_similarity(xv.v, yv.v), 6) AS s
  FROM c x JOIN c y ON x.qid = y.qid AND x.cid != y.cid
  JOIN vv xv ON xv.id = x.cid JOIN vv yv ON yv.id = y.cid
),
selacc_0 AS (SELECT qid, cid, 1 AS rank, 0.0 AS score FROM c WHERE false)"""]
    for i in range(1, k + 1):
        parts.append(f""",
scored_{i} AS MATERIALIZED (
  SELECT c.qid, c.cid,
    CAST(round(CAST({l6} AS DECIMAL(9,6)) * CAST(c.rel AS DECIMAL(18,6))
             - CAST({mu} AS DECIMAL(9,6)) * CAST(coalesce(m.ms, 0.0) AS DECIMAL(18,6)), 6) AS DOUBLE) AS score
  FROM c
  LEFT JOIN (
    SELECT ps.qid, ps.a AS cid, max(ps.s) AS ms
    FROM ps JOIN selacc_{i - 1} sp ON sp.qid = ps.qid AND sp.cid = ps.b
    GROUP BY ps.qid, ps.a
  ) m ON m.qid = c.qid AND m.cid = c.cid
  WHERE NOT EXISTS (SELECT 1 FROM selacc_{i - 1} sp WHERE sp.qid = c.qid AND sp.cid = c.cid)
),
sel_{i} AS MATERIALIZED (
  SELECT qid, cid, {i} AS rank, score FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rn FROM scored_{i}
  ) WHERE rn = 1
),
selacc_{i} AS MATERIALIZED (
  SELECT * FROM selacc_{i - 1} UNION ALL SELECT qid, cid, rank, score FROM sel_{i}
)""")
    parts.append(f"""
SELECT qid AS query_id, cid AS cand_id, rank AS mmr_rank, score AS mmr_score
FROM selacc_{k}""")
    return "".join(parts)


@_q("mmr_rerank", _mmr_oracle())
def mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversified top-5 (Carbonell &
    Goldstein 1998; operators/similarity.py:MMRRerank) over the top-20
    cosine candidates of 5 query vectors — the standard
    redundancy-suppressing rerank between dense retrieval and a
    context window.

    Scale shape: candidates are top-C bounded by the upstream
    CosineTopK, so the per-query pairwise self-join is C^2 rows and
    the greedy loop runs in an applyInPandas group of <= C(C+1)/2 rows
    — linear in queries, never in the corpus (max_candidates
    hard-fails if the bound is lost).  All cosines are rounded 6dp
    JVM-side; the Python loop combines them with the same IEEE ops and
    HALF_UP rounding the unrolled 5-round MATERIALIZED-CTE oracle
    performs, so selections (including tie-breaks) hash-match exactly.
    Beyond-reference: retrieval surface for RAG-style data pipelines."""
    from strom_spark import MMRRerank

    emb = load_table(spark, sf_dir, "embeddings")
    cands = CosineTopK(
        "corpus", "queries", "knn", k=20,
    )(Flow({"corpus": emb, "queries": emb.filter(F.col("vec_id") < 5)}))["knn"]
    cands = cands.select(
        "query_id", F.col("neighbor_id").alias("cand_id"), "cosine"
    )
    return MMRRerank(
        "cands", "vecs", "out",
        k=5, lambda_=0.7,
        query_col="query_id", cand_col="cand_id", rel_col="cosine",
    )(Flow({"cands": cands, "vecs": emb}))["out"]


@_q(
    "tfidf_top_terms",
    rf"""
WITH {_NORM_DOCS},
tw AS (SELECT doc_id, list_filter(w, x -> length(x) >= 2) AS w FROM toks),
n AS (SELECT count(*) AS n FROM tw),
tf AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(w) AS t FROM tw)
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
    round(tf.tf * ln(n.n / CAST(dfreq.df AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored
) WHERE rank <= 3
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF
    (operators/textrank.py:TfIdfTopTerms) — the standard topic /
    boilerplate fingerprint.  Ranks on the ROUNDED score so cross-
    engine ulp differences in ln() cannot flip near-ties; term text
    breaks exact ties deterministically.  df join is a shuffle (vocab
    can be large — never broadcast), rank is one window shuffle on
    doc_id."""
    from strom_spark import TfIdfTopTerms

    docs = spread(load_table(spark, sf_dir, "documents"))
    return TfIdfTopTerms(
        "docs", "top",
        id_col="doc_id", text_col="text", k=3, min_token_len=2,
    )(Flow({"docs": docs}))["top"]


@_q(
    "embedding_clusters",
    """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS d1, b.vec_id AS d2
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE a.vec_id < 20000 AND b.vec_id < 20000
    AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.3
),
e AS (SELECT d1 AS s, d2 AS t FROM pairs UNION SELECT d2, d1 FROM pairs),
walk(node, lab) AS (
  SELECT s, s FROM e
  UNION
  SELECT e.s, walk.lab FROM e JOIN walk ON walk.node = e.t
)
SELECT node, min(lab) AS component FROM walk GROUP BY node
""",
)
def embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS over the embedding cosine graph: the
    generic ConnectedComponents operator (operators/graph.py — min-
    label propagation + pointer jumping, O(log n) rounds, linear
    state) applied to EmbeddingNearDupPairs edges.  The oracle walks
    the same graph with a recursive CTE.  This is the composition a
    dedup pipeline actually runs: pair generator -> components ->
    keep min id per component.

    Bounded at ``_EMB_DEMO_CAP`` (r14): the edge generator is the
    sanctioned exact quadratic — the cap keeps it at the certified
    sf1.0 size at any SF (no-op at <= sf1.0).  Decade-scale clustering
    over the FULL corpus runs through the sub-quadratic pair graph
    (dedup_minhash_clusters' verified pairs) with the same CC
    operator."""
    from strom_spark import ConnectedComponents

    flow = Flow(
        {
            "emb": load_table(spark, sf_dir, "embeddings").filter(
                F.col("vec_id") < _EMB_DEMO_CAP
            )
        }
    )
    pairs = EmbeddingNearDupPairs(
        "emb", "pairs", threshold=0.3, on_overflow="tile"
    )(flow)["pairs"]
    out = ConnectedComponents("e", "cc", src="d1", dst="d2")(
        Flow({"e": pairs.select("d1", "d2")})
    )["cc"]
    return out


@_q(
    "value_quantiles",
    """
WITH ranked AS (
  SELECT event_type, value AS v,
    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
q AS (
  SELECT event_type, n,
    MAX(CASE WHEN rn = CAST(floor(1.0 + 0.5 * (n - 1)) AS BIGINT) THEN v END) AS v50lo,
    MAX(CASE WHEN rn = CAST(floor(1.0 + 0.5 * (n - 1)) AS BIGINT) + 1 THEN v END) AS v50hi,
    MAX(CASE WHEN rn = CAST(floor(1.0 + 0.95 * (n - 1)) AS BIGINT) THEN v END) AS v95lo,
    MAX(CASE WHEN rn = CAST(floor(1.0 + 0.95 * (n - 1)) AS BIGINT) + 1 THEN v END) AS v95hi
  FROM ranked
  GROUP BY event_type, n
)
SELECT event_type,
  v50lo + ((1.0 + 0.5 * (n - 1)) - floor(1.0 + 0.5 * (n - 1)))
    * (COALESCE(v50hi, v50lo) - v50lo) AS p50,
  v95lo + ((1.0 + 0.95 * (n - 1)) - floor(1.0 + 0.95 * (n - 1)))
    * (COALESCE(v95hi, v95lo) - v95lo) AS p95,
  n
FROM q
""",
)
def value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT grouped quantiles (operators/relational.py:Quantiles):
    rank per group + explicit quantile_cont interpolation, so Spark
    and the oracle evaluate the identical IEEE expression — native
    percentile/quantile_cont internals differ between engines and are
    not hash-portable.  One window shuffle on the group key; for hot
    single groups at 100 TB the documented alternative is
    approx_percentile."""
    from strom_spark import Quantiles

    events = load_table(spark, sf_dir, "events")
    return Quantiles(
        "e", "q",
        value_col="value",
        quantiles={"p50": 0.5, "p95": 0.95},
        by=["event_type"],
        tie_breaker="event_id",
    )(Flow({"e": events}))["q"]


@_q(
    "lm_quality_scores",
    rf"""
WITH {_NORM_DOCS},
tw AS (SELECT doc_id, list_filter(w, x -> x != '') AS w FROM toks),
tok AS (SELECT doc_id, unnest(w) AS t FROM tw),
tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
ct AS (SELECT t, count(*) AS ct FROM tok GROUP BY t),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS total,
         CAST(count(DISTINCT t) AS DOUBLE) AS vocab
  FROM tok
),
ntok AS (SELECT doc_id, len(w) AS n_tok FROM tw WHERE len(w) > 0),
contrib AS (
  SELECT tf.doc_id,
    round(tf.tf * -ln((ct.ct + 1.0) / (stats.total + 1.0 * stats.vocab)), 6) AS c
  FROM tf JOIN ct USING (t) CROSS JOIN stats
)
SELECT n.doc_id, n.n_tok,
  CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) / n.n_tok AS nll
FROM contrib JOIN ntok n USING (doc_id)
GROUP BY n.doc_id, n.n_tok
""",
)
def lm_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring
    (operators/textrank.py:UnigramLMScore): mean negative
    log-likelihood per document under an add-one unigram LM trained on
    the corpus itself — the cheap outlier/boilerplate filter every
    curation pipeline runs before an expensive model-based one.  Same
    determinism discipline as BM25: contributions rounded and summed
    as DECIMAL, one explode pass carrying n_tok, term-count join
    shuffles on the term (vocab is corpus-sized — never broadcast)."""
    from strom_spark import UnigramLMScore

    docs = spread(load_table(spark, sf_dir, "documents"))
    return UnigramLMScore(
        "docs", "scored", id_col="doc_id", text_col="text", alpha=1.0
    )(Flow({"docs": docs}))["scored"]


@_q(
    "salted_skew_join",
    """
WITH stats AS (
  -- decimal sum is exact and order-independent; double division of
  -- identical inputs is IEEE-identical across engines (a bare avg()
  -- over doubles is summation-order-dependent and can flip boundary
  -- rows between Spark and DuckDB)
  SELECT event_type,
    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_value
  FROM events GROUP BY event_type
)
SELECT e.event_type, count(*) AS n_above,
  CAST(SUM(CAST(e.value - s.avg_value AS DECIMAL(18,6))) AS DOUBLE) AS excess
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE e.value > s.avg_value
GROUP BY e.event_type
""",
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact join (scale.salted_join): events carry a
    handful of event_type values, so a plain equi-join on event_type
    funnels EVERY row of a hot type through one reducer — the classic
    100 TB straggler.  salted_join spreads each hot key over ``salt``
    sub-keys on the fact side and replicates the (tiny) per-type stats
    side salt times; the plan shows the salt explode + an equi-join on
    (event_type, __salt), and the downstream aggregation re-parallelizes
    because each sub-key is its own partition.  Row-identical to the
    unsalted join (differential-tested in tests/test_scale_utils.py)."""
    from strom_spark import salted_join

    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value")
    )
    fact = events.select("event_type", "value")
    joined = salted_join(fact, stats, ["event_type"], salt=8)
    return (
        joined.filter(F.col("value") > F.col("avg_value"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.sum((F.col("value") - F.col("avg_value")).cast("decimal(18,6)"))
            .cast("double")
            .alias("excess"),
        )
    )


@_q(
    "hot_key_detection",
    """
SELECT source, CAST(count(*) AS BIGINT) AS n_rows
FROM documents
GROUP BY source
HAVING count(*) > (SELECT count(*) / 40 FROM documents)
ORDER BY n_rows DESC, source
LIMIT 100
""",
)
def hot_key_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-defense front door (scale.hot_key_table, r11): the
    rows-per-key frequency scan that feeds salted_join(hot_keys='auto')
    as an oracle-checked DataFrame — one skew-immune groupBy-count
    (map-side partials collapse any hot key to one row per input
    partition), strict > threshold so a boundary tie can never flip
    membership between engines, descending-count order with a
    deterministic key tie-break, bounded by max_keys.  The threshold
    here is an explicit corpus fraction (N/40, integer-exact on both
    sides) rather than the advisory-size default so the row is
    reproducible across boxes; production callers use the
    advisoryPartitionSizeInBytes-derived default and pass the result
    straight to salted_join(hot_keys=...)."""
    from strom_spark.scale import hot_key_table

    docs = load_table(spark, sf_dir, "documents")
    thresh = docs.count() // 40
    return hot_key_table(
        docs, "source", threshold_rows=thresh, max_keys=100
    ).select("source", F.col("n_rows").cast("bigint").alias("n_rows"))


@_q(
    "bucketed_join_revenue",
    """
SELECT o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
       AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The storage layer proven END-TO-END, not just unit-tested
    (scale.write_bucketed + zorder_key): lineitem and orders are
    written as tables bucketed 8 ways ON THE JOIN KEY — lineitem
    additionally z-order-clustered within buckets on (partkey,
    suppkey), so row-group min/max stats stay tight for BOTH part- and
    supplier-range scans of the same physical copy — then re-read and
    joined.  Because both sides' bucketing matches the join key, the
    sort-merge join requires NO Exchange: the fn ASSERTS zero Exchange
    operators in the join's physical plan before returning, so a
    bucketing regression flips this row red rather than silently
    reintroducing the shuffle.  The aggregate result is hash-checked
    against the plain-parquet oracle — identical answers off the
    optimized layout.  This is the pre-shuffled layout a 100 TB fact
    table should live in: the per-query shuffle of the biggest table
    is paid ONCE at write time, every subsequent keyed join/agg rides
    it for free.  Decimal revenue sum: exact and order-independent, so
    Spark (bucketed) and DuckDB (flat scan) agree bit-for-bit.

    Round 7: the writes are now idempotent-cheap and sf-scoped.  A
    source-file fingerprint (size+mtime of the parquet inputs) is
    passed to write_bucketed, so WARM reruns (bench warm passes,
    repeated driver runs over unchanged testdata) skip both table
    rewrites and measure the exchange-free JOIN — the steady-state a
    100 TB deployment actually lives in, where the layout was paid
    for long ago.  Table names carry the sf tag so benches at
    different scale factors never race on one physical directory."""
    from strom_spark import write_bucketed, zorder_key

    # DERIVE is a version stamp for the derivation baked into the
    # written rows (zorder params, column set): editing it below MUST
    # change the fingerprint, or warm machines silently serve a stale
    # layout computed by the old code
    DERIVE = "zorder(l_partkey,l_suppkey,bits=16):v1"

    def _fp(table: str) -> str:
        st = os.stat(os.path.join(sf_dir, f"{table}.parquet"))
        return (
            f"{os.path.realpath(sf_dir)}:{table}:{st.st_size}:"
            f"{st.st_mtime_ns}:{DERIVE}"
        )

    tag = _sf_tag(sf_dir)
    li_tbl, ord_tbl = f"strom_li_bucketed_{tag}", f"strom_ord_bucketed_{tag}"
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "zkey", zorder_key(["l_partkey", "l_suppkey"], bits=16)
    )
    write_bucketed(
        li, li_tbl,
        bucket_by=["l_orderkey"], num_buckets=8, sort_by=["zkey"],
        fingerprint=_fp("lineitem"),
    )
    write_bucketed(
        load_table(spark, sf_dir, "orders"), ord_tbl,
        bucket_by=["o_orderkey"], num_buckets=8,
        fingerprint=_fp("orders"),
    )
    lib = spark.table(li_tbl).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    ob = spark.table(ord_tbl).select(
        "o_orderkey", "o_orderpriority"
    )
    joined = lib.hint("merge").join(ob, lib.l_orderkey == ob.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(
            "bucketed join plan contains an Exchange — bucketing is not "
            "being used:\n" + plan
        )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@_q(
    "decontaminate_train",
    rf"""
WITH {_NORM_DOCS},
{_SHINGLES},
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 29 = 0),
tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 29 <> 0)
SELECT tr.doc_id, count(*) AS n_contaminated
FROM tr JOIN ev USING (shingle)
GROUP BY tr.doc_id
HAVING count(*) >= 5
""",
)
def decontaminate_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.py:Decontaminate) —
    the canonical pre-training step: a held-out slice of documents
    (doc_id % 29 = 0) plays the eval/benchmark corpus; every remaining
    training doc sharing >= 5 distinct 3-word shingles with it is
    flagged.  The lowering never materializes pairs: distinct train
    postings join the distinct eval shingle SET, so each posting
    matches at most once (output bounded by the posting count); counts
    shuffle on the doc id.  The oracle is the identical shingle
    algebra in DuckDB (shared CTE with the Jaccard queries)."""
    from strom_spark import Decontaminate

    docs = spread(load_table(spark, sf_dir, "documents"))
    train = docs.filter(F.col("doc_id") % 29 != 0)
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    flagged = Decontaminate(
        "train", "eval", "out", k=3, min_overlap=5, mode="flag"
    )(Flow({"train": train, "eval": ev}))["out"]
    return flagged.filter(F.col("contaminated")).select(
        "doc_id", "n_contaminated"
    )


@_q(
    "pii_redaction",
    r"""
SELECT doc_id,
  length(regexp_replace(regexp_replace(regexp_replace(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IPV4>', 'g'),
    '\+?[0-9]{1,3}[-. (]{1,2}[0-9]{3}[-. )]{1,2}[0-9]{3}[-. ]?[0-9]{4}', '<PHONE>', 'g')
  ) AS n_redacted_chars,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(text, '\+?[0-9]{1,3}[-. (]{1,2}[0-9]{3}[-. )]{1,2}[0-9]{3}[-. ]?[0-9]{4}')) AS BIGINT) AS n_phone
FROM documents
""",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (functions/text.py:redact_pii) — the standard
    pre-release redaction pass: emails, dotted-quad IPs, and phone
    numbers replaced by typed placeholders, with per-class audit
    counts.  Pure regexp_replace/extract_all chain (JVM codegen, zero
    Python); patterns restricted to the Java-regex ∩ RE2 dialect so
    the identical expressions run on the DuckDB oracle.  The hash
    compares the redacted LENGTH (not the text — the driver hashes all
    columns and long strings make mismatch triage useless) plus raw
    counts."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    counts = TXT.pii_counts("text")
    return docs.select(
        "doc_id",
        F.length(TXT.redact_pii("text")).alias("n_redacted_chars"),
        counts["n_email"].alias("n_email"),
        counts["n_ipv4"].alias("n_ipv4"),
        counts["n_phone"].alias("n_phone"),
    )


_SUBSTR_K = 8

@_q(
    "substring_dedup_docs",
    rf"""
WITH {_NORM_DOCS},
tw AS (SELECT doc_id, list_filter(w, x -> x != '') AS w FROM toks WHERE w IS NOT NULL),
win AS (
  SELECT doc_id, r.p, array_to_string(w[r.p+1:r.p+{_SUBSTR_K}], ' ') AS s
  FROM tw, UNNEST(range(0, greatest(len(w) - {_SUBSTR_K} + 1, 0))) AS r(p)
),
occ AS (
  SELECT doc_id, p,
    count(*) OVER (PARTITION BY s) AS cnt,
    row_number() OVER (PARTITION BY s ORDER BY doc_id, p) AS rn
  FROM win
),
cov AS (
  SELECT DISTINCT doc_id, p + o.off AS tp
  FROM occ, UNNEST(range(0, {_SUBSTR_K})) AS o(off)
  WHERE cnt > 1 AND rn > 1
),
pt AS (
  SELECT doc_id, r.i AS tp, w[r.i+1] AS tok
  FROM tw, UNNEST(range(0, len(w))) AS r(i)
),
kept AS (
  SELECT pt.doc_id, pt.tp, pt.tok
  FROM pt LEFT JOIN cov ON pt.doc_id = cov.doc_id AND pt.tp = cov.tp
  WHERE cov.doc_id IS NULL
)
SELECT k.doc_id,
  string_agg(k.tok, ' ' ORDER BY k.tp) AS text,
  CAST(count(*) AS BIGINT) AS n_kept,
  CAST(coalesce(any_value(d.nc), 0) AS BIGINT) AS n_dropped
FROM kept k
LEFT JOIN (SELECT doc_id, count(*) AS nc FROM cov GROUP BY doc_id) d
  ON k.doc_id = d.doc_id
GROUP BY k.doc_id
""",
)
def substring_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup at {k}-token-window granularity
    (operators/dedup.py:SubstringDedup — Lee et al. 2022 semantics,
    keep-first): spans repeated within OR across documents are removed
    everywhere but their first global occurrence, and documents
    rebuild from surviving tokens.  The span-level dedup that document
    dedup and line dedup both miss (mid-document licence headers,
    quoted chunks, templated paragraphs).  The oracle replays the
    definition declaratively: window strings → occurrence counts +
    global first-occurrence ranks → covered positions → rebuild.  The
    engine keys occurrences on md5(window) so the corpus-wide shuffle
    carries 32 hex chars instead of k tokens — the volume economy
    that lets the declarative form stand in for a suffix array at
    100 TB."""
    from strom_spark import SubstringDedup

    docs = spread(load_table(spark, sf_dir, "documents"))
    return SubstringDedup("docs", "out", k=_SUBSTR_K)(
        Flow({"docs": docs})
    )["out"]


@_q(
    "dsir_weights",
    rf"""
WITH {_NORM_DOCS},
tw AS (SELECT doc_id, list_filter(w, x -> x != '') AS w FROM toks WHERE w IS NOT NULL),
g AS (
  SELECT doc_id, u.x AS gram FROM tw, UNNEST(w) AS u(x)
  UNION ALL
  SELECT doc_id, array_to_string(w[r.i:r.i+1], ' ') AS gram
  FROM tw, UNNEST(range(1, len(w))) AS r(i)
),
db AS (
  SELECT doc_id, ('0x' || substring(md5(gram), 1, 8))::UBIGINT % 10000 AS b,
         count(*) AS cnt
  FROM g GROUP BY 1, 2
),
rawb AS (SELECT b, sum(cnt) AS cr FROM db GROUP BY 1),
tgtb AS (
  SELECT db.b, sum(db.cnt) AS ct
  FROM db JOIN documents d ON db.doc_id = d.doc_id
  WHERE d.lang = 'en' GROUP BY 1
),
tot AS (
  SELECT (SELECT sum(cr) FROM rawb) AS nr, (SELECT sum(ct) FROM tgtb) AS nt
),
lr AS (
  SELECT rawb.b,
    CAST(round(
      ln((coalesce(tgtb.ct, 0) + 1.0) / (tot.nt + 10000.0))
      - ln((rawb.cr + 1.0) / (tot.nr + 10000.0)), 6) AS DECIMAL(18,6)) AS lr
  FROM rawb LEFT JOIN tgtb ON rawb.b = tgtb.b CROSS JOIN tot
),
wt AS (
  SELECT db.doc_id, sum(db.cnt) AS nf, CAST(sum(db.cnt * lr.lr) AS DOUBLE) AS w
  FROM db JOIN lr ON db.b = lr.b GROUP BY 1
)
SELECT d.doc_id,
  CAST(coalesce(wt.nf, 0) AS BIGINT) AS n_feats,
  coalesce(wt.w, 0.0) AS dsir_weight
FROM documents d LEFT JOIN wt ON d.doc_id = wt.doc_id
""",
)
def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/textrank.py:DSIRWeights —
    Xie et al. 2023, arXiv:2302.03169): every document scored by
    Σ n(d,b)·[ln p̂_target(b) − ln p̂_raw(b)] over 10,000 hashed
    unigram+bigram buckets (portable md5-prefix hash, add-1
    smoothing), target = the English slice of the corpus — the
    published recipe for domain-targeted pre-training data selection.
    Corpus-sized shuffles key on (doc, bucket) then doc; the bucket
    log-ratio table (≤10k rows) and corpus totals attach by
    broadcast; per-bucket contributions are rounded and summed as
    DECIMAL so the weight is order-independent (BM25Score
    convention).  The oracle replays grams → buckets → smoothed
    log-ratios → decimal dot product declaratively."""
    from strom_spark import DSIRWeights

    docs = spread(load_table(spark, sf_dir, "documents"))
    flow = Flow({"d": docs, "t": docs.filter(F.col("lang") == "en")})
    return DSIRWeights("d", "t", "w", n_buckets=10_000)(flow)["w"]


@_q(
    "image_phash_groups",
    """
WITH d AS (
  SELECT doc_id, 5 + doc_id % 6 AS w, 3 + doc_id % 4 AS h, doc_id % 256 AS g
  FROM documents
),
s AS (
  SELECT doc_id, j.j, i.i,
    299 * ((i.i * w) // 8) + 587 * g + 114 * ((j.j * h) // 8) AS l
  FROM d, UNNEST(range(0, 8)) AS j(j), UNNEST(range(0, 8)) AS i(i)
),
t AS (SELECT doc_id, sum(l) AS tot FROM s GROUP BY 1),
b AS (
  SELECT s.doc_id,
    string_agg(CASE WHEN 64 * s.l > t.tot THEN '1' ELSE '0' END, ''
               ORDER BY s.j, s.i) AS phash
  FROM s JOIN t ON s.doc_id = t.doc_id GROUP BY s.doc_id
)
SELECT phash, CAST(count(*) AS BIGINT) AS n_images, min(doc_id) AS keep_id
FROM b GROUP BY phash
""",
)
def image_phash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE near-dup dedup end-to-end (operators/multimodal.py:
    ImagePHash + bmp_phash): one synthetic 24-bit BMP per document id
    generated executor-side, REALLY decoded (row flip + stride
    padding), perceptually hashed — 8×8 nearest-neighbor luma
    resample, above-mean threshold, ALL in integer arithmetic
    (299R+587G+114B scaled luma; threshold 64·l > Σl) so the hash is
    exact and order-independent — then exact-phash dedup groups
    (phash, n_images, keep_id).  The gradient corpus collapses to
    ≤24 groups (the hash sees geometry; the per-id G plane cancels in
    the threshold) — a planted demonstration that perceptually-equal
    images dedup across different color offsets.  Only fingerprints
    ever shuffle; blobs stay in their scan partitions.  The oracle
    states the decode+resample+threshold closed-form per id."""
    from strom_spark import ImagePHash, bmp_synth

    @F.pandas_udf("binary")
    def _synth(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda i: bmp_synth(int(i)))

    docs = load_table(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"), _synth("doc_id").alias("content")
    )
    hashed = ImagePHash("assets", "ph")(Flow({"assets": assets}))["ph"]
    return hashed.groupBy("phash").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.min("asset_id").alias("keep_id"),
    )


_PAGERANK_ORACLE = r"""
WITH edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT 'o' || CAST(l_orderkey AS VARCHAR) AS src,
           'p' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem
    UNION ALL
    SELECT 'p' || CAST(l_partkey AS VARCHAR),
           'o' || CAST(l_orderkey AS VARCHAR) FROM lineitem
  )
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
nn AS (SELECT count(*) AS n FROM nodes),
pr0 AS (SELECT node, 1000000000000 // (SELECT n FROM nn) AS rank FROM nodes),
pr1 AS (
  SELECT nd.node,
    (150 * 1000000000000) // (1000 * (SELECT n FROM nn)) + coalesce(c.inr, 0) AS rank
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node, sum((850 * p.rank) // (1000 * d.d)) AS inr
    FROM edges e JOIN pr0 p ON p.node = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) c ON c.node = nd.node
),
pr2 AS (
  SELECT nd.node,
    (150 * 1000000000000) // (1000 * (SELECT n FROM nn)) + coalesce(c.inr, 0) AS rank
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node, sum((850 * p.rank) // (1000 * d.d)) AS inr
    FROM edges e JOIN pr1 p ON p.node = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) c ON c.node = nd.node
),
pr3 AS (
  SELECT nd.node,
    (150 * 1000000000000) // (1000 * (SELECT n FROM nn)) + coalesce(c.inr, 0) AS rank
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node, sum((850 * p.rank) // (1000 * d.d)) AS inr
    FROM edges e JOIN pr2 p ON p.node = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) c ON c.node = nd.node
),
pr4 AS (
  SELECT nd.node,
    (150 * 1000000000000) // (1000 * (SELECT n FROM nn)) + coalesce(c.inr, 0) AS rank
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node, sum((850 * p.rank) // (1000 * d.d)) AS inr
    FROM edges e JOIN pr3 p ON p.node = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) c ON c.node = nd.node
),
pr5 AS (
  SELECT nd.node,
    (150 * 1000000000000) // (1000 * (SELECT n FROM nn)) + coalesce(c.inr, 0) AS rank
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node, sum((850 * p.rank) // (1000 * d.d)) AS inr
    FROM edges e JOIN pr4 p ON p.node = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) c ON c.node = nd.node
)
SELECT node, CAST(rank AS DOUBLE) / 1000000000000.0 AS rank FROM pr5
"""



@_q(
    "pagerank_order_part",
    _PAGERANK_ORACLE,
)
def pagerank_order_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PageRank (operators/graph.py:PageRank — Page et
    al. 1999, the Pregel/GraphX showcase) over the symmetric
    order↔part bipartite graph of lineitem: 5 rounds of one
    dst-keyed shuffle each, lineage truncated per round
    (ConnectedComponents discipline).  Arithmetic is FIXED-POINT
    INTEGER (ranks scaled 10^12; contributions (850·r) div
    (1000·deg), pure bigint) so ALL FIVE iterations are bit-exact,
    order-independent, and engine-portable — the oracle replays them
    as five unrolled CTEs and hash-matches all ~17k nodes,
    certifying an ITERATIVE distributed algorithm end-to-end (not
    just one aggregate; a double-rounding formulation diverged on
    ~1% of nodes — graph.py:PageRank docstring).  At 100 TB: state
    is one (node, rank) row per node, each round linear in edges,
    hot destinations ride AQE skew handling.

    r14 shuffle-bytes optimization (guide §2.3): the rank loop runs on
    BIGINT node ids (order k → 2k, part k → 2k+1 — a bijection, so the
    graph is isomorphic and the fixed-point integer ranks are
    bit-identical), decoded back to the oracle's 'o<k>'/'p<k>' strings
    only at output.  Every per-round join/aggregate key is 8 bytes
    instead of a ~8-char string, and the one-time distinct dedups the
    600k-row single-direction pair set instead of the mirrored 1.2M
    rows (mirroring a distinct set preserves distinctness, so the
    edge multiset is unchanged)."""
    from strom_spark import PageRank

    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select(
        (F.col("l_orderkey") * 2).cast("bigint").alias("src"),
        (F.col("l_partkey") * 2 + 1).cast("bigint").alias("dst"),
    ).distinct()
    edges = pairs.unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pr = PageRank("e", "pr", iterations=5)(Flow({"e": edges}))["pr"]
    return pr.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("o"), F.expr("CAST(node DIV 2 AS STRING)")),
        )
        .otherwise(
            F.concat(F.lit("p"), F.expr("CAST((node - 1) DIV 2 AS STRING)"))
        )
        .alias("node"),
        "rank",
    )


@_q(
    "image_phash_near_pairs",
    """
WITH d AS (
  SELECT doc_id, 5 + doc_id % 6 AS w, 3 + doc_id % 4 AS h, doc_id % 256 AS g
  FROM documents
),
s AS (
  SELECT doc_id, j.j, i.i,
    299 * ((i.i * w) // 8) + 587 * g + 114 * ((j.j * h) // 8) AS l
  FROM d, UNNEST(range(0, 8)) AS j(j), UNNEST(range(0, 8)) AS i(i)
),
t AS (SELECT doc_id, sum(l) AS tot FROM s GROUP BY 1),
b AS (
  SELECT s.doc_id,
    string_agg(CASE WHEN 64 * s.l > t.tot THEN '1' ELSE '0' END, ''
               ORDER BY s.j, s.i) AS phash
  FROM s JOIN t ON s.doc_id = t.doc_id GROUP BY s.doc_id
),
reps AS (SELECT phash, min(doc_id) AS rid FROM b GROUP BY phash)
SELECT a.rid AS id_a, c.rid AS id_b,
  CAST(hamming(a.phash, c.phash) AS BIGINT) AS distance
FROM reps a JOIN reps c ON a.rid < c.rid
WHERE hamming(a.phash, c.phash) <= 8
""",
)
def image_phash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image NEAR-duplicate pairs (operators/multimodal.py:
    PHashNearDupPairs): the distinct perceptual-hash group
    representatives from `image_phash_groups`, paired within Hamming
    distance 8 by the SimHash pigeonhole — candidates meet only
    inside a (block, block-value) bucket (9 blocks for d=8, never
    all-pairs), exact distance verified JVM-side as
    bit_count(hi⊕hi') + bit_count(lo⊕lo') on the conv-packed halves.
    The oracle cross-joins the ≤12 representatives with DuckDB's
    native hamming() — exactness of both the pigeonhole recall and
    the packed-long distance is what's being certified.  At corpus
    scale the pair stage runs on fingerprints (64 chars), never
    blobs, and the bucket join is the sub-quadratic path."""
    from strom_spark import ImagePHash, PHashNearDupPairs, bmp_synth

    @F.pandas_udf("binary")
    def _synth(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda i: bmp_synth(int(i)))

    docs = load_table(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"), _synth("doc_id").alias("content")
    )
    hashed = ImagePHash("assets", "ph")(Flow({"assets": assets}))["ph"]
    reps = hashed.groupBy("phash").agg(F.min("asset_id").alias("asset_id"))
    # max_block_freq is the production hot-bucket guard (viral flat-
    # image block values); the SCALE.md probe shows the benchmark
    # corpus' largest (blk, value) bucket is far below 1000, so the
    # cap provably does not bind here and the oracle hash is
    # unaffected — the knob is exercised, not the recall loss.
    out = PHashNearDupPairs(
        "reps", "pairs", max_distance=8, max_block_freq=1000
    )(Flow({"reps": reps}))["pairs"]
    return out.select("id_a", "id_b", F.col("distance").cast("bigint").alias("distance"))


@_q(
    "stupid_backoff_scores",
    rf"""
WITH {_NORM_DOCS},
tw AS (SELECT doc_id, list_filter(w, x -> x != '') AS w FROM toks WHERE w IS NOT NULL),
nz AS (SELECT doc_id, w, len(w) AS n FROM tw WHERE len(w) > 0),
pos AS (
  SELECT doc_id, n,
    CASE WHEN r.p >= 2 THEN w[r.p - 1] END AS prev, w[r.p] AS cur
  FROM nz, UNNEST(range(1, n + 1)) AS r(p)
),
grouped AS (
  SELECT doc_id, n, prev, cur, count(*) AS cnt FROM pos GROUP BY ALL
),
uc AS (SELECT u.x AS t, count(*) AS c FROM nz, UNNEST(w) AS u(x) GROUP BY 1),
bc AS (
  SELECT w[r.i] AS p, w[r.i + 1] AS c, count(*) AS bc
  FROM nz, UNNEST(range(1, n)) AS r(i) GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS N FROM uc),
sc AS (
  SELECT g.doc_id, g.n,
    CAST(round(g.cnt * -ln(
      CASE WHEN g.prev IS NULL THEN cu.c / tot.N
           WHEN bc.bc IS NOT NULL THEN bc.bc / CAST(pu.c AS DOUBLE)
           ELSE 0.4 * cu.c / tot.N END), 6) AS DECIMAL(18,6)) AS contrib
  FROM grouped g
  JOIN uc cu ON cu.t = g.cur
  LEFT JOIN uc pu ON pu.t = g.prev
  LEFT JOIN bc ON bc.p = g.prev AND bc.c = g.cur
  CROSS JOIN tot
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tok,
  CAST(sum(contrib) AS DOUBLE) / n AS sb_nll
FROM sc GROUP BY doc_id, n
""",
)
def stupid_backoff_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality scores with Stupid Backoff (operators/
    textrank.py:StupidBackoffLM — Brants et al. 2007, the smoothing
    designed for distributed corpus-count LMs: counts + one backoff
    constant, no discounting).  Per doc: mean −ln S over positions,
    S = c(bigram)/c(prev) when seen, else 0.4·c(w)/N; sentence-
    initial tokens score on the unigram model.  The bigram upgrade of
    `lm_quality_scores`: fluent word ORDER now scores low — the
    CCNet-style LM gate.  Count tables are vocab-sized checkpoints,
    score joins shuffle on token/(prev,cur) keys (never broadcast —
    bigram vocab is web-scale), contributions DECIMAL-summed.  The
    oracle replays positions → counts → backoff CASE declaratively."""
    from strom_spark import StupidBackoffLM

    docs = spread(load_table(spark, sf_dir, "documents"))
    flow = Flow({"docs": docs})
    return StupidBackoffLM("docs", "out", id_col="doc_id", text_col="text")(
        flow
    )["out"]


@_q(
    "dsir_sample",
    rf"""
WITH {_NORM_DOCS},
tw AS (SELECT doc_id, list_filter(w, x -> x != '') AS w FROM toks WHERE w IS NOT NULL),
g AS (
  SELECT doc_id, u.x AS gram FROM tw, UNNEST(w) AS u(x)
  UNION ALL
  SELECT doc_id, array_to_string(w[r.i:r.i+1], ' ')
  FROM tw, UNNEST(range(1, len(w))) AS r(i)
),
db AS (
  SELECT doc_id, ('0x' || substring(md5(gram), 1, 8))::UBIGINT % 10000 AS b,
         count(*) AS cnt
  FROM g GROUP BY 1, 2
),
rawb AS (SELECT b, sum(cnt) AS cr FROM db GROUP BY 1),
tgtb AS (
  SELECT db.b, sum(db.cnt) AS ct
  FROM db JOIN documents d ON db.doc_id = d.doc_id
  WHERE d.lang = 'en' GROUP BY 1
),
tot AS (
  SELECT (SELECT sum(cr) FROM rawb) AS nr, (SELECT sum(ct) FROM tgtb) AS nt
),
lr AS (
  SELECT rawb.b,
    CAST(round(
      ln((coalesce(tgtb.ct, 0) + 1.0) / (tot.nt + 10000.0))
      - ln((rawb.cr + 1.0) / (tot.nr + 10000.0)), 6) AS DECIMAL(18,6)) AS lr
  FROM rawb LEFT JOIN tgtb ON rawb.b = tgtb.b CROSS JOIN tot
),
wt AS (
  SELECT db.doc_id, CAST(sum(db.cnt * lr.lr) AS DOUBLE) AS w
  FROM db JOIN lr ON db.b = lr.b GROUP BY 1
),
keyed AS (
  SELECT d.doc_id, coalesce(wt.w, 0.0) AS dsir_weight,
    round(coalesce(wt.w, 0.0)
      - ln(-ln(((('0x' || substring(md5('gumbel' || CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000) + 0.5) / 10000.0)),
      6) AS sample_key
  FROM documents d LEFT JOIN wt ON d.doc_id = wt.doc_id
)
SELECT doc_id, dsir_weight, sample_key
FROM keyed ORDER BY sample_key DESC, doc_id LIMIT 100
""",
)
def dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RESAMPLING half of DSIR (Xie et al. 2023 §2: sample
    without replacement ∝ exp(weight)): Gumbel-top-k — key each doc
    with weight + Gumbel noise g = −ln(−ln(u)) and take the global
    top 100, where u derives from the portable md5-prefix hash of the
    doc id (sampling.py:bucket_of convention) so the draw is
    deterministic, engine-replayable, and retry-stable (no seeded
    RNG).  Keys are rounded to 6 digits with a doc-id tie-break
    before ranking, so Spark's distributed TakeOrdered and the
    oracle's ORDER BY...LIMIT select the identical set.  The top-k is
    per-partition top-100 + driver merge — no global sort shuffle."""
    from strom_spark import DSIRWeights, TopK, Transformer
    from strom_spark.operators.sampling import bucket_of

    docs = spread(load_table(spark, sf_dir, "documents"))
    flow = Flow({"d": docs, "t": docs.filter(F.col("lang") == "en")})
    w = DSIRWeights("d", "t", "w", n_buckets=10_000)(flow)
    u = (bucket_of("doc_id", "gumbel") + F.lit(0.5)) / F.lit(10000.0)
    keyed = Transformer(
        "w",
        select={
            "doc_id": "doc_id",
            "dsir_weight": "dsir_weight",
            "sample_key": F.round(
                F.col("dsir_weight") - F.log(-F.log(u)), 6
            ),
        },
    )(w)
    out = TopK(
        "w", "s", k=100, order_by=[F.col("sample_key").desc(), F.col("doc_id")]
    )(keyed)
    return out["s"]


@_q(
    "semdedup_flags",
    """
WITH p AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS pv
  FROM embeddings ORDER BY vec_id LIMIT 8
),
a AS (
  SELECT e.vec_id, e.embedding::DOUBLE[] AS v, p.cid,
    row_number() OVER (PARTITION BY e.vec_id
      ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], p.pv), 6) DESC, p.cid) AS rk
  FROM embeddings e CROSS JOIN p WHERE e.vec_id < 20000
),
asg AS (SELECT vec_id, cid AS centroid_id, v FROM a WHERE rk = 1),
d AS (
  SELECT DISTINCT y.vec_id
  FROM asg x JOIN asg y ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
  WHERE round(list_cosine_similarity(x.v, y.v), 6) >= 0.3
)
SELECT g.vec_id, g.centroid_id, (d.vec_id IS NOT NULL) AS is_dup
FROM asg g LEFT JOIN d ON d.vec_id = g.vec_id
""",
)
def semdedup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup flags (operators/dedup.py:SemDeDup — Abbas et al.
    2023, arXiv:2303.09540): assign every embedding to its nearest of 8
    deterministic pivot centroids (round-6 cosine, lowest-centroid-id
    tie-break, pure-JVM argmax over literal arrays), then flag vectors
    with a smaller-id cluster-mate at cosine >= 0.3 via one
    ``applyInPandas`` GEMM per cluster — no pair materialization, one
    shuffle keyed on centroid_id.  Clustering bounds the pairwise work
    at Σ cᵢ² ≈ N²/k — the published trick that makes embedding-level
    dedup tractable at 100 TB (the production path swaps the pivots for
    sampled-Lloyd centroids; identical plumbing, exercised in pytest).
    The oracle replays assignment (argmax via row_number) and the
    within-cluster smaller-id-mate EXISTS declaratively.

    Bounded at ``_EMB_DEMO_CAP`` (r14): at FIXED k=8 the per-cluster
    GEMM work is Σcᵢ² = N²/8 — the same fixed-parameter quadratic the
    r11 LSH probe caught — so the pinned-pivot demo is capped at its
    certified sf1.0 size (no-op at <= sf1.0, 5e7 cosines at any SF).
    The decade path is auto-k (n_clusters=None), certified at sf10 by
    semdedup_dup_floor."""
    from strom_spark import SemDeDup

    flow = Flow(
        {
            "emb": load_table(spark, sf_dir, "embeddings").filter(
                F.col("vec_id") < _EMB_DEMO_CAP
            )
        }
    )
    return SemDeDup(
        "emb", "flags", threshold=0.3, n_clusters=8, centroids="pivot"
    )(flow)["flags"]


@_q(
    "line_dedup_docs",
    """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE text IS NOT NULL
),
lines AS (
  SELECT doc_id, i AS pos,
         array_to_string(w[(i-1)*3+1:(i-1)*3+3], ' ') AS line
  FROM w, unnest(range(1, CAST(ceil(len(w)/3.0) AS BIGINT) + 1)) u(i)
),
keyed AS (SELECT doc_id, pos, line, trim(line) AS k FROM lines),
freq AS (
  SELECT k FROM keyed WHERE k <> ''
  GROUP BY k HAVING COUNT(DISTINCT doc_id) > 4
),
kept AS (
  SELECT doc_id, pos, line FROM keyed
  WHERE k = '' OR k NOT IN (SELECT k FROM freq)
),
totals AS (SELECT doc_id, COUNT(*) AS n_total FROM lines GROUP BY doc_id)
SELECT kp.doc_id,
  md5(string_agg(kp.line, chr(10) ORDER BY kp.pos)) AS text_md5,
  COUNT(*) AS n_kept,
  CAST(any_value(t.n_total) - COUNT(*) AS BIGINT) AS n_dropped
FROM kept kp JOIN totals t USING (doc_id)
GROUP BY kp.doc_id
""",
)
def line_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level line dedup (LineDedup, operators/dedup.py) — the
    CCNet/RefinedWeb boilerplate-removal step: any line occurring in
    more than 4 distinct documents is removed from every document and
    the docs are rebuilt with surviving lines in original order.

    The synthetic docs are single-line word soup, so the query first
    derives a line-structured corpus DETERMINISTICALLY on both sides:
    consecutive 3-word groups become lines (newline-joined).  The
    small vocabulary makes 3-word lines genuinely collide across docs,
    so the frequency tail is non-empty and drops are exercised, not
    just the identity path.  The rebuilt text is compared by md5 (the
    oracle's string_agg ORDER BY pos mirrors the operator's
    array_sort(collect_list(struct(pos, line)))); audit counts compare
    exactly."""
    from strom_spark import LineDedup

    docs = spread(load_table(spark, sf_dir, "documents"))
    w = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size(w) / F.lit(3.0)).cast("int")
    lined = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), n_lines),
                lambda i: F.array_join(F.slice(w, (i - F.lit(1)) * 3 + 1, 3), " "),
            ),
            "\n",
        ).alias("text"),
    )
    out = LineDedup("docs", "clean", max_docs=4)(Flow({"docs": lined}))["clean"]
    return out.select(
        "doc_id", F.md5("text").alias("text_md5"), "n_kept", "n_dropped"
    )


@_q(
    "chunk_documents",
    r"""
WITH norm AS (
  SELECT doc_id,
    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
  CAST((s - 1) / 24 AS BIGINT) AS chunk_idx,
  CAST(s AS BIGINT) AS token_start,
  CAST(least(32, len(w) - s + 1) AS BIGINT) AS n_chunk_tokens,
  md5(array_to_string(w[s : s + 31], ' ')) AS chunk_md5
FROM norm, unnest(range(1, greatest(len(w), 1) + 1, 24)) u(s)
""",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (operators/packing.py ChunkDocuments,
    size=32 tokens, overlap=8): the doc → embedding-unit explode of a
    retrieval pipeline, with 1-based token offsets so spans map back
    into the source.  Pure Column-HOF narrow fan-out, zero shuffle;
    chunk text compared by md5."""
    from strom_spark import ChunkDocuments

    docs = spread(load_table(spark, sf_dir, "documents"))
    out = ChunkDocuments("docs", "chunks", size=32, overlap=8)(
        Flow({"docs": docs})
    )["chunks"]
    return out.select(
        "doc_id",
        "chunk_idx",
        "token_start",
        "n_chunk_tokens",
        F.md5("chunk_text").alias("chunk_md5"),
    )


@_q(
    "blocklist_flag_docs",
    r"""
WITH norm AS (
  SELECT doc_id,
    ' ' || trim(regexp_replace(lower(text), '\s+', ' ', 'g')) || ' ' AS t
  FROM documents WHERE text IS NOT NULL
),
p(phrase) AS (VALUES ('table scan'), ('fast merge batch'), ('big vector')),
hits AS (
  SELECT n.doc_id, COUNT(*) AS n_blocklisted
  FROM norm n JOIN p ON n.t LIKE '% ' || p.phrase || ' %'
  GROUP BY n.doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(h.n_blocklisted, 0) AS BIGINT) AS n_blocklisted,
  COALESCE(h.n_blocklisted, 0) > 0 AS blocked
FROM documents d LEFT JOIN hits h USING (doc_id)
""",
)
def blocklist_flag_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banned-phrase compliance pass (operators/dedup.py
    PhraseBlocklist): every document flagged with how many blocklisted
    phrases occur in it as whole-word sequences.  The engine lowers to
    length-grouped shingle equi-joins (one doc explode per distinct
    phrase word-length, AQE-broadcast phrase side — never a doc×phrase
    LIKE scan); the oracle IS the quadratic LIKE formulation over the
    same normalized text, so a hash match certifies the inverted
    lowering against the naive semantics."""
    from strom_spark import PhraseBlocklist

    docs = spread(load_table(spark, sf_dir, "documents"))
    phrases = spark.createDataFrame(
        [("table scan",), ("fast merge batch",), ("big vector",)],
        "phrase string",
    )
    out = PhraseBlocklist("docs", "deny", "flagged", max_inline=0)(
        Flow({"docs": docs, "deny": phrases})
    )["flagged"]
    return out.select("doc_id", "n_blocklisted", "blocked")


@_q(
    "repetition_scores",
    rf"""
WITH {_NORM_DOCS},
tw AS (SELECT doc_id, list_filter(w, x -> x != '') AS w FROM toks),
g AS (
  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS gram
  FROM tw, unnest(range(1, greatest(len(w) - 1, 1))) t(i)
  WHERE len(w) >= 3
),
pg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram)
SELECT doc_id,
  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS rep_ratio,
  CAST(sum(c) AS BIGINT) AS n_grams
FROM pg GROUP BY doc_id
""",
)
def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signal
    (functions/text.py:repetition_stats): per document, the share of
    3-gram occurrences taken by its single most frequent 3-gram —
    near-1 flags boilerplate/degenerate loops for removal.
    NON-distinct grams (repeats ARE the signal), explode → two keyed
    aggregations; no per-element HOF over derived arrays (quadratic
    per doc)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return TXT.repetition_stats(docs, "doc_id", "text", k=3)


@_q(
    "curation_v2",
    rf"""
WITH {_NORM_DOCS},
{_SHINGLES},
fp AS (SELECT doc_id, md5(ntext) AS fp FROM norm),
dd AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 29 = 0),
cont AS (
  SELECT s.doc_id FROM sh s JOIN ev USING (shingle)
  WHERE s.doc_id % 29 <> 0
  GROUP BY s.doc_id HAVING count(*) >= 5
),
base AS (
  SELECT d.doc_id FROM dd d
  WHERE d.doc_id % 29 <> 0
    AND d.doc_id NOT IN (SELECT doc_id FROM cont)
),
tw AS (SELECT doc_id, list_filter(w, x -> x != '') AS w FROM toks),
g AS (
  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS gram
  FROM tw, unnest(range(1, greatest(len(w) - 1, 1))) t(i)
  WHERE len(w) >= 3
),
pg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
rep AS (
  SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS rep_ratio
  FROM pg GROUP BY doc_id
),
pii AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}'))
    + len(regexp_extract_all(text, '[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}'))
    + len(regexp_extract_all(text, '\+?[0-9]{{1,3}}[-. (]{{1,2}}[0-9]{{3}}[-. )]{{1,2}}[0-9]{{3}}[-. ]?[0-9]{{4}}')) AS n_pii
  FROM documents
),
kept AS (
  SELECT b.doc_id, r.rep_ratio, p.n_pii,
    ('0x' || substring(md5('cur' || CAST(b.doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000 AS bucket
  FROM base b JOIN rep r USING (doc_id) JOIN pii p USING (doc_id)
  WHERE r.rep_ratio <= 0.5
)
SELECT CASE WHEN bucket < 9000 THEN 'train'
            WHEN bucket < 9500 THEN 'val'
            ELSE 'test' END AS split,
  COUNT(*) AS n_docs,
  CAST(SUM(n_pii) AS BIGINT) AS total_pii,
  min(rep_ratio) AS min_rep, max(rep_ratio) AS max_rep
FROM kept GROUP BY 1 ORDER BY 1
""",
)
def curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 end-to-end curation pipeline as ONE composed Flow —
    every stage a library component over the same algebra: exact dedup
    (keep min doc_id per content fingerprint) → benchmark
    DECONTAMINATION (drop docs sharing ≥5 shingles with the held-out
    doc_id % 29 eval slice) → repetition gate (most-frequent-3-gram
    share ≤ 0.5, <3-token docs dropped with it) → PII audit
    (email/IP/phone counts ride along) → deterministic hash split →
    per-split report.  One Catalyst plan: fingerprint shuffle, shingle
    join, two gram aggregations, split projection — no driver
    materialization anywhere.  min/max rep_ratio are identical IEEE
    divisions on both engines (order-independent); total_pii is an
    integer sum."""
    from strom_spark import Decontaminate, HashSplit

    docs = spread(load_table(spark, sf_dir, "documents"))
    fp = docs.withColumn("fp", TXT.fingerprint("text"))
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    deduped = docs.join(keep, "doc_id", "left_semi")
    train = deduped.filter(F.col("doc_id") % 29 != 0)
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    clean = Decontaminate(
        "train", "eval", "clean", k=3, min_overlap=5, mode="drop"
    )(Flow({"train": train, "eval": ev}))["clean"]
    # clean feeds the repetition-stats branch AND the audit join's left
    # side — pin the decontaminated survivor set once instead of
    # running the dedup+decontaminate subtree per consumer (r14, the
    # shared-lineage rule; see _curation_v3_split)
    from pyspark import StorageLevel

    from strom_spark.cache import track as _cache_track

    clean = clean.persist(StorageLevel.MEMORY_AND_DISK).transform(_cache_track)
    reps = TXT.repetition_stats(clean, "doc_id", "text", k=3)
    counts = TXT.pii_counts("text")
    audited = (
        clean.join(reps.select("doc_id", "rep_ratio"), "doc_id")
        .filter(F.col("rep_ratio") <= 0.5)
        .withColumn(
            "n_pii",
            counts["n_email"] + counts["n_ipv4"] + counts["n_phone"],
        )
    )
    split = HashSplit(
        "docs", "out", key_col="doc_id",
        splits={"train": 0.9, "val": 0.05, "test": 0.05}, salt="cur",
    )(Flow({"docs": audited}))["out"]
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pii").cast("bigint").alias("total_pii"),
            F.min("rep_ratio").alias("min_rep"),
            F.max("rep_ratio").alias("max_rep"),
        )
        .orderBy("split")
    )


#: curation_v3's full CTE chain through `kept` (the audited survivor
#: set) — shared verbatim by the curation_v3 and curation_v4 oracles,
#: so the two reports can never drift on the doc set they describe.
_CURATION_V3_KEPT = rf"""
WITH {_NORM_DOCS},
{_SHINGLES},
fp AS (SELECT doc_id, md5(ntext) AS fp FROM norm),
dd AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 29 = 0),
cont AS (
  SELECT s.doc_id FROM sh s JOIN dd USING (doc_id) JOIN ev USING (shingle)
  WHERE s.doc_id % 29 <> 0
  GROUP BY s.doc_id HAVING count(*) >= 5
),
blk AS (
  SELECT n.doc_id FROM norm n
  WHERE ' ' || n.ntext || ' ' LIKE '% table scan %'
     OR ' ' || n.ntext || ' ' LIKE '% fast merge batch %'
     OR ' ' || n.ntext || ' ' LIKE '% big vector %'
),
base AS (
  SELECT d.doc_id FROM dd d
  WHERE d.doc_id % 29 <> 0
    AND d.doc_id NOT IN (SELECT doc_id FROM cont)
    AND d.doc_id NOT IN (SELECT doc_id FROM blk)
),
feats AS (
  SELECT t.doc_id,
    len(list_filter(w, x -> x != '')) AS n_tok,
    len(regexp_extract_all(d.text, '[^A-Za-z0-9\s]')) AS n_punct,
    len(list_filter(w, x -> list_contains(['the','a','an','and','or','of','to','in','is','it'], x))) AS n_stop,
    len(list_distinct(w)) AS n_uniq,
    length(d.text) AS n_chars,
    len(list_filter(w, x -> list_contains(['the','and','of','to','in','is','a'], x))) AS s_en,
    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht'], x))) AS s_de,
    len(list_filter(w, x -> list_contains(['le','la','les','et','est','une'], x))) AS s_fr,
    len(list_filter(w, x -> list_contains(['el','los','las','y','es','una'], x))) AS s_es
  FROM toks t JOIN base USING (doc_id) JOIN documents d ON t.doc_id = d.doc_id
),
scored AS (
  SELECT doc_id,
    0.3 * least(n_tok / 100.0, 1.0)
      + 0.25 * least((n_stop / greatest(n_tok, 1)) * 5, 1.0)
      + 0.25 * (1.0 - least((n_punct / greatest(n_chars, 1)) * 10, 1.0))
      + 0.2 * (n_uniq / greatest(n_tok, 1)) AS q,
    CASE WHEN s_en > 0 AND s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
         WHEN s_de > 0 AND s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
         WHEN s_fr > 0 AND s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
         WHEN s_es > 0 AND s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
         ELSE 'und' END AS lang
  FROM feats
),
gated AS (SELECT doc_id, q FROM scored WHERE lang = 'en' AND q >= 0.4),
tw AS (SELECT doc_id, list_filter(w, x -> x != '') AS w FROM toks),
g AS (
  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS gram
  FROM tw, unnest(range(1, greatest(len(w) - 1, 1))) t(i)
  WHERE len(w) >= 3
),
pg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
rep AS (
  SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS rep_ratio
  FROM pg GROUP BY doc_id
),
pii AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}'))
    + len(regexp_extract_all(text, '[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}'))
    + len(regexp_extract_all(text, '\+?[0-9]{{1,3}}[-. (]{{1,2}}[0-9]{{3}}[-. )]{{1,2}}[0-9]{{3}}[-. ]?[0-9]{{4}}')) AS n_pii
  FROM documents
),
kept AS (
  SELECT b.doc_id, b.q, r.rep_ratio, p.n_pii,
    ('0x' || substring(md5('cur' || CAST(b.doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000 AS bucket
  FROM gated b JOIN rep r USING (doc_id) JOIN pii p USING (doc_id)
  WHERE r.rep_ratio <= 0.5
)"""


@_q(
    "curation_v3",
    _CURATION_V3_KEPT
    + """
SELECT CASE WHEN bucket < 9000 THEN 'train'
            WHEN bucket < 9500 THEN 'val'
            ELSE 'test' END AS split,
  COUNT(*) AS n_docs,
  CAST(SUM(n_pii) AS BIGINT) AS total_pii,
  min(rep_ratio) AS min_rep, max(rep_ratio) AS max_rep,
  min(q) AS min_q, max(q) AS max_q
FROM kept GROUP BY 1 ORDER BY 1
""",
)
def curation_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE training-data curation pipeline as one composed
    Flow — curation_v2's stages plus the language-ID and quality gates
    of corpus_curation, so every curation capability the engine has
    runs in a single Catalyst plan with one monolithic composed oracle:

      exact dedup (min doc_id per content fingerprint, semi-join on the
      raw scan — cheap derived key, wide payload: the adjudicated
      ExactDedup shape) → benchmark DECONTAMINATION (drop docs sharing
      ≥5 shingles with the held-out doc_id % 29 eval slice) →
      BLOCKLIST compliance drop (PhraseBlocklist, whole-word phrase
      matching — round-5 extension; the oracle runs the equivalent
      LIKE predicates over the shared normalized-text CTE) →
      language-ID gate (en) + quality gate (q ≥ 0.4) → repetition gate
      (most-frequent-3-gram share ≤ 0.5) → PII audit → deterministic
      hash split → per-split report.

    Stage ORDER is deliberate: decontamination runs on raw deduped text
    BEFORE scoring, so the expensive quality/langid HOF subtree is
    computed exactly once, on the decontaminated survivors — the same
    double-compute trap fixed in corpus_curation this round, avoided by
    construction.  (Decontamination must not depend on quality gates
    anyway: a contaminated doc is contaminated regardless of quality.)
    Report aggregates are order-independent (count, integer sum,
    min/max) so the hash is engine-stable."""
    split = _curation_v3_split(spark, sf_dir)
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pii").cast("bigint").alias("total_pii"),
            F.min("rep_ratio").alias("min_rep"),
            F.max("rep_ratio").alias("max_rep"),
            F.min("q").alias("min_q"),
            F.max("q").alias("max_q"),
        )
        .orderBy("split")
    )


def _curation_v3_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curation_v3's pipeline through the hash split (shared with
    curation_v4, which continues into sequence packing): returns the
    audited survivor set with (doc_id, text, q, rep_ratio, n_pii,
    split)."""
    from strom_spark import Decontaminate, HashSplit, PhraseBlocklist

    raw = spread(load_table(spark, sf_dir, "documents"))
    # Blocklist FIRST, on the raw scan: PhraseBlocklist consumes its
    # input three times (one shingle explode per phrase length + the
    # anti-join back), so its input must be the cheap parquet scan,
    # not the composed dedup/decontaminate subtree (placing it after
    # decontamination tripled the whole plan: 22 -> 64 exchanges).
    # Matching is content-based on the SAME normalized text as the
    # dedup fingerprint, so every copy of a blocked content blocks and
    # the drop commutes exactly with min-id dedup — the oracle keeps
    # its order-independent formulation (blk excluded at base).
    deny = spark.createDataFrame(
        [("table scan",), ("fast merge batch",), ("big vector",)],
        "phrase string",
    )
    docs = PhraseBlocklist("docs", "deny", "ok", mode="drop")(
        Flow({"docs": raw, "deny": deny})
    )["ok"]
    fp = docs.withColumn("fp", TXT.fingerprint("text"))
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    deduped = docs.join(keep, "doc_id", "left_semi")
    train = deduped.filter(F.col("doc_id") % 29 != 0)
    ev = raw.filter(F.col("doc_id") % 29 == 0)
    clean = Decontaminate(
        "train", "eval", "clean", k=3, min_overlap=5, mode="drop"
    )(Flow({"train": train, "eval": ev}))["clean"]
    gated = (
        clean.select(
            "doc_id",
            "text",
            TXT.lang_id("text").alias("lang"),
            TXT.quality_features("text")["quality_score"].alias("q"),
        )
        .filter((F.col("lang") == "en") & (F.col("q") >= 0.4))
    )
    # gated is consumed TWICE (the repetition-stats branch and the
    # audit join's left side) and its lineage is the whole dedup →
    # decontaminate → langid/quality subtree — without pinning, that
    # subtree (including the quality/langid HOFs) executes once per
    # consumer.  Persist the survivor set once (r14; MEMORY_AND_DISK,
    # LRU-evictable, released via strom_spark.release_caches) — the
    # same shared-lineage rule every auto-mode operator applies.
    from pyspark import StorageLevel

    from strom_spark.cache import track as _cache_track

    gated = gated.persist(StorageLevel.MEMORY_AND_DISK).transform(_cache_track)
    reps = TXT.repetition_stats(gated, "doc_id", "text", k=3)
    counts = TXT.pii_counts("text")
    audited = (
        gated.join(reps.select("doc_id", "rep_ratio"), "doc_id")
        .filter(F.col("rep_ratio") <= 0.5)
        .withColumn(
            "n_pii",
            counts["n_email"] + counts["n_ipv4"] + counts["n_phone"],
        )
    )
    return HashSplit(
        "docs", "out", key_col="doc_id",
        splits={"train": 0.9, "val": 0.05, "test": 0.05}, salt="cur",
    )(Flow({"docs": audited}))["out"]


@_q(
    "curation_v4",
    _CURATION_V3_KEPT
    + """,
sp AS (
  SELECT doc_id,
    CASE WHEN bucket < 9000 THEN 'train'
         WHEN bucket < 9500 THEN 'val'
         ELSE 'test' END AS split
  FROM kept
),
ptc AS (
  SELECT s.doc_id, s.split,
    CAST(len(list_filter(t.w, x -> x != '')) AS BIGINT) AS n_tok,
    CAST((('0x' || substring(md5('pack' || CAST(s.doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000) % 4 AS INTEGER) AS pack_bucket
  FROM sp s JOIN toks t ON s.doc_id = t.doc_id
),
pk AS (
  SELECT split, pack_bucket, doc_id, n_tok,
    SUM(n_tok) OVER (PARTITION BY split, pack_bucket ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tok AS prev
  FROM ptc
)
SELECT split, pack_bucket,
  COUNT(*) AS n_docs,
  COUNT(DISTINCT prev // 512) AS n_seqs,
  CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM pk GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def curation_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curation_v3 carried one stage further — all the way to
    TRAINING-READY PACKED SEQUENCES, still as ONE Catalyst plan vs one
    monolithic composed oracle: the complete curation pipeline (dedup →
    decontaminate → blocklist → langid/quality gates → repetition gate
    → PII audit → hash split) feeds PackSequences with
    ``partition_by=['split']`` (round-6 extension), so concat-then-cut
    512-token windows are packed WITHIN each split across 4
    deterministic lanes — a sequence can never straddle the train/val
    boundary.  The report is per (split, lane): docs packed, sequences
    produced, tokens filled — the numbers a training job's data loader
    needs.  The oracle reuses curation_v3's CTE chain verbatim
    (shared constant) and replays the packing as a per-(split, lane)
    window cumsum, so the two composites can never drift on the doc
    set.  At 100 TB: the split column only refines the packing
    window's shuffle key; no stage was added to the plan, one keyed
    window shuffle beyond v3."""
    from strom_spark import PackSequences
    from strom_spark.functions import text as TX

    split = _curation_v3_split(spark, sf_dir).select(
        "doc_id", "split", TX.token_count("text").alias("n_tok")
    )
    packed = PackSequences(
        "docs", "packed", id_col="doc_id", tokens_col="n_tok",
        budget=512, n_buckets=4, partition_by=["split"],
    )(Flow({"docs": split}))["packed"]
    return (
        packed.groupBy("split", "pack_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("seq_id").alias("n_seqs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
        .orderBy("split", "pack_bucket")
    )


@_q(
    "curation_v5",
    _CURATION_V3_KEPT
    + rf""",
sp AS (
  SELECT doc_id,
    CASE WHEN bucket < 9000 THEN 'train'
         WHEN bucket < 9500 THEN 'val'
         ELSE 'test' END AS split
  FROM kept
),
gdoc AS (
  SELECT s.doc_id, s.split, coalesce(d.text, '') AS text,
    list_filter(t.w, x -> x != '') AS w
  FROM sp s JOIN documents d USING (doc_id) JOIN toks t USING (doc_id)
),
gm AS (
  SELECT doc_id, split, w,
    len(w) AS n, greatest(len(w), 1) AS sn,
    coalesce(length(array_to_string(w, '')), 0) AS sum_len,
    len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.')) AS n_sym,
    greatest(len(string_split(text, chr(10))), 1) AS n_lines,
    len(list_filter(string_split(text, chr(10)), l -> starts_with(trim(l), '-') OR starts_with(trim(l), '*') OR starts_with(trim(l), '•'))) AS n_bullet,
    len(list_filter(string_split(text, chr(10)), l -> ends_with(trim(l), '...'))) AS n_ellipsis,
    len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
    len(list_filter(['the','be','to','of','and','that','have','with'], s2 -> list_contains(w, s2))) AS n_stop
  FROM gdoc
),
gpass AS (
  SELECT doc_id, split, w FROM gm
  WHERE CAST(n >= 50 AND n <= 100000 AS INT)
      + CAST(sum_len / sn >= 3.0 AND sum_len / sn <= 10.0 AS INT)
      + CAST(n_sym / sn <= 0.1 AS INT)
      + CAST(n_bullet / n_lines < 0.9 AS INT)
      + CAST(n_ellipsis / n_lines < 0.3 AS INT)
      + CAST(n_alpha / sn >= 0.8 AS INT)
      + CAST(n_stop >= 2 AS INT) >= 5
),
win5 AS (
  SELECT doc_id, r.p, array_to_string(w[r.p+1:r.p+{_SUBSTR_K}], ' ') AS s
  FROM gpass, UNNEST(range(0, greatest(len(w) - {_SUBSTR_K} + 1, 0))) AS r(p)
),
occ5 AS (
  SELECT doc_id, p,
    count(*) OVER (PARTITION BY s) AS cnt,
    row_number() OVER (PARTITION BY s ORDER BY doc_id, p) AS rn
  FROM win5
),
cov5 AS (
  SELECT DISTINCT doc_id, p + o.off AS tp
  FROM occ5, UNNEST(range(0, {_SUBSTR_K})) AS o(off)
  WHERE cnt > 1 AND rn > 1
),
ntok5 AS (
  SELECT g.doc_id, g.split, len(g.w) - coalesce(c.nc, 0) AS n_tok
  FROM gpass g
  LEFT JOIN (SELECT doc_id, count(*) AS nc FROM cov5 GROUP BY doc_id) c
    USING (doc_id)
  WHERE len(g.w) - coalesce(c.nc, 0) > 0
),
ptc5 AS (
  SELECT doc_id, split, CAST(n_tok AS BIGINT) AS n_tok,
    CAST((('0x' || substring(md5('pack' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000) % 4 AS INTEGER) AS pack_bucket
  FROM ntok5
),
pk5 AS (
  SELECT split, pack_bucket, doc_id, n_tok,
    SUM(n_tok) OVER (PARTITION BY split, pack_bucket ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tok AS prev
  FROM ptc5
)
SELECT split, pack_bucket,
  COUNT(*) AS n_docs,
  COUNT(DISTINCT prev // 512) AS n_seqs,
  CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM pk5 GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def curation_v5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline at STATE-OF-THE-ART completeness — v4
    plus the two round-7 operators, still ONE Catalyst plan vs one
    monolithic oracle: dedup → decontaminate → blocklist → langid/
    quality/repetition gates → PII audit → hash split → **published
    Gopher rule gate** (n_rules_passed >= 5 of 7; the synthetic corpus
    can never pass r_stop_words, and the v3 survivor pool skews short
    — decontamination preferentially kills long template docs — so 5
    is the bar that drops multi-rule failures without emptying the
    report) →
    **exact substring dedup** (Lee et al. keep-first over the gated
    survivor corpus — duplication statistics computed on exactly the
    docs that will train, not the raw crawl) → split-isolated packed
    sequences.  Split assignment is a pure hash of doc_id, so it is
    RE-DERIVED after span dedup instead of joined back — zero extra
    shuffle for the bookkeeping.  The report is per (split, lane):
    docs, sequences, tokens — now counted over span-deduped text, so
    total_tokens is what the training job actually loads."""
    from strom_spark import HashSplit, PackSequences, SubstringDedup

    split = _curation_v3_split(spark, sf_dir)
    g = TXT.gopher_rules("text")
    gated = split.filter(g["n_rules_passed"] >= 5).select("doc_id", "text")
    dd = SubstringDedup("d", "o", k=_SUBSTR_K)(Flow({"d": gated}))["o"]
    resplit = HashSplit(
        "d", "o", key_col="doc_id",
        splits={"train": 0.9, "val": 0.05, "test": 0.05}, salt="cur",
    )(Flow({"d": dd}))["o"]
    packed = PackSequences(
        "docs", "packed", id_col="doc_id", tokens_col="n_tok",
        budget=512, n_buckets=4, partition_by=["split"],
    )(
        Flow(
            {
                "docs": resplit.select(
                    "doc_id", "split", F.col("n_kept").alias("n_tok")
                )
            }
        )
    )["packed"]
    return (
        packed.groupBy("split", "pack_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("seq_id").alias("n_seqs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
        .orderBy("split", "pack_bucket")
    )


@_q(
    "heavy_hitter_users",
    """
SELECT user_id, count(*) AS n
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id
HAVING count(*) > (SELECT count(user_id) // 150 FROM events)
""",
)
def heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (operators/relational.py:HeavyHitters):
    users contributing more than 1/150th of all events, via the two-pass
    Misra-Gries lowering — per-partition k-counter sketches (bounded
    state, no wide shuffle of every distinct user) find a guaranteed
    SUPERSET of the heavy hitters, then an exact count of only those
    candidates (broadcast semi-join) makes the output exact.  The SQL
    oracle is the plain GROUP BY ... HAVING the sketch replaces at
    scale."""
    from strom_spark import HeavyHitters

    events = load_table(spark, sf_dir, "events")
    # callable threshold: derived from the sketch pass's own row count —
    # the events table is scanned exactly twice (sketch + verify)
    return HeavyHitters(
        "e", "hh", value_col="user_id", min_count=lambda n: n // 150, k=1024
    )(Flow({"e": events}))["hh"]


@_q(
    "pack_sequences",
    rf"""
WITH {_NORM_DOCS},
tc AS (
  SELECT doc_id, CAST(len(list_filter(w, x -> x != '')) AS BIGINT) AS n_tok
  FROM toks
),
lanes AS (
  SELECT doc_id, n_tok,
    CAST((('0x' || substring(md5('pack' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000) % 4 AS INTEGER) AS pack_bucket
  FROM tc
),
packed AS (
  SELECT pack_bucket, doc_id, n_tok,
    SUM(n_tok) OVER (PARTITION BY pack_bucket ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tok AS prev
  FROM lanes
)
SELECT pack_bucket, CAST(prev // 512 AS BIGINT) AS seq_id,
  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS seq_tokens,
  CAST(MIN(prev % 512) AS BIGINT) AS first_offset
FROM packed GROUP BY 1, 2
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/packing.py PackSequences): documents
    -> whitespace token counts -> 4 deterministic md5-hash packing
    lanes -> concat-then-cut context windows of 512 tokens; the result
    aggregates per (lane, window): docs packed, tokens filled, first
    document's offset.  The assignment is a pure function of
    (doc_id, token count), so the oracle replays it with a window
    cumsum.  One shuffle (the per-lane sort); lanes bound per-task sort
    size at 100 TB."""
    from strom_spark import PackSequences
    from strom_spark.functions import text as TX

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", TX.token_count("text").alias("n_tok")
    )
    out = PackSequences(
        "docs", "packed", id_col="doc_id", tokens_col="n_tok", budget=512, n_buckets=4
    )(Flow({"docs": docs}))["packed"]
    return out.groupBy("pack_bucket", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("seq_tokens"),
        F.min("tok_offset").alias("first_offset"),
    )


@_q(
    "slice_divergence",
    rf"""
WITH {_NORM_DOCS},
tok AS (
  SELECT t.doc_id, u.t
  FROM toks t, unnest(list_filter(t.w, x -> x != '')) u(t)
),
cst AS (
  SELECT d.source AS g, tok.t, COUNT(*) AS cst
  FROM tok JOIN documents d ON tok.doc_id = d.doc_id
  GROUP BY 1, 2
),
ct AS (SELECT t, CAST(SUM(cst) AS BIGINT) AS ct FROM cst GROUP BY t),
ns AS (SELECT g, CAST(SUM(cst) AS BIGINT) AS ns FROM cst GROUP BY g),
n AS (SELECT CAST(SUM(ns) AS BIGINT) AS n FROM ns)
SELECT cst.g AS source, ns.ns AS n_tok,
  CAST(SUM(CAST(round((cst.cst / ns.ns) * ln((cst.cst * n.n) / (ns.ns * ct.ct)), 6) AS DECIMAL(18,6))) AS DOUBLE) AS kl
FROM cst JOIN ct ON cst.t = ct.t JOIN ns ON cst.g = ns.g, n
GROUP BY cst.g, ns.ns
""",
)
def slice_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift monitor (operators/textrank.py
    SliceDivergence): per-source KL(P_slice || P_corpus) over unigram
    distributions — the corpus-QA signal that flags drifted/mis-routed
    sources.  One corpus explode; per-(slice,term) counts are the
    checkpointed sufficient statistic; contributions rounded to 6 dp
    and summed as DECIMAL (shuffle-order independent, the BM25
    discipline)."""
    from strom_spark import SliceDivergence

    docs = load_table(spark, sf_dir, "documents")
    return SliceDivergence("docs", "kl", group_col="source", text_col="text")(
        Flow({"docs": docs})
    )["kl"]


def _kmeans_oracle(k: int = 8, dim: int = 64, iters: int = 2) -> str:
    """Unrolled-Lloyd DuckDB oracle: seeds = first k by vec_id; each
    iteration = argmin assignment (lower-cluster tie-break) + exact
    DECIMAL per-dimension mean; output = integer-only per-cluster
    stats (floating point never reaches the hash)."""
    dist = (
        "list_sum(list_transform(generate_series(1, {d}), "
        "i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])))"
    ).format(d=dim)
    sql = [
        "WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),",
        f"cents0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS c FROM emb ORDER BY vec_id LIMIT {k}),",
    ]
    for it in range(iters):
        nxt = it + 1
        sql.append(
            f"""assign{it} AS (
  SELECT vec_id, v, cluster FROM (
    SELECT e.vec_id, e.v, c.cluster,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY {dist}, c.cluster) AS rk
    FROM emb e, cents{it} c
  ) WHERE rk = 1
),
means{nxt} AS (
  SELECT cluster, i,
    CAST(SUM(CAST(v[i] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS x
  FROM assign{it}, unnest(generate_series(1, {dim})) t(i)
  GROUP BY cluster, i
),
cents{nxt} AS (
  SELECT p.cluster, COALESCE(n.c, p.c) AS c
  FROM cents{it} p LEFT JOIN (
    SELECT cluster, list(x ORDER BY i) AS c FROM means{nxt} GROUP BY cluster
  ) n ON p.cluster = n.cluster
),"""
        )
    sql.append(
        f"""final AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY {dist}, c.cluster) AS rk
    FROM emb e, cents{iters} c
  ) WHERE rk = 1
)
SELECT CAST(cluster AS INTEGER) AS cluster, COUNT(*) AS n,
  MIN(vec_id) AS min_vid, MAX(vec_id) AS max_vid
FROM final GROUP BY cluster"""
    )
    return "\n".join(sql)


@_q("kmeans_embedding_clusters", _kmeans_oracle())
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (operators/clustering.py
    LloydKMeans): k=8, 2 full-corpus iterations over the embedding
    table — per round, assignment is a narrow argmin projection (JVM
    codegen) and the mean update ONE keyed hash-agg; the driver holds
    exactly k rows of per-dimension DECIMAL sums (shuffle-order-exact
    centroids), never the corpus.  The oracle unrolls the same two
    iterations in SQL; the compared output is integer-only (cluster
    sizes + id ranges), so engine ulp differences in distance sums
    cannot touch the hash (argmin margins absorb them)."""
    from strom_spark import LloydKMeans

    emb = load_table(spark, sf_dir, "embeddings")
    out = LloydKMeans(
        "emb", "o", id_col="vec_id", vec_col="embedding", dim=64, k=8, iters=2
    )(Flow({"emb": emb}))["o"]
    return out.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("vec_id").alias("min_vid"),
        F.max("vec_id").alias("max_vid"),
    )


@_q(
    "grouping_sets_orders",
    """
SELECT o_orderstatus, o_orderpriority,
  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
  COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube desugar
    to; completes the subtotal trio next to rollup_revenue and
    cube_lineitem_flags): per-(status, priority) revenue, per-status
    subtotals, and the grand total in ONE partial+final hash-agg pass
    (grouping-set rows expanded map-side, no extra shuffle).
    grouping_id uses the same bitmask convention as DuckDB GROUPING
    (first grouping column = high bit)."""
    flow = Flow({"orders": load_table(spark, sf_dir, "orders")})
    out = Agg(
        "orders",
        "agg",
        by=["o_orderstatus", "o_orderpriority"],
        mode="grouping_sets",
        sets=[["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        aggs={
            "gid": F.grouping_id().cast("bigint"),
            "n": F.count("*"),
            "revenue": F.sum(_dec("o_totalprice")).cast("double"),
        },
    )(flow)
    return out["agg"].select(
        "o_orderstatus", "o_orderpriority", "gid", "n", "revenue"
    )


@_q(
    "fuzzy_name_pairs",
    """
WITH n AS (SELECT c_custkey AS id, c_name AS s FROM customer),
v AS (
  SELECT id, s, s AS var FROM n
  UNION ALL
  SELECT id, s, substring(s, 1, i - 1) || substring(s, i + 1) AS var
  FROM n, unnest(range(1, length(s) + 1)) t(i)
),
cand AS (
  SELECT DISTINCT a.id AS id1, a.s AS s1, b.id AS id2, b.s AS s2
  FROM v a JOIN v b ON a.var = b.var AND a.id < b.id
)
SELECT id1, id2, CAST(levenshtein(s1, s2) AS BIGINT) AS dist
FROM cand WHERE levenshtein(s1, s2) <= 1
""",
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance self-join (operators/fuzzy.py EditDistanceJoin):
    every customer-name pair within Levenshtein distance 1, found via
    ED-Join q-gram prefix filtering (q=3: rarest-4-gram inverted
    index + length filter + exact levenshtein verify) — never
    all-pairs.  The oracle (rewritten bounded, round 8 — the previous
    brute-force 15k×15k levenshtein scan stalled DuckDB for 45+
    CPU-min at sf0.1) uses the FastSS deletion-variant identity:
    ed(s1,s2) ≤ 1 ⟹ s1 and s2 share a member of {s} ∪ del1(s)
    (equal strings share s itself; a substitution shares the
    delete-at-that-position variant; an insertion/deletion shares the
    shorter string).  Variants are near-unique, so the candidate join
    is ~output-sized, and the exact levenshtein verify runs on
    candidates only — an INDEPENDENT bounded algorithm (deletion
    variants) certifying the engine's q-gram strategy."""
    from strom_spark import EditDistanceJoin

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    out = EditDistanceJoin(
        "cust", "pairs", id_col="c_custkey", str_col="c_name", max_dist=1, q=3
    )(Flow({"cust": cust}))["pairs"]
    return out.select("id1", "id2", F.col("dist").cast("bigint").alias("dist"))


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


# The driver's correctness gate samples the FIRST 50 queries of this
# dict; with more registered than that, plain registration order would
# leave the same tail permanently unsampled.  Export
# LEAST-RECENTLY-GREEN first: scan the driver's own CORRECTNESS_r*.json
# artifacts and order by the last round each query got a GREEN driver
# row (hash-matched, or the rows-only best-outcome for oracle-less
# ops).  A red row counts as never-signed, so a query fixed after a
# driver failure automatically leads the very next window instead of
# waiting out the rotation.  Never-signed queries first, registration
# order as the tie-break.


def _row_green(name: str, row: dict) -> bool:
    """A driver row counts as 'signed' only when it is its best
    possible outcome TODAY: hash-matched for queries that currently
    register a SQL oracle, or a successful rows-only run
    (err == 'no_oracle') for queries that deliberately register none.

    The oracle check is against the CURRENT registry, not the round
    the row was recorded: a query that gained (or changed) its oracle
    after an old rows-only signature must sort as never-signed, so it
    re-enters the export window and gets driver-checked under the
    real oracle (this is how approx_distinct_users sat unsampled for
    two rounds after its r4 oracle fix)."""
    err = row.get("err")
    if err == "no_oracle":
        return name not in _ORACLES and row.get("spark_rows") is not None
    if err:
        return False
    return (
        bool(row.get("rows_match"))
        and bool(row.get("schema_match"))
        and bool(row.get("hash_match"))
    )


def _export_order() -> list[str]:
    import glob
    import json
    import re

    last_signed: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and _row_green(name, row):
                last_signed[name] = max(last_signed.get(name, 0), rnd)
    names = list(_QUERIES)
    reg_pos = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (last_signed.get(n, -1), reg_pos[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: _QUERIES[n] for n in _export_order()}


def oracle_sql() -> dict[str, str]:
    return {n: _ORACLES[n] for n in _export_order() if n in _ORACLES}
