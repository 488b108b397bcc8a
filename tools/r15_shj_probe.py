"""SHJ-default certification at sf1.0 (r15, verdict #7).

The r14 session default `spark.sql.join.preferSortMergeJoin=false`
rested on an sf0.1 A/B.  This probe re-runs a join-heavy query subset
at sf1.0 (10× the bench SF) with the conf flipped per arm INSIDE one
session (it is a runtime SQL conf), arms alternated per query so box
drift hits both, recording wall times and per-run spill deltas from
the UI REST API — the OOM-risk signature the verdict asked to check
(a shuffled hash join's build side must fit per-partition memory; a
misestimate shows up first as execution-memory spill).

Usage: SPARK_GRAFT_CPUS=32 python tools/r15_shj_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("STROM_SPARK_UI", "true")

import __spark_entry__ as entrymod
from strom_spark import get_spark, release_caches

QUERIES = [
    "q3_shipping_priority",
    "q9_product_profit",
    "q18_large_orders",
    "q21_waiting_supplier",
    "top3_customers_per_nation",
    "bloom_prefilter_join",
    "salted_skew_join",
    "copurchase_similar_parts",
    "dedup_minhash_lsh",
    "pagerank_order_part",
]


def _exec_metrics():
    """(sum memoryBytesSpilled, sum diskBytesSpilled, failedTasks)
    across executors from the live UI."""
    import urllib.request

    base = "http://localhost:4040/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    total_mem = total_disk = failed = 0
    for s in json.load(
        urllib.request.urlopen(
            f"{base}/applications/{app_id}/stages?status=COMPLETE"
        )
    ):
        total_mem += s.get("memoryBytesSpilled", 0)
        total_disk += s.get("diskBytesSpilled", 0)
        failed += s.get("numFailedTasks", 0)
    return total_mem, total_disk, failed


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1.0"
    spark = get_spark("r15_shj_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2_000_000).selectExpr("sum(id * 2)").collect()

    def canary():
        out = []
        for _ in range(3):
            t0 = time.time()
            spark.range(40_000_000).selectExpr(
                "count(if(md5(cast(id as string)) > 'f0', 1, null)) as n"
            ).collect()
            out.append(time.time() - t0)
        return round(min(out), 3)

    qs = entrymod.queries()
    out: dict = {"sf_dir": sf_dir, "canary_start_s": canary(), "queries": {}}
    for qi, name in enumerate(QUERIES):
        fn = qs[name]
        row: dict = {}
        arms = ("shj", "smj") if qi % 2 == 0 else ("smj", "shj")
        for arm in arms:
            spark.conf.set(
                "spark.sql.join.preferSortMergeJoin",
                "false" if arm == "shj" else "true",
            )
            runs = []
            m0 = _exec_metrics()
            for _ in range(2):
                t0 = time.time()
                spark.sparkContext.setJobDescription(f"shjprobe:{name}:{arm}")
                fn(spark, sf_dir).count()
                runs.append(round(time.time() - t0, 3))
            m1 = _exec_metrics()
            release_caches()
            row[arm] = {
                "runs": runs,
                "warm_s": runs[1],
                "mem_spill_bytes": m1[0] - m0[0],
                "disk_spill_bytes": m1[1] - m0[1],
                "failed_tasks": m1[2] - m0[2],
            }
            print(json.dumps({name: {arm: row[arm]}}), flush=True)
        out["queries"][name] = row
    out["canary_end_s"] = canary()
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "plans", "r15",
            "shj_probe_sf1.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
