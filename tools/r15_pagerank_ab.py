"""Interleaved A/B for the r15 PageRank lazy-unroll (verdict #4).

Flips PageRank._TRUNCATE_EVERY between 1 (per-round localCheckpoint —
the r14 behavior) and 6 (lazy unroll: the registered 5-round queries
never truncate) inside ONE Spark session, alternating arms so box
drift hits both equally.  Timed region = fn(spark, sf_dir) + count(),
identical to bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from strom_spark import get_spark, release_caches
from strom_spark.operators.graph import PageRank


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "4"))
    qname = os.environ.get("AB_QUERY", "pagerank_order_part")
    spark = get_spark("r15_pagerank_ab")
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

    fn = entrymod.queries()[qname]
    res = {1: [], 6: []}
    c0 = canary()
    for rep in range(reps):
        for cad in (1, 6) if rep % 2 == 0 else (6, 1):
            PageRank._TRUNCATE_EVERY = cad
            # 1 cold + 1 warm per arm per rep; caches released between
            # arms so each arm pays its own persist population
            runs = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).count()
                runs.append(round(time.time() - t0, 3))
            release_caches()
            res[cad].append(runs)
            print(json.dumps({"rep": rep, "cadence": cad, "runs": runs}),
                  flush=True)
    c1 = canary()
    summary = {
        "canary_start_s": c0, "canary_end_s": c1, "query": qname,
        "arm_checkpoint_per_round": res[1], "arm_lazy_unroll": res[6],
        "warm_min_checkpoint": min(r[1] for r in res[1]),
        "warm_min_lazy": min(r[1] for r in res[6]),
    }
    print(json.dumps(summary, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "plans", "r15",
            "pagerank_ab.jsonl"), "a") as f:
        f.write(json.dumps(summary) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
