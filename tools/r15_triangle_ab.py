"""Interleaved A/B for the r15 TriangleCount adjacency-intersect
closure (verdict #1): flips TriangleCount._CLOSURE between "wedge"
(pre-r15 self-join + closure equi-join) and "adj" (r15
adjacency-intersect) inside ONE Spark session, alternating arms so box
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
from strom_spark.operators.graph import TriangleCount


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "4"))
    qname = os.environ.get("AB_QUERY", "triangle_counts")
    spark = get_spark("r15_triangle_ab")
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
    res = {"wedge": [], "adj": []}
    c0 = canary()
    for rep in range(reps):
        arms = ("wedge", "adj") if rep % 2 == 0 else ("adj", "wedge")
        for arm in arms:
            TriangleCount._CLOSURE = arm
            runs = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).count()
                runs.append(round(time.time() - t0, 3))
            release_caches()
            res[arm].append(runs)
            print(json.dumps({"rep": rep, "arm": arm, "runs": runs}),
                  flush=True)
    TriangleCount._CLOSURE = "adj"
    c1 = canary()
    summary = {
        "canary_start_s": c0, "canary_end_s": c1, "query": qname,
        "arm_wedge": res["wedge"], "arm_adj": res["adj"],
        "warm_min_wedge": min(r[1] for r in res["wedge"]),
        "warm_min_adj": min(r[1] for r in res["adj"]),
    }
    print(json.dumps(summary, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "plans", "r15",
            "triangle_ab.jsonl"), "a") as f:
        f.write(json.dumps(summary) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
