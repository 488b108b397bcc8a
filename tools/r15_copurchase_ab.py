"""Interleaved A/B for the r15 CoOccurrenceJaccard collect_set rewrite
(verdict #6): the OLD formulation (distinct postings + cap semi-join +
group-keyed equi-self-join) is inlined here verbatim from the pre-r15
operator; the NEW arm calls the registered query.  Arms alternate in
ONE Spark session; timed region = build + count, identical to
bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import Window as W
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from strom_spark import get_spark, release_caches


def old_copurchase(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li0 = (
        li.select(F.col("l_orderkey").alias("__g"), F.col("l_partkey").alias("__i"))
        .distinct()
    )
    ok = li0.groupBy("__g").agg(F.count(F.lit(1)).alias("__n")).filter(
        F.col("__n") <= 1000
    )
    cap = li0.join(ok.select("__g"), "__g").persist(StorageLevel.MEMORY_AND_DISK)
    sizes = cap.groupBy("__i").agg(F.count(F.lit(1)).alias("__n"))
    a, b = cap.alias("a"), cap.alias("b")
    pairs = (
        a.join(b, (F.col("a.__g") == F.col("b.__g")) & (F.col("a.__i") < F.col("b.__i")))
        .groupBy(F.col("a.__i").alias("u"), F.col("b.__i").alias("v"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    jac = (
        pairs.join(sizes.withColumnRenamed("__i", "u").withColumnRenamed("__n", "nu"), "u")
        .join(sizes.withColumnRenamed("__i", "v").withColumnRenamed("__n", "nv"), "v")
        .select("u", "v", F.round(F.col("__c") / (F.col("nu") + F.col("nv") - F.col("__c")), 6).alias("jaccard"))
    )
    both = jac.select(F.col("u").alias("part_id"), F.col("v").alias("other"), "jaccard").unionByName(
        jac.select(F.col("v").alias("part_id"), F.col("u").alias("other"), "jaccard")
    )
    w = W.partitionBy("part_id").orderBy(F.col("jaccard").desc(), F.col("other"))
    out = both.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)
    df = out.select("part_id", "other", "jaccard", "rank")
    df.count()
    cap.unpersist()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "4"))
    spark = get_spark("r15_copurchase_ab")
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

    fn_new = entrymod.queries()["copurchase_similar_parts"]
    res = {"old": [], "new": []}
    c0 = canary()
    for rep in range(reps):
        arms = ("old", "new") if rep % 2 == 0 else ("new", "old")
        for arm in arms:
            runs = []
            for _ in range(2):
                t0 = time.time()
                if arm == "old":
                    old_copurchase(spark, sf_dir)
                else:
                    fn_new(spark, sf_dir).count()
                runs.append(round(time.time() - t0, 3))
            release_caches()
            res[arm].append(runs)
            print(json.dumps({"rep": rep, "arm": arm, "runs": runs}), flush=True)
    c1 = canary()
    summary = {
        "canary_start_s": c0, "canary_end_s": c1,
        "query": "copurchase_similar_parts",
        "arm_old_selfjoin": res["old"], "arm_new_collect_set": res["new"],
        "warm_min_old": min(r[1] for r in res["old"]),
        "warm_min_new": min(r[1] for r in res["new"]),
    }
    print(json.dumps(summary, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "plans", "r15",
            "copurchase_ab.jsonl"), "a") as f:
        f.write(json.dumps(summary) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
