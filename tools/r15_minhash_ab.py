"""Interleaved A/B for the r15 int64-shingle verify sets (verdict #8):
monkeypatches MinHashLSHPairs._doc_shingles between the NEW (hashed
array<bigint>) and OLD (array<string>) forms inside one session, arms
alternated.  The old arm needs the old signature postings too (they
re-hash the string) — handled by a paired _signatures_from_shingles
patch.  Timed region = build + count, identical to bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from strom_spark import get_spark, release_caches
from strom_spark.operators import dedup as D
from strom_spark.operators.dedup import MinHashLSHPairs, _spread
from strom_spark.functions import text as TXT


def _doc_shingles_old(self, df):
    slim = _spread(
        df.select(F.col(self.id_col).alias("id"), F.col(self.text_col).alias("__text"))
    )
    toks = slim.select("id", TXT.tokens("__text").alias("__toks"))
    return toks.select(
        "id", TXT.shingles_of_tokens(F.col("__toks"), self.k).alias("sh")
    )


def _sigs_old(self, doc_sh, num_hashes):
    import random

    postings = doc_sh.select("id", F.explode("sh").alias("shingle")).select(
        "id", F.pmod(F.xxhash64("shingle"), F.lit(self._P)).alias("__h")
    )
    rng = random.Random(97)
    coeffs = [
        (rng.randrange(1, self._P), rng.randrange(0, self._P))
        for _ in range(num_hashes)
    ]
    se = "named_struct(" + ", ".join(
        f"'h{i}', min(pmod({a}L * __h + {b}L, {self._P}L))"
        for i, (a, b) in enumerate(coeffs)
    ) + ")"
    return (
        postings.groupBy("id")
        .agg(F.expr(se).alias("__sig"))
        .select("id", "__sig.*")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "4"))
    qname = os.environ.get("AB_QUERY", "dedup_minhash_lsh")
    # --pin mode: both arms run the NEW int64 shingles; the flipped
    # variable is MinHashLSHPairs._PERSIST_PINNED (old = no persist on
    # the pinned path, new = persist) — evidence for the r15 revisit
    # of the r14 pinned-persist revert.
    pin_mode = "--pin" in sys.argv
    spark = get_spark("r15_minhash_ab")
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

    new_ds = MinHashLSHPairs._doc_shingles
    new_sig = MinHashLSHPairs._signatures_from_shingles
    fn = entrymod.queries()[qname]
    res = {"old": [], "new": []}
    c0 = canary()
    for rep in range(reps):
        arms = ("old", "new") if rep % 2 == 0 else ("new", "old")
        for arm in arms:
            if pin_mode:
                MinHashLSHPairs._PERSIST_PINNED = arm == "new"
            elif arm == "old":
                MinHashLSHPairs._doc_shingles = _doc_shingles_old
                MinHashLSHPairs._signatures_from_shingles = _sigs_old
            else:
                MinHashLSHPairs._doc_shingles = new_ds
                MinHashLSHPairs._signatures_from_shingles = new_sig
            runs = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).count()
                runs.append(round(time.time() - t0, 3))
            release_caches()
            res[arm].append(runs)
            print(json.dumps({"rep": rep, "arm": arm, "runs": runs}), flush=True)
    MinHashLSHPairs._doc_shingles = new_ds
    MinHashLSHPairs._signatures_from_shingles = new_sig
    MinHashLSHPairs._PERSIST_PINNED = True
    c1 = canary()
    summary = {
        "canary_start_s": c0, "canary_end_s": c1, "query": qname,
        "mode": "pin_persist" if pin_mode else "int64_shingles",
        "arm_old": res["old"], "arm_new": res["new"],
        "warm_min_old": min(r[1] for r in res["old"]),
        "warm_min_new": min(r[1] for r in res["new"]),
    }
    print(json.dumps(summary, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "plans", "r15",
            "minhash_pin_ab.jsonl" if pin_mode else "minhash_ab.jsonl"),
            "a") as f:
        f.write(json.dumps(summary) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
