"""Round-14 measurement harness (guide §1): isolate named queries with
the noop sink and capture .explain("formatted") into plans/r15/.

Usage:
  python tools/r15_measure.py [--plans-only] [--tag before|after] q1 q2 ...

Per query:
  - builds the DataFrame, writes plans/r15/<q>_<tag>.txt (formatted plan)
  - unless --plans-only: times 1 cold + 2 warm noop-sink executions
    (df.write.format("noop") — computes every column, avoids count()'s
    column pruning) and prints cold/warm-min seconds.

Queries with driver-side loops (pagerank, CC, iterate, kmeans) execute
jobs at build time; their build time is reported separately so the
noop number isolates the final-plan execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from strom_spark import get_spark, release_caches


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans_only = "--plans-only" in args
    args = [a for a in args if a != "--plans-only"]
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = args or []
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark("r15_measure")
    spark.sparkContext.setLogLevel("ERROR")
    # generic warmup (bench.py discipline)
    spark.range(2_000_000).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def canary():
        out = []
        for _ in range(3):
            t0 = time.time()
            spark.range(40_000_000).selectExpr(
                "count(if(md5(cast(id as string)) > 'f0', 1, null)) as n"
            ).collect()
            out.append(time.time() - t0)
        return round(min(out), 3)

    box_canary_s = canary()

    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    results = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"r15:{name}:build")
        t0 = time.time()
        df = fn(spark, sf_dir)
        build_s = round(time.time() - t0, 3)
        import contextlib, io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        row = {"build_s": build_s}
        if not plans_only:
            runs = []
            for i in range(3):
                spark.sparkContext.setJobDescription(f"r15:{name}:noop{i}")
                t0 = time.time()
                if i == 0:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    # warm runs rebuild the frame so driver-loop queries
                    # re-execute their setup jobs too (bench parity)
                    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
            row.update({"cold_noop_s": runs[0], "warm_noop_min_s": min(runs[1:]),
                        "runs": runs})
        results[name] = row
        print(json.dumps({name: row}), flush=True)
        release_caches()
    payload = {"sf_dir": sf_dir, "tag": tag, "box_canary_s": box_canary_s,
               "box_canary_end_s": canary(), "results": results}
    print(json.dumps(payload, indent=1))
    with open(os.path.join(outdir, f"measure_{tag}.jsonl"), "a") as f:
        f.write(json.dumps(payload) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
