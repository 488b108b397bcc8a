"""Capture loop-body plans for the iterative graph queries (r15).

``localCheckpoint``/persist truncate the top-level plan, so the
per-round join/exchange story of PageRank and ConnectedComponents is
invisible to plans/r15/<q>_{before,after}.txt.  This tool wraps the
query build in strom_spark.capture_loop_plans() and writes every
probed stage's formatted plan plus an Exchange/join summary per round.

Usage: python tools/r15_loop_probe.py <tag> <query> [query ...]
Writes plans/r15/<query>_loop_<tag>.txt
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from strom_spark import capture_loop_plans, get_spark, release_caches


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entrymod.queries()
    spark = get_spark("r15_loop_probe")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        with capture_loop_plans() as plans:
            qs[name](spark, sf_dir)
        lines = []
        for i, (stage, df) in enumerate(plans):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
            n_ex = len(re.findall(r"\bExchange\b", txt.split("===")[0]))
            joins = re.findall(
                r"\b(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)\b",
                txt,
            )
            lines.append(
                f"##### probe {i}: {stage} — Exchange x{n_ex}, joins: "
                + (", ".join(sorted(set(joins))) or "none")
            )
            lines.append(txt)
        with open(os.path.join(outdir, f"{name}_loop_{tag}.txt"), "w") as f:
            f.write("\n".join(lines))
        print(f"{name}: {len(plans)} probes -> {name}_loop_{tag}.txt")
        release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
