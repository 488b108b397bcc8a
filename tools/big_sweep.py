"""Chunked full-registry correctness sweep for big scale factors.

Runs tools/check_correctness.py over EVERY registered query at a given
sf_dir, 8 queries per subprocess (the r9 lesson: one long-lived
Spark+DuckDB process OOM-cascades at decade scale — a 143M-row collect
poisons the heap for every later oracle, and thread handles exhaust),
parses the per-query PASS/FAIL/SKIP lines, and writes one artifact
JSON.

Queries whose DuckDB oracle is infeasible at this SF (timeout or
rows-cap) are re-certified through their SELF-VERIFYING invariant row
(r10 verdict task 2) when one is registered: the invariant runs the
SAME operator at this SF with a constant-flag oracle, so the operator
is still correctness-checked — the artifact records status
PASS(invariant) with the covering row, instead of a bare SKIP.

Usage: python tools/big_sweep.py <sf_dir> <out_json> [sf] [chunk_size] [scale]

The optional 5th arg ``scale`` (r12 verdict task 1) restricts the
sweep to SCALE_SUBSET — the ~20 scale-critical queries whose 100-TB
story carries the repo (dedup family, LSH/IVF recall floors,
graph invariants, curation_v5, CEP, hot-key detection) — for
second-decade (sf10) certification where a 157-query full sweep is
wall-clock infeasible and most oracles are anyway covered by their
self-verifying floor/invariant rows.  SCALE_EXCLUDED documents the
rows that CANNOT run at sf10 and why, so the artifact carries the
exclusion list instead of silence.
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: oracle-infeasible query -> the registered invariant/floor row that
#: certifies the same operator at this SF (r10 verdict task 2; r12
#: adds the LSH/IVF rows whose exact-replay oracles go quadratic at
#: decade scale while their planted/constant floor rows stay valid at
#: every SF)
INVARIANT_COVER = {
    "pagerank_order_part": "pagerank_mass_invariant",
    "triangle_counts": "triangle_doubling_invariant",
    # r13: the capped row's oracle replays the degree-cap wedge join in
    # DuckDB — value-hash green at sf0.01/0.1 where the join is
    # feasible; above that the wedge machinery is covered by the
    # doubling invariant (cap semantics don't change with SF)
    "triangle_capped_counts": "triangle_doubling_invariant",
    "embedding_clusters": "cc_label_invariant",
    "dedup_minhash_lsh": "minhash_recall_floor",
    "dedup_minhash_clusters": "minhash_recall_floor",
    "ivf_index_search": "ann_recall_floor",
    "cosine_lsh_prod": "lsh_auto_recall_floor",
    "semdedup_flags": "semdedup_dup_floor",
    # r14: the batch CEP row's 15M-row sf10 output exceeds the collect
    # cap; its registered 1-row aggregate twin value-hashes the full
    # decision distribution in-sweep (no more hand-annotated covers)
    "cep_order_fulfillment": "cep_decision_invariant",
}

#: the second-decade certification subset (r12 verdict task 1): the
#: scale-critical operators, certified at sf10 by oracle where DuckDB
#: can replay it and by their self-verifying invariant/floor rows
#: where it can't
SCALE_SUBSET = [
    # dedup family
    "dedup_exact", "dedup_minhash_lsh", "dedup_minhash_clusters",
    "minhash_recall_floor", "substring_dedup_docs", "semdedup_dup_floor",
    "line_dedup_docs", "intra_doc_line_dedup",
    # embedding / ANN floors + production LSH
    "lsh_auto_recall_floor", "cosine_lsh_prod", "lsh_recall_floor",
    "ann_recall_floor", "sq8_recall_floor", "ivf_index_search",
    # graph invariants (cover the oracle-infeasible graph queries)
    "pagerank_order_part", "pagerank_mass_invariant",
    "triangle_doubling_invariant",
    # composites / relational / skew
    "curation_v5", "cep_order_fulfillment", "cep_decision_invariant",
    "hot_key_detection",
    # r14: the previously-excluded pinned-config demo rows, now bounded
    # BY REGISTRATION at their certified design corpus (_EMB_DEMO_CAP /
    # the sf1.0 order keyspace — the triangle_doubling_invariant
    # precedent applied family-wide), so every scale-critical row runs
    # at sf10 and the exclusion list is empty
    "dedup_embedding", "embedding_dedup_recall_floor",
    "embedding_clusters", "cc_label_invariant",
    "semdedup_flags", "triangle_counts",
]

#: rows that cannot run at this SF AT ALL, with compensating coverage.
#: EMPTY since r14: the six pinned-config demo rows that used to live
#: here (dedup_embedding, embedding_dedup_recall_floor,
#: embedding_clusters, cc_label_invariant, semdedup_flags,
#: triangle_counts) are now bounded BY REGISTRATION at their certified
#: design corpus — vec_id < _EMB_DEMO_CAP (= the full corpus at
#: <= sf1.0) for the embedding family, l_orderkey < 1.5e6 (= all
#: orders at <= sf1.0) for the triangle row — so their fixed-parameter
#: quadratics (candidates ~ N²/2^bits at fixed bits, Σcᵢ² = N²/k at
#: fixed k, wedge volume Σd²) stay at the certified sf1.0 size at any
#: SF and every scale-critical row runs in the sweep.  Full-corpus
#: decade coverage is the auto-sized twins (cosine_lsh_prod,
#: lsh_auto_recall_floor, semdedup_dup_floor, minhash_recall_floor,
#: triangle_capped_counts / triangle_doulion_floor /
#: triangle_doubling_invariant).
SCALE_EXCLUDED: dict[str, str] = {}

LINE = re.compile(
    r"^(PASS|FAIL|SKIP|ok\?)\s+(\S+?):\s*(.*)$"
)


def main() -> int:
    sf_dir = sys.argv[1]
    out_json = sys.argv[2]
    sf = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    scale_mode = len(sys.argv) > 5 and sys.argv[5] == "scale"

    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    if scale_mode:
        missing = [n for n in SCALE_SUBSET if n not in names]
        if missing:
            raise SystemExit(f"SCALE_SUBSET names not registered: {missing}")
        names = list(SCALE_SUBSET)
    env = dict(
        os.environ,
        SPARK_GRAFT_ORACLE_TIMEOUT=os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "240"),
        SPARK_GRAFT_MAX_ROWS=os.environ.get("SPARK_GRAFT_MAX_ROWS", "5000000"),
    )
    results: dict[str, dict] = {}
    t_start = time.time()
    for i in range(0, len(names), chunk):
        batch = names[i : i + chunk]
        print(f"--- chunk {i // chunk + 1}: {batch}", flush=True)
        p = subprocess.run(
            [sys.executable, "tools/check_correctness.py", sf_dir, *batch],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        seen = set()
        for line in p.stdout.splitlines():
            m = LINE.match(line.strip())
            if not m:
                continue
            status, name, rest = m.groups()
            if name.endswith(":"):
                name = name[:-1]
            if name not in batch:
                continue
            seen.add(name)
            entry: dict = {"status": {"ok?": "ROWS_ONLY"}.get(status, status)}
            rm = re.search(r"rows=(\d+)", rest)
            if rm:
                entry["rows"] = int(rm.group(1))
            tm = re.search(r"\[spark ([0-9.]+)s, duck ([0-9.]+)s\]", rest)
            if tm:
                entry["spark_s"] = float(tm.group(1))
                entry["duck_s"] = float(tm.group(2))
            if status != "PASS":
                entry["note"] = rest[:240]
            results[name] = entry
            print(f"  {status} {name}: {rest[:120]}", flush=True)
        for name in batch:
            if name not in seen:
                # subprocess died before reaching it (crash/OOM)
                results[name] = {
                    "status": "NO_RESULT",
                    "note": (p.stderr.strip().splitlines() or ["process died"])[-1][:240],
                }
                print(f"  NO_RESULT {name}", flush=True)

    # invariant-cover pass: an oracle-infeasible SKIP whose covering
    # invariant row PASSED at this SF is certified by that row
    for name, cover in INVARIANT_COVER.items():
        r = results.get(name)
        if r and r["status"] == "SKIP" and results.get(cover, {}).get("status") == "PASS":
            r["status"] = "PASS(invariant)"
            r["covered_by"] = cover

    n_pass = sum(1 for r in results.values() if r["status"].startswith("PASS"))
    n_rows_only = sum(1 for r in results.values() if r["status"] == "ROWS_ONLY")
    bad = {
        k: v for k, v in results.items()
        if not v["status"].startswith("PASS") and v["status"] != "ROWS_ONLY"
    }
    artifact = {
        "sf": sf,
        "subset": "SCALE_SUBSET (scale-critical second-decade certification)"
        if scale_mode else "full registry",
        **({"excluded": SCALE_EXCLUDED} if scale_mode else {}),
        "sf_dir": f"{os.path.basename(sf_dir.rstrip('/'))} (tools/gen_testdata.py, seed 42)",
        "gates": (
            "rows + schema + value-hash vs DuckDB oracle; "
            f"SPARK_GRAFT_ORACLE_TIMEOUT={env['SPARK_GRAFT_ORACLE_TIMEOUT']} "
            f"SPARK_GRAFT_MAX_ROWS={env['SPARK_GRAFT_MAX_ROWS']}; "
            "oracle-infeasible queries certified by their registered "
            "self-verifying invariant rows (PASS(invariant), covered_by)"
        ),
        "n_queries": len(names),
        "n_pass": n_pass,
        "n_rows_only": n_rows_only,
        "exclusions": bad,
        "wall_s": round(time.time() - t_start, 1),
        "queries": dict(sorted(results.items())),
    }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(
        f"\n{n_pass}/{len(names)} PASS ({n_rows_only} rows-only), "
        f"{len(bad)} not green -> {out_json} [{artifact['wall_s']}s]"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
