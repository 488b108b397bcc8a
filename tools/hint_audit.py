"""Audit forced-broadcast hints across every registered query.

For each entry in ``__spark_entry__.queries()`` build the DataFrame
(plan only — no collect) and run
``strom_spark.plans.audit.fact_broadcast_violations`` on it: a
violation is a ResolvedHint subtree that reaches an SF-growing
parquet scan with no bounding (global-agg / limit) operator in
between — the class of plan that aborts at Spark's 8 GB broadcast
hard limit at 100 TB.

Usage: python tools/hint_audit.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry
    from strom_spark.plans.audit import fact_broadcast_violations, hint_count
    from strom_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    flagged = {}
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: BUILD ERROR {type(e).__name__}: {e}")
            continue
        v = fact_broadcast_violations(df)
        status = f"{hint_count(df)} hint(s)"
        if v:
            flagged[name] = v
            status += "  VIOLATION"
        print(f"{name}: {status}")
    print(f"\n== {len(flagged)} queries with unbounded fact-side forced broadcasts ==")
    for name, vs in flagged.items():
        print(f"\n--- {name} ---")
        for v in vs:
            print(v)
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
