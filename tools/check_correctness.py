"""Local replica of the driver's correctness gate: run each
__spark_entry__ query on Spark and its oracle on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from strom_spark import get_spark
from strom_spark.io import TABLES


def norm_cell(v):
    """Type-faithful cell normalization mirroring the driver: a float
    renders with a fractional marker even when integral (``78.0``),
    while an int renders bare (``78``) — so an oracle column that came
    back float64 (e.g. DuckDB integer-SUM -> HUGEINT -> pandas float)
    MISMATCHES a Spark bigint, exactly as the driver's hash does.
    Floats keep %.9g magnitude tolerance for genuine double columns."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        s = f"{v:.9g}"
        if not any(c in s for c in ".einf"):
            s += ".0"
        return s
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def frame_signature(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(",".join(norm_cell(r[i]) for i in order) for r in rows)
    return lines


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))
    spark = get_spark("correctness")
    spark.sparkContext.setLogLevel("ERROR")
    # big-SF hygiene: bound duck's parallelism (don't fight the Spark
    # session for all 32 cores) and memory (spill instead of
    # ballooning); SPARK_GRAFT_ORACLE_TIMEOUT=<sec> interrupts an
    # oracle that runs away (recursive CTEs at 10x data) so one
    # pathological query can't stall the whole sweep;
    # SPARK_GRAFT_MAX_ROWS=<n> skips (rather than collects) a result
    # larger than n rows — a 143M-pair output poisons the whole
    # process heap if collected (the round-9 sf1.0 lesson)
    oracle_timeout = float(os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "0") or 0)
    max_rows = int(os.environ.get("SPARK_GRAFT_MAX_ROWS", "0") or 0)

    def fresh_con():
        c = duckdb.connect()
        c.execute(f"SET threads={os.environ.get('SPARK_GRAFT_DUCK_THREADS', '16')}")
        c.execute(
            f"SET memory_limit='{os.environ.get('SPARK_GRAFT_DUCK_MEM', '24GB')}'"
        )
        # an in-memory duckdb has NO temp directory and therefore NO
        # operator spilling — a decade-size window/join oracle hits the
        # memory limit with 'bad allocation' instead of spilling.
        # SPARK_GRAFT_DUCK_TMP points it at disk (r12, found when the
        # sf10 substring oracle OOM'd at a 56GB limit)
        tmp = os.environ.get("SPARK_GRAFT_DUCK_TMP")
        if tmp:
            os.makedirs(tmp, exist_ok=True)
            c.execute(f"SET temp_directory='{tmp}'")
            # bound the spill so a runaway decade oracle cannot fill
            # the disk under the SAME chunk's Spark shuffle dirs (r14:
            # the 900s minhash-clusters oracle wrote 68GB of temp) —
            # exceeding the cap raises an allocation error that the
            # resource classifier below records as SKIP-infeasible
            c.execute(
                "SET max_temp_directory_size='"
                + os.environ.get("SPARK_GRAFT_DUCK_TMP_MAX", "40GB")
                + "'"
            )
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return c

    con = fresh_con()

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            if max_rows:
                n = sdf.count()
                if n > max_rows:
                    print(
                        f"SKIP  {name}: spark result {n} rows > "
                        f"SPARK_GRAFT_MAX_ROWS={max_rows} — output-bound "
                        f"at this SF, not collectable"
                    )
                    failures.append(f"{name}(rows-cap)")
                    continue
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        finally:
            # operator-internal persists are dead once the query is
            # collected; releasing here keeps decade-SF sweeps from
            # accumulating disk-backed blocks (the r9 OOM cascade)
            from strom_spark.cache import release_caches

            release_caches()
        t1 = time.time()
        if name not in oracles:
            print(f"ok?   {name}: rows={len(srows)} (no oracle, rows-only) [{t1-t0:.1f}s]")
            continue
        try:
            if oracle_timeout:
                import threading

                # fresh connection per oracle under timeout mode: an
                # interrupted/OOMed query must not poison later ones
                con.close()
                con = fresh_con()
                timer = threading.Timer(oracle_timeout, con.interrupt)
                timer.start()
                try:
                    ddf = con.execute(oracles[name]).df()
                finally:
                    timer.cancel()
            else:
                ddf = con.execute(oracles[name]).df()
        except Exception as e:
            msg = str(e)
            if "INTERRUPT" in msg.upper():
                print(
                    f"SKIP  {name}: oracle exceeded {oracle_timeout:.0f}s "
                    f"(interrupted) — spark rows={len(srows)}"
                )
                failures.append(f"{name}(oracle-timeout)")
                continue
            # oracle RESOURCE exhaustion is infeasibility, not a
            # mismatch: a decade-size replay that outgrows the memory
            # limit or fills the spill disk earns the same
            # SKIP-with-invariant-cover a timeout does (r14 — the 900s
            # minhash-clusters oracle ran the 68GB spill volume out of
            # disk and mis-classified as FAIL).  Real oracle defects
            # (syntax, binder, conversion errors) still FAIL.
            low = msg.lower().replace("-", " ")
            resource = (
                "bad allocation" in low
                or "no space left on device" in low
                or "out of memory" in low
                or "could not allocate" in low
                or "temp directory size limit" in low
                or "failed to offload" in low
            )
            if resource:
                print(
                    f"SKIP  {name}: oracle resource-infeasible at this "
                    f"SF ({msg[:120]}) — spark rows={len(srows)}"
                )
                failures.append(f"{name}(oracle-resource)")
                continue
            print(f"FAIL  {name}: duckdb error: {msg[:300]}")
            failures.append(name)
            continue
        dcols = list(ddf.columns)
        drows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
        t2 = time.time()
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            failures.append(name)
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            failures.append(name)
            continue
        ssig = frame_signature(srows, scols)
        dsig = frame_signature(drows, dcols)
        if ssig != dsig:
            diffs = [(a, b) for a, b in zip(ssig, dsig) if a != b][:3]
            print(f"FAIL  {name}: value mismatch ({len([1 for a,b in zip(ssig,dsig) if a!=b])} rows); first: {diffs}")
            failures.append(name)
            continue
        print(f"PASS  {name}: rows={len(srows)} [spark {t1-t0:.1f}s, duck {t2-t1:.1f}s]")
    print()
    print(f"{len(failures)} failures: {failures}" if failures else "ALL GREEN")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
