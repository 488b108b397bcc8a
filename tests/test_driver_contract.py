"""The driver-contract mechanics in __spark_entry__ that decide WHICH
queries the grading driver samples: only the first 50 exported queries
get a correctness row per round, so the export order is load-bearing —
a red (failed) driver row must count as never-signed so a fixed query
re-enters the very next window instead of waiting out the rotation.
No Spark session needed: these are pure-Python contract tests.
"""

import glob
import json
import os

import __spark_entry__ as entry


def test_row_green_classification():
    """Green = hash-matched, or a successful rows-only run for queries
    that CURRENTLY register no oracle; anything else (hash mismatch,
    schema mismatch, a real error, or a stale no_oracle row for a
    query that has since gained an oracle) is NOT signed."""
    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 5, "oracle_rows": 5, "err": None}
    red_hash = dict(green, hash_match=False)
    red_schema = dict(green, schema_match=False)
    red_err = dict(green, err="SparkException: boom")
    rows_only = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": 5, "oracle_rows": None, "err": "no_oracle"}
    rows_only_dead = dict(rows_only, spark_rows=None)
    oracled = next(iter(entry._ORACLES))  # any query with a SQL oracle
    no_oracle_name = "__definitely_not_registered__"
    assert no_oracle_name not in entry._ORACLES
    assert entry._row_green(oracled, green)
    assert not entry._row_green(oracled, red_hash)
    assert not entry._row_green(oracled, red_schema)
    assert not entry._row_green(oracled, red_err)
    assert entry._row_green(no_oracle_name, rows_only)
    assert not entry._row_green(no_oracle_name, rows_only_dead)
    # the r1-r3 approx_distinct_users trap: a no_oracle-era signature
    # must NOT count once the query registers a real oracle
    assert not entry._row_green(oracled, rows_only)


def test_export_order_contract():
    """Invariants against the REAL committed artifacts: every
    registered query exported exactly once; queries with no green
    driver row anywhere (new or failed) precede every signed query;
    among signed queries, older signatures come first.  The expected
    green-rounds map is recomputed here with an INDEPENDENT inline
    definition of green, so a regression in either _row_green or the
    sort breaks this test."""
    order = entry._export_order()
    names = set(entry._QUERIES)
    assert len(order) == len(names) and set(order) == names

    last_green: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(entry.__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            ok = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
                and name not in entry._ORACLES
            ) or (
                not row.get("err")
                and row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
            )
            if ok and name in names:
                last_green[name] = max(last_green.get(name, 0), rnd)

    pos = {n: i for i, n in enumerate(order)}
    unsigned = [n for n in names if n not in last_green]
    signed = [n for n in names if n in last_green]
    if unsigned and signed:
        assert max(pos[n] for n in unsigned) < min(pos[n] for n in signed)
    # signed queries are ordered by their last green round (stable)
    rounds_in_order = [last_green[n] for n in order if n in last_green]
    assert rounds_in_order == sorted(rounds_in_order)

    # the dict interfaces expose the same order and a SQL oracle per query
    assert list(entry.queries()) == order
    assert list(entry.oracle_sql()) == [n for n in order if n in entry._ORACLES]
