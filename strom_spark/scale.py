"""Scale utilities: co-located (bucketed) joins and skew salting.

The two knobs that matter most for 100 TB fact-fact joins beyond what
AQE does automatically:

  - **Bucketing**: pre-shuffle both tables once at write time
    (``bucketBy`` on the join key); every later join/aggregation on
    that key reads co-located buckets and skips its exchange entirely.
    Amortizes one shuffle across every downstream query — the batch
    analog of the reference's hash-partitioned topology
    (``test/examples/words_count_test.exs:43-66``).
  - **Salting**: when one key dominates (web-scale "null"/"unknown"/
    boilerplate keys), split it into ``salt`` sub-keys on the big side
    and replicate the other side ``salt``×.  AQE's skew-join handles
    sort-merge spills; salting is for when the hot key must also
    parallelize through the downstream aggregation.
"""

from __future__ import annotations

import os
import shutil
import warnings
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: marker dropped inside every write_bucketed table directory.  The
#: leading underscore makes Spark's file listing skip it (same rule as
#: ``_SUCCESS``), so it is invisible to scans; its presence scopes the
#: orphan guard to OUR tables, and its content (fingerprint + bucket
#: spec) lets a later call skip an identical rewrite.
_MARKER = "_strom_bucketed.json"


def _default_location(spark, table: str) -> str | None:
    """Default-warehouse directory for an unqualified table name in the
    ``default`` database, or None when the layout can't be trusted
    (qualified name, non-default current db, non-local warehouse)."""
    if "." in table or spark.catalog.currentDatabase() != "default":
        return None
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    if wh.scheme not in ("", "file") or not wh.path:
        return None
    return os.path.join(wh.path, table.lower())


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    fingerprint: str | None = None,
) -> bool:
    """Persist ``df`` as a bucketed (and optionally sorted) table.
    Joins/aggs between tables bucketed the same way on the same key
    run exchange-free (verified in tests/test_scale_utils.py).
    Returns True when data was written, False when an identical
    existing layout was reused (see ``fingerprint``).

    ``fingerprint`` (opt-in) makes the write idempotent-cheap: a
    caller-supplied content stamp (e.g. source-file size+mtime) is
    stored in a ``_strom_bucketed.json`` marker inside the table
    directory.  When a later call presents the same fingerprint AND
    the same bucket spec, the rewrite is skipped — within a session
    the catalog entry is reused as-is; across sessions (in-memory
    catalog lost, files still on disk) the table is re-registered as
    an EXTERNAL table over the existing files via ``CREATE TABLE …
    CLUSTERED BY … LOCATION``, preserving the bucket spec so joins
    stay exchange-free.  This is the write-once-ride-free contract at
    100 TB: the fact-table shuffle is paid once, every later session
    rides the layout.

    Orphaned-location guard: with the in-memory catalog, a managed
    table written by a PREVIOUS session leaves its warehouse directory
    behind while the new session's catalog has no entry for it —
    saveAsTable then fails with LOCATION_ALREADY_EXISTS even in
    overwrite mode.  When the table is absent from the catalog but its
    default warehouse location exists, the stale directory is MOVED
    ASIDE to ``<loc>.stale`` (replacing any previous ``.stale`` — so
    leftovers are bounded at one per table name, and a mis-identified
    LIVE table fails loudly in its owning session instead of silently
    losing data — this guard used to rmtree, which with two concurrent
    sessions sharing a warehouse could delete the other session's live
    table).  The rename applies whether or not the dir carries our
    marker: the caller asked to overwrite this table, anything at its
    location blocks the write, and renaming is non-destructive (the
    content survives at ``<loc>.stale`` for manual recovery) — this
    also self-heals directories written before the marker scheme
    existed.  Known residual race: two sessions concurrently writing
    the SAME table name with DIFFERENT content still conflict —
    same-content concurrent runs converge via the fingerprint skip
    instead."""
    import json

    spark = df.sparkSession
    loc = _default_location(spark, table)
    # schema DDL is part of the marker identity: a caller that changes
    # the written column set/types without changing the fingerprint
    # must NOT ride the skip path — the cross-session re-registration
    # below declares df.schema over the on-disk files, and a mismatch
    # would produce a mis-declared external table over old data.
    # Markers written before this field (no "schema" key) never match
    # and trigger one clean rewrite.
    spec = {
        "bucket_by": list(bucket_by),
        "num_buckets": num_buckets,
        "sort_by": list(sort_by) if sort_by else [],
        "schema": df.schema.toDDL(),
    }

    if fingerprint is not None and mode == "overwrite" and loc:
        marker = os.path.join(loc, _MARKER)
        try:
            with open(marker) as f:
                prev = json.load(f)
        except (OSError, ValueError):
            prev = None
        if prev == {**spec, "fingerprint": fingerprint}:
            if not spark.catalog.tableExists(table):
                # new session, files intact: re-declare the bucket spec
                # over the existing location (external table — DROP
                # must never delete the shared files)
                sort_clause = (
                    f"SORTED BY ({', '.join(spec['sort_by'])}) "
                    if spec["sort_by"]
                    else ""
                )
                spark.sql(
                    f"CREATE TABLE {table} ({df.schema.toDDL()}) "
                    f"USING PARQUET "
                    f"CLUSTERED BY ({', '.join(spec['bucket_by'])}) "
                    f"{sort_clause}INTO {num_buckets} BUCKETS "
                    f"LOCATION '{loc}'"
                )
            return False
    if mode == "overwrite" and loc and spark.catalog.tableExists(table):
        # an EXTERNAL entry (the re-registration above, from this or an
        # earlier call) can't be overwritten in place by saveAsTable —
        # drop the catalog entry (files stay; the orphan guard below
        # moves them aside).  Managed entries take the normal
        # saveAsTable overwrite path untouched.
        try:
            typ = (
                spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
                .filter(F.col("col_name") == "Type")
                .first()
            )
            if typ and str(typ[1]).strip().upper() == "EXTERNAL":
                spark.sql(f"DROP TABLE {table}")
        except Exception:
            pass  # metadata probe failure: fall through, write decides

    if (
        mode == "overwrite"
        and loc
        and not spark.catalog.tableExists(table)
        and os.path.isdir(loc)
    ):
        # Rename aside rather than delete — non-destructive for every
        # case: our own stale dirs (marker present), pre-marker dirs
        # written before the fingerprint scheme existed, and even a
        # genuinely foreign dir squatting on the table's location (the
        # caller asked to overwrite this table; anything there blocks
        # the write, and the content survives at <loc>.stale for
        # manual recovery).  A mis-identified LIVE table from a
        # concurrent session fails loudly in that session instead of
        # silently losing data (the pre-round-7 guard rmtree'd here).
        stale = loc + ".stale"
        shutil.rmtree(stale, ignore_errors=True)
        try:
            os.rename(loc, stale)
        except OSError:
            pass  # lost a concurrent race; saveAsTable reports it

    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table)
    if loc:
        try:
            with open(os.path.join(loc, _MARKER), "w") as f:
                json.dump({**spec, "fingerprint": fingerprint}, f)
        except OSError:
            pass  # marker is an optimization; the table itself is live
    return True



#: Catalyst per-type defaultSize values (see
#: org.apache.spark.sql.types.*Type.defaultSize) used to estimate
#: bytes/row from a schema without touching the data.
_TYPE_BYTES = {
    "boolean": 1, "byte": 1, "short": 2, "integer": 4, "float": 4,
    "date": 4, "long": 8, "double": 8, "timestamp": 8,
    "timestamp_ntz": 8, "string": 20, "binary": 100,
}


def estimate_row_bytes(df: DataFrame) -> int:
    """Schema-width estimate of bytes per row (Catalyst defaultSize
    semantics): exact for fixed-width types, Catalyst's own constants
    for string/binary, 100 for complex types.  Used by
    :func:`detect_hot_keys` to convert AQE's advisory partition SIZE
    into a rows-per-key threshold without a data scan."""
    total = 0
    for f_ in df.schema.fields:
        t = f_.dataType.typeName()
        if t == "decimal":
            total += 8 if f_.dataType.precision <= 18 else 16
        else:
            total += _TYPE_BYTES.get(t, 100)
    return max(total, 1)


def _parse_bytes(v: str) -> int:
    """Parse a Spark size conf value ("64MB", "67108864b", "1g")."""
    v = str(v).strip().lower()
    for suf, mult in (("tb", 2**40), ("gb", 2**30), ("mb", 2**20),
                      ("kb", 2**10), ("t", 2**40), ("g", 2**30),
                      ("m", 2**20), ("k", 2**10), ("b", 1)):
        if v.endswith(suf):
            return int(float(v[: -len(suf)])) * mult
    return int(v)


def detect_hot_keys(
    df: DataFrame,
    key: str,
    *,
    advisory_bytes: int | None = None,
    max_keys: int = 64,
    threshold_rows: int | None = None,
) -> list:
    """Find the join-key values hot enough to need salting: any key
    whose rows alone outweigh one AQE advisory partition
    (``spark.sql.adaptive.advisoryPartitionSizeInBytes``, default
    64 MB) is a guaranteed straggler in a shuffle join no matter how
    AQE splits the surrounding partitions, because all of a key's rows
    must land in ONE task of a sort-merge/hash join.

    One aggregation pass: ``groupBy(key).count()`` is itself
    skew-immune (map-side partial aggregation collapses the hot key to
    one row per input partition — measured in the r10 skew probe), and
    the collect is bounded by ``max_keys``.  Returns the hot key
    values ordered by descending frequency — feed directly to
    ``salted_join(hot_keys=...)``.

    ``threshold_rows`` overrides the size-derived threshold (useful in
    tests or when the schema-width estimate misleads, e.g. giant
    string payloads)."""
    rows = hot_key_table(
        df, key, advisory_bytes=advisory_bytes, max_keys=max_keys,
        threshold_rows=threshold_rows,
    ).collect()
    return [r[0] for r in rows]


def hot_key_table(
    df: DataFrame,
    key: str,
    *,
    advisory_bytes: int | None = None,
    max_keys: int = 64,
    threshold_rows: int | None = None,
) -> DataFrame:
    """The distributed plan behind :func:`detect_hot_keys` as a
    DataFrame — ``(key, n_rows)`` for every key above the threshold,
    ordered by descending frequency with a deterministic key
    tie-break.  Use directly when the hot list feeds another plan
    (no driver round-trip) or for auditing key distributions."""
    if threshold_rows is None:
        if advisory_bytes is None:
            advisory_bytes = _parse_bytes(
                df.sparkSession.conf.get(
                    "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
                )
            )
        threshold_rows = max(1, advisory_bytes // estimate_row_bytes(df))
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > threshold_rows)
        .orderBy(F.col("n_rows").desc(), F.col(key))
        .limit(max_keys)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    salt: int = 8,
    how: str = "inner",
    hot_keys: Sequence | str | None = None,
) -> DataFrame:
    """Equi-join with the LEFT side's keys spread over ``salt``
    sub-keys (deterministic hash of the whole row) and the RIGHT side
    replicated ``salt``× — each hot key's rows land in ``salt``
    parallel partitions instead of one straggler.

    Use when ``left`` is large with pathological key skew; ``right``
    replication costs ``salt × |right|``, so keep the dimension side
    right.  Result equals ``left.join(right, on, how)`` row-for-row
    for ``how`` in {inner, left, left_semi, left_anti, cross}.  Right/
    full outer are rejected: every unmatched RIGHT row exists once per
    salt replica, so the salted join would emit it ``salt`` times.

    ``hot_keys`` (r10): salt ONLY the listed key values — the
    production form when ``right`` is itself large (a full replication
    would cost ``salt × |right|``): non-hot rows keep sub-key 0 on
    both sides (no replication, no fan-out) and only the known-hot
    keys spread/replicate.  Single-column ``on`` only (the hot list is
    matched against ``on[0]``).  ``hot_keys='auto'`` (r11) runs
    :func:`detect_hot_keys` on the left side — one skew-immune
    aggregation pass, threshold = rows-per-key vs AQE's
    ``advisoryPartitionSizeInBytes`` — and salts only what it finds;
    when nothing is hot the join degrades to the plain unsalted join
    (zero overhead beyond the detection scan).
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched right rows "
            f"are replicated {salt}x by salting (use {sorted(allowed)})"
        )
    on = list(on)
    if isinstance(hot_keys, str):
        if hot_keys != "auto":
            raise ValueError(f"hot_keys must be a list, 'auto', or None, got {hot_keys!r}")
        if len(on) != 1:
            raise ValueError("hot_keys salting supports single-column joins")
        hot_keys = detect_hot_keys(left, on[0])
        if not hot_keys:
            return left.join(right, on, how)
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast("int")
    if hot_keys is not None:
        if len(on) != 1:
            raise ValueError("hot_keys salting supports single-column joins")
        hot = F.lit(list(hot_keys))
        key = F.col(on[0])
        l = left.withColumn(
            "__salt",
            F.when(F.array_contains(hot, key), lsalt).otherwise(F.lit(0)),
        )
        r = right.withColumn(
            "__salt",
            F.explode(
                F.when(
                    F.array_contains(hot, key),
                    F.sequence(F.lit(0), F.lit(salt - 1)),
                )
                .otherwise(F.array(F.lit(0)))
                .cast("array<int>")
            ),
        )
    else:
        l = left.withColumn("__salt", lsalt)
        r = right.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]).cast("array<int>"))
        )
    out = l.join(r, on + ["__salt"], how)
    return out.drop("__salt")


def compact_write(
    df: DataFrame,
    path: str,
    *,
    target_file_bytes: int = 512 * 1024 * 1024,
    sort_by: Sequence[str] | None = None,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    max_files: int = 1_000_000,
) -> int:
    """Write ``df`` as parquet with a TARGET FILE SIZE instead of
    whatever file count the upstream partitioning happens to leave —
    the small-files fix every 100 TB pipeline needs at its sinks (a
    shuffle-wide write emits one file per task: 10k tasks × 5 MB
    files poisons every later scan's split planning and the
    metastore).

    File count derives from Catalyst's size estimate for the plan
    (``optimizedPlan().stats()``, the same statistic AQE plans with),
    scaled by a conservative parquet compression factor, then the
    frame is repartitioned to exactly that count before the write.
    With ``partition_by``, rows are repartitioned ON the partition
    columns so each output directory receives few writers rather
    than one file per (task × directory).

    ``sort_by`` adds ``sortWithinPartitions`` before the write: rows
    cluster by the sort key inside each file, so parquet row-group
    min/max statistics become tight and selective scans prune row
    groups server-side (verified against real footers in
    tests/test_scale_utils.py).  This is the single-column core of
    what table formats market as Z-ordering/clustering.

    Returns the file count it targeted.  Estimates are estimates:
    actual sizes land within a small factor of the target, which is
    all split planning needs (128 MB vs 5 MB matters; 380 MB vs
    512 MB does not).  Two guards: an estimate at/above the
    unknown-stats sentinel (or implausibly above an exbibyte — a
    scaled sentinel) is GARBAGE and the input partition count is kept;
    a plausible estimate whose implied count exceeds ``max_files`` is
    clamped to ``max_files`` with a warning naming the real cause.
    """
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    if max_files < 1:
        raise ValueError("max_files must be >= 1")
    jdf = df._jdf
    est_bytes = int(
        jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    # Plans without estimates (LogicalRDD from createDataFrame, some
    # streaming sinks) report the unknown-stats sentinel
    # (spark.sql.defaultSizeInBytes = Long.MaxValue); dividing that by
    # the target would ask for ~1.7e10 files.  A DERIVED plan over
    # estimate-less lineage is worse: Catalyst SCALES the sentinel by
    # column-width ratios (a Project can land it anywhere below
    # Long.MaxValue), so the sentinel equality test alone is not
    # enough — any absurd file count means "no usable estimate".
    # Fall back to the current partition count in both cases:
    # compacting an estimate-less frame is a no-op by file count,
    # which is the safe direction.
    sentinel = int(
        df.sparkSession.conf.get(
            "spark.sql.defaultSizeInBytes", str(2**63 - 1)
        )
    )
    n_files = max(1, -(-est_bytes // target_file_bytes))
    if est_bytes >= sentinel or est_bytes > 2**60:
        # exact sentinel, or a scaled sentinel (a Project over
        # estimate-less lineage lands anywhere below Long.MaxValue —
        # nothing real is an exbibyte): the estimate is garbage
        n_files = max(1, df.rdd.getNumPartitions())
        warnings.warn(
            "compact_write: no usable size estimate for this plan "
            f"(est_bytes={est_bytes}; non-file-scan lineage); keeping "
            f"{n_files} files instead of sizing to target_file_bytes",
            stacklevel=2,
        )
    elif n_files > max_files:
        # the estimate is plausible but the caller's target implies an
        # absurd file count — honor the SPIRIT of the target by
        # clamping, and say so (a 'no estimate' message here would
        # send the operator debugging the wrong thing)
        warnings.warn(
            f"compact_write: target_file_bytes={target_file_bytes} "
            f"implies {n_files} files for an estimated {est_bytes} "
            f"bytes; clamping to max_files={max_files}",
            stacklevel=2,
        )
        n_files = max_files
    # For a bare scan, Catalyst's sizeInBytes IS the on-disk file size
    # (fileCompressionFactor defaults to 1.0), so the estimate maps to
    # output bytes ~1:1 when re-writing with the same codec; derived
    # plans inflate it (row-width products), which only errs toward
    # MORE files of smaller size — the benign direction for split
    # planning.
    if partition_by:
        out = df.repartition(n_files, *[F.col(c) for c in partition_by])
    else:
        out = df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    w = out.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return n_files


def zorder_key(cols: Sequence, bits: int = 16):
    """Z-ORDER (Morton) interleave of two or more non-negative integer
    columns — the multi-column clustering key for :func:`compact_write`
    ``sort_by``: sorting by the interleaved key keeps rows that are
    close in EVERY dimension inside the same parquet row group, so
    range predicates on ANY of the columns prune row groups via their
    min/max stats (sorting by one column alone leaves the others
    spanning their full domain in every row group — verified against
    real footers in tests/test_scale_utils.py).

    Callers supply columns already normalized to ``[0, 2**bits)`` —
    days-since-epoch, bucketed ids, quantized measures; values beyond
    ``bits`` low bits are masked (high bits ignored), which degrades
    clustering, not correctness.  Pure Column arithmetic (codegen);
    the key is deterministic, so layouts replay identically.
    """
    if not 1 <= bits <= 62:
        raise ValueError("bits must be in [1, 62]")
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least two columns")
    if bits * n > 62:
        raise ValueError(f"{n} columns x {bits} bits exceeds a bigint key")
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        lc = c.cast("long")
        for b in range(bits):
            bit = F.when(
                lc.bitwiseAND(F.lit(1 << b)) != 0,
                F.lit(1 << (b * n + i)),
            ).otherwise(F.lit(0))
            key = key + bit
    return key
