"""Streaming query control policies.

Maps the reference's runtime knobs onto Structured Streaming:

  - ``no_wait`` (halt when the first input stream ends,
    ``lib/gen_mix.ex:377-387``): Spark streaming queries don't "end"
    per-input; the analog is a stop policy — ``StopWhen`` watches a
    condition (e.g. a sentinel row, an idle timeout) and stops the
    query.
  - sink ``sync`` (block until drained): ``run_available`` drains all
    currently-available input with trigger(availableNow) semantics —
    the deterministic way to run a finite workload through the
    streaming engine (used by the streaming tests).
  - Loop/feedback (``lib/loop.ex``): ``feedback_loop`` runs a
    foreachBatch sink that writes looping rows back to a staging
    directory the source re-reads — the acyclic-DAG version of a cyclic
    flow edge.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def run_available(df: DataFrame, *, format: str = "memory", query_name: str = "out", **options) -> StreamingQuery:
    """Drain everything currently available, synchronously (the batch-
    deterministic way to run a streaming plan in tests)."""
    q = (
        df.writeStream.format(format)
        .queryName(query_name)
        .outputMode(options.pop("output_mode", "append"))
        .options(**options)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def transform_per_batch(
    stream: DataFrame,
    apply: Callable[[DataFrame], DataFrame],
    write: "Callable[[DataFrame, int], None]",
    *,
    query_name: str = "per_batch",
    available_now: bool = True,
    **options,
) -> StreamingQuery:
    """Run a BATCH lowering over each micro-batch via ``foreachBatch``
    — the documented fallback when a frozen-statistics broadcast bound
    cannot hold (``StupidBackoffLM.max_broadcast_counts``,
    ``DSIRWeights``' ratio table, ``Decontaminate.
    max_broadcast_shingles``): each micro-batch arrives as a plain
    batch DataFrame, ``apply`` runs the full shuffle-join batch
    lowering on it (web-scale vocab tables join instead of
    broadcasting), and ``write(result_df, batch_id)`` persists the
    scored batch.

    Delivery note: ``foreachBatch`` is at-least-once under retry —
    make ``write`` idempotent (overwrite a batch_id-keyed partition,
    or dedup downstream on a row key).  ``available_now=True`` drains
    currently-available input and stops (the ``run_available``
    discipline); pass False for a continuous query.  A streaming
    checkpoint location can be passed via ``options``
    (``checkpointLocation=...``); without one Spark uses a temporary
    checkpoint, which is fine for drain-once scoring."""

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        write(apply(batch_df), batch_id)

    w = stream.writeStream.foreachBatch(_fn).queryName(query_name).options(
        **options
    )
    if available_now:
        w = w.trigger(availableNow=True)
    q = w.start()
    if available_now:
        q.awaitTermination()
    return q


def stop_when(query: StreamingQuery, condition: Callable[[StreamingQuery], bool], poll_s: float = 0.2, timeout_s: float = 60.0) -> None:
    """Poll ``condition(query)`` and stop the query when it holds —
    the generic custom-halt policy hook."""
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if condition(query):
            query.stop()
            return
        time.sleep(poll_s)
    query.stop()


def halt_when_input_ends(
    query: StreamingQuery,
    source: str,
    *,
    idle_batches: int = 2,
    poll_s: float = 0.1,
    timeout_s: float = 60.0,
) -> bool:
    """TRUE ``no_wait`` semantics (reference ``lib/gen_mix.ex:377-387``,
    ``test/mixer_test.exs:126-147``): watch ONE NAMED INPUT of a mixed
    query and halt the whole query when that input ends.

    ``source`` is matched as a substring of the per-source progress
    description (e.g. the finite side's file path); the input counts as
    ended once it has produced at least one row and then goes silent —
    ``idle_batches`` consecutive NEW micro-batches contributing zero
    rows with an unchanged end offset — while other (infinite) inputs
    keep the query ticking.  Structured Streaming has no per-input
    "done" signal (a file source can always receive more files), so
    caught-up-and-idle is the faithful cluster analog of the
    reference's finite-Enumerable halt.

    Returns True if the named input was seen to end (query stopped by
    the policy), False on overall timeout (query stopped anyway).
    """
    started = False
    idle = 0
    last_batch = -1
    last_offset: object = object()
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        p = query.lastProgress
        if p is None or p["batchId"] == last_batch:
            time.sleep(poll_s)
            continue
        last_batch = p["batchId"]
        matches = [s for s in p["sources"] if source in (s.get("description") or "")]
        if matches:
            s = matches[0]
            rows = s.get("numInputRows") or 0
            off = s.get("endOffset")
            if rows > 0:
                started = True
                idle = 0
            elif started and off == last_offset:
                idle += 1
                if idle >= idle_batches:
                    query.stop()
                    return True
            last_offset = off
        time.sleep(poll_s)
    query.stop()
    return False


def feedback_loop(
    spark,
    seed_df: DataFrame,
    body: Callable[[DataFrame], DataFrame],
    exit_when,
    workdir: str,
    *,
    idle_batches: int = 3,
    poll_s: float = 0.3,
    timeout_s: float = 120.0,
) -> DataFrame:
    """The reference's cyclic Loop edge (``lib/loop.ex``: a struct that
    is both sink and source, draining when empty for ``timeout`` ms) as
    an acyclic streaming plan: rows cycle through a staging directory.

    Each micro-batch applies ``body``; rows satisfying ``exit_when``
    land in the results directory, the rest are re-staged and re-read
    by the same file source — the feedback edge.  The query stops after
    ``idle_batches`` empty micro-batches (the Loop's drain-on-timeout,
    ``lib/loop.ex:31-56``).  Returns the accumulated results as a batch
    DataFrame.

    At scale every hop is a parallel write+scan; for production loops
    use a transactional table (Delta/Iceberg) as the staging area so
    concurrent readers see atomic appends.
    """
    staging, results = f"{workdir}/staging", f"{workdir}/results"
    seed_df.write.mode("overwrite").parquet(staging)
    # seed the results dir so the final read never sees a missing path
    seed_df.limit(0).write.mode("overwrite").parquet(results)
    schema = seed_df.schema

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = body(batch_df)
        out.persist()
        try:
            done = out.filter(exit_when)
            loop = out.filter(~exit_when)
            done.write.mode("append").parquet(results)
            if loop.limit(1).count():
                loop.write.mode("append").parquet(staging)
        finally:
            out.unpersist()

    q = (
        spark.readStream.schema(schema)
        .parquet(staging)
        .writeStream.foreachBatch(process)
        .start()
    )
    idle_stop(q, idle_batches=idle_batches, poll_s=poll_s, timeout_s=timeout_s)
    return spark.read.parquet(results)


def idle_stop(
    query: StreamingQuery,
    idle_batches: int = 2,
    poll_s: float = 0.3,
    timeout_s: float = 120.0,
    idle_s: float = 5.0,
    startup_grace_s: float = 30.0,
) -> None:
    """Stop once the query stops making progress: either
    ``idle_batches`` consecutive EMPTY micro-batches, or no new
    micro-batch at all for ``idle_s`` seconds (a drained file source
    schedules no batch, so empty batches alone can't be relied on) —
    the analog of the reference Loop's drain-on-timeout
    (``lib/loop.ex:31-56``).  ``startup_grace_s`` covers stream
    initialization before the first batch."""
    empty = 0
    deadline = time.time() + timeout_s
    last_batch = -1
    last_change = time.time() + startup_grace_s - idle_s
    while time.time() < deadline and empty < idle_batches:
        p = query.lastProgress
        if p is not None and p["batchId"] != last_batch:
            last_batch = p["batchId"]
            last_change = time.time()
            empty = empty + 1 if p["numInputRows"] == 0 else 0
        elif time.time() - last_change > idle_s:
            break
        time.sleep(poll_s)
    query.stop()
