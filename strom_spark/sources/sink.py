"""Sink component: runs a named stream into an origin and removes it
from the flow.

Reference: ``Sink.new(name, origin, sync: bool)`` — side effect per
event, stream removed from flow; ``sync: true`` blocks the caller,
otherwise the drain runs detached (``lib/sink.ex:33-104``).

Spark translation: batch -> ``df.write.*`` (always "sync": Spark
actions block until done); streaming -> ``df.writeStream.*`` where
``sync=True`` awaits termination and ``sync=False`` returns with the
query handle attached to the sink (the detached analog).  Origins map
per SURVEY §2.2: WriteLines -> text/csv writer, IOPuts -> console,
Null -> noop, memory sink for tests.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame

from ..component import Component
from ..flow import Flow


class SinkOrigin:
    """Pluggable sink behaviour (reference ``lib/sink.ex:17-19``)."""

    def write_batch(self, df: DataFrame) -> Any:
        raise NotImplementedError

    def write_stream(self, df: DataFrame, sync: bool) -> Any:
        raise NotImplementedError("streaming not supported by this sink origin")


class Sink(Component):
    def __init__(self, name: str, origin: "SinkOrigin", *, sync: bool = False, label: str | None = None):
        self.name = name
        self.origin = origin
        self.sync = sync
        self.label = label
        self.query = None  # streaming query handle when detached
        self.result: Any = None

    def transform(self, flow: Flow) -> Flow:
        df = flow[self.name]
        if df.isStreaming:
            self.query = self.origin.write_stream(df, self.sync)
        else:
            # batch writes are inherently synchronous in Spark; `sync`
            # only changes semantics for streams.
            self.result = self.origin.write_batch(df)
        return flow.without(self.name)

    def stop(self) -> None:
        if self.query is not None:
            self.query.stop()
            self.query = None

    def input_names(self) -> Sequence[str]:
        return (self.name,)

    def output_names(self) -> Sequence[str]:
        return ()


class Write(SinkOrigin):
    """File sink: ``Write("parquet", path, mode="overwrite", **opts)``.
    ``Write("text", path)`` is the reference's ``Sink.WriteLines``
    (``lib/sink/write_lines.ex:14-29``)."""

    def __init__(self, fmt: str, path: str, mode: str = "overwrite", partition_by: Sequence[str] = (), **options: Any):
        self.fmt = fmt
        self.path = path
        self.mode = mode
        self.partition_by = tuple(partition_by)
        self.options = options

    def write_batch(self, df: DataFrame) -> None:
        w = df.write.format(self.fmt).mode(self.mode).options(**self.options)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.save(self.path)

    def write_stream(self, df: DataFrame, sync: bool):
        # file-sink streams REQUIRE a checkpoint; default it under the
        # output path.  sync drains currently-available input and
        # returns (availableNow — the reference's blocking finite
        # drain, lib/sink.ex:77-81); async runs a continuous query.
        opts = dict(self.options)
        opts.setdefault("checkpointLocation", f"{self.path}/_checkpoint")
        w = df.writeStream.format(self.fmt).options(**opts)
        if sync:
            w = w.trigger(availableNow=True)
        q = w.start(self.path)
        if sync:
            q.awaitTermination()
        return q


class Console(SinkOrigin):
    """Print events (reference ``Sink.IOPuts``, ``lib/sink/io_puts.ex``)."""

    def __init__(self, num_rows: int = 20, truncate: bool = False):
        self.num_rows = num_rows
        self.truncate = truncate

    def write_batch(self, df: DataFrame) -> None:
        df.show(self.num_rows, truncate=self.truncate)

    def write_stream(self, df: DataFrame, sync: bool):
        w = df.writeStream.format("console")
        if sync:
            w = w.trigger(availableNow=True)
        q = w.start()
        if sync:
            q.awaitTermination()
        return q


class Null(SinkOrigin):
    """Discard (reference ``Sink.Null``, ``lib/sink/null.ex``).  Batch:
    a count action forces full evaluation without collecting; streaming:
    the noop sink."""

    def write_batch(self, df: DataFrame) -> int:
        return df.count()

    def write_stream(self, df: DataFrame, sync: bool):
        w = df.writeStream.format("noop")
        if sync:
            w = w.trigger(availableNow=True)
        q = w.start()
        if sync:
            q.awaitTermination()
        return q


class Memory(SinkOrigin):
    """Collect to driver memory — the test sink.  Batch: rows list on
    ``.rows``; streaming: Spark's memory sink table ``.table_name``.
    Driver-side by design; use only on small/test outputs."""

    _counter = 0

    def __init__(self, table_name: str | None = None):
        if table_name is None:
            Memory._counter += 1
            table_name = f"strom_memory_{Memory._counter}"
        self.table_name = table_name
        self.rows: list | None = None

    def write_batch(self, df: DataFrame) -> list:
        self.rows = df.collect()
        return self.rows

    def write_stream(self, df: DataFrame, sync: bool):
        q = df.writeStream.format("memory").queryName(self.table_name).outputMode("append").start()
        if sync:
            q.processAllAvailable()
            q.stop()
        return q
