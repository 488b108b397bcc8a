"""Source/Sink origin parity (reference lib/source/*, lib/sink/*):
ReadLines round-trips through WriteLines-style text sinks; Null drains;
Memory collects; same-name source concat unions."""

import shutil
import tempfile

from pyspark.sql import functions as F

from strom_spark import (
    Flow,
    Memory,
    Null,
    Pipeline,
    Read,
    ReadLines,
    Sink,
    Source,
    Transformer,
    Write,
)


def test_readlines_writelines_roundtrip(spark):
    d = tempfile.mkdtemp(prefix="strom_lines_")
    try:
        lines = ["alpha", "  beta  ", "gamma delta"]
        with open(f"{d}/in.txt", "w") as f:
            f.write("\n".join(lines) + "\n")
        # ReadLines trims (reference read_lines.ex:10-24)
        sink = Sink("s", Write("text", f"{d}/out"), sync=True)
        Pipeline(
            [
                Source("s", ReadLines(f"{d}/in.txt"), spark=spark),
                Transformer("s", value=F.upper("value")),
                sink,
            ]
        )()
        back = [r.value for r in spark.read.text(f"{d}/out").collect()]
        assert sorted(back) == ["ALPHA", "BETA", "GAMMA DELTA"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_null_sink_drains_and_counts(spark):
    null = Null()
    sink = Sink("s", null, sync=True)
    flow = Pipeline([Source("s", [1, 2, 3], spark=spark), sink])()
    assert "s" not in flow
    assert sink.result == 3  # Null's batch form returns the drained count


def test_memory_sink_collects(spark):
    mem = Memory()
    Pipeline([Source("s", [{"a": 1}, {"a": 2}], spark=spark), Sink("s", mem, sync=True)])()
    assert sorted(r["a"] for r in mem.rows) == [1, 2]


def test_same_name_source_concat(spark):
    """Two sources on one name concatenate (reference
    lib/source.ex:19-25,108-112)."""
    flow = Pipeline(
        [
            Source("n", [1, 2], spark=spark),
            Source("n", [3, 4], spark=spark),
        ]
    )()
    assert sorted(r.value for r in flow["n"].collect()) == [1, 2, 3, 4]


def test_read_origin_formats(spark, sf_dir):
    """Read('parquet', path) equals spark.read.parquet."""
    flow = Source("r", Read("parquet", f"{sf_dir}/region.parquet"), spark=spark)()
    assert flow["r"].count() == spark.read.parquet(f"{sf_dir}/region.parquet").count()


def test_iogets_socket_origin(spark):
    """IOGets (reference lib/source/io_gets.ex:13-16): interactive
    line input as a stream.  Cluster-mode stdin is the socket source —
    lines sent to the port arrive as trimmed `value` rows."""
    import socket
    import threading
    import time

    from strom_spark import Flow, IOGets, Source

    srv = socket.socket()
    srv.bind(("localhost", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        conn.sendall(b"  hello \nworld\n")
        time.sleep(8)
        conn.close()
        srv.close()

    threading.Thread(target=serve, daemon=True).start()
    flow = Source("lines", IOGets("localhost", port), spark=spark)(None)
    assert flow["lines"].isStreaming
    q = (
        flow["lines"]
        .writeStream.format("memory")
        .queryName("t_iogets")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        got: set = set()
        while time.time() < deadline and got != {"hello", "world"}:
            got = {r.value for r in spark.sql("SELECT * FROM t_iogets").collect()}
            time.sleep(0.3)
        assert got == {"hello", "world"}  # trimmed, one row per line
    finally:
        q.stop()
