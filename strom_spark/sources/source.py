"""Source component: adds a named stream to the flow.

Reference: ``Source.new(name, origin)`` where origin is an in-memory
Enumerable, a lazy/infinite stream, or a start/call/stop behaviour
struct (``lib/source.ex:47-125``); two sources on the same name
concatenate (``lib/source.ex:19-25,108-112``).

Spark translation: origins become ``spark.read`` / ``spark.readStream``
/ ``spark.createDataFrame``.  Concat-on-same-name becomes ``unionByName``
— at scale this is a metadata-only plan union; Spark reads both inputs
in parallel rather than sequentially, which is strictly better.

Untyped scalar events (the reference's ``event() :: any()``) land in a
single ``value`` column; mapping events (dict rows) become proper
multi-column rows with an explicit schema.
"""

from __future__ import annotations

from typing import Any, Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..component import Component
from ..flow import Flow


def _union_compat(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b, allowMissingColumns=True)


class Source(Component):
    """Add stream ``name`` from an origin.

    Origins accepted:
      - ``DataFrame`` (batch or streaming): used as-is
      - list/iterable of scalars -> one-column frame ``value``
      - list of dicts -> multi-column rows (schema inferred or given)
      - ``Read``/``ReadStream`` origin objects (file formats, rate, ...)

    Same-name source concatenates with the existing stream (union).
    """

    def __init__(
        self,
        name: str,
        origin: Any,
        *,
        spark: SparkSession | None = None,
        schema: Any = None,
        label: str | None = None,
    ):
        self.name = name
        self.origin = origin
        self.spark = spark
        self.schema = schema
        self.label = label

    # -- origin materialization -------------------------------------------
    def _session(self) -> SparkSession:
        s = self.spark or SparkSession.getActiveSession()
        if s is None:
            raise RuntimeError("no active SparkSession; pass spark= to Source")
        return s

    def _materialize(self) -> DataFrame:
        origin = self.origin
        if isinstance(origin, DataFrame):
            return origin
        if isinstance(origin, SourceOrigin):
            return origin.load(self._session())
        if isinstance(origin, Mapping):
            origin = [origin]
        if isinstance(origin, Iterable) and not isinstance(origin, (str, bytes)):
            rows = list(origin)
            spark = self._session()
            if rows and isinstance(rows[0], Mapping):
                return spark.createDataFrame(rows, schema=self.schema)
            # scalar events -> single `value` column (reference event :: any())
            data = [(v,) for v in rows]
            schema = self.schema or "value " + _scalar_type(rows)
            return spark.createDataFrame(data, schema=schema)
        raise TypeError(f"unsupported source origin: {type(origin)}")

    def transform(self, flow: Flow) -> Flow:
        df = self._materialize()
        if self.name in flow:
            df = _union_compat(flow[self.name], df)
        return flow.with_stream(self.name, df)

    def input_names(self) -> Sequence[str]:
        return ()

    def output_names(self) -> Sequence[str]:
        return (self.name,)


def _scalar_type(rows: list) -> str:
    for v in rows:
        if v is None:
            continue
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, int):
            return "bigint"
        if isinstance(v, float):
            return "double"
        if isinstance(v, str):
            return "string"
        if isinstance(v, bytes):
            return "binary"
    return "string"


class SourceOrigin:
    """start/call/stop behaviour analog (reference ``lib/source.ex:31-33``):
    pluggable origin with a single ``load(spark) -> DataFrame`` hook."""

    def load(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError


class Read(SourceOrigin):
    """Batch file origin: ``Read("parquet", path, **options)``.

    Maps the reference's ``Source.ReadLines`` (file -> stream of lines,
    ``lib/source/read_lines.ex:10-24``) and generalizes to every Spark
    batch format.  Format ``text`` yields one ``value`` column per line
    — the direct ReadLines equivalent.
    """

    def __init__(self, fmt: str, path: str | None = None, schema: Any = None, **options: Any):
        self.fmt = fmt
        self.path = path
        self.schema = schema
        self.options = options

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format(self.fmt).options(**self.options)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.load(self.path) if self.path else reader.load()


class ReadLines(Read):
    """File -> stream of lines, trimmed (reference
    ``lib/source/read_lines.ex``)."""

    def __init__(self, path: str):
        super().__init__("text", path)

    def load(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql import functions as F

        return super().load(spark).select(F.trim(F.col("value")).alias("value"))


class ReadStream(SourceOrigin):
    """Streaming origin: ``ReadStream("rate", rowsPerSecond=10)`` /
    ``ReadStream("parquet", path, schema=...)`` etc.  The unbounded-
    stream analog of the reference's infinite Enumerables
    (``test/gen_mix_test.exs:172``)."""

    def __init__(self, fmt: str, path: str | None = None, schema: Any = None, **options: Any):
        self.fmt = fmt
        self.path = path
        self.schema = schema
        self.options = options

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.format(self.fmt).options(**self.options)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.load(self.path) if self.path else reader.load()


class IOGets(ReadStream):
    """Interactive line input as a stream (reference
    ``lib/source/io_gets.ex:13-16``: ``IO.gets`` -> trimmed line).

    A cluster has no stdin, so the Spark-native equivalent is the
    socket source: lines typed into ``nc -lk <port>`` arrive as a
    trimmed ``value`` column, one row per line — the same
    line-at-a-time interactive contract, network-reachable from every
    executor."""

    def __init__(self, host: str = "localhost", port: int = 9999):
        super().__init__("socket", host=host, port=port)

    def load(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql import functions as F

        return super().load(spark).select(F.trim(F.col("value")).alias("value"))
