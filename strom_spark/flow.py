"""Flow: the engine's core object — a named registry of DataFrames.

The reference models a "flow" as a map from stream name to lazy stream
(``flow() :: %{optional(stream_name()) => stream()}``, reference
``lib/strom.ex:8``).  Here a *flow* is a mapping ``str -> DataFrame``
where each DataFrame is a lazy Catalyst logical plan — batch or
Structured Streaming.  Components consume some named frames and
add/replace/remove named frames, mirroring ``call(flow, component) ::
flow`` (reference ``lib/composite.ex:3``).

DataFrames are immutable plans, so a Flow is cheap to copy; every
component call returns a NEW Flow (value semantics), which makes
composition and re-use trivial and leaves all physical concerns
(scheduling, shuffle, memory) to Spark.
"""

from __future__ import annotations

from typing import Iterator, Mapping

from pyspark.sql import DataFrame


class Flow(Mapping[str, DataFrame]):
    """Immutable mapping of stream name -> DataFrame (lazy plan)."""

    __slots__ = ("_streams",)

    def __init__(self, streams: Mapping[str, DataFrame] | None = None, **kw: DataFrame):
        data: dict[str, DataFrame] = {}
        if streams:
            data.update(streams)
        data.update(kw)
        for name, df in data.items():
            if not isinstance(df, DataFrame):
                raise TypeError(f"stream {name!r} must be a DataFrame, got {type(df)}")
        self._streams = data

    # -- Mapping interface -------------------------------------------------
    def __getitem__(self, name: str) -> DataFrame:
        try:
            return self._streams[name]
        except KeyError:
            raise KeyError(
                f"no stream named {name!r} in flow; have {sorted(self._streams)}"
            ) from None

    def __iter__(self) -> Iterator[str]:
        return iter(self._streams)

    def __len__(self) -> int:
        return len(self._streams)

    def __repr__(self) -> str:
        return f"Flow({sorted(self._streams)})"

    # -- functional updates ------------------------------------------------
    def with_stream(self, name: str, df: DataFrame) -> "Flow":
        """Return a new Flow with ``name`` bound to ``df`` (replaces)."""
        data = dict(self._streams)
        data[name] = df
        return Flow(data)

    def without(self, *names: str) -> "Flow":
        data = {k: v for k, v in self._streams.items() if k not in names}
        return Flow(data)

    def updated(self, adds: Mapping[str, DataFrame] = (), removes: tuple[str, ...] = ()) -> "Flow":
        data = {k: v for k, v in self._streams.items() if k not in removes}
        data.update(adds)
        return Flow(data)

    def names(self) -> list[str]:
        return sorted(self._streams)


def as_flow(obj: "Flow | Mapping[str, DataFrame] | None") -> Flow:
    if obj is None:
        return Flow()
    if isinstance(obj, Flow):
        return obj
    return Flow(obj)
