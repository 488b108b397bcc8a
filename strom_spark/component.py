"""Component base class and Pipeline (the reference's Composite).

Reference semantics: every component implements ``call(flow, component)
:: flow`` (``lib/composite.ex:3``); a Composite is a list of components
that is itself a component — nested composites flatten
(``lib/composite.ex:40-52``) and ``call`` left-folds the flow through
members (``lib/composite.ex:93-97``).

Spark translation: components are pure plan-rewriters.  ``start``/
``stop`` exist for API parity but are (almost always) no-ops — Spark has
no per-operator processes; execution happens at a terminal action
(collect/write/writeStream.start), scheduled by Spark itself.  A
Pipeline therefore composes for free: folding immutable DataFrames
builds one combined Catalyst plan that the optimizer rewrites globally
(predicate pushdown across *our* component boundaries included).
"""

from __future__ import annotations

from typing import Iterable, Mapping, Sequence

from pyspark.sql import DataFrame

from .flow import Flow, as_flow


def require_batch(df: DataFrame, component: str, why: str) -> None:
    """Raise a TYPED, actionable error when a batch-only lowering
    receives a streaming DataFrame — instead of the opaque
    AnalysisException Spark would throw deep inside the plan (multiple
    flat aggregations / rank windows are unsupported on streams).

    The escape hatch is always the same: drive the stream with
    ``foreachBatch`` (or an availableNow trigger) and apply the
    component to each materialized micro-batch, where full-corpus
    statistics are well-defined."""
    if df.isStreaming:
        raise TypeError(
            f"{component} is batch-only: {why}. Drive the stream with "
            "foreachBatch/availableNow and apply it per micro-batch "
            "(see streaming.control.run_available)"
        )


def rechunk_batches(batches: Iterable, chunk: "int | None"):
    """Split incoming Arrow batches into ``<= chunk``-row slices — the
    PER-COMPONENT analog of the reference's per-operator ``chunk`` opt
    (``lib/gen_mix.ex:7``: events-per-message flowing through one
    component).  The session-level Arrow batch size bounds the JVM→
    Python TRANSFER globally; this bounds one component's per-batch
    working set (e.g. decode fan-out memory on large media blobs)
    without touching global config.  ``None``/0 passes batches
    through untouched."""
    if not chunk:
        yield from batches
        return
    if chunk < 0:
        raise ValueError(f"chunk must be >= 1 or None, got {chunk}")
    for pdf in batches:
        if len(pdf) <= chunk:
            yield pdf
        else:
            for i in range(0, len(pdf), chunk):
                yield pdf.iloc[i : i + chunk]


class Component:
    """Base class: a named, pure ``Flow -> Flow`` transformation."""

    #: display label for topology drawing (reference opt ``label``)
    label: str | None = None

    def __call__(self, flow: "Flow | Mapping[str, DataFrame] | None" = None) -> Flow:
        return self.transform(as_flow(flow))

    # subclasses override
    def transform(self, flow: Flow) -> Flow:
        raise NotImplementedError

    # lifecycle parity with the reference (start/call/stop) — plans need no
    # processes, so these are no-ops unless a component owns real resources
    # (e.g. a streaming query handle held by a Sink).
    def start(self) -> "Component":
        return self

    def stop(self) -> None:
        return None

    # wiring metadata for topology drawing; subclasses override.
    def input_names(self) -> Sequence[str]:
        return ()

    def output_names(self) -> Sequence[str]:
        return ()

    def __repr__(self) -> str:
        name = type(self).__name__
        ins, outs = list(self.input_names()), list(self.output_names())
        lbl = f" label={self.label!r}" if self.label else ""
        return f"<{name} {ins}->{outs}{lbl}>"


class Pipeline(Component):
    """A list of components; itself a component (reference Composite,
    ``lib/composite.ex:39-97``).  Nested pipelines flatten."""

    def __init__(self, components: Iterable["Component"], name: str | None = None):
        flat: list[Component] = []
        for c in components:
            if isinstance(c, Pipeline):
                flat.extend(c.components)
            elif isinstance(c, Component):
                flat.append(c)
            else:
                raise TypeError(f"not a Component: {c!r}")
        self.components = flat
        self.name = name or "pipeline"

    def transform(self, flow: Flow) -> Flow:
        for comp in self.components:
            flow = comp.transform(flow)
        return flow

    def start(self) -> "Pipeline":
        for c in self.components:
            c.start()
        return self

    def stop(self) -> None:
        for c in self.components:
            c.stop()

    # -- live topology edits (reference lib/composite/manipulations.ex) ----
    # DataFrame plans are immutable, so "live" edits here rebuild the plan;
    # for running streaming queries the caller restarts from checkpoint.
    def insert(self, index: int, *components: "Component") -> "Pipeline":
        new = list(self.components)
        new[index:index] = Pipeline(components).components
        return Pipeline(new, self.name)

    def replace(self, index: int, *components: "Component") -> "Pipeline":
        new = list(self.components)
        new[index : index + 1] = Pipeline(components).components
        return Pipeline(new, self.name)

    def delete(self, index: int) -> "Pipeline":
        new = list(self.components)
        del new[index]
        return Pipeline(new, self.name)

    def input_names(self) -> Sequence[str]:
        seen: list[str] = []
        produced: set[str] = set()
        for c in self.components:
            for n in c.input_names():
                if n not in produced and n not in seen:
                    seen.append(n)
            produced.update(c.output_names())
        return seen

    def output_names(self) -> Sequence[str]:
        out: list[str] = []
        for c in self.components:
            for n in c.output_names():
                if n not in out:
                    out.append(n)
        return out

    def __repr__(self) -> str:
        return f"<Pipeline {self.name!r} n={len(self.components)}>"
