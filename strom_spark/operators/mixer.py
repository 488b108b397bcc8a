"""Mixer / MixerTree: N streams -> 1 (reference ``lib/mixer.ex``).

The reference interleaves events in nondeterministic arrival order
(``lib/mixer.ex:5-11``); its own tests sort before asserting.  The
relational equivalent is UNION ALL — ``unionByName`` — which is a
metadata-only plan node: no shuffle, inputs scanned in parallel.

``MixerTree`` (reference ``lib/mixer_tree.ex``) exists only because the
reference pays a process per mixer; an n-ary union is one plan node in
Spark, so the tree collapses to a single reduce-union.  The class is
kept for API parity.

``no_wait`` (finish when the first input halts, ``lib/gen_mix.ex:
377-387``) is meaningful only for unbounded streams; see
``streaming/control.py`` for the query-stop policy.  In batch it is a
no-op (all inputs are finite).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame

from ..component import Component
from ..flow import Flow


class Mixer(Component):
    def __init__(
        self,
        inputs: Sequence[str],
        output: str,
        *,
        no_wait: bool = False,
        tag: str | None = None,
        label: str | None = None,
    ):
        """``tag``: optionally add a column holding the origin stream
        name — the reference's label-each-stream-then-mix pattern
        (README.md:117-160) as a first-class option."""
        self.inputs = tuple(inputs)
        self.output = output
        self.no_wait = no_wait
        self.tag = tag
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        from pyspark.sql import functions as F

        frames: list[DataFrame] = []
        for name in self.inputs:
            df = flow[name]
            if self.tag:
                df = df.withColumn(self.tag, F.lit(name))
            frames.append(df)
        out = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)
        return flow.without(*self.inputs).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return self.inputs

    def output_names(self) -> Sequence[str]:
        return (self.output,)


class MixerTree(Mixer):
    """API-parity alias: the reference builds a fan-in tree of arity
    ``parts`` (``lib/mixer_tree.ex:16-42``); in Spark the n-ary union is
    already one plan node, so ``parts`` is accepted and ignored."""

    def __init__(self, inputs: Sequence[str], output: str, *, parts: int = 2, **kw):
        super().__init__(inputs, output, **kw)
        self.parts = parts
