"""Connected components over a distributed edge list.

The reference's Loop origin (``lib/loop.ex``; SURVEY §7.3) expresses
cyclic dataflow but ships no graph algorithms; connected components is
THE graph primitive a dedup pipeline needs (near-dup pair graph →
cluster representative).  ``SimHashDedup`` inlines a bipartite variant
of this; ``ConnectedComponents`` is the general form over any
``(src, dst)`` edge list, so LSH/embedding/winnowing pair outputs can
all be clustered with the same operator.

Algorithm: min-label propagation with POINTER JUMPING.  Each round
does

  1. neighbor min: ``lab(v) ← min(lab(v), min over neighbors u of
     lab(u))`` — one shuffle keyed on node id;
  2. pointer jump: ``lab(v) ← min(lab(v), lab(lab(v)))`` — labels are
     themselves node ids, so a label's label is also a reachable node;
     this halves label-chain depth every round (Shiloach-Vishkin
     style), giving O(log n) rounds instead of O(diameter) — a 1M-hop
     chain converges in ~20 rounds, not 1M.

Labels only decrease and only to reachable node ids, so at fixpoint
both endpoints of every edge agree and every component carries its
minimum node id.  ``sum(lab)`` is a monotone potential: an unchanged
sum IS the fixpoint, detected with one scalar agg per round (no
join+count change detector).  State is one row per node; pairs beyond
the input edges are never materialized.  Lineage is truncated per
round with ``localCheckpoint`` (driver fixpoint loop = the reference's
Loop pattern).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import functions as F

from ..component import Component
from ..flow import Flow


class ConnectedComponents(Component):
    """``input`` is an edge stream with columns ``src``/``dst``
    (integral ids); emits ``(node_col, component_col)`` with one
    row per node appearing in an edge, ``component_col`` = the minimum
    node id of the node's connected component.  Isolated nodes (no
    edges) are their own representatives and can be unioned in by the
    caller if needed.
    """

    def __init__(
        self,
        input: str,
        output: str | None = None,
        *,
        src: str = "src",
        dst: str = "dst",
        node_col: str = "node",
        component_col: str = "component",
        max_iterations: int = 30,
        label: str | None = None,
    ):
        self.input = input
        self.output = output or input
        self.src, self.dst = src, dst
        self.node_col, self.component_col = node_col, component_col
        self.max_iterations = int(max_iterations)
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        df = flow[self.input]
        numeric = ("tinyint", "smallint", "int", "bigint", "long", "integer")
        dtypes = dict(df.dtypes)
        for c in (self.src, self.dst):
            if dtypes.get(c) not in numeric:
                raise ValueError(
                    f"node ids must be integral for the sum-potential fixpoint "
                    f"detector; column {c!r} is {dtypes.get(c)} — hash or "
                    "dense-rank string ids to longs first"
                )
        sym = (
            df.select(F.col(self.src).alias("a"), F.col(self.dst).alias("b"))
            .unionAll(df.select(F.col(self.dst).alias("a"), F.col(self.src).alias("b")))
            .localCheckpoint(eager=True)
        )
        labels = sym.select("a").distinct().select("a", F.col("a").alias("lab"))
        prev_sum = None
        for _ in range(self.max_iterations):
            nbr = (
                sym.join(labels.select(F.col("a").alias("b"), "lab"), "b")
                .groupBy("a")
                .agg(F.min("lab").alias("nmin"))
            )
            stepped = labels.join(nbr, "a", "left").select(
                "a", F.least("lab", F.coalesce("nmin", "lab")).alias("lab")
            )
            jump = stepped.select(F.col("a").alias("p"), F.col("lab").alias("plab"))
            labels = (
                stepped.join(jump, stepped.lab == jump.p, "left")
                .select("a", F.least("lab", F.coalesce("plab", "lab")).alias("lab"))
                .localCheckpoint(eager=True)
            )
            cur_sum = labels.agg(F.sum("lab")).collect()[0][0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        out = labels.select(
            F.col("a").alias(self.node_col), F.col("lab").alias(self.component_col)
        )
        return flow.without(self.input).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)
