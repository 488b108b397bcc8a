"""Distributed Lloyd's k-means over an embedding column.

IVFIndex trains its coarse quantizer on a driver-side SAMPLE (bounded
by ``sample_size`` — the right call for index building).  This
operator is the full-corpus counterpart: every iteration is a
DISTRIBUTED pass — assignment is a narrow projection (argmin over k
distance expressions, JVM codegen), the mean update is one keyed
hash-agg shuffle — and the only driver state is the k×dim centroid
matrix itself.  At 100 TB nothing corpus-sized ever reaches the
driver: per round the driver receives exactly k rows (per-dimension
sums + counts).

Determinism (the oracle-parity discipline): per-dimension member sums
are accumulated as DECIMAL (exact, shuffle-order independent — float
addition is not associative), and each new centroid coordinate is ONE
IEEE division ``double(sum)/n``.  Assignment ties break on the lower
cluster index.  Initial centroids are the first ``k`` vectors in
``id_col`` order — reproducible and replayable by any engine (for
clustering quality on real corpora, pass ``init_ids`` with k-means++-
sampled ids instead; the iteration mechanics are identical).

Distances are left-fold sums over the dimension order on both engines
(Spark ``aggregate`` HOF / DuckDB ``list_sum``), so argmin decisions
agree across engines up to genuine floating-point ties — which the
cluster-index tie-break resolves identically.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..component import Component, require_batch
from ..flow import Flow
from ..functions import vectors as V
from ..planprobe import probe_loop_plan

#: decimal type for exact member sums (float32 inputs widen losslessly
#: to double; 12 fractional digits carry them with headroom)
_DEC = "decimal(28,12)"


class LloydKMeans(Component):
    """Cluster ``vec_col`` into ``k`` groups with ``iters`` full
    Lloyd iterations; adds a ``cluster`` column (int, 0..k-1) holding
    the final assignment."""

    def __init__(
        self,
        input: str,
        output: str | None = None,
        *,
        id_col: str,
        vec_col: str,
        dim: int,
        k: int = 8,
        iters: int = 3,
        init_ids: "Sequence | None" = None,
        label: str | None = None,
    ):
        if k < 1 or iters < 0 or dim < 1:
            raise ValueError("k >= 1, iters >= 0, dim >= 1 required")
        self.input = input
        self.output = output or input
        self.id_col = id_col
        self.vec_col = vec_col
        self.dim = dim
        self.k = k
        self.iters = iters
        self.init_ids = list(init_ids) if init_ids is not None else None
        self.label = label

    def _assign(self, df: DataFrame, cents: "list[list[float]]"):
        """cluster = argmin_j ||v - c_j||² with lower-j tie-break.

        Selection is ``array_position(dists, array_min(dists)) - 1``
        (first occurrence == lower-j tie-break) over a single dists
        array — value-identical to the r9 chained-when form, whose
        ``best_d = when(better, d_j).otherwise(best_d)`` nesting
        duplicated the running expression TWICE per centroid: a 2^k
        expression-tree blowup that made analysis + interpreted HOF
        evaluation the entire cost of the operator (14.1 s → 1.7 s at
        sf0.1, k=8).  Centroids ship as true ArrayType literals
        (``F.lit(list)``) — ``F.array(*lits)`` is CreateArray,
        re-materialized per row (the r9 Bloom lesson).  The per-dist
        fold arithmetic (zip_with + aggregate, left fold) is unchanged,
        so distances — and therefore every assignment — are
        bit-identical to the previous form."""
        v = F.col(self.vec_col).cast("array<double>")
        # NOTE (r14): an unrolled-codegen distance chain (k × dim terms
        # with the centroid floats as literals) was tried and REVERTED —
        # every iteration embeds fresh centroid literals, so each round
        # forces a Janino compile of k×dim-term methods that the codegen
        # cache can never reuse; measured 3.2 s → 22.2 s at sf0.1.  The
        # interpreted HOF fold is the faster end-to-end form here.
        # const_double_array, NOT F.lit(list): the lit path costs k×dim
        # individual py4j calls PER ITERATION on the driver (r14,
        # measured 1.6 s vs 0.03 s across a k=8 dim=64 6-iter run);
        # elements are bit-identical so assignments cannot move
        dists = F.array(*[
            F.aggregate(
                F.zip_with(v, V.const_double_array(c), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in cents
        ])
        # array_position returns 0 when nothing equals the min (only
        # possible when every distance is NaN, i.e. a NaN input
        # vector); greatest(...,0) pins that case to cluster 0, the
        # same assignment the chained-when form used to make
        best = F.greatest(
            F.array_position(dists, F.array_min(dists)) - 1, F.lit(0)
        )
        return df.withColumn("cluster", best.cast("int"))

    def transform(self, flow: Flow) -> Flow:
        df = flow[self.input]
        require_batch(df, "LloydKMeans", "every Lloyd iteration is a full-corpus aggregate")
        if self.init_ids is not None:
            seed = df.filter(F.col(self.id_col).isin(self.init_ids))
        else:
            seed = df.orderBy(self.id_col).limit(self.k)
        cents = [
            [float(x) for x in r[1]]
            for r in seed.select(self.id_col, F.col(self.vec_col).cast("array<double>"))
            .orderBy(self.id_col)
            .collect()
        ]
        if len(cents) < self.k:
            raise ValueError(f"corpus has only {len(cents)} rows for k={self.k}")
        v = F.col(self.vec_col).cast("array<double>")
        for _ in range(self.iters):
            assigned = self._assign(df, cents)
            sums = assigned.groupBy("cluster").agg(
                F.count(F.lit(1)).alias("__n"),
                *[
                    F.sum(F.element_at(v, i + 1).cast(_DEC)).alias(f"__s{i}")
                    for i in range(self.dim)
                ],
            )
            probe_loop_plan("LloydKMeans/round", sums)
            rows = {r["cluster"]: r for r in sums.collect()}
            cents = [
                [float(rows[j][f"__s{i}"]) / rows[j]["__n"] for i in range(self.dim)]
                if j in rows
                else cents[j]  # empty cluster keeps its centroid
                for j in range(self.k)
            ]
        out = self._assign(df, cents)
        return flow.without(self.input).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)
