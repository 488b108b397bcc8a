"""Similarity search over embedding columns (array<float>).

Two paths:

  - **CosineTopK** — exact brute force: broadcast the (small) query
    set, linear scan of the corpus, per-query top-k via window rank.
    This IS the right 100 TB plan for small query sets: embarrassingly
    parallel, no corpus shuffle, one narrow shuffle of the (tiny)
    per-partition top-k results.
  - **CosineLSHJoin** — random-hyperplane (sign) LSH: H deterministic
    hyperplanes (seeded numpy, shipped as literal arrays — a few KB),
    each vector hashed to a sign bit-string; ``n_tables`` independent
    tables of ``bits_per_table`` bits each form bucket keys.  Vectors
    meet only within a bucket -> sub-quadratic candidate pairs,
    verified with the exact dot product.  Approximate recall (tunable
    via tables × bits), exact precision.

Both compute similarity with JVM higher-order functions — no Python.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..component import Component
from ..flow import Flow
from ..functions import vectors as V


class CosineTopK(Component):
    """Exact top-k nearest neighbors (cosine) for each query vector.

    ``queries``: name of a flow stream holding (id_col, vec_col) query
    rows — small enough to broadcast.  Output: (query_id, neighbor_id,
    cosine, rank) with rank 1..k, self-matches excluded, deterministic
    tie-break on neighbor id.
    """

    def __init__(
        self,
        input: str,
        queries: str,
        output: str,
        *,
        k: int = 10,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        label: str | None = None,
    ):
        self.input = input
        self.queries = queries
        self.output = output
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        corpus = flow[self.input].select(
            F.col(self.id_col).alias("neighbor_id"), V.l2_normalize(self.vec_col).alias("__cv")
        )
        queries = flow[self.queries].select(
            F.col(self.id_col).alias("query_id"), V.l2_normalize(self.vec_col).alias("__qv")
        )
        sims = (
            corpus.join(F.broadcast(queries), F.col("query_id") != F.col("neighbor_id"))
            .withColumn("cosine", F.round(V.dot("__qv", "__cv"), 6))
            .select("query_id", "neighbor_id", "cosine")
        )
        w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
        out = (
            sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= self.k)
        )
        return flow.without(self.input, self.queries).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.input, self.queries)

    def output_names(self) -> Sequence[str]:
        return (self.output,)


def _hyperplanes(dim: int, n: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, dim)).tolist()


def _sign_bits(vec_col, planes: list[list[float]]):
    """Bit-string of sign(v · p) for each hyperplane p (literal arrays
    — planes are few and tiny, inlined into the plan)."""
    bits = []
    for p in planes:
        lit = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(V.dot(vec_col, lit) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


class CosineLSHJoin(Component):
    """Approximate near-neighbor pairs: random-hyperplane LSH buckets,
    exact-verified.  Output: (d1, d2, cosine) with cosine >= threshold,
    d1 < d2.  Recall ~ 1-(1-(1-θ/π)^bits)^tables for angle θ."""

    def __init__(
        self,
        input: str,
        output: str | None = None,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        dim: int = 64,
        threshold: float = 0.9,
        n_tables: int = 8,
        bits_per_table: int = 12,
        seed: int = 42,
        label: str | None = None,
    ):
        self.input = input
        self.output = output or input
        self.id_col = id_col
        self.vec_col = vec_col
        self.dim = dim
        self.threshold = threshold
        self.n_tables = n_tables
        self.bits_per_table = bits_per_table
        self.seed = seed
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        df = flow[self.input]
        normed = df.select(
            F.col(self.id_col).alias("id"), V.l2_normalize(self.vec_col).alias("v")
        )
        planes = _hyperplanes(self.dim, self.n_tables * self.bits_per_table, self.seed)
        keys = []
        for t in range(self.n_tables):
            tp = planes[t * self.bits_per_table : (t + 1) * self.bits_per_table]
            keys.append(F.concat(F.lit(f"{t}#"), _sign_bits(F.col("v"), tp)))
        bucketed = normed.select("id", "v", F.explode(F.array(*keys)).alias("bucket"))
        a, b = bucketed.alias("a"), bucketed.alias("b")
        cand = (
            a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
            .select(
                F.col("a.id").alias("d1"),
                F.col("b.id").alias("d2"),
                F.col("a.v").alias("v1"),
                F.col("b.v").alias("v2"),
            )
            .dropDuplicates(["d1", "d2"])
        )
        out = (
            cand.withColumn("cosine", F.round(V.dot("v1", "v2"), 6))
            .filter(F.col("cosine") >= self.threshold)
            .select("d1", "d2", "cosine")
        )
        return flow.without(self.input).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)
