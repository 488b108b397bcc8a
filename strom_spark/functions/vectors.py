"""Vector expression builders for embedding columns (array<float>).

All JVM-side higher-order functions — no Python UDF in the scan path.
For million-vector × million-vector workloads the driver of cost is the
pair count, not the per-pair arithmetic; see ``operators/similarity.py``
for the blocking strategies."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: "Column | str") -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: "Column | str", b: "Column | str") -> Column:
    """Sequential left-fold dot product — deterministic summation order
    (stable across runs/engines for oracle comparison)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: "Column | str") -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_c(a), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: "Column | str", b: "Column | str") -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(a: "Column | str") -> Column:
    """Pre-normalize once so downstream similarity is a plain dot
    product — at scale, normalize at ingest, not per pair."""
    n = norm(a)
    return F.transform(_c(a), lambda x: x.cast("double") / n)
