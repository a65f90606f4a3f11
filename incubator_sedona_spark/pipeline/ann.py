"""Approximate nearest-neighbor search over embedding columns.

- ``brute_force_topk``: exact cosine top-k against a literal query vector —
  native higher-order functions (zip_with + aggregate) compute the dot product
  JVM-side; ORDER BY LIMIT k plans as TakeOrderedAndProject (per-partition
  heap + driver merge), so the scan is one pass, no shuffle.
- ``lsh_topk``: random-hyperplane bucket signature narrows the scan to
  buckets within a Hamming radius of the query's signature before the exact
  re-rank.  Recall tunable via num_planes / radius.
- ``ivf_build`` / ``ivf_topk``: the IVF scale path — k-means-style centroids
  fitted on a bounded sample (driver-side, like every IVF trainer), vectors
  assigned to their nearest centroid once (a persisted/partitionable list
  column), queries probed against the ``nprobe`` nearest lists only.  At
  warehouse scale the list id doubles as a partition column so probing
  prunes files, not just rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType


def _dot_lit(vec_col, qvec: list[float]):
    q = F.array(*[F.lit(float(v)) for v in qvec])
    return F.aggregate(
        F.zip_with(vec_col, q, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(vec_col):
    return F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def brute_force_topk(
    df: DataFrame,
    qvec: list[float],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dist_col: str = "cosine",
) -> DataFrame:
    qn = float(np.linalg.norm(qvec))
    cos = _dot_lit(F.col(vec_col), qvec) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        df.withColumn(dist_col, cos)
        .orderBy(F.col(dist_col).desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_topk(
    df: DataFrame,
    qvec: list[float],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 12,
    hamming_radius: int = 2,
    dist_col: str = "cosine",
) -> DataFrame:
    """Bucket-pruned cosine top-k: scan only rows whose hyperplane signature is
    within ``hamming_radius`` bits of the query's — at scale, with the bucket
    id stored as a partition/cluster column, this prunes files, not just rows."""
    first = df.select(F.size(vec_col).alias("d")).first()
    dim = first.d if first else len(qvec)
    rng = np.random.default_rng(7)
    planes = rng.standard_normal((num_planes, dim))

    @F.pandas_udf(LongType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy())
        signs = (M @ planes.T) > 0
        keys = np.zeros(len(M), dtype=np.int64)
        for b in range(num_planes):
            keys |= signs[:, b].astype(np.int64) << b
        return pd.Series(keys)

    qsig = 0
    qs = (planes @ np.asarray(qvec)) > 0
    for b in range(num_planes):
        qsig |= int(qs[b]) << b

    withb = df.withColumn("__bucket", _bucket(F.col(vec_col)))
    near = F.bit_count(F.col("__bucket").bitwiseXOR(F.lit(qsig).cast("long"))) <= hamming_radius
    pruned = withb.where(near)
    return brute_force_topk(pruned, qvec, k, vec_col, id_col, dist_col).drop("__bucket")


# -- IVF (inverted-file) index -------------------------------------------------


def ivf_build(
    df: DataFrame,
    n_lists: int = 64,
    vec_col: str = "embedding",
    sample_rows: int = 100_000,
    iters: int = 10,
    seed: int = 7,
) -> tuple[DataFrame, np.ndarray]:
    """(assigned_df, centroids): k-means centroids from a bounded sample +
    per-row nearest-list assignment.

    The trainer samples at most ``sample_rows`` vectors to the driver (IVF
    training is sample-based by design — FAISS trains on a subsample too;
    the BOUND makes it scale-safe, unlike a full collect) and runs Lloyd's
    iterations on normalized vectors (spherical k-means: cosine == dot).
    Assignment is one Arrow-batched argmax-GEMM pass; the returned ``__list``
    column is the natural partition/cluster key for file-level probe pruning.
    """
    n = df.count()
    frac = min(1.0, sample_rows / max(n, 1))
    sample = df.select(vec_col).sample(frac, seed=seed).limit(sample_rows).collect()
    S = np.stack([np.asarray(r[0], dtype=np.float64) for r in sample])
    S /= np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
    k = min(n_lists, len(S))
    rng = np.random.default_rng(seed)
    C = S[rng.choice(len(S), k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(S @ C.T, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                c = S[m].mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)

    @F.pandas_udf(LongType())
    def _assign(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int64))

    return df.withColumn("__list", _assign(F.col(vec_col))), C


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    qvec: list[float],
    k: int,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dist_col: str = "cosine",
) -> DataFrame:
    """Cosine top-k probing only the ``nprobe`` lists nearest to the query."""
    q = np.asarray(qvec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(centroids @ q))[:nprobe]
    probe = [int(j) for j in order]
    pruned = assigned.where(F.col("__list").isin(probe))
    return brute_force_topk(pruned, qvec, k, vec_col, id_col, dist_col).drop("__list")
