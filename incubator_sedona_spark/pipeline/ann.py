"""Approximate nearest-neighbor search over embedding columns.

- ``brute_force_topk``: exact cosine top-k against a literal query vector —
  native higher-order functions (zip_with + aggregate) compute the dot product
  JVM-side; ORDER BY LIMIT k plans as TakeOrderedAndProject (per-partition
  heap + driver merge), so the scan is one pass, no shuffle.
- ``lsh_topk``: the scale path — random-hyperplane bucket signature narrows
  the scan to buckets within a Hamming radius of the query's signature before
  the exact re-rank.  Recall tunable via num_planes / radius.
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
