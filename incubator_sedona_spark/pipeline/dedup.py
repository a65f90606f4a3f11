"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (which is a spatial engine); included because the
north-star workload is a 10^12-row image+caption corpus where dedup is a core
pipeline stage.  Everything is expressed shuffle-consciously:

- exact dedup: one hash-aggregate (map-side partial combine).
- MinHash LSH: signatures via one pandas UDF, banding via native explode +
  groupBy band-bucket, candidate pairs verified by signature similarity —
  the candidate join is an equi-join on (band, bucket), never a cross join.
- SimHash: 64-bit signature, bucketed by rotated prefixes.
- embedding cosine near-dup: cell-bucketed by LSH hyperplane signs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType

_PRIME = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (keep_id, dup_count) per distinct text.

    One shuffle on md5(text); map-side partial aggregation makes this scale
    linearly.  Keep rule: smallest id survives.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of character k-shingles (stable across runs: polynomial rolling hash)."""
    data = text.encode("utf-8", "ignore")
    n = len(data)
    if n < k:
        data = data + b" " * (k - n)
        n = len(data)
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    h = np.zeros(n - k + 1, dtype=np.uint64)
    for i in range(k):
        h = h * np.uint64(1000003) + arr[i : n - k + 1 + i]
    return np.unique(h)


def minhash_signatures(
    df: DataFrame, text_col: str = "text", num_hashes: int = 64, shingle_k: int = 5
) -> DataFrame:
    """Attach ``minhash`` array<long> of ``num_hashes`` min-hash values.

    One Arrow-batched pandas UDF; the (a,b) hash family is seeded determinstically.
    """
    rng = np.random.default_rng(42)
    A = rng.integers(1, _PRIME, num_hashes, dtype=np.int64).astype(np.uint64)
    B = rng.integers(0, _PRIME, num_hashes, dtype=np.int64).astype(np.uint64)

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            sh = _shingle_hashes(t or "", shingle_k)
            # (a * x + b) mod p, columnwise min
            vals = (sh[None, :] * A[:, None] + B[:, None]) % np.uint64(_PRIME)
            out.append(vals.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return df.withColumn("minhash", _sig(F.col(text_col)))


def minhash_lsh_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    shingle_k: int = 5,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard >= threshold) via LSH banding.

    Plan: signatures -> explode to (band, band_hash) keys -> self equi-join on
    the band bucket (shuffle on bucket, never all-pairs) -> distinct pair ->
    verify by full-signature agreement fraction (estimates Jaccard).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, num_hashes, shingle_k).select(
        F.col(id_col), F.col("minhash")
    )
    banded = sig.select(
        id_col,
        "minhash",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "minhash", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("minhash").alias("mh_a"), "band", "bucket"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("minhash").alias("mh_b"), "band", "bucket"
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "mh_a", "mh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.aggregate(
        F.zip_with("mh_a", "mh_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.withColumn("est_jaccard", agree / F.lit(float(num_hashes)))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash64(df: DataFrame, text_col: str = "text", shingle_k: int = 4) -> DataFrame:
    """Attach a 64-bit SimHash signature column ``simhash``."""

    @F.pandas_udf(LongType())
    def _sh(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            sh = _shingle_hashes(t or "", shingle_k)
            bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            v = (bits.sum(axis=0) * 2 - len(sh)) > 0
            acc = np.uint64(0)
            for bit in range(64):
                if v[bit]:
                    acc |= np.uint64(1) << np.uint64(bit)
            out[i] = np.int64(acc)
        return pd.Series(out)

    return df.withColumn("simhash", _sh(F.col(text_col)))


def simhash_dup_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming on SimHash.

    Pigeonhole blocking: split the 64-bit signature into (max_hamming+1)
    16-bit blocks; any pair within distance max_hamming agrees on >=1 block, so
    an equi-join per block finds all candidates without a cross join.
    """
    nblocks = max_hamming + 1
    sig = simhash64(df, text_col).select(F.col(id_col), F.col("simhash"))
    width = 64 // nblocks
    blocked = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1).cast("long"))
                        .alias("key"),
                    )
                    for b in range(nblocks)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.blk").alias("blk"), F.col("bk.key").alias("key"))
    a = blocked.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "blk", "key")
    b = blocked.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "blk", "key")
    cand = (
        a.join(b, ["blk", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).where(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-n-gram Jaccard over candidate pairs sharing >=1 n-gram.

    Native: split -> n-gram arrays -> explode -> equi-join on the n-gram hash
    -> per-pair shared count -> |A∪B| = |A|+|B|-shared.  All built-ins.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.lit(0), F.size(toks) - n)),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n))),
        )
    )
    g = df.select(F.col(id_col), grams.alias("grams")).where(F.size("grams") > 0)
    g = g.withColumn("n_grams", F.size("grams"))
    e = g.select(id_col, "n_grams", F.explode("grams").alias("gram"))
    a = e.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("na"), "gram")
    b = e.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("nb"), "gram")
    shared = (
        a.join(b, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("shared"))
    )
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return shared.withColumn("jaccard", jac).where(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def embedding_cosine_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 12,
) -> DataFrame:
    """Near-duplicate pairs by cosine similarity, LSH-bucketed.

    Random-hyperplane signature (seeded) buckets vectors; exact cosine verify
    inside buckets via native array ops.  Recall < 1 by construction (LSH);
    num_planes trades bucket size vs recall.
    """
    first = df.select(F.size(vec_col).alias("d")).first()
    dim = first.d if first else 0
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

    withb = df.select(F.col(id_col), F.col(vec_col)).withColumn("bucket", _bucket(F.col(vec_col)))
    a = withb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "bucket")
    b = withb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "bucket")
    dot = F.aggregate(
        F.zip_with("v_a", "v_b", lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: (x * x).cast("double")), F.lit(0.0), lambda acc, v: acc + v
        )
    )
    cos = dot / (norm(F.col("v_a")) * norm(F.col("v_b")))
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )
