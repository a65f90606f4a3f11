"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (which is a spatial engine); included because the
north-star workload is a 10^12-row image+caption corpus where dedup is a core
pipeline stage.  Everything is expressed shuffle-consciously:

- exact dedup: one hash-aggregate (map-side partial combine).
- MinHash LSH: banding generates candidate pairs via an equi-join on the band
  bucket (never all-pairs); ONLY (id, band, bucket) rides the candidate
  shuffle — signatures/texts are joined back by id for the verify stage.
- SimHash: 64-bit signature computed natively from md5(token) bits (no UDF),
  pigeonhole-blocked with wide (3-block-combination) keys.
- embedding cosine near-dup: banded multi-table hyperplane LSH with an exact
  cosine verify inside candidates.

Every candidate generator takes ``max_bucket_size``: a bucket holding more
rows than the cap (an empty-document bucket, a boilerplate shingle) is
dropped from candidate generation instead of going quadratic.  The cap trades
recall for a hard bound on work; it is OFF by default so that the exact-verify
contract (Spark result == the SQL oracle's exact pair set) holds.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType

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
    """Hashes of character k-shingles (stable across runs: polynomial rolling hash).

    Operates on CODEPOINTS (utf-32), not bytes, so shingle positions agree
    with SQL substr() semantics for non-ASCII text; texts shorter than k are
    space-padded to length k.  The per-doc loop lives in the caller; this
    body is fully vectorized (a batch-concatenated variant measured slower
    because of gather-indexing overheads).
    """
    t = text or ""
    if len(t) < k:
        t = t + " " * (k - len(t))
    arr = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = len(arr)
    h = np.zeros(n - k + 1, dtype=np.uint64)
    for i in range(k):
        h = h * np.uint64(1000003) + arr[i : n - k + 1 + i]
    return np.unique(h)


def _char_shingles(text: str, k: int) -> set:
    """Distinct character k-shingles, matching SQL:
    substr(text, i, k) for i in 1..greatest(1, length(text)-k+1)."""
    t = text or ""
    return {t[i : i + k] for i in range(max(1, len(t) - k + 1))}


def exact_shingle_jaccard(a: str, b: str, k: int) -> float:
    sa, sb = _char_shingles(a, k), _char_shingles(b, k)
    inter = len(sa & sb)
    return inter / float(len(sa) + len(sb) - inter)


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


def _cap_buckets(
    banded: DataFrame, keys: list[str], max_bucket_size: int | None
) -> DataFrame:
    """Drop rows of over-full buckets before the candidate self-join.

    One extra aggregation on the SAME keys as the join (Catalyst reuses the
    exchange), so the cost is a map-side-combined count — the quadratic
    in-bucket blowup a hot key would cause costs far more at scale.
    """
    if max_bucket_size is None:
        return banded
    sizes = banded.groupBy(*keys).agg(F.count("*").alias("__bsz"))
    return (
        banded.join(sizes, keys)
        .where(F.col("__bsz") <= max_bucket_size)
        .drop("__bsz")
    )


def minhash_lsh_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.7,
    shingle_k: int = 5,
    verify: str = "exact",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold) via LSH banding.

    Plan: signatures -> explode to (band, band_hash) keys (ids only — the
    64-long signatures never ride the candidate shuffle) -> self equi-join on
    the band bucket -> distinct pair -> verify.

    ``verify="exact"`` joins the texts back by id and computes the exact
    character-``shingle_k``-shingle Jaccard per candidate pair, so the output
    is a deterministic subset relation the SQL oracle can replicate; with the
    default 32 bands x 2 rows, a pair at the 0.7 threshold is missed with
    probability (1 - 0.7^2)^32 ~ 5e-10 — candidate recall is effectively
    exhaustive at any realistic threshold.  ``verify="estimate"`` keeps the
    signature-agreement estimate (cheaper: no text join).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, num_hashes, shingle_k).select(
        F.col(id_col), F.col("minhash")
    )
    banded = sig.select(
        id_col,
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
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    banded = _cap_buckets(banded, ["band", "bucket"], max_bucket_size)

    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    raw = a.join(b, ["band", "bucket"]).where(F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b"
    )

    # Band-match-count prefilter: the r=2 banding needed for exhaustive recall
    # at the threshold also passes millions of moderately-similar pairs on
    # repetitive corpora.  One all-native groupBy both DEDUPLICATES the pairs
    # and counts how many of the 32 bands matched; a pair at jaccard j matches
    # a band with p = j^r, so requiring >= floor(bands*(threshold-0.25)^r)
    # matches drops the j << threshold flood while a true-qualifying pair
    # fails the cut with probability ~ exp(-2*bands*(j^r-(threshold-.25)^r)^2)
    # (~1e-5 at j = threshold = 0.8; the deterministic gate checks the
    # realized corpus).  The expensive verify then runs on survivors only.
    min_bands = max(1, int(np.floor(bands * max(threshold - 0.25, 0.0) ** rows_per_band)))
    cand = (
        raw.groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__nb"))
        .where(F.col("__nb") >= min_bands)
        .select("id_a", "id_b")
    )

    if verify == "exact":
        texts = df.select(F.col(id_col), F.col(text_col))
        withtext = cand.join(
            texts.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("__ta")),
            "id_a",
        ).join(
            texts.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("__tb")),
            "id_b",
        )

        @F.pandas_udf(DoubleType())
        def _jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
            return pd.Series(
                [exact_shingle_jaccard(x, y, shingle_k) for x, y in zip(ta, tb)]
            )

        return (
            withtext.withColumn("jaccard", _jac(F.col("__ta"), F.col("__tb")))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )

    # estimate mode: join signatures to the (small) surviving candidate set
    # by id — signatures never ride the banding shuffle
    agree = F.aggregate(
        F.zip_with("mh_a", "mh_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    withsig = cand.join(
        sig.select(F.col(id_col).alias("id_a"), F.col("minhash").alias("mh_a")), "id_a"
    ).join(
        sig.select(F.col(id_col).alias("id_b"), F.col("minhash").alias("mh_b")), "id_b"
    )
    return (
        withsig.withColumn("est_jaccard", agree / F.lit(float(num_hashes)))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# -- SimHash (md5-token bits, fully native: no Python in the plan) -------------

_HEX = "0123456789abcdef"


def _md5_chunk(col, start: int):
    """First/second 32 bits of md5 hex as a non-negative long (conv base 16)."""
    return F.conv(F.substring(col, start, 8), 16, 10).cast("long")


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash): 64-bit SimHash over distinct whitespace tokens.

    Bit b's vote is sum over tokens of (2*bit_b(md5(token)) - 1); the signature
    sets bit b iff the vote is positive.  md5 makes the signature reproducible
    in any engine (the SQL oracle recomputes it bit-for-bit); the plan is one
    explode + one 64-column hash aggregate — pure Catalyst, no UDF.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).alias("__tok"),
    )
    md = F.md5(F.col("__tok"))
    hi, lo = _md5_chunk(md, 1), _md5_chunk(md, 9)
    aggs = []
    for b in range(64):
        chunk, sh = (lo, b) if b < 32 else (hi, b - 32)
        bit = F.shiftrightunsigned(chunk, sh).bitwiseAND(F.lit(1))
        aggs.append(F.sum(bit * 2 - 1).alias(f"__v{b}"))
    votes = toks.groupBy(id_col).agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = sim.bitwiseOR(
            F.when(
                F.col(f"__v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
        )
    return votes.select(F.col(id_col), sim.alias("simhash"))


# 6 blocks covering 64 bits; any pair within hamming distance 3 differs in at
# most 3 blocks, so at least 3 blocks are clean and some 3-block combination
# matches exactly -> indexing all C(6,3)=20 combinations finds every pair with
# ~33-bit keys (vs 16-bit single-block keys, whose buckets go quadratic at
# billions of rows).
_SIM_BLOCKS = [(0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10)]
_SIM_TRIPLES = list(combinations(range(6), 3))


def _sim_block(col, off: int, width: int):
    return F.shiftrightunsigned(col, off).bitwiseAND(
        F.lit((1 << width) - 1).cast("long")
    )


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming on SimHash.

    Pigeonhole blocking over 3-of-6 block combinations (exact for
    max_hamming <= 3); candidates carry only (id, combo, key), the signature
    is joined back by id for the exact bit_count verify.
    """
    if max_hamming > 3:
        raise ValueError("3-of-6 block keys are exact only for max_hamming <= 3")
    sig = simhash64(df, id_col, text_col)
    blocks = [
        _sim_block(F.col("simhash"), off, w).alias(f"__b{i}")
        for i, (off, w) in enumerate(_SIM_BLOCKS)
    ]
    withb = sig.select(F.col(id_col), F.col("simhash"), *blocks)
    keyed = withb.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("combo"),
                        (
                            F.col(f"__b{i}")
                            .bitwiseOR(F.shiftleft(F.col(f"__b{j}"), 11))
                            .bitwiseOR(F.shiftleft(F.col(f"__b{k}"), 22))
                        ).alias("key"),
                    )
                    for t, (i, j, k) in enumerate(_SIM_TRIPLES)
                ]
            )
        ).alias("ck"),
    ).select(id_col, F.col("ck.combo").alias("combo"), F.col("ck.key").alias("key"))
    keyed = _cap_buckets(keyed, ["combo", "key"], max_bucket_size)

    a = keyed.select(F.col(id_col).alias("id_a"), "combo", "key")
    b = keyed.select(F.col(id_col).alias("id_b"), "combo", "key")
    cand = (
        a.join(b, ["combo", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    withsig = cand.join(
        sig.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a")), "id_a"
    ).join(
        sig.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b")), "id_b"
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        withsig.withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard over candidate pairs sharing >=1 n-gram.

    Native: split -> n-gram arrays -> explode -> equi-join on the n-gram hash
    -> per-pair shared count -> |A∪B| = |A|+|B|-shared.  All built-ins.

    ``max_df`` drops n-grams occurring in more than that many documents from
    the gram SETS themselves (both the join keys and the set sizes), so the
    stop-gram hot keys ("of the and") never hit the join; the SQL oracle can
    apply the identical document-frequency filter, keeping results exact.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.lit(0), F.size(toks) - n)),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n))),
        )
    )
    g = df.select(F.col(id_col), grams.alias("grams")).where(F.size("grams") > 0)
    if max_df is None:
        e = g.select(id_col, F.size("grams").alias("n_grams"), F.explode("grams").alias("gram"))
    else:
        e = g.select(id_col, F.explode("grams").alias("gram"))
        dfreq = e.groupBy("gram").agg(F.count("*").alias("__df"))
        e = e.join(dfreq.where(F.col("__df") <= max_df), "gram").drop("__df")
        sizes = e.groupBy(id_col).agg(F.count("*").alias("n_grams"))
        e = e.join(sizes, id_col)
    a = e.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("na"), "gram")
    b = e.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("nb"), "gram")
    # size-ratio prune: jaccard >= t implies min(na,nb)/max(na,nb) >= t, so
    # the filter is implied by the final threshold and cannot change the
    # result set — it only keeps size-incompatible pairs out of the count agg
    shared = (
        a.join(b, "gram")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("nb") >= F.col("na") * threshold)
            & (F.col("nb") * threshold <= F.col("na"))
        )
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("shared"))
    )
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return shared.withColumn("jaccard", jac).where(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def embedding_cosine_pairs_exact(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """EXACT cosine pair search via blocked GEMM against a broadcast matrix.

    Hyperplane LSH is only selective when the threshold is high (p per plane
    = 1 - angle/pi; at cosine 0.4 a plane agrees on ~63% of ALL pairs, so no
    banding scheme prunes meaningfully — candidate generation itself goes
    quadratic).  In that dense regime the honest plan is exact blocked
    matrix multiplication: normalize once, broadcast the (n x d) float32
    matrix, and stream row blocks through ONE mapInPandas that BLAS-multiplies
    each Arrow batch against the broadcast side and emits qualifying pairs.

    Scale path: broadcast works to ~10^7 x 128 float32 (~5 GB executor
    memory); beyond that, shard the broadcast side into column blocks and
    union the per-shard scans (same operator shape, B scans), or switch to
    the LSH variant with a >=0.9 threshold where banding is selective.
    """
    rows = df.select(F.col(id_col), F.col(vec_col)).collect()
    ids = np.array([r[0] for r in rows])
    M = np.array([list(map(float, r[1])) for r in rows], dtype=np.float32)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_M = spark.sparkContext.broadcast(M)

    def _scan(batches):
        ids_all = b_ids.value
        Mt = b_M.value.T
        for pdf in batches:
            q = np.stack(pdf[vec_col].to_numpy()).astype(np.float32)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ Mt  # BLAS
            qi = pdf[id_col].to_numpy()
            out_a, out_b, out_c = [], [], []
            for r in range(len(q)):
                hits = np.nonzero((sims[r] >= threshold) & (ids_all > qi[r]))[0]
                out_a.extend([qi[r]] * len(hits))
                out_b.extend(ids_all[hits])
                out_c.extend(sims[r, hits].astype(np.float64))
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

    id_type = dict(df.dtypes)[id_col]
    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        _scan, schema=f"id_a {id_type}, id_b {id_type}, cosine double"
    )


def embedding_cosine_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_tables: int = 64,
    planes_per_table: int = 2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine similarity: banded multi-table LSH +
    exact cosine verify.

    Each of ``num_tables`` tables buckets a vector by the sign pattern of
    ``planes_per_table`` seeded random hyperplanes; a pair is a candidate if
    it collides in ANY table (standard banding: recall
    1-(1-p^m)^L with p = 1 - angle/pi).  Candidates carry only
    (id, table, bucket); vectors are joined back by id and verified with an
    exact native cosine, so the emitted pair set equals the all-pairs result
    whenever no qualifying pair is missed — with m=2, L=64 a pair at
    cosine 0.4 is missed with probability ~6e-14.  At billion-row scale raise
    ``planes_per_table`` (bigger buckets budget) and set ``max_bucket_size``.
    """
    first = df.select(F.size(vec_col).alias("d")).first()
    dim = first.d if first else 0
    rng = np.random.default_rng(7)
    planes = rng.standard_normal((num_tables, planes_per_table, dim))

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float64)
        # (rows, tables, planes) sign bits -> per-table integer keys
        signs = np.einsum("rd,tpd->rtp", M, planes) > 0
        keys = np.zeros((len(M), planes.shape[0]), dtype=np.int64)
        for p in range(planes.shape[1]):
            keys |= signs[:, :, p].astype(np.int64) << p
        return pd.Series(list(keys))

    ids = df.select(F.col(id_col), F.col(vec_col))
    keyed = ids.select(
        id_col, F.posexplode(_buckets(F.col(vec_col))).alias("table", "bucket")
    )
    keyed = _cap_buckets(keyed, ["table", "bucket"], max_bucket_size)

    a = keyed.select(F.col(id_col).alias("id_a"), "table", "bucket")
    b = keyed.select(F.col(id_col).alias("id_b"), "table", "bucket")
    cand = (
        a.join(b, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    withv = cand.join(
        ids.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")), "id_a"
    ).join(
        ids.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")), "id_b"
    )
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
        withv.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
