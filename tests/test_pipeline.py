"""Pipeline operators (dedup / text / ANN) vs in-memory oracles on real testdata."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.pipeline import ann as ANN
from incubator_sedona_spark.pipeline import dedup as D
from incubator_sedona_spark.pipeline import text as T

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup(spark, docs):
    got = D.exact_dedup(docs).agg(F.sum("dup_count"), F.count("*")).collect()[0]
    total = docs.count()
    distinct_texts = docs.select("text").distinct().count()
    assert got[0] == total and got[1] == distinct_texts


def test_token_count_matches_python(spark, docs):
    sample = docs.limit(50).select("doc_id", "text").collect()
    got = {
        r.doc_id: r.n
        for r in docs.limit(50).select("doc_id", T.token_count_col(F.col("text")).alias("n")).collect()
    }
    for r in sample:
        expected = len(r.text.split()) if r.text.strip() else 0
        assert got[r.doc_id] == expected, r.text[:50]


def test_quality_cols_run(spark, docs):
    cols = T.quality_score_cols(F.col("text"))
    row = docs.select(*[v.alias(k) for k, v in cols.items()]).agg(
        F.min("n_chars"), F.max("punct_ratio"), F.max("n_tokens")
    ).collect()[0]
    assert row[0] >= 0 and 0 <= row[1] <= 1


def test_langid_and_fingerprint(spark, docs):
    out = docs.select(
        "doc_id",
        T.langid_col(F.col("text")).alias("lang_guess"),
        T.fingerprint_col(F.col("text")).alias("fp"),
    )
    langs = {r.lang_guess for r in out.select("lang_guess").distinct().collect()}
    assert langs <= {"en", "de", "fr", "es", "und"}
    # fingerprint is whitespace-insensitive
    df2 = spark.createDataFrame([("a b  c",), ("A B C ",)], "text string")
    fps = df2.select(T.fingerprint_col(F.col("text")).alias("f")).collect()
    assert fps[0].f == fps[1].f


def test_minhash_lsh_finds_planted_dups(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [(0, base), (1, base[:-10] + " extra tail"), (2, "completely different short text"),
            (3, base), (4, "another unrelated document about spark engines")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in D.minhash_lsh_dup_pairs(df, threshold=0.6).collect()}
    assert (0, 3) in pairs
    assert (0, 1) in pairs or (1, 3) in pairs  # near-dup caught
    assert all({a, b} <= {0, 1, 3} for a, b in pairs)


def test_simhash_pairs(spark):
    base = "spark engines process arrow batches with vectorized kernels " * 4
    rows = [(0, base), (1, base + "tail"), (2, "zebra xylophone quantum %d" )]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in D.simhash_dup_pairs(df, max_hamming=8).collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs and (1, 2) not in pairs


def test_ngram_jaccard(spark):
    rows = [(0, "a b c d e f g h"), (1, "a b c d e f g x"), (2, "p q r s t u v w")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.jaccard for r in D.ngram_jaccard_pairs(df, n=3, threshold=0.3).collect()}
    assert (0, 1) in got and (0, 2) not in got
    # grams of 8 tokens: 6 trigrams each, 5 shared -> 5/7
    assert got[(0, 1)] == pytest.approx(5 / 7)


def test_ann_bruteforce_matches_numpy(spark, embs):
    pdf = embs.select("vec_id", "embedding").toPandas()
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    q = M[0]
    cos = (M @ q) / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    order = np.lexsort((pdf["vec_id"].to_numpy(), -cos))
    expected = set(pdf["vec_id"].to_numpy()[order[:10]].tolist())
    got = ANN.brute_force_topk(embs, q.tolist(), 10).select("vec_id").collect()
    assert {r.vec_id for r in got} == expected


def test_ann_lsh_subset_of_bruteforce_space(spark, embs):
    pdf = embs.select("embedding").limit(1).toPandas()
    q = np.asarray(pdf["embedding"][0], dtype=np.float64)
    got = ANN.lsh_topk(embs, q.tolist(), 5, hamming_radius=12).collect()  # radius=all -> exact
    exact = ANN.brute_force_topk(embs, q.tolist(), 5).collect()
    assert {r.vec_id for r in got} == {r.vec_id for r in exact}


def test_embedding_cosine_dup_pairs(spark):
    rng = np.random.default_rng(2)
    base = rng.standard_normal(16)
    rows = [
        (0, base.tolist()),
        (1, (base + rng.standard_normal(16) * 0.01).tolist()),
        (2, rng.standard_normal(16).tolist()),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    pairs = {(r.id_a, r.id_b) for r in D.embedding_cosine_dup_pairs(df, threshold=0.95, num_planes=6).collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs
