"""BM25 + vocabulary (pipeline/retrieval.py): brute-force parity, plan shape."""

import math

import pytest

from incubator_sedona_spark.pipeline.retrieval import (
    bm25_scores,
    bm25_topk,
    vocab_topk,
)

_DOCS = [
    (0, "spark shuffles the window over merge sort"),
    (1, "merge merge merge conflict"),
    (2, "a window into spark internals spark spark"),
    (3, "completely unrelated words here"),
    (4, "window"),
]


def _brute_bm25(terms, k1=1.2, b=0.75):
    toks = {i: t.split(" ") for i, t in _DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for t in terms:
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            tf = tk.count(t)
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(tk) / avgdl)
            )
        out[i] = s
    return out


def test_bm25_matches_bruteforce(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(df, ["spark", "merge", "window"]).collect()}
    want = _brute_bm25(["spark", "merge", "window"])
    assert got.keys() == want.keys()
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)
    # doc 3 contains no query term: exactly zero
    assert got[3] == 0.0


def test_bm25_topk_deterministic_order(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    rows = bm25_topk(df, ["spark"], k=5).collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # zero-score ties (docs 1, 3, 4) break by doc_id ascending
    tied = [r["doc_id"] for r in rows if r["score"] == 0.0]
    assert tied == sorted(tied)


def test_bm25_corpus_never_shuffles(spark):
    """The scoring plan's only wide op is the final top-k: no Exchange from
    an explode/groupBy of the corpus, and no Python eval nodes."""
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    plan = bm25_scores(df, ["spark", "window"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Generate" not in plan  # no explode on the scored side
    topk = bm25_topk(df, ["spark"], k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in topk


def test_bm25_input_validation(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        bm25_scores(df, ["a", "a"])


def test_vocab_topk(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    rows = vocab_topk(df, k=3).collect()
    assert [(r["token"], r["cnt"]) for r in rows] == [
        ("merge", 4), ("spark", 4), ("window", 3)
    ]
