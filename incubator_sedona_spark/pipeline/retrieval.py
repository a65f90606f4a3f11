"""BM25 ranked retrieval + corpus vocabulary — native Catalyst, no UDFs.

Training-data pipelines rank documents against query term sets constantly
(quality-targeted sampling, topic filtering, eval-set mining).  BM25
(Robertson-Spärck Jones; the Okapi formulation) over a SMALL query term set
needs no inverted index at corpus scale — it is two passes over the table:

  1. one hash-aggregate computing N, avgdl, and per-term document
     frequencies (conditional sums — map-side combinable, a few doubles);
  2. one broadcast of that 1-row stats frame joined back (Catalyst plans a
     BroadcastNestedLoopJoin over a single row — no shuffle of the corpus),
     scoring each document with pure array/arithmetic expressions inside
     whole-stage codegen.

Per-document term frequencies use `F.filter` over the token array — no
explode, so the corpus never shuffles at all; the only wide operation is
the final top-k (TakeOrderedAndProject, partial per partition).

``vocab_topk`` is the standard tokenizer-training precursor (corpus term
counts): explode + hash-agg + top-k, the canonical combiner-backed plan.

No counterpart in the reference (text retrieval is out of its scope);
part of the training-pipeline extension surface.  Formula constants
k1=1.2, b=0.75 are the standard Okapi defaults; idf uses the
non-negative ``ln(1 + (N - df + 0.5)/(df + 0.5))`` variant (Lucene's
choice, avoids negative idf for very common terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _toks(text_col: str):
    return F.split(F.col(text_col), " ")


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against ``terms``; returns (id, dl, score).

    Tokenization is single-space split — the corpus convention (mirror any
    other rule in both engine and oracle).  Scores are plain doubles; the
    caller rounds for presentation/oracle hashing.
    """
    if not terms:
        raise ValueError("terms must be a non-empty list")
    if len(set(terms)) != len(terms):
        raise ValueError(f"duplicate query terms: {terms}")
    toks = _toks(text_col)
    dl = F.size(toks).cast("double")

    def tf(t: str):
        return F.size(F.filter(toks, lambda x: x == F.lit(t))).cast("double")

    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(dl).alias("avgdl"),
        *[
            F.sum((tf(t) > 0).cast("double")).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    )

    scored = docs.select(F.col(id_col), dl.alias("dl"),
                         *[tf(t).alias(f"tf_{i}")
                           for i, t in enumerate(terms)])
    scored = scored.join(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        tf_i = F.col(f"tf_{i}")
        norm = tf_i + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        score = score + idf * (tf_i * F.lit(k1 + 1.0)) / norm
    return scored.select(id_col, "dl", score.alias("score"))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k by (score desc, id asc) — deterministic under score ties."""
    s = bm25_scores(docs, terms, k1=k1, b=b, id_col=id_col, text_col=text_col)
    return s.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def bm25_oracle_sql(
    terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """The DuckDB twin of ``bm25_topk`` — same tokenization, same formula,
    same association order, so doubles agree bit-for-bit before rounding."""
    tf_cols = ", ".join(
        "len(list_filter(toks, x -> x = '%s'))::DOUBLE AS tf_%d" % (t, i)
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        "sum(CASE WHEN tf_%d > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_%d" % (i, i)
        for i in range(len(terms))
    )
    score = " + ".join(
        "ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        " * (tf_{i} * {k1p1}) / (tf_{i} + {k1} * ({omb} + {b} * dl / avgdl))"
        .format(i=i, k1=repr(k1), k1p1=repr(k1 + 1.0), b=repr(b),
                omb=repr(1.0 - b))
        for i in range(len(terms))
    )
    return f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' '))::DOUBLE AS dl
  FROM {table}
), tf AS (
  SELECT doc_id, dl, {tf_cols} FROM base
), stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl, {df_cols} FROM tf
)
SELECT doc_id, dl::BIGINT AS dl, round({score}, 6) AS score_r
FROM tf CROSS JOIN stats
ORDER BY {score} DESC, doc_id ASC
LIMIT {k}
"""


def vocab_topk(
    docs: DataFrame, k: int = 20, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus term counts, top-k by (count desc, token asc) — the vocabulary/
    tokenizer-training precursor.  Explode + combiner-backed hash-agg; the
    shuffle carries (token, partial count) only."""
    return (
        docs.select(F.explode(_toks(text_col)).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(k)
    )
