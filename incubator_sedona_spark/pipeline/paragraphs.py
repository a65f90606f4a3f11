"""Corpus-wide duplicate-paragraph removal (CCNet-style) — native Catalyst.

CCNet (Wenzek et al. 2020) dedups Common Crawl at the PARAGRAPH grain:
boilerplate (nav bars, cookie banners, license blocks) repeats across
millions of pages while the surrounding documents differ, so
document-level dedup misses it entirely.  The rule here is the
deterministic, order-independent version of CCNet's "drop previously
seen paragraphs": an instance (doc, pos) of a paragraph is KEPT iff it
is the minimum (doc_id, pos) over every instance of that paragraph in
the corpus — so exactly one copy of each distinct paragraph survives,
and which copy survives does not depend on scan order or partitioning
(a property CCNet's sequential hash-set walk does not have).

Plan shape (one logical shuffle key — the paragraph hash):

  1. posexplode the per-row paragraph array (row-local),
  2. hash-aggregate min(struct(doc_id, pos)) BY md5(para) — map-side
     combine ships 16-byte digests + (id, pos), never paragraph text,
  3. equi-join the instances back on the digest and keep the canonical
     one (paragraph text crosses the wire exactly once, on this probe
     side),
  4. hash-aggregate by doc_id to reassemble kept text in position order.

At 100 TB both aggregates are ordinary combiner-backed hash aggs; there
is no window over the corpus and no driver-side state.  md5 collisions
(2^-64-ish at corpus scale) would merge two distinct paragraphs — the
standard accepted trade of every hash-keyed dedup in this package.

Paragraph definition: ``split_re`` (default blank-line-ish ``\\n+``)
for real text, or ``chunk_tokens=N`` for corpora without structural
newlines (fixed N-token chunks — the form the synthetic word-soup test
corpus exercises).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _paragraphs_col(text: Column, split_re: str | None, chunk_tokens: int | None) -> Column:
    if (split_re is None) == (chunk_tokens is None):
        raise ValueError("exactly one of split_re / chunk_tokens must be set")
    if split_re is not None:
        return F.filter(
            F.transform(F.split(text, split_re), lambda s: F.trim(s)),
            lambda s: s != "",
        )
    n = int(chunk_tokens)
    if n < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    toks = F.split(F.trim(text), r"\s+")
    n_chunks = F.ceil(F.size(toks) / F.lit(n)).cast("int")
    return F.when(F.trim(text) == "", F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(toks, i * n + 1, n), " "),
        )
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_re: str | None = r"\n+",
    chunk_tokens: int | None = None,
    joiner: str = "\n",
) -> DataFrame:
    """(id_col, n_total, n_kept, kept_text): per document, the paragraph
    count before/after corpus-wide dedup and the surviving text (kept
    paragraphs rejoined in original order with ``joiner``).  Documents
    whose every paragraph lost (all were non-canonical duplicates) come
    back with n_kept = 0 and kept_text = ''."""
    paras_arr = _paragraphs_col(F.col(text_col), split_re, chunk_tokens)
    inst = df.select(
        F.col(id_col),
        F.size(paras_arr).alias("n_total"),
        F.posexplode_outer(paras_arr).alias("pos", "para"),
    ).withColumn("__h", F.md5(F.col("para").cast("binary")))
    keep = inst.where(F.col("para").isNotNull()).groupBy("__h").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias("__k")
    )
    kept = inst.join(keep, "__h", "left").select(
        id_col,
        "n_total",
        "pos",
        "para",
        (
            F.col("para").isNotNull()
            & (F.col("__k.i") == F.col(id_col))
            & (F.col("__k.p") == F.col("pos"))
        ).alias("__keep"),
    )
    return kept.groupBy(id_col, "n_total").agg(
        F.sum(F.when(F.col("__keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("__keep"), F.struct("pos", "para"))
                    )
                ),
                lambda s: s["para"],
            ),
            joiner,
        ).alias("kept_text"),
    )
