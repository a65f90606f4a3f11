"""Benchmark decontamination + repetition quality filters — native Catalyst.

Two training-data-pipeline operators every large corpus run needs before
training, re-expressed as pure built-in expressions (whole-stage codegen,
no Python in the hot path):

  * ``decontaminate`` — GPT-3-style n-gram test-set overlap (Brown et al.
    2020, appendix C; also The Pile / Llama decontamination): a corpus
    document is contaminated when it shares at least one normalized
    13-gram with any benchmark document.
  * ``repetition_stats`` — Gopher-style repetition filters (Rae et al.
    2022, table A1): duplicate-token fraction, duplicate-line fraction,
    and the fraction of tokens claimed by the single most frequent word
    bigram.

100-TB shape: the benchmark side of ``decontaminate`` is distinct n-grams
of the (small — MBs, not TBs) benchmark suite, broadcast to every
executor; the corpus side streams map-side through the broadcast hash
join, so the only shuffle is the per-document hit aggregation over the
CONTAMINATED subset (tiny).  ``repetition_stats`` shuffles (doc_id,
bigram) partial counts — a keyed aggregation with map-side combine, the
same shape as any word-count.  At deployment scale the n-gram join key
would be xxhash64(gram) (8 bytes instead of ~80); the tests and oracle
join on the gram string itself so DuckDB can mirror the query exactly —
hashing both sides changes bytes moved, not the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def normalized_tokens_col(text: Column) -> Column:
    """Lowercase, collapse every non-alphanumeric run to one space, split.
    (The normalization GPT-3's decontamination describes.)"""
    return F.filter(
        F.split(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "), " "),
        lambda x: x != "",
    )


def ngrams_col(text: Column, n: int) -> Column:
    """Array of space-joined word n-grams (empty when under n tokens).

    The token array is barriered through a single-element aggregate() so
    Catalyst cannot re-inline the O(chars) regexp+split tokenization into
    every gram lambda — the collapse class dedup.winnow_fingerprints hit
    (measured 9x there).  Here the A/B measured NEUTRAL (token arrays are
    short and the tokenize is cheap relative to the join), so this is a
    defensive invariant, not a claimed speedup."""

    def _grams(t: Column) -> Column:
        return F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.array_join(F.slice(t, i + 1, n), " "),
            )
        )

    return F.aggregate(
        F.array(F.lit(1)),
        normalized_tokens_col(text),
        lambda acc, _x: acc,
        lambda acc: _grams(acc),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """(id_col, n_hits): corpus documents sharing >= 1 normalized n-gram
    with any benchmark document, with the count of DISTINCT shared n-grams.
    Documents not returned are clean — filter with a left-anti join against
    this result to produce the decontaminated corpus."""
    bench_grams = (
        benchmark.select(
            F.explode(ngrams_col(F.col(bench_text_col or text_col), n)).alias("__gram")
        )
        .distinct()
    )
    # per-document dedup is ROW-LOCAL (array_distinct before the explode):
    # a corpus-wide .distinct() here would shuffle every (id, gram) pair —
    # the exact shuffle this operator's design avoids.  A document repeats
    # each distinct n-gram at most once after this, so the post-join count
    # is the distinct-shared-gram count with zero corpus-side Exchange
    # before the broadcast join.
    corpus_grams = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams_col(F.col(text_col), n))).alias("__gram"),
    )
    # count_distinct (not count) so a duplicated corpus ROW for one doc_id
    # (an upstream union re-reading a partition) cannot double-count: the
    # distinct runs over the post-join CONTAMINATED subset only — tiny —
    # never over the corpus
    return (
        corpus_grams.join(F.broadcast(bench_grams), "__gram")
        .groupBy(id_col)
        .agg(F.count_distinct("__gram").alias("n_hits"))
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition metrics (Gopher table A1 family):

    - n_tokens
    - dup_token_frac: 1 - distinct/total tokens
    - dup_line_frac:  1 - distinct/total non-blank lines (0 if <= 1 line)
    - top_bigram / top_bigram_frac: the most frequent word bigram (count
      desc, bigram asc tiebreak) and 2*count/n_tokens

    Documents with < 2 tokens are dropped (no bigram is defined)."""
    toks = normalized_tokens_col(F.col(text_col))
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    base = df.select(
        F.col(id_col),
        toks.alias("__t"),
        F.size(toks).alias("n_tokens"),
        lines.alias("__l"),
    ).where(F.col("n_tokens") >= 2)
    base = base.select(
        id_col,
        "n_tokens",
        (1.0 - F.size(F.array_distinct("__t")) / F.col("n_tokens")).alias("dup_token_frac"),
        F.when(F.size("__l") <= 1, F.lit(0.0))
        .otherwise(1.0 - F.size(F.array_distinct("__l")) / F.size("__l"))
        .alias("dup_line_frac"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_tokens") - 2),
                lambda i: F.concat_ws(" ", F.slice(F.col("__t"), i + 1, 2)),
            )
        ).alias("__bg"),
    )
    counts = base.groupBy(
        id_col, "n_tokens", "dup_token_frac", "dup_line_frac", "__bg"
    ).agg(F.count("*").alias("__cnt"))
    # top bigram via min_by over struct(-count, bigram): picks max count,
    # then lexicographically smallest bigram — one hash aggregate instead
    # of a window sort (same two Exchanges, no per-partition sort)
    top = counts.groupBy(id_col, "n_tokens", "dup_token_frac", "dup_line_frac").agg(
        F.min_by(
            F.struct(F.col("__cnt"), F.col("__bg")),
            F.struct((-F.col("__cnt")).alias("nc"), F.col("__bg")),
        ).alias("__top")
    )
    return top.select(
        id_col,
        "n_tokens",
        "dup_token_frac",
        "dup_line_frac",
        F.col("__top.__bg").alias("top_bigram"),
        (2.0 * F.col("__top.__cnt") / F.col("n_tokens")).alias("top_bigram_frac"),
    )
