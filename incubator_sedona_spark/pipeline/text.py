"""Text analysis columns for training-data pipelines — all native Catalyst.

Language-ID, quality scoring, token counting, and fingerprinting are pure
built-in expressions (regexp/length/hash), so they run inside whole-stage
codegen at full scan speed — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that"],
    "de": ["der", "die", "und", "das", "nicht", "ist"],
    "fr": ["le", "la", "les", "et", "des", "est"],
    "es": ["el", "la", "los", "que", "de", "es"],
}


def token_count_col(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    t = F.trim(text)
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count_col(text: Column) -> Column:
    """Sub-word-ish count: words + digits + punctuation as separate tokens."""
    pieces = F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0)
    return F.size(pieces)


def quality_score_cols(text: Column) -> dict[str, Column]:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length heuristics."""
    t = F.trim(text)
    n_chars = F.length(t)
    toks = F.split(t, r"\s+")
    n_tokens = F.when(t == "", 0).otherwise(F.size(toks))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    mean_word_len = F.when(
        n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens
    ).otherwise(F.lit(0.0))
    stop_hits = sum(
        (F.when(F.array_contains(toks, w), 1).otherwise(0) for w in _STOPWORDS["en"]),
        F.lit(0),
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": punct_ratio,
        "mean_word_len": mean_word_len,
        "en_stopword_hits": stop_hits,
    }


def langid_col(text: Column) -> Column:
    """Stopword-vote language guess over {en, de, fr, es}, 'und' if no votes.

    A deliberately SQL-expressible heuristic (deterministic, oracle-checkable);
    a production system would swap in a vectorized n-gram model UDF here.
    """
    t = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    votes = {
        lang: sum(
            (F.when(t.contains(f" {w} "), 1).otherwise(0) for w in words), F.lit(0)
        )
        for lang, words in _STOPWORDS.items()
    }
    best = F.greatest(*votes.values())
    out = F.lit("und")
    # ties resolve in reverse iteration order -> deterministic fixed priority
    for lang in ("es", "fr", "de", "en"):
        out = F.when((votes[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def fingerprint_col(text: Column) -> Column:
    """Normalized-content fingerprint: lowercase, collapse whitespace, md5.

    The cheap canonical-form dedup key (rolling-hash document fingerprint).
    """
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)
