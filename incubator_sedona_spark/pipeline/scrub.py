"""PII scrubbing for training corpora — native regexp, no Python in the plan.

Before text reaches a training shard, pipelines redact personally
identifying strings (the BigScience ROOTS / Llama-2 pretraining recipe:
emails, phone numbers, IP addresses replaced by typed placeholder
tokens).  This module is that stage as pure Catalyst ``regexp_replace``
chains — whole-stage codegen, scan-speed, zero shuffle: at 100 TB the
scrub is a free rider on whatever scan already reads the text column.

Pattern dialect: the regexes below restrict themselves to the syntax
subset with identical semantics in Java's Pattern (Spark), RE2 (DuckDB)
and Python's re — character classes, bounded repetition, alternation,
``\\b`` word boundaries; no backreferences or lookaround — so the same
pattern strings drive the engine, the DuckDB oracle, and any sidecar
Python QA script.

Replacement ORDER is load-bearing and fixed: emails first (an email
contains dot-separated runs an IP pattern could half-match), then
phones, then IPs.  Counts are computed on the ORIGINAL text, each
pattern independently, before any replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# email: local part @ dotted domain with a 2+ letter TLD
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# international-ish phone: +CC separator 3 digits separator 4 digits
PHONE_RE = r"\+[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{4}"
# dotted-quad IPv4 (octet range not enforced — scrubbing favors recall)
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

_PII_PATTERNS = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IPV4_RE, "<IP>"),
]


def pii_count_cols(text: Column) -> dict[str, Column]:
    """n_email / n_phone / n_ip match counts on the un-scrubbed text."""
    return {
        f"n_{name}": F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for name, pat, _tag in _PII_PATTERNS
    }


def scrub_pii_col(text: Column) -> Column:
    """Text with every PII match replaced by its typed placeholder tag."""
    out = text
    for _name, pat, tag in _PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_email / n_phone / n_ip and replaces ``text_col`` with the
    scrubbed text.  Row-local: the plan is a single Project over the scan."""
    counts = pii_count_cols(F.col(text_col))
    out = df.select(
        "*", *[c.alias(n) for n, c in counts.items()]
    )
    return out.withColumn(text_col, scrub_pii_col(F.col(text_col)))


def pii_sql_exprs(text_sql: str) -> dict[str, str]:
    """DuckDB twins: same pattern strings, same replacement order.

    DuckDB needs the 'g' flag for global replace (Spark's regexp_replace
    is always global) and len(regexp_extract_all(...)) for counts.
    DuckDB single-quoted strings are escape-free (no E'' here), so the
    pattern's backslashes pass through to RE2 verbatim — no doubling."""
    scrubbed = text_sql
    counts = {}
    for name, pat, tag in _PII_PATTERNS:
        lit = pat.replace("'", "''")
        counts[f"n_{name}"] = f"len(regexp_extract_all({text_sql}, '{lit}'))"
        scrubbed = f"regexp_replace({scrubbed}, '{lit}', '{tag}', 'g')"
    counts["scrubbed"] = scrubbed
    return counts
