"""PII scrubbing for training corpora: detect and redact emails, IPv4
addresses, and international-format phone numbers in a text column.

This is the redaction stage of a training-data pipeline (the reference
validates security-event schemas — ocsf/ocsf-validator
validators.py's attribute checks — and a corpus of such events is
exactly where literal PII leaks into training text). Design:

- Pure JVM column algebra: counts via ``size(regexp_extract_all(...))``
  and redaction via chained ``regexp_replace`` — scan-speed, zero
  shuffle, no UDF; Catalyst keeps the whole operator in one
  WholeStageCodegen projection over a column-pruned scan.
- Patterns are deliberately RESTRICTED to the alternation-free,
  backreference-free subset where Java's backtracking (Spark), RE2's
  leftmost-longest (DuckDB), and Python's ``re`` (tests) all agree, so
  the operator is engine-replayable: the DuckDB oracle runs the same
  patterns with the 'g' flag and hashes identically.
- Counts are computed on the ORIGINAL text (an email whose domain is a
  literal IP counts as both — the count columns answer "how much PII
  was here", not "how many replacements ran"); redaction is sequential
  email -> ipv4 -> phone, and the placeholders contain no digits, dots,
  or '@', so an earlier replacement can never manufacture a later
  match.
- NULL text stays NULL with zero counts.

At 100 TB: regex work is per-row and embarrassingly parallel; the
operator adds no exchange, so it composes into any existing scan
(quality scoring, dedup prep) for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies top-to-bottom. Each pattern is valid and
# equivalent under Java regex, RE2, and Python re (no alternation-vs-
# backtracking divergence, no backreferences, no lookaround).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # international format only (leading +): unambiguous cross-engine
    # and avoids flagging ordinary large numbers
    ("phone", r"\+\d[\d -]{7,}\d", "<PHONE>"),
)


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Per-row PII counts (on the original text) plus the redacted
    text. Returns ``(*id_cols, n_email, n_ipv4, n_phone,
    text_scrubbed)``.
    """
    t = F.col(text_col)
    counts = [
        F.when(t.isNull(), F.lit(0))
        .otherwise(
            # lit() pattern, not an expr() SQL literal: the SQL parser
            # would eat the regex backslashes
            F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        )
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = t
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(
        *[F.col(c) for c in id_cols],
        *counts,
        scrubbed.alias("text_scrubbed"),
    )


def normalize_docs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Text canonicalization — the step BEFORE any dedup/fingerprint
    pass (X7/X9 key on exact bytes, so 'Foo  bar' and 'foo bar' dedup
    as different documents until normalized): control characters →
    space, whitespace runs collapsed, edges trimmed, lowercased.
    Unicode NFC is deliberately out of scope — Spark has no built-in
    normalizer and a per-row Python UDF is the one cost this module
    refuses; upstream ingest owns encoding normalization.

    Pure chained regexp_replace/lower/trim column algebra — one
    WholeStageCodegen projection, zero Exchange (plan-pinned), the
    pii_scrub discipline: patterns restricted to the alternation-free
    lookaround-free subset where Java regex and RE2 agree. Emits both
    content keys so a migration can measure how many duplicate pairs
    normalization newly exposes (join key_norm against the X7 ledger).

    Returns (id_col, text_norm, changed, key_raw, key_norm); NULL text
    stays NULL with changed = false and NULL keys.
    """
    t = F.col(text_col)
    norm = F.lower(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(t, "[\\x00-\\x1f]", " "), " +", " "
            )
        )
    )
    return df.select(
        F.col(id_col),
        norm.alias("text_norm"),
        (t.isNotNull() & (t != norm)).alias("changed"),
        F.md5(t).alias("key_raw"),
        F.md5(norm).alias("key_norm"),
    )
