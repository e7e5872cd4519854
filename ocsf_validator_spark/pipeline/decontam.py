"""Benchmark decontamination: flag (and drop) corpus documents whose
word n-grams overlap a held-out evaluation set.

The canonical pretraining hygiene step (reference has no analogue —
this is engine-brief surface, like dedup.py / select.py): before
training, every corpus document is scored by the fraction of its
distinct word ``n``-grams that appear anywhere in the benchmark's
n-gram set; documents above a threshold are contaminated and removed.

Scale discipline (the 100 TB design point):

- The benchmark side is SMALL by construction (eval sets are MBs; the
  corpus is the 100 TB side). Its distinct n-gram hash set is built
  once and **broadcast** — the corpus is never shuffled for the
  membership test.
- N-grams cross the join as 60-bit md5-prefix integers, never as raw
  strings (the jaccard_pairs lesson: hash before the exchange). The
  derivation is md5-replayable, so a DuckDB oracle can reproduce the
  hashes bit-for-bit — membership by hash is then *provably* identical
  across engines, and the only residual risk is a genuine 60-bit md5
  collision (~2^-60 per pair; production could widen to the full
  128-bit digest without changing the plan).
- Per-document grams are deduplicated map-side (``array_distinct``
  inside the projection) BEFORE the explode, so a pathological
  document repeating one phrase a million times contributes one join
  probe, not a million.
- The per-document re-aggregation after the explode is a partial-agg
  groupBy: the exchange carries ~one (doc_id, hits, total) row per
  document, never gram rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# First 15 md5 hex chars as a non-negative 60-bit bigint. Wider than
# dedup._MD5_HASH's 32 bits because this hash stands in for gram
# IDENTITY in a membership test (a false positive marks a clean doc
# contaminated); DuckDB replays it exactly:
#   ('0x' || substr(md5(x), 1, 15))::BIGINT
_MD5_60 = "cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"


def bind1(body: str, input_expr: str, var: str) -> str:
    """Bind ``input_expr`` ONCE as lambda variable ``var`` over ``body``
    via a single-element transform: subexpressions free inside
    higher-order-function lambdas are re-evaluated per ELEMENT (a
    split() referenced in a per-gram lambda is O(grams) re-tokenizations
    per document — measured 2-3x wall on every gram operator), and
    CollapseProject can't help inside one expression. A lambda VARIABLE
    is evaluated exactly once, closures over it are free, and the
    wrapper stays a pure SQL string — no projection-API change for
    composable Column helpers."""
    return f"element_at(transform(array({input_expr}), {var} -> {body}), 1)"


def _gram_hashes(text_col: str, n: int) -> str:
    """SQL expression: array of DISTINCT 60-bit hashes of the document's
    word ``n``-grams (whitespace tokens, the corpus-wide tokenizer of
    textstats/select). Documents with fewer than ``n`` tokens yield an
    empty array (guarded — ``sequence(1, 0)`` would count down).
    The token array is bound once via :func:`bind1` (never re-split
    per gram)."""
    gram = f"concat_ws(' ', slice(tk, i, {n}))"
    body = (
        f"case when size(tk) >= {n} then "
        f"array_distinct(transform(sequence(1, size(tk) - {n - 1}), "
        f"i -> {_MD5_60.format(x=gram)})) "
        f"else array() end"
    )
    return bind1(body, f"split({text_col}, ' ')", "tk")


def benchmark_ngrams(
    bench: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """Distinct n-gram hash set of the benchmark — the broadcast side.

    One column ``_g``. ``distinct()`` is global but over the SMALL
    side; at deployment scale this is computed once per benchmark
    release and persisted, not per corpus pass.
    """
    return (
        bench.select(
            F.explode(F.expr(_gram_hashes(text_col, n))).alias("_g")
        )
        .distinct()
    )


def contamination_scores(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination score against the benchmark.

    Returns (id_col, n_grams, n_hit, overlap, contaminated) where
    ``overlap = n_hit / n_grams`` over the document's DISTINCT
    n-grams, NULL (and contaminated = false) when the document is too
    short to have any.

    Plan shape: project distinct gram-hash arrays map-side →
    ``explode_outer`` (outer keeps zero-gram documents in the result)
    → **broadcast** left join against the benchmark set → partial-agg
    groupBy(id). One narrow exchange; no corpus text ever leaves the
    scan stage.
    """
    grams = docs.select(
        F.col(id_col),
        F.explode_outer(F.expr(_gram_hashes(text_col, n))).alias("_g"),
    )
    marked = grams.join(
        F.broadcast(benchmark_ngrams(bench, n, text_col)).withColumn(
            "_hit", F.lit(1)
        ),
        "_g",
        "left",
    )
    scored = marked.groupBy(id_col).agg(
        F.count("_g").alias("n_grams"),  # count() skips the outer NULL
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_hit"),
    )
    overlap = F.try_divide(
        F.col("n_hit").cast("double"), F.col("n_grams").cast("double")
    )
    return scored.select(
        id_col,
        "n_grams",
        "n_hit",
        F.round(overlap, 6).alias("overlap"),
        F.coalesce(overlap >= threshold, F.lit(False)).alias("contaminated"),
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The corpus minus contaminated documents (all original columns).

    The contaminated-id set is defect-proportional (decontamination
    removes a sliver of a healthy corpus), so the anti-join's build
    side is small — AQE plans it as a broadcast join at runtime; no
    static hint because a pathological benchmark could flag
    everything.
    """
    bad = (
        contamination_scores(docs, bench, n, threshold, id_col, text_col)
        .filter(F.col("contaminated"))
        .select(id_col)
    )
    return docs.join(bad, id_col, "left_anti")


def split_leakage(
    df: DataFrame,
    split_pred: str,
    text_col: str = "text",
    key_expr: str | None = None,
) -> DataFrame:
    """Train/val split-leakage report: content keys present on BOTH
    sides of a split — the exact-duplicate form of benchmark
    contamination, applied to one's own holdout (a val doc whose exact
    content also sits in train inflates every eval number; the n-gram
    overlap form is :func:`contamination_scores`). ``split_pred`` is a
    SQL predicate marking the train side; NULL-predicate rows are
    ignored. ``key_expr`` defaults to md5 of the raw text — pass
    render/canonicalization keys for looser equality.

    ONE exchange: groupBy(content key) with conditional per-side counts
    (partial agg collapses map-side to |distinct keys|), filter to keys
    seen on both sides — output is leakage-proportional, the raw text
    never shuffles. Returns (content_key, n_train, n_val) ordered by
    key."""
    key = key_expr or f"md5({text_col})"
    tagged = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.expr(key).alias("content_key"),
            F.expr(split_pred).alias("_is_train"),
        )
        .filter(F.col("_is_train").isNotNull())
    )
    return (
        tagged.groupBy("content_key")
        .agg(
            F.sum(F.col("_is_train").cast("long")).alias("n_train"),
            F.sum((~F.col("_is_train")).cast("long")).alias("n_val"),
        )
        .filter((F.col("n_train") > 0) & (F.col("n_val") > 0))
        .orderBy("content_key")
    )
