"""Exact duplicate-substring span detection and removal.

The cross-document dedup family (pipeline/dedup.py) drops WHOLE
documents; boilerplate removal (pipeline/boilerplate.py) strips grams
shared by a constant FRACTION of the corpus. What neither catches is
the classic exact-substring case: a long token run copied between as
few as TWO documents — quoted passages, syndicated paragraphs, pasted
code — the target of suffix-array dedup in the training-data
literature. This module re-expresses that operator for Spark: every
``k``-token window is hashed; a window that appears in at least
``min_docs`` DISTINCT documents marks its positions as duplicated;
per document, overlapping/adjacent duplicated windows merge into
maximal spans (the islands-and-gaps pattern), which are reported
(:func:`dup_spans`) or stripped (:func:`strip_dup_spans`).

Scale discipline (the 100 TB design point):

- Window document-frequency rides DISTINCT per-doc window hashes
  (``array_distinct`` BEFORE the explode), keyed on the 60-bit
  md5-prefix (decontam derivation, DuckDB-replayable): that exchange
  carries 8-byte ints, never window strings.
- Unlike boilerplate's corpus-fraction threshold, the ``>= min_docs``
  set is NOT bounded by pigeonholing — at 100 TB it is proportional to
  the duplicated-content volume. The occurrence probe therefore joins
  on the 8-byte hash WITHOUT assuming broadcast: AQE broadcasts when
  the flagged set is small and falls back to a hash-keyed shuffle join
  when it is not. Everything downstream of that join is
  duplication-proportional — clean documents never shuffle.
- Span merging is one exchange on ``doc_id``: lag + running-sum over
  (doc_id, pos) share a single sort, and the island groupBy reuses the
  window's hash partitioning (doc_id is a prefix of the grouping key),
  so no second exchange.
- The rebuild in :func:`strip_dup_spans` is the positional-filter
  projection shared with boilerplate: pure column algebra, no UDF.

Hash collisions (two distinct windows sharing a 60-bit prefix) can
over-mark a span; at 2^60 the expected collision count stays < 1 up to
~10^9 distinct windows per corpus shard — the same accepted trade as
decontam/boilerplate, documented here.

Reference: the validator family this engine grew from has no dedup
surface (reference repo is a schema linter); span dedup follows the
published exact-substring formulation (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better") restated
as rolling-window hashing so Catalyst keeps it whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocsf_validator_spark.pipeline.boilerplate import _gram_structs


def _occurrences(df: DataFrame, k: int, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, gh) for every k-token window of every document."""
    probe = (
        f"transform({_gram_structs(text_col, k)}, "
        "t -> struct(t.pos as pos, t.gh as gh))"
    )
    return (
        df.select(F.col(id_col), F.explode(F.expr(probe)).alias("o"))
        .select(id_col, "o.pos", "o.gh")
    )


def _flagged_from(occ: DataFrame, min_docs: int, id_col: str) -> DataFrame:
    """Window hashes present in >= min_docs distinct documents, derived
    from the (id, pos, gh) occurrence frame so the tokenize + window-
    hash pass runs ONCE per query (it used to run twice: once for the
    occurrences, once for a distinct-per-doc flag pass — two full gram
    passes where one suffices). count(DISTINCT id) deduplicates
    (gh, id) map-side, so the exchange still carries per-doc-distinct
    fixed-width keys, never the window strings."""
    return (
        occ.groupBy("gh")
        .agg(F.countDistinct(id_col).alias("df_docs"))
        .filter(F.col("df_docs") >= int(min_docs))
        .select("gh")
    )


def dup_spans(
    df: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal duplicated spans per document.

    A position ``p`` is duplicated when the k-token window starting at
    ``p`` (1-based) occurs in >= ``min_docs`` distinct documents.
    Windows at starts s1 < s2 belong to one span iff s2 <= s1 + k
    (their covered ranges overlap or touch). Returns
    (id, span_start, span_end, span_len, n_windows) ordered by
    (id, span_start); span bounds are token positions, inclusive.
    """
    occ = _occurrences(df, k, text_col, id_col).localCheckpoint(eager=False)
    hits = occ.join(_flagged_from(occ, min_docs, id_col), "gh")
    w = Window.partitionBy(id_col).orderBy("pos")
    gap = F.when(F.col("pos") - F.lag("pos", 1).over(w) > k, 1).otherwise(0)
    island = F.sum(gap).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        hits.select(id_col, "pos", island.alias("_island"))
        .groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            id_col,
            F.col("span_start").cast("bigint").alias("span_start"),
            F.col("span_end").cast("bigint").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("bigint").alias("span_len"),
            F.col("n_windows").cast("bigint").alias("n_windows"),
        )
        .orderBy(id_col, "span_start")
    )


def strip_dup_spans(
    df: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove every token covered by a duplicated window.

    Returns (id, text_clean, n_removed); documents with no duplicated
    window pass through unchanged (n_removed = 0). Row count is
    preserved — span stripping edits text, never drops documents
    (whole-document dedup is pipeline/dedup.py's job).
    """
    occ = _occurrences(df, k, text_col, id_col).localCheckpoint(eager=False)
    cov = (
        occ.join(_flagged_from(occ, min_docs, id_col), "gh")
        .select(id_col, F.expr(f"sequence(pos, pos + {k - 1})").alias("_span"))
        .groupBy(id_col)
        .agg(F.array_distinct(F.flatten(F.collect_list("_span"))).alias("_cov"))
    )
    toks = f"split({text_col}, ' ')"
    kept = (
        f"filter({toks}, (t, j) -> _cov is null or "
        "not array_contains(_cov, j + 1))"
    )
    # every _cov position is an in-range token position by construction
    # (covered windows end within the document), so the removed-token
    # count IS size(_cov) — the size(toks) - size(kept) formulation
    # re-evaluated the whole positional filter a second time. NULL-text
    # rows keep their NULL count (size(NULL) - size(NULL) was NULL).
    n_removed = (
        F.when(F.col(text_col).isNull(), F.lit(None))
        .when(F.col("_cov").isNull(), F.lit(0))
        .otherwise(F.size("_cov"))
    )
    return (
        df.join(cov, id_col, "left")
        .select(
            F.col(id_col),
            F.expr(f"concat_ws(' ', {kept})").alias("text_clean"),
            n_removed.cast("bigint").alias("n_removed"),
        )
        .orderBy(id_col)
    )
