"""Cross-document boilerplate detection and removal (CCNet-style).

Word n-grams that occur in more than ``min_doc_frac`` of all documents
are template residue — navigation chrome, license footers, cookie
banners — that per-document dedup can never catch because every
instance lives in a DIFFERENT document. The screen: compute each
gram's document frequency, flag grams above the threshold, and strip
every token position covered by a flagged gram.

Scale discipline (the 100 TB design point):

- Gram document-frequency rides DISTINCT per-doc gram hashes
  (``array_distinct`` BEFORE the explode — a page repeating its own
  footer 100x contributes one row), keyed on the 60-bit md5-prefix
  (decontam derivation, DuckDB-replayable): the count exchange carries
  8-byte ints, never gram strings.
- The flagged set is, by construction, tiny (it is the grams shared by
  a constant FRACTION of the corpus — cardinality bounded by
  sum(doc grams) * frac⁻¹ pigeonholing, in practice a few thousand) →
  it BROADCASTS back for the occurrence probe.
- Covered-position aggregation is occurrence-proportional: only
  (doc, flagged-gram-position) hits cross that exchange, grouped by
  doc_id.
- The rebuild joins the coverage back on doc_id: when the hit set is
  small AQE broadcasts it and clean documents never shuffle; in the
  generic plan (boilerplate pervasive — hits ~ docs) it is a
  sort-merge join on doc_id, which is the right shape since the
  coverage side is then itself corpus-sized. The rebuild expression is
  a pure projection: positional ``filter`` over the token array +
  ``concat_ws`` — scan speed, no UDF.
- The text column is scanned three times (df pass, occurrence pass,
  rebuild pass) rather than materializing the token stream — the same
  trade the ngram/decontam passes document; production persists the
  tokenized projection once and feeds all three.

The threshold compare is ``df_docs >= min_doc_frac * N`` in double on
both engines, so the flagged set is bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocsf_validator_spark.pipeline.decontam import _MD5_60, bind1


def _gram_structs(text_col: str, n: int) -> str:
    """Per-doc array of (pos, gram-hash, gram) structs; empty when the
    document is shorter than ``n`` tokens (sequence guard). Token array
    bound once via bind1 (never re-split per gram)."""
    gram = f"concat_ws(' ', slice(tk, i, {n}))"
    body = (
        f"case when size(tk) >= {n} then "
        f"transform(sequence(1, size(tk) - {n - 1}), "
        f"i -> struct(i as pos, {_MD5_60.format(x=gram)} as gh, {gram} as gram)) "
        f"else array() end"
    )
    return bind1(body, f"split({text_col}, ' ')", "tk")


def boilerplate_grams(
    df: DataFrame,
    n: int = 2,
    min_doc_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Word ``n``-grams present in >= ``min_doc_frac`` of documents,
    with their document frequency. The gram string is recovered as the
    deterministic ``min`` over the (distinct-per-doc) probe rows —
    collision-safe pick, same contract as select.ngram_topk."""
    totals = df.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    pairs = (
        f"array_distinct(transform({_gram_structs(text_col, n)}, "
        "t -> struct(t.gh as gh, t.gram as gram)))"
    )
    return (
        df.select(F.explode(F.expr(pairs)).alias("p"))
        .select("p.gh", "p.gram")
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df_docs"), F.min("gram").alias("gram"))
        .crossJoin(F.broadcast(totals))
        .filter(F.col("df_docs") >= F.lit(min_doc_frac) * F.col("_n_docs"))
        .select("gram", "df_docs")
        .orderBy(F.col("df_docs").desc(), F.col("gram").asc())
    )


def strip_boilerplate(
    df: DataFrame,
    n: int = 2,
    min_doc_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove every token position covered by a boilerplate n-gram.

    Returns (id_col, text_clean, n_removed); documents with no flagged
    occurrence pass through unchanged (n_removed = 0).
    """
    totals = df.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    # two gram passes by design for the short-gram (n=2) case: a
    # shared-occurrence single-pass variant (the spans.py shape) was
    # measured this round and REVERTED here — its extra partial-distinct
    # exchanges cost more than the cheap bigram re-tokenize saves
    # (+0.3 s at sf0.1), while spans' 8-token windows keep that shape
    # (the md5-over-window pass there is the expensive side)
    distinct_h = (
        f"array_distinct(transform({_gram_structs(text_col, n)}, t -> t.gh))"
    )
    flagged = (
        df.select(F.explode(F.expr(distinct_h)).alias("gh"))
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df_docs"))
        .crossJoin(F.broadcast(totals))
        .filter(F.col("df_docs") >= F.lit(min_doc_frac) * F.col("_n_docs"))
        .select("gh")
    )
    # occurrence probe: every (doc, pos) whose gram is flagged expands
    # to its covered token positions [pos, pos + n - 1]
    occ = (
        df.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"transform({_gram_structs(text_col, n)}, "
                    "t -> struct(t.pos as pos, t.gh as gh))"
                )
            ).alias("o"),
        )
        .select(id_col, "o.pos", "o.gh")
        .join(F.broadcast(flagged), "gh")
        .select(
            id_col, F.expr(f"sequence(pos, pos + {n - 1})").alias("_span")
        )
        .groupBy(id_col)
        .agg(
            F.array_distinct(F.flatten(F.collect_list("_span"))).alias("_cov")
        )
    )
    toks = f"split({text_col}, ' ')"
    kept = (
        f"filter({toks}, (t, j) -> _cov is null or "
        "not array_contains(_cov, j + 1))"
    )
    # size(_cov) IS the removed-token count (covered positions are in
    # range by construction) — the size-difference formulation
    # re-evaluated the positional filter twice. NULL-text rows keep
    # their NULL count.
    n_removed = (
        F.when(F.col(text_col).isNull(), F.lit(None))
        .when(F.col("_cov").isNull(), F.lit(0))
        .otherwise(F.size("_cov"))
    )
    return (
        df.join(occ, id_col, "left")
        .select(
            F.col(id_col),
            F.expr(f"concat_ws(' ', {kept})").alias("text_clean"),
            n_removed.cast("bigint").alias("n_removed"),
        )
        .orderBy(id_col)
    )
