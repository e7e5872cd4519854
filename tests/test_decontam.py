"""Benchmark decontamination (pipeline/decontam.py) and intra-document
repetition signals (textstats.repetition_cols).

The decontam plan contract matters as much as the values: the corpus
side must reach the membership test through a BROADCAST join (the
benchmark is the small side by construction) and raw text must never
cross an Exchange.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocsf_validator_spark.pipeline import decontam, textstats


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "a b c x"),            # grams {a b c, b c x} -> 1/2 hit
            (2, "x y z w"),            # no overlap
            (3, "a b"),                # too short for 3-grams
            (4, "a b c d e"),          # {a b c, b c d, c d e} -> 2/3
            (5, "a b c a b c a b c"),  # repeats dedup to 3 distinct -> 1/3
        ],
        "doc_id long, text string",
    )


@pytest.fixture()
def bench(spark):
    # benchmark grams: {a b c, b c d}
    return spark.createDataFrame([(100, "a b c d")], "doc_id long, text string")


def test_contamination_scores_hand_computed(corpus, bench):
    got = {
        r["doc_id"]: r
        for r in decontam.contamination_scores(
            corpus, bench, n=3, threshold=0.5
        ).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    assert (got[1]["n_grams"], got[1]["n_hit"]) == (2, 1)
    assert got[1]["overlap"] == pytest.approx(0.5)
    assert got[1]["contaminated"] is True  # >= is inclusive
    assert (got[2]["n_grams"], got[2]["n_hit"]) == (2, 0)
    assert got[2]["contaminated"] is False
    # zero-gram doc survives explode_outer: NULL overlap, not contaminated
    assert (got[3]["n_grams"], got[3]["n_hit"]) == (0, 0)
    assert got[3]["overlap"] is None
    assert got[3]["contaminated"] is False
    assert got[4]["overlap"] == pytest.approx(round(2 / 3, 6))
    assert got[4]["contaminated"] is True
    # within-doc repeats of a gram count once (array_distinct map-side)
    assert (got[5]["n_grams"], got[5]["n_hit"]) == (3, 1)
    assert got[5]["contaminated"] is False


def test_decontaminate_keeps_clean_docs_with_all_columns(corpus, bench):
    out = decontam.decontaminate(corpus, bench, n=3, threshold=0.5)
    assert out.columns == corpus.columns
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 3, 5]


def test_decontam_plan_broadcast_and_no_text_exchange(spark, corpus, bench):
    """The membership join must be a broadcast (corpus never shuffles
    gram rows for it) and no Exchange may carry raw text — grams cross
    as 60-bit ints only."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        scores = decontam.contamination_scores(corpus, bench, n=3)
        jvm = spark._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = scores._jdf.queryExecution().explainString(mode)
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        hash_exchanges = 0
        for b in plan.split("\n\n"):
            if ") Exchange" in b.split("\n")[0]:
                assert "text#" not in b, f"text crossed an exchange:\n{b}"
                if "hashpartitioning" in b:
                    hash_exchanges += 1
        # exactly two hash exchanges: the benchmark distinct (small
        # side) and the per-doc re-aggregation (~1 row per doc)
        assert hash_exchanges == 2, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


# ---------------------------------------------------------------------------
# repetition signals
# ---------------------------------------------------------------------------


def _rep(spark, text, n=2):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return textstats.repetition_profile(df, n=n).collect()[0]


def test_repetition_hand_computed(spark):
    r = _rep(spark, "a a b")
    assert r["n_tokens"] == 3
    assert r["dup_token_frac"] == pytest.approx(round(1 / 3, 6))
    assert r["dup_ngram_frac"] == pytest.approx(0.0)  # "a a", "a b"
    assert r["top_ngram_frac"] == pytest.approx(0.5)

    r = _rep(spark, "a a a a")
    assert r["dup_token_frac"] == pytest.approx(0.75)
    assert r["dup_ngram_frac"] == pytest.approx(round(2 / 3, 6))
    assert r["top_ngram_frac"] == pytest.approx(1.0)

    r = _rep(spark, "a b a b a c")
    assert r["dup_token_frac"] == pytest.approx(0.5)
    assert r["dup_ngram_frac"] == pytest.approx(0.4)
    assert r["top_ngram_frac"] == pytest.approx(0.4)  # "a b" x2 of 5


def test_repetition_short_doc_yields_null_gram_fracs(spark):
    r = _rep(spark, "solo")
    assert r["n_tokens"] == 1
    assert r["dup_token_frac"] == pytest.approx(0.0)
    assert r["dup_ngram_frac"] is None
    assert r["top_ngram_frac"] is None


def test_mode_fold_matches_relational_mode(spark):
    """The sort+linear-fold mode count must equal the explode +
    groupBy(doc, gram) + max formulation (what the DuckDB oracle runs)
    on varied docs."""
    words = ["alpha", "beta", "gamma", "the", "of"]
    rows = [
        (i, " ".join(words[(i + j * j) % len(words)] for j in range(2 + i % 17)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fold = {
        r["doc_id"]: r["top_ngram_frac"]
        for r in textstats.repetition_profile(df, n=2).collect()
    }
    grams = df.select(
        "doc_id",
        F.explode(F.expr(textstats._grams("text", 2))).alias("gram"),
        F.expr(f"size({textstats._grams('text', 2)})").alias("n_grams"),
    )
    relational = (
        grams.groupBy("doc_id", "gram", "n_grams")
        .count()
        .groupBy("doc_id", "n_grams")
        .agg(F.max("count").alias("topc"))
        .select(
            "doc_id",
            F.round(
                F.col("topc").cast("double") / F.col("n_grams"), 6
            ).alias("frac"),
        )
    )
    rel = {r["doc_id"]: r["frac"] for r in relational.collect()}
    for doc_id, frac in rel.items():
        assert fold[doc_id] == pytest.approx(frac), doc_id
    # docs with no bigrams are NULL in the fold output and absent here
    for doc_id in set(fold) - set(rel):
        assert fold[doc_id] is None


def test_split_leakage_semantics(spark):
    from ocsf_validator_spark.pipeline.decontam import split_leakage

    df = spark.createDataFrame(
        [
            (0, "leaked body"),     # train
            (1, "leaked body"),     # val  -> leaks
            (2, "train only"),
            (4, "train only"),      # duplicated WITHIN train: no leak
            (3, "val only"),
            (5, None),              # NULL text ignored
        ],
        "doc_id long, text string",
    )
    rows = split_leakage(df, "doc_id % 2 = 0").collect()
    assert len(rows) == 1
    assert (rows[0].n_train, rows[0].n_val) == (1, 1)
    # custom key: prefix equality catches template leakage
    df2 = spark.createDataFrame(
        [(0, "TEMPLATE: alpha"), (1, "TEMPLATE: beta")],
        "doc_id long, text string",
    )
    assert split_leakage(df2, "doc_id % 2 = 0").count() == 0
    assert (
        split_leakage(
            df2, "doc_id % 2 = 0", key_expr="md5(substr(text, 1, 9))"
        ).count()
        == 1
    )


def test_split_leakage_plan_no_text_in_exchange(spark):
    from ocsf_validator_spark.pipeline.decontam import split_leakage

    df = spark.createDataFrame(
        [(0, "body")], "doc_id long, text string"
    )
    plan = (
        split_leakage(df, "doc_id % 2 = 0")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    exchanges = [
        ln for ln in plan.splitlines() if "hashpartitioning" in ln
    ]
    assert exchanges and all("text#" not in ln for ln in exchanges)
