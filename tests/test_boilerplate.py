"""Cross-document boilerplate detection/removal
(pipeline/boilerplate.py).

Semantics: hand-built corpus with a planted footer; coverage overlap
(chained grams) must strip the union of spans; per-doc repetition must
NOT inflate document frequency. Plan: the df exchange carries gram
hashes, never gram strings; the flagged set joins back as a broadcast.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocsf_validator_spark.pipeline.boilerplate import (
    boilerplate_grams,
    strip_boilerplate,
)


@pytest.fixture()
def corpus(spark):
    footer = "all rights reserved"
    rows = [
        (0, f"alpha beta {footer}"),
        (1, f"gamma {footer} delta"),
        (2, f"{footer}"),
        (3, f"epsilon zeta eta theta {footer}"),
        # footer repeated within ONE doc: df must still count it once
        (4, f"{footer} iota {footer}"),
        (5, "unique words only here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_flagged_grams_and_df_counts(spark, corpus):
    out = {r["gram"]: r["df_docs"] for r in boilerplate_grams(
        corpus, n=2, min_doc_frac=0.5
    ).collect()}
    # both footer bigrams are in 5 of 6 docs (>= 3); doc 4's repeat
    # counts once
    assert out == {"all rights": 5, "rights reserved": 5}


def test_strip_union_of_overlapping_spans(spark, corpus):
    out = {r["doc_id"]: r for r in strip_boilerplate(
        corpus, n=2, min_doc_frac=0.5
    ).collect()}
    # overlapping grams 'all rights' + 'rights reserved' cover all 3
    # footer tokens exactly once
    assert out[0]["text_clean"] == "alpha beta" and out[0]["n_removed"] == 3
    assert out[1]["text_clean"] == "gamma delta"
    # a doc that is ONLY boilerplate strips to empty
    assert out[2]["text_clean"] == "" and out[2]["n_removed"] == 3
    # both in-doc occurrences strip
    assert out[4]["text_clean"] == "iota" and out[4]["n_removed"] == 6
    # clean doc passes through untouched
    assert out[5]["text_clean"] == "unique words only here"
    assert out[5]["n_removed"] == 0
    # row count preserved (removal edits text, never drops documents)
    assert len(out) == 6


def test_short_docs_never_flag(spark):
    df = spark.createDataFrame(
        [(0, "solo"), (1, "solo"), (2, "solo")], "doc_id long, text string"
    )
    assert boilerplate_grams(df, n=2, min_doc_frac=0.1).count() == 0
    out = strip_boilerplate(df, n=2, min_doc_frac=0.1).collect()
    assert all(r["text_clean"] == "solo" and r["n_removed"] == 0 for r in out)


def test_df_exchange_is_hash_keyed_and_flagged_set_broadcasts(spark, corpus):
    plan = (
        strip_boilerplate(corpus, n=2, min_doc_frac=0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    gh_exchanges = [ln for ln in exchanges if "gh#" in ln]
    assert gh_exchanges, plan
    assert all("gram#" not in ln for ln in gh_exchanges), gh_exchanges
    assert "BroadcastHashJoin" in plan, plan


def test_unicode_sanity_planted_damage(spark):
    from ocsf_validator_spark.pipeline import textstats

    df = spark.createDataFrame(
        [
            (0, "clean ascii text"),
            (1, "bad\x00byte and \x1f another"),
            (2, "lost � bytes � here"),
            (3, "invi​sible‍ join﻿"),
            (4, "café naïve résumé"),
            (5, ""),
            (6, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id", *textstats.unicode_sanity_cols("text")
        ).collect()
    }
    assert (got[0].n_control, got[0].n_replacement, got[0].n_zero_width,
            got[0].nonascii_ratio) == (0, 0, 0, 0.0)
    assert got[1].n_control == 2
    assert got[2].n_replacement == 2
    assert got[3].n_zero_width == 3
    assert got[4].nonascii_ratio == round(4 / len("café naïve résumé"), 6)
    # tab/newline/CR are NOT control junk
    ws = spark.createDataFrame([(7, "a\tb\nc\rd")], "doc_id long, text string")
    r7 = ws.select("doc_id", *textstats.unicode_sanity_cols("text")).collect()[0]
    assert r7.n_control == 0
    # empty text: counts 0, ratio NULL; NULL text: everything NULL
    assert (got[5].n_control, got[5].nonascii_ratio) == (0, None)
    assert got[6].n_control is None and got[6].nonascii_ratio is None
