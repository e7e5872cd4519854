"""Exact duplicate-substring span detection/removal (pipeline/spans.py).

Semantics: a planted passage shared by two docs must come back as ONE
maximal span per doc (adjacent windows merge); two separated copies in
one doc are two islands; a window repeated only WITHIN one document
must not flag (min_docs counts distinct docs); short docs never flag.
Plan: the df exchange carries window hashes, never window strings, and
the island groupBy reuses the span window's doc_id partitioning (no
second doc_id exchange).
"""

from __future__ import annotations

import pytest

from ocsf_validator_spark.pipeline.spans import dup_spans, strip_dup_spans

PASSAGE = "a b c d e f g h i j"  # 10 tokens -> 3 windows at k=8


@pytest.fixture()
def corpus(spark):
    rows = [
        (0, f"intro words {PASSAGE} outro"),
        (1, f"{PASSAGE} completely different tail here"),
        # the passage twice in ONE doc, separated: island split, and the
        # doc-pair count still makes every window >= 2 docs
        (2, f"{PASSAGE} w x y z q r s t u v {PASSAGE}"),
        # intra-doc-only repetition: never flags at min_docs=2
        (3, "m n o p q r s t m n o p q r s t"),
        (4, "nothing shared with anything else at all ok"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_maximal_span_merge_and_positions(spark, corpus):
    out = [
        (r.doc_id, r.span_start, r.span_end, r.span_len, r.n_windows)
        for r in dup_spans(corpus, k=8, min_docs=2).collect()
    ]
    # doc 0: passage at tokens 3..12 -> windows start 3,4,5 -> one span
    assert (0, 3, 12, 10, 3) in out
    # doc 1: passage at 1..10
    assert (1, 1, 10, 10, 3) in out
    # doc 2: two copies (1..10 and 21..30) -> two islands, gap > k
    assert (2, 1, 10, 10, 3) in out and (2, 21, 30, 10, 3) in out
    # docs 3 and 4 never appear
    assert all(d not in (3, 4) for d, *_ in out)
    assert len(out) == 4


def test_overlapping_windows_single_island(spark):
    # 12 shared tokens -> 5 windows at k=8, all gaps == 1 -> one span
    shared = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"
    df = spark.createDataFrame(
        [(0, shared), (1, f"pre {shared}")], "doc_id long, text string"
    )
    out = dup_spans(df, k=8, min_docs=2).collect()
    assert [(r.doc_id, r.span_start, r.span_end) for r in out] == [
        (0, 1, 12), (1, 2, 13)
    ]


def test_strip_preserves_rows_and_clean_docs(spark, corpus):
    out = {r.doc_id: r for r in strip_dup_spans(corpus, k=8, min_docs=2).collect()}
    assert len(out) == 5
    assert out[0].text_clean == "intro words outro" and out[0].n_removed == 10
    assert out[1].text_clean == "completely different tail here"
    # doc 2 loses both copies, keeps the middle filler
    assert out[2].text_clean == "w x y z q r s t u v"
    assert out[2].n_removed == 20
    # intra-doc-only repetition untouched
    assert out[3].n_removed == 0 and out[4].n_removed == 0


def test_short_docs_never_flag(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c")], "doc_id long, text string"
    )
    assert dup_spans(df, k=8, min_docs=2).count() == 0
    out = strip_dup_spans(df, k=8, min_docs=2).collect()
    assert all(r.n_removed == 0 for r in out)


def test_plan_hash_keyed_exchange_and_window_group_reuse(spark, corpus):
    plan = (
        dup_spans(corpus, k=8, min_docs=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    # no window STRINGS cross any exchange (hash-keyed df count)
    assert all("gram#" not in ln for ln in exchanges), exchanges
    # the island groupBy rides the span window's doc_id partitioning:
    # exactly one exchange PARTITIONED BY doc_id in the whole plan (the
    # single-gram-pass df count adds a (gh, doc_id)-keyed partial-
    # distinct exchange — fixed-width ints, keyed on gh first — which
    # is not a doc_id repartition)
    doc_exchanges = [
        ln for ln in exchanges if "hashpartitioning(doc_id#" in ln
    ]
    assert len(doc_exchanges) == 1, plan
