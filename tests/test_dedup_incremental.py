"""Incremental exact dedup (dedup.dedup_against): new-increment rows
whose text already exists in the prior corpus are dropped; NULL text
never matches anything (kept — the oracle's NOT IN (non-null keys)
reading, not SQL anti-join NULL semantics); the prior side collapses
to DISTINCT content keys so increment cost is keys-not-corpus.
"""

from __future__ import annotations

from ocsf_validator_spark.pipeline.dedup import dedup_against, exact_duplicates


def test_dedup_against_drops_prior_texts_keeps_null(spark):
    prior = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, None), (4, "beta")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "alpha"),   # dup of prior 1 -> dropped
            (11, "gamma"),   # fresh -> kept
            (12, None),      # NULL never matches (even prior NULL) -> kept
            (13, "beta"),    # dup of prior 2/4 -> dropped
            (14, "ALPHA"),   # case-sensitive: distinct -> kept
        ],
        "doc_id long, text string",
    )
    out = dedup_against(new, prior)
    assert [f.name for f in out.schema.fields] == ["doc_id", "text"]
    assert sorted(r.doc_id for r in out.collect()) == [11, 12, 14]


def test_dedup_against_empty_prior_is_identity(spark):
    new = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None)], "doc_id long, text string"
    )
    prior = new.limit(0)
    got = sorted(map(tuple, dedup_against(new, prior).collect()))
    assert got == [(1, "a"), (2, "a"), (3, None)]


def test_dedup_against_agrees_with_exact_duplicates(spark):
    """Running full-corpus exact_duplicates and applying dedup_against
    to a later increment must agree about what 'the same text' means:
    an increment row is dropped by dedup_against iff a full-corpus run
    over prior+new flags it as a duplicate of a PRIOR doc."""
    prior = spark.createDataFrame(
        [(i, f"doc {i % 5}") for i in range(10)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(100, "doc 0"), (101, "brand new"), (102, "doc 4")],
        "doc_id long, text string",
    )
    survivors = {r.doc_id for r in dedup_against(new, prior).collect()}
    full = prior.unionByName(new)
    dup_of_prior = {
        r.doc_id
        for r in exact_duplicates(full).collect()
        if r.doc_id >= 100 and r.keep_id < 100
    }
    assert survivors == {101}
    assert dup_of_prior == {100, 102}
    assert survivors.isdisjoint(dup_of_prior)
    assert survivors | dup_of_prior == {100, 101, 102}


def test_dedup_against_plan_no_text_through_exchange(spark):
    """The anti join must key on the 128-bit content key, not text:
    no raw text column appears in any Exchange of the physical plan
    (the body never shuffles — at 100 TB the join moves 20-byte keys)."""
    prior = spark.createDataFrame(
        [(1, "alpha")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "alpha"), (3, "x")], "doc_id long, text string"
    )
    plan = (
        dedup_against(new, prior)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


def test_lsh_pairs_against_matches_full_corpus_pairs(spark):
    """Incremental banding must be bit-identical to the full-corpus op:
    the (new x prior) pairs of lsh_pairs_against == the cross-side
    subset of lsh_candidate_pairs run over prior+new together."""
    from ocsf_validator_spark.pipeline import dedup

    docs = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "completely different text with no overlap whatsoever here"),
        (101, "the quick brown fox jumps over the lazy dog today"),
        (102, "another unrelated document about spark window functions"),
    ]
    full = spark.createDataFrame(docs, "doc_id long, text string")
    prior = full.filter("doc_id < 100")
    new = full.filter("doc_id >= 100")
    sig = lambda d: dedup.minhash_signatures(d, n_hashes=8, k=5)
    inc = {
        (r.new_id, r.prior_id)
        for r in dedup.lsh_pairs_against(sig(new), sig(prior)).collect()
    }
    cross = {
        (r.b_id, r.a_id)
        for r in dedup.lsh_candidate_pairs(sig(full)).collect()
        if r.a_id < 100 <= r.b_id
    }
    assert inc == cross and (101, 1) in inc


def test_lsh_filter_against_drops_near_dups_only(spark):
    from ocsf_validator_spark.pipeline import dedup

    prior = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (101, "the quick brown fox jumps over the lazy dog today"),
            (102, "another unrelated document about spark window functions"),
        ],
        "doc_id long, text string",
    )
    sig = lambda d: dedup.minhash_signatures(d, n_hashes=8, k=5)
    out = dedup.lsh_filter_against(new, sig(new), sig(prior))
    assert [r.doc_id for r in out.collect()] == [102]
    # empty prior keeps everything
    empty_sig = sig(prior.limit(0))
    kept = dedup.lsh_filter_against(new, sig(new), empty_sig)
    assert sorted(r.doc_id for r in kept.collect()) == [101, 102]


def test_dup_rate_first_seen_attribution(spark):
    """dup_rate: duplicates attribute to the LATER id's source; NULL
    texts are never duplicates (and never alias each other); rates are
    exact ratios; a duplicate-free source reads 0.0."""
    from ocsf_validator_spark.pipeline.dedup import dup_rate

    rows = [
        ("orig", 1, "alpha"), ("orig", 2, "beta"), ("orig", 3, "gamma"),
        ("mirror", 10, "alpha"), ("mirror", 11, "beta"), ("mirror", 12, "new"),
        ("nulls", 20, None), ("nulls", 21, None),
        # an in-source duplicate
        ("orig", 4, "alpha"),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    got = {r.source: (r.n_docs, r.dup_docs, r.dup_rate) for r in dup_rate(df).collect()}
    assert got["orig"] == (4, 1, 0.25)
    assert got["mirror"] == (3, 2, round(2 / 3, 6))
    assert got["nulls"] == (2, 0, 0.0)
