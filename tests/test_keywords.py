"""Keyword extraction (pipeline/keywords.py) and the embedding
label-centroid outlier audit (similarity.label_centroid_outliers).

Semantics tests pin hand-computable TF-IDF values and outlier picks;
plan tests pin the at-scale contracts — the df count exchange carries
the 60-bit hash (never term strings), and the centroid table comes
back as a broadcast, never a shuffled join.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ocsf_validator_spark.pipeline import keywords, similarity


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "apple apple banana shared"),
            (1, "banana cherry shared"),
            (2, "cherry cherry cherry shared"),
        ],
        "doc_id long, text string",
    )


def test_tfidf_values_and_ranking(spark, docs):
    out = keywords.tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["term"]] = r
    # 'shared' is in all 3 docs -> idf = ln(1) = 0, never a top term
    # when a distinctive one exists
    assert "shared" not in by_doc[0]
    # doc 0: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    apple = by_doc[0]["apple"]
    assert apple["tf"] == 2 and apple["df_docs"] == 1
    assert apple["tfidf"] == round(2 * math.log(3.0), 6)
    banana = by_doc[0]["banana"]
    assert banana["tfidf"] == round(math.log(1.5), 6)
    # doc 2: cherry tf=3 df=2 dominates; second slot falls to 'shared'
    # (idf 0) because doc 2 has no other distinctive term
    assert by_doc[2]["cherry"]["tfidf"] == round(3 * math.log(1.5), 6)
    assert set(by_doc[2]) == {"cherry", "shared"}
    # every doc emits exactly k rows (enough vocabulary in fixture)
    assert all(len(v) == 2 for v in by_doc.values())


def test_tfidf_tie_breaks_on_term(spark):
    # two terms with identical tf and df -> identical tfidf; the
    # alphabetically earlier term must win the last slot
    docs = spark.createDataFrame(
        [(0, "zebra apple"), (1, "other")], "doc_id long, text string"
    )
    out = keywords.tfidf_topk(docs, k=1).collect()
    doc0 = [r for r in out if r["doc_id"] == 0]
    assert len(doc0) == 1 and doc0[0]["term"] == "apple"


def test_tfidf_df_exchange_carries_hash_not_strings(spark, docs):
    """The document-frequency aggregation must key on the 60-bit hash:
    its exchange's partitioning expression mentions _h and no string
    term column (the select.py/decontam.py narrow-exchange contract)."""
    plan = keywords.tfidf_topk(docs, k=2)._jdf.queryExecution().executedPlan().toString()
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    df_exchanges = [ln for ln in exchanges if "_h#" in ln]
    assert df_exchanges, plan
    assert all("term#" not in ln for ln in df_exchanges), df_exchanges


@pytest.fixture()
def vectors(spark):
    rows = []
    # label 0: tight cluster on e0, one outlier pointing at e1
    for i in range(6):
        rows.append((i, 0, [1.0, 0.01 * i, 0.0]))
    rows.append((6, 0, [0.0, 1.0, 0.0]))
    # label 1: cluster on e2, outlier on -e2 axis mix
    for i in range(5):
        rows.append((10 + i, 1, [0.0, 0.02 * i, 1.0]))
    rows.append((15, 1, [1.0, 0.0, -1.0]))
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def test_outlier_pick_and_order(spark, vectors):
    out = similarity.label_centroid_outliers(vectors, k=2).collect()
    got = {(r["label"], r["vec_id"]) for r in out}
    # the planted outliers must be among the per-label picks
    assert (0, 6) in got and (1, 15) in got
    assert len([r for r in out if r["label"] == 0]) == 2
    # farthest-first rank: the planted outlier has the LOWEST cosine
    lab0 = {r["vec_id"]: r["cos_sim"] for r in out if r["label"] == 0}
    assert lab0[6] == min(lab0.values())


def test_outlier_centroid_is_order_independent(spark, vectors):
    """Decimal accumulation: shuffling input order / partitioning must
    not change a single rounded cosine (float sums would)."""
    a = similarity.label_centroid_outliers(vectors, k=3).collect()
    b = similarity.label_centroid_outliers(
        vectors.repartition(7, "vec_id").sortWithinPartitions(
            F.col("vec_id").desc()
        ),
        k=3,
    ).collect()
    key = lambda r: (r["label"], r["vec_id"])
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert {key(r): r["cos_sim"] for r in a} == {key(r): r["cos_sim"] for r in b}


def test_outlier_centroids_broadcast(spark, vectors):
    """The centroid table must come back as a BroadcastHashJoin — a
    shuffled join here would re-exchange the full vector table at
    scale for a labels-sized build side."""
    plan = (
        similarity.label_centroid_outliers(vectors, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_unigram_logprob_semantics(spark):
    from math import log

    df = spark.createDataFrame(
        [(0, "common common common"), (1, "common rare")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in keywords.unigram_logprob_score(df).collect()}
    # corpus: common x4, rare x1, total 5
    p_common, p_rare = 4 / 5, 1 / 5
    assert out[0]["n_tokens"] == 3
    assert out[0]["avg_neg_logprob"] == round(-log(p_common), 6)
    want1 = -(log(p_common) + log(p_rare)) / 2
    assert out[1]["avg_neg_logprob"] == round(want1, 6)
    # rarer vocabulary scores strictly higher
    assert out[1]["avg_neg_logprob"] > out[0]["avg_neg_logprob"]


def test_vocab_coverage_matches_naive_rank_curve(spark):
    """vocab_coverage equals the naive per-term rank curve (sort terms
    by cnt desc, take the smallest prefix covering q%), for every q and
    any partition count — the histogram shortcut loses nothing."""
    from collections import Counter

    from ocsf_validator_spark.pipeline.keywords import vocab_coverage

    rng = __import__("random").Random(5)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choices(vocab, weights=range(1, 41), k=rng.randint(5, 60))))
        for i in range(80)
    ] + [(999, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    counts = Counter()
    for _, t in docs:
        if t is not None:
            counts.update(t.split(" "))
    total = sum(counts.values())
    ordered = sorted(counts.values(), reverse=True)

    def naive(q_pct):
        needed = -(-total * q_pct // 100)
        acc = vs = 0
        for c in ordered:
            acc += c
            vs += 1
            if acc >= needed:
                return needed, vs, c, acc
        raise AssertionError

    for parts in (1, 4):
        got = {
            r["coverage_pct"]: (
                r["needed_tokens"], r["vocab_size"],
                r["cutoff_cnt"], r["covered_tokens"],
            )
            for r in vocab_coverage(
                df, coverages_pct=(1, 50, 90, 100), num_partitions=parts
            ).collect()
        }
        for q in (1, 50, 90, 100):
            want = naive(q)
            # cutoff_cnt and covered_tokens can differ from the naive
            # greedy ONLY in which equal-count term closes the prefix —
            # needed/vocab_size must be exact, covered >= needed
            assert got[q][0] == want[0] and got[q][1] == want[1], (q, got[q], want)
            assert got[q][3] >= got[q][0]
        assert got[100][3] == total


def test_vocab_coverage_edges(spark):
    from ocsf_validator_spark.pipeline.keywords import vocab_coverage

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert vocab_coverage(empty).count() == 0
    one = spark.createDataFrame([(1, "a a a b")], "doc_id long, text string")
    got = {r["coverage_pct"]: r for r in vocab_coverage(one, (50, 100)).collect()}
    # 4 tokens: 50% -> 2 tokens -> just 'a' (vocab 1); 100% -> both
    assert (got[50].vocab_size, got[50].cutoff_cnt) == (1, 3)
    assert (got[100].vocab_size, got[100].covered_tokens) == (2, 4)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        vocab_coverage(one, (0,))
    with _pytest.raises(ValueError):
        vocab_coverage(one, ())


def test_ngram_diversity_naive_parity_and_edges(spark):
    """ngram_diversity equals a naive Python count (cross-doc repeats
    collapse, in-doc repeats collapse once, short docs contribute 0
    grams, NULL text excluded, empty groups get NULL ratio)."""
    from collections import defaultdict

    import pytest as _pytest

    from ocsf_validator_spark.pipeline.keywords import ngram_diversity

    rows = [
        ("a", "x y x y"),      # bigrams: 'x y','y x','x y' -> 3 total, 2 distinct
        ("a", "x y"),          # repeats doc 1's bigram across docs
        ("a", None),           # excluded
        ("b", "solo"),         # 0 bigrams
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r.source, r.n): (r.total_grams, r.distinct_grams, r.distinct_ratio)
        for r in ngram_diversity(df, ns=(1, 2)).collect()
    }
    tot, dis = defaultdict(int), defaultdict(set)
    for s, t in rows:
        if t is None:
            continue
        toks = t.split(" ")
        for n in (1, 2):
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            tot[(s, n)] += len(grams)
            dis[(s, n)].update(grams)
    for key, (t_, d_, r_) in got.items():
        assert t_ == tot[key] and d_ == len(dis[key]), (key, got[key])
        if t_ == 0:
            assert r_ is None
        else:
            assert r_ == round(len(dis[key]) / tot[key], 6)
    assert got[("b", 2)] == (0, 0, None)
    with _pytest.raises(ValueError):
        ngram_diversity(df, ns=())
    with _pytest.raises(ValueError):
        ngram_diversity(df, ns=(0,))


def test_pmi_collocations_planted_pair(spark):
    """A planted always-together pair tops the PMI ranking; a frequent
    independent pair scores near 0; pairs under min_count are out; the
    recovered strings match the hashes."""
    import math

    from ocsf_validator_spark.pipeline.keywords import pmi_collocations

    rng = __import__("random").Random(9)
    common = [f"c{i}" for i in range(20)]
    docs = []
    for i in range(60):
        toks = rng.choices(common, k=20)
        # plant 'zig zag' as an inseparable bigram in every doc
        pos = rng.randint(0, len(toks))
        toks[pos:pos] = ["zig", "zag"]
        docs.append((i, " ".join(toks)))
    # a rare pair seen twice stays below min_count=5
    docs += [(100, "rare pairx"), (101, "rare pairx")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = pmi_collocations(df, k=10, min_count=5).collect()
    assert rows[0].bigram == "zig zag"
    assert rows[0].n_pair == 60 and rows[0].n_left == 60 and rows[0].n_right == 60
    # pmi of the planted pair: ln(n*T*T / (TB*60*60)) with exact counts
    T = sum(len(t.split(" ")) for _, t in docs)
    TB = sum(len(t.split(" ")) - 1 for _, t in docs)
    want = round(math.log((60 * T * T) / (TB * 60 * 60)), 6)
    assert abs(rows[0].pmi - want) < 2e-6
    grams = {r.bigram for r in rows}
    assert "rare pairx" not in grams
    # every returned bigram is a real adjacent pair
    corpus = " | ".join(t for _, t in docs)
    for g in grams:
        assert g in corpus


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_posting_lists_matches_naive_for_any_partitioning(spark, parts):
    """posting_lists: the two-stage partition-local merge equals the
    naive global answer for any input partitioning; df counts docs not
    occurrences; caps at k ascending; in-doc repeats collapse."""
    from collections import defaultdict

    from ocsf_validator_spark.pipeline.keywords import posting_lists

    rng = __import__("random").Random(13)
    vocab = [f"t{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(3, 15))))
        for i in range(100)
    ] + [(200, None), (None, "t0 t1")]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(parts)
    got = {
        r.term: (r.df_docs, list(r.top_docs))
        for r in posting_lists(df, k=4).collect()
    }
    docs = defaultdict(set)
    for d, t in rows:
        if t is None or d is None:
            continue
        for term in set(t.split(" ")):
            docs[term].add(d)
    want = {t: (len(ds), sorted(ds)[:4]) for t, ds in docs.items()}
    assert got == want


def test_source_vocab_overlap_matrix(spark):
    """source_vocab_overlap: Jaccard is exact on crafted vocabularies,
    pairs are ordered src_a < src_b, disjoint sources are absent, and
    the pair expansion never self-joins the term stream (no SortMerge/
    ShuffledHash join of two big sides in the plan)."""
    from ocsf_validator_spark.pipeline.keywords import source_vocab_overlap

    rows = [
        ("s1", "a b c d"),
        ("s2", "c d e f"),      # |s1 ∩ s2| = 2, union 6 -> 1/3
        ("s3", "x y z"),        # disjoint from s1/s2
        ("s3", "z x"),          # repeats don't change vocab
        ("s1", None),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r.src_a, r.src_b): (r.shared_terms, r.vocab_a, r.vocab_b, r.jaccard)
        for r in source_vocab_overlap(df).collect()
    }
    assert got == {("s1", "s2"): (2, 4, 4, round(2 / 6, 6))}
    plan = (
        source_vocab_overlap(df)._jdf.queryExecution().executedPlan().toString()
    )
    # report joins are broadcast; the term stream itself is never joined
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_tokenizer_fertility_semantics(spark):
    from ocsf_validator_spark.pipeline import textstats

    df = spark.createDataFrame(
        [
            (0, "ab cd", "en", "s1"),      # 2 ws tokens, 5 chars
            (1, "a  b", "en", "s1"),       # double space: 2 ws tokens
            (2, None, "en", "s1"),         # NULL: counts as doc, adds 0
            (3, "xyz", "de", "s2"),
        ],
        "doc_id int, text string, lang string, source string",
    )
    rows = {
        (r.lang, r.source): r
        for r in textstats.tokenizer_fertility(df).collect()
    }
    en = rows[("en", "s1")]
    assert en.n_docs == 3 and en.ws_tokens == 4 and en.chars == 9
    assert en.chars_per_ws_token == 2.25
    de = rows[("de", "s2")]
    assert de.ws_tokens == 1 and de.chars_per_ws_token == 3.0


def test_quality_logit_matches_hand_computation(spark):
    """quality_logit_cols: logit = w.f + b over four exact-ratio
    features — replayed by hand for two fixed docs, exact to the
    rounding the column applies (round 6)."""
    from ocsf_validator_spark.pipeline import textstats

    docs = [
        (0, ("the cat and the dog of the house is a friend of the bird " * 12).strip()),
        (1, "zzz #### !!!!"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.quality_logit, r.keep)
        for r in df.select(
            "doc_id", *textstats.quality_logit_cols("text")
        ).collect()
    }
    w0, w1, w2, w3 = textstats.QUALITY_W
    for doc_id, text in docs:
        toks = text.split(" ")
        n_tokens = len(toks)
        nonspace = len(text.replace(" ", ""))
        n_sym = len(text) - sum(
            1 for c in text if c.isascii() and (c.isalpha() or c == " ")
        )
        stops = sum(1 for t in toks if t in textstats.STOPWORDS["en"])
        logit = (
            w0 * (min(n_tokens, 400) / 400.0)
            + w1 * ((nonspace / n_tokens) / 10.0)
            + w2 * (stops / n_tokens)
            + w3 * (n_sym / len(text))
            + textstats.QUALITY_B
        )
        assert got[doc_id] == (round(logit, 6), logit > 0)
    assert got[0][1] is True and got[1][1] is False


def test_bigram_logprob_known_values_and_ordering(spark):
    import math

    from ocsf_validator_spark.pipeline import keywords

    df = spark.createDataFrame(
        [
            (0, "x x x x"),      # the only x-transition: p=1, score 0
            (1, "p q"),          # ctx p seen twice, p(q|p)=1/2
            (2, "p r"),
            (3, "solo"),         # <2 tokens: no transitions, drops
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in keywords.bigram_logprob_score(df).collect()}
    assert set(got) == {0, 1, 2}
    assert (got[0].n_bigrams, got[0].avg_neg_logprob) == (3, 0.0)
    assert got[1].avg_neg_logprob == round(math.log(2), 6)
    assert got[2].avg_neg_logprob == round(math.log(2), 6)


def test_bigram_logprob_catches_transition_scramble(spark):
    """Same unigram profile, scrambled transitions: the bigram score
    separates what the unigram score cannot."""
    from ocsf_validator_spark.pipeline import keywords

    template = "the cat sat on the mat"
    docs = [(i, template) for i in range(10)]
    docs.append((10, "mat the on sat cat the"))  # same bag of words
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bi = {
        r.doc_id: r.avg_neg_logprob
        for r in keywords.bigram_logprob_score(df).collect()
    }
    uni = {
        r.doc_id: r.avg_neg_logprob
        for r in keywords.unigram_logprob_score(df).collect()
    }
    # identical unigram score (same token multiset)...
    assert uni[10] == uni[0]
    # ...but the scramble's transitions are corpus-rare
    assert bi[10] > bi[0] + 1.0


def test_quality_logit_empty_and_null_text_do_not_crash(spark):
    """ANSI regression: f3 divides by length(text) — an empty doc must
    yield NULL logit / keep=false, not a DIVIDE_BY_ZERO job failure."""
    from ocsf_validator_spark.pipeline import textstats

    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "the cat and the dog")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.quality_logit, r.keep)
        for r in df.select(
            "doc_id", *textstats.quality_logit_cols("text")
        ).collect()
    }
    assert got[0] == (None, False)
    assert got[1] == (None, None)
    assert got[2][0] is not None
