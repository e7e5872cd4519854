"""Near-dup-aware train/holdout split (dedup.cluster_split): cluster
members can never straddle the split — the leakage a per-document
random split permits by construction.
"""

from __future__ import annotations

import hashlib

from ocsf_validator_spark.pipeline.dedup import (
    cluster_split,
    connected_components,
)


def _side(rep, num=9, den=10, salt="split0"):
    h = int(hashlib.md5(f"{rep}|{salt}".encode()).hexdigest()[:8], 16)
    return "train" if h % den < num else "holdout"


def test_cluster_members_never_straddle(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a_id long, b_id long"
    )
    clusters = connected_components(pairs)
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 21)], "doc_id long"
    )
    out = {r.doc_id: (r.rep_id, r.split) for r in cluster_split(docs, clusters).collect()}
    assert len(out) == 20
    # the {1,2,3} component reps to 1, {10,11} to 10 — one side each
    assert {out[i] for i in (1, 2, 3)} == {(1, _side(1))}
    assert {out[i] for i in (10, 11)} == {(10, _side(10))}
    # singletons are their own representative with the md5-derived side
    for i in (4, 5, 6, 7, 8, 9, 12, 20):
        assert out[i] == (i, _side(i))


def test_cluster_split_deterministic_and_rate(spark):
    docs = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    empty = spark.createDataFrame([], "doc_id long, canonical_id long")
    a = cluster_split(docs, empty, num=1, den=2)
    b = cluster_split(docs, empty, num=1, den=2)
    rows_a = sorted(map(tuple, a.collect()))
    assert rows_a == sorted(map(tuple, b.collect()))
    n_train = sum(1 for _, _, s in rows_a if s == "train")
    assert 175 < n_train < 325  # ~1/2 with md5 dispersion slack
    # num=den keeps everything; num=0 holds everything out
    assert all(
        s == "train" for _, _, s in cluster_split(docs, empty, 1, 1).collect()
    )
    assert all(
        s == "holdout" for _, _, s in cluster_split(docs, empty, 0, 1).collect()
    )
