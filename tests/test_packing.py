"""Sequence packing (pipeline/packing.py).

The load-bearing property: the two-phase distributed prefix sum equals
the naive global cumulative window for ANY partition count — partition
boundaries split work, never meaning. Plus straddle math, exclusion of
empty docs, and the plan contract that no single-reducer global window
appears (the only rangepartitioning carries the range REPARTITION, at
the requested parallelism, plus the final presentation orderBy).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ocsf_validator_spark.pipeline.packing import pack_sequences


def naive(rows, max_tokens):
    out, start = {}, 0
    for doc_id, n in sorted(rows):
        if n is None or n <= 0:
            continue
        out[doc_id] = (
            n,
            start // max_tokens,
            start % max_tokens,
            (start + n - 1) // max_tokens - start // max_tokens + 1,
        )
        start += n
    return out


def collect(df):
    return {
        r["doc_id"]: (
            r["n_tokens"],
            r["pack_id"],
            r["pack_offset"],
            r["spans_packs"],
        )
        for r in df.collect()
    }


@pytest.fixture()
def rows():
    rng = random.Random(3)
    rows = [(i, rng.randint(1, 900)) for i in range(400)]
    rows += [(1000, 5000)]  # longer than max_tokens: straddles >= 3 packs
    rows += [(1001, None), (1002, 0), (1003, -4)]  # excluded
    return rows


def make_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_matches_naive_for_any_partition_count(spark, rows, parts):
    got = collect(
        pack_sequences(make_df(spark, rows), 2048, num_partitions=parts)
    )
    assert got == naive(rows, 2048)


def test_oversize_doc_straddle_count(spark, rows):
    got = collect(pack_sequences(make_df(spark, rows), 2048))
    n, pack_id, off, spans = got[1000]
    assert n == 5000 and spans in (3, 4)  # 5000 tokens cover 3-4 windows
    assert got[1000] == naive(rows, 2048)[1000]
    assert 1001 not in got and 1002 not in got and 1003 not in got


def test_empty_and_all_excluded(spark):
    empty = make_df(spark, [])
    assert pack_sequences(empty, 128).count() == 0
    assert pack_sequences(make_df(spark, [(1, 0), (2, None)]), 128).count() == 0


def test_no_global_cumsum_window_in_plan(spark, rows):
    df = pack_sequences(make_df(spark, rows), 2048, num_partitions=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the running sum must be windowed by the partition id (local), so
    # every Window node partitions on _pid — a global running-total
    # window would show an empty partition spec
    windows = [ln for ln in plan.splitlines() if "Window " in ln or "RunningWindowFunction" in ln]
    assert windows and all("_pid" in ln for ln in windows), plan


from ocsf_validator_spark.pipeline.packing import plan_shards


@pytest.mark.parametrize("parts", [1, 4])
def test_plan_shards_token_balance_and_naive_equality(spark, rows, parts):
    df = make_df(spark, rows)
    out = plan_shards(df, n_shards=5, num_partitions=parts).collect()
    got = {r["doc_id"]: r["shard_id"] for r in out}
    # naive: shard = (start * n) // total over the id-ordered cumsum
    clean = [(i, n) for i, n in sorted(rows) if n and n > 0]
    total = sum(n for _, n in clean)
    start, want = 0, {}
    for i, n in clean:
        want[i] = (start * 5) // total
        start += n
    assert got == want
    # shard ids are monotone in doc order and cover 0..n-1
    ordered = [got[i] for i, _ in clean]
    assert ordered == sorted(ordered)
    assert set(ordered) == set(range(5))
    # token balance: every shard within one max-doc of the ideal share
    sums: dict[int, int] = {}
    for i, n in clean:
        sums[want[i]] = sums.get(want[i], 0) + n
    ideal = total / 5
    max_doc = max(n for _, n in clean)
    assert all(abs(s - ideal) <= max_doc for s in sums.values()), sums


from ocsf_validator_spark.pipeline.packing import chunk_documents


def naive_chunks(text, chunk, overlap):
    if text is None:
        return []
    toks = text.split(" ")
    n, stride, out, s, idx = len(toks), chunk - overlap, [], 0, 0
    while True:
        window = toks[s : s + chunk]
        out.append((idx, s, len(window), len(" ".join(window))))
        idx += 1
        s += stride
        if s > max(n - overlap - 1, 0):
            break
    return out


@pytest.mark.parametrize(
    "text",
    [
        "a",  # shorter than one window -> exactly one chunk
        " ".join(f"t{i}" for i in range(31)),  # one token short of full
        " ".join(f"t{i}" for i in range(32)),  # exactly one window
        " ".join(f"t{i}" for i in range(33)),  # one token past: 2nd chunk
        " ".join(f"t{i}" for i in range(113)),  # partial final window
        " ".join(f"t{i}" for i in range(120)),  # stride-aligned end
        "",  # split('') -> [''] -> one 1-token chunk, like the oracle
    ],
)
def test_chunk_documents_matches_naive(spark, text):
    df = spark.createDataFrame([(1, text), (2, None)], "doc_id long, text string")
    got = [
        (r["chunk_idx"], r["start_tok"], r["n_tokens"], r["chunk_chars"])
        for r in chunk_documents(df, chunk_tokens=32, overlap=8)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    ]
    assert got == naive_chunks(text, 32, 8)


def test_chunk_documents_covers_every_token_and_no_contained_window(spark):
    rng = random.Random(11)
    rows = [(i, " ".join(f"w{j}" for j in range(rng.randint(1, 300)))) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in chunk_documents(df, chunk_tokens=32, overlap=8).collect():
        out.setdefault(r["doc_id"], []).append((r["start_tok"], r["n_tokens"]))
    for doc_id, text in rows:
        n = len(text.split(" "))
        spans = sorted(out[doc_id])
        # full coverage: union of [start, start+len) is [0, n)
        assert spans[0][0] == 0 and spans[-1][0] + spans[-1][1] == n
        for (a, la), (b, lb) in zip(spans, spans[1:]):
            assert b == a + 24  # stride
            assert b + lb > a + la  # no window fully contained in prior


def test_chunk_documents_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        chunk_documents(df, chunk_tokens=32, overlap=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=16, overlap=16)


from ocsf_validator_spark.pipeline.packing import epoch_shuffle


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_epoch_shuffle_matches_naive_global_rank(spark, parts):
    ids = list(range(200)) + [None]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["pos"]
        for r in epoch_shuffle(df, epoch=7, num_partitions=parts).collect()
    }
    naive = {
        r["doc_id"]: r["pos"]
        for r in df.filter("doc_id is not null")
        .select(
            "doc_id",
            (
                F.row_number().over(
                    Window.orderBy(
                        F.md5(F.concat_ws("|", F.col("doc_id").cast("string"),
                                          F.lit("shuffle"), F.lit("7"))),
                        "doc_id",
                    )
                )
                - 1
            ).alias("pos"),
        )
        .collect()
    }
    assert got == naive and None not in got
    assert sorted(got.values()) == list(range(200))  # a true permutation


def test_epoch_shuffle_changes_between_epochs_and_is_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    e1 = {r["doc_id"]: r["pos"] for r in epoch_shuffle(df, 1, num_partitions=4).collect()}
    e1b = {r["doc_id"]: r["pos"] for r in epoch_shuffle(df, 1, num_partitions=4).collect()}
    e2 = {r["doc_id"]: r["pos"] for r in epoch_shuffle(df, 2, num_partitions=4).collect()}
    assert e1 == e1b  # reproducible
    moved = sum(1 for k in e1 if e1[k] != e2[k])
    assert moved > 250  # epochs genuinely re-permute


def test_epoch_shuffle_no_global_sort_window(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    plan = (
        epoch_shuffle(df, 1, num_partitions=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    windows = [ln for ln in plan.splitlines() if "Window " in ln or "RunningWindowFunction" in ln]
    assert windows and all("_pid" in ln for ln in windows), plan


def test_epoch_shuffle_empty(spark):
    df = spark.createDataFrame([], "doc_id long")
    assert epoch_shuffle(df, 1).count() == 0
