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
