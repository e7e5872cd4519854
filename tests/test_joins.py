"""salted_join: identity with the plain join under a hot key, salt
distribution, outer-semantics guardrails, and the plan contract (the
join really runs on the widened key, shuffle-hash, no broadcast)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocsf_validator_spark.joins import (
    pick_num_salts,
    probe_hot_key_rows,
    salted_join,
    salted_join_auto,
)


def _fixture(spark):
    # hot key: "h" is 60% of the probe side
    left = spark.range(0, 1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 6, F.lit("h"))
        .when(F.col("id") % 10 < 8, F.lit("w"))
        .when(F.col("id") % 10 == 8, F.lit("miss"))
        .otherwise(F.lit(None))
        .alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    right = spark.createDataFrame(
        [("h", 100), ("w", 200), ("unused", 300)], "k string, payload int"
    )
    return left, right


def _rows(df):
    # None-safe total order for comparison
    return sorted(map(tuple, df.collect()), key=repr)


def test_inner_matches_plain_join(spark):
    left, right = _fixture(spark)
    got = salted_join(left, right, on=["k"], salt_from="row_id", num_salts=8)
    want = left.join(right, ["k"], "inner")
    assert _rows(got.select(*want.columns)) == _rows(want)


def test_left_matches_plain_join_incl_null_and_missing_keys(spark):
    left, right = _fixture(spark)
    got = salted_join(
        left, right, on=["k"], salt_from="row_id", num_salts=8, how="left"
    )
    want = left.join(right, ["k"], "left")
    assert _rows(got.select(*want.columns)) == _rows(want)


def test_hot_key_spreads_over_salts(spark):
    left, _ = _fixture(spark)
    n = (
        left.filter(F.col("k") == "h")
        .select(F.pmod(F.xxhash64("row_id"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert n == 8  # 600 rows over 8 salt buckets: all buckets hit


def test_plan_joins_on_widened_key_without_broadcast(spark):
    left, right = _fixture(spark)
    plan = (
        salted_join(left, right, on=["k"], salt_from="row_id", num_salts=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__salt" in plan  # the widened key is really in the join
    assert "BroadcastHashJoin" not in plan  # replication not undone
    assert "ShuffledHashJoin" in plan


def test_pick_num_salts_math():
    # under target: never salt
    assert pick_num_salts(0) == 1
    assert pick_num_salts(2_000_000) == 1
    # ceil(hot/target), minimum that caps the straggler task
    assert pick_num_salts(2_000_001) == 2
    assert pick_num_salts(10_000_000) == 5
    assert pick_num_salts(601, target_rows_per_task=100) == 7
    # replication bound
    assert pick_num_salts(10**12, target_rows_per_task=100) == 256
    assert pick_num_salts(10**12, target_rows_per_task=100, max_salts=32) == 32
    with pytest.raises(ValueError):
        pick_num_salts(5, max_salts=0)
    with pytest.raises(ValueError):
        pick_num_salts(5, target_rows_per_task=0)


def test_probe_hot_key_rows_excludes_nulls(spark):
    left, _ = _fixture(spark)
    # "h" is 600 of 1000 rows; the 100 NULL keys must not count
    assert probe_hot_key_rows(left, ["k"]) == 600


@pytest.mark.parametrize("target,expect_s", [(100, 6), (200, 3)])
def test_auto_salted_parity_at_two_auto_s(spark, target, expect_s):
    """Hot-key parity at two auto-picked S values: the derived salt
    factor changes with the per-task target, the rows never do."""
    left, right = _fixture(spark)
    assert pick_num_salts(600, target_rows_per_task=target) == expect_s
    got = salted_join_auto(
        left, right, on=["k"], salt_from="row_id",
        target_rows_per_task=target,
    )
    want = left.join(right, ["k"], "inner")
    assert _rows(got.select(*want.columns)) == _rows(want)
    # really salted: the widened key is in the plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_auto_salted_skips_salt_when_not_skewed(spark):
    left, right = _fixture(spark)
    out = salted_join_auto(
        left, right, on=["k"], salt_from="row_id",
        target_rows_per_task=10_000,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" not in plan  # plain join: S=1
    want = left.join(right, ["k"], "inner")
    assert _rows(out.select(*want.columns)) == _rows(want)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join_auto(
            left, right, on=["k"], salt_from="row_id", how="full",
            target_rows_per_task=10_000,
        )


def test_guardrails(spark):
    left, right = _fixture(spark)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, on=["k"], salt_from="row_id", how="right")
    with pytest.raises(ValueError, match="at least one key"):
        salted_join(left, right, on=[], salt_from="row_id")
    with pytest.raises(ValueError, match="already exists"):
        salted_join(
            left.withColumn("__salt", F.lit(1)), right, on=["k"], salt_from="row_id"
        )


def test_star_join_plan_is_all_broadcast(spark):
    """star_revenue_region's contract: the fact side is scanned once
    and meets every dimension via BroadcastHashJoin — no sort-merge,
    no fact-side shuffle before the final 5-row aggregation."""
    import __spark_entry__ as e

    plan = (
        e.queries()["star_revenue_region"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
