"""Equivalence of the skew-resilient ordered-check path (ordered.py,
range-partition + mapInPandas + boundary carry) with the window
formulation (violations.fused_group_violations) — row-for-row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocsf_validator_spark.ordered import scalable_group_violations
from ocsf_validator_spark.spec import transcript_suite
from ocsf_validator_spark.synth import synth_transcripts
from ocsf_validator_spark.violations import _fusable, fused_group_violations

KEYS = ("conv_id", "turn_idx")


def _with_defects(spark, n=20_000):
    """Synth data + duplicate keys (triplicates!) + gaps so every group
    constraint fires, including multi-occurrence dup groups."""
    df = synth_transcripts(spark, n_turns=n, seed=42)
    dups = df.filter(F.xxhash64("conv_id", "turn_idx") % 53 == 0)
    d2 = dups.withColumn("ts", F.col("ts") + F.expr("INTERVAL 5 MINUTES"))
    d3 = dups.withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 MINUTES"))
    gaps = df.filter(F.xxhash64("conv_id", "turn_idx") % 47 == 0)
    return (
        df.join(gaps.select(*KEYS), list(KEYS), "left_anti")
        .unionByName(d2)
        .unionByName(d3)
    )


def _diff(a, b):
    return a.exceptAll(b).count() + b.exceptAll(a).count()


@pytest.mark.parametrize("partitions", [4, 97])
def test_scalable_matches_window(spark, partitions):
    df = _with_defects(spark)
    suite = transcript_suite()
    cs, ties = _fusable(suite, df, KEYS)
    want = fused_group_violations(df, cs, ties, KEYS)
    got = scalable_group_violations(df, cs, ties, KEYS, num_partitions=partitions)
    assert want.count() > 100
    assert _diff(got, want) == 0


def test_scalable_straddling_groups(spark):
    """A single giant duplicate group + one giant conversation forced
    across MANY partitions: occurrence numbers and first-seen must carry
    over every boundary (and tiny Arrow batches exercise the
    within-partition batch-state carry too)."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        base = synth_transcripts(spark, n_turns=4000, seed=11)
        # 500 copies of ONE key, distinct ts values for deterministic ranks
        giant = (
            spark.range(500)
            .select(
                F.lit("c_giant").alias("conv_id"),
                F.lit(0).cast("int").alias("turn_idx"),
                F.lit("user").alias("role"),
                F.lit("dup text").alias("text"),
                F.lit(None).cast("string").alias("tool"),
                F.timestamp_seconds(F.lit(1767225600) + F.col("id")).alias("ts"),
            )
        )
        df = base.unionByName(giant)
        suite = transcript_suite()
        cs, ties = _fusable(suite, df, KEYS)
        want = fused_group_violations(df, cs, ties, KEYS)
        got = scalable_group_violations(df, cs, ties, KEYS, num_partitions=64)
        assert _diff(got, want) == 0
        # the giant group must yield occurrences 2..500 exactly once each
        uniq = got.filter(
            (F.col("constraint_id") == "unique.conv_turn")
            & (F.col("conv_id") == "c_giant")
        )
        assert uniq.count() == 499
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_scalable_null_ties(spark):
    """Rows with NULL tie columns (concat_ws skips nulls) still match."""
    df = _with_defects(spark, n=5000).withColumn(
        "role",
        F.when(F.xxhash64("conv_id", "turn_idx", "ts") % 7 == 0, None).otherwise(
            F.col("role")
        ),
    )
    suite = transcript_suite()
    cs, ties = _fusable(suite, df, KEYS)
    want = fused_group_violations(df, cs, ties, KEYS)
    got = scalable_group_violations(df, cs, ties, KEYS, num_partitions=13)
    assert _diff(got, want) == 0
