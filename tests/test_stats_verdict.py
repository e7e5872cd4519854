from __future__ import annotations

from pyspark.sql import functions as F

from ocsf_validator_spark.spec import Severity, transcript_suite
from ocsf_validator_spark.stats import (
    column_stats,
    conversation_stats,
    length_histogram,
    overall_stats,
)
from ocsf_validator_spark.verdict import exit_code, summarize, verdicts
from ocsf_validator_spark.violations import all_violations

SUITE = transcript_suite()


def test_column_stats_single_pass(transcripts):
    stats = column_stats(transcripts, num_buckets=8)
    rows = stats.collect()
    assert sum(r.n_rows for r in rows) == transcripts.count()
    total_null_roles = sum(r.role__nulls for r in rows)
    assert total_null_roles == 1  # (c001, 3)
    # single aggregation: exactly one Aggregate pair in the plan (partial+final)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 2


def test_overall_stats(transcripts):
    row = overall_stats(transcripts).collect()[0]
    assert row.n_rows == transcripts.count()
    assert row.text__len_max == 70000


def test_length_histogram(transcripts):
    hist = length_histogram(transcripts, "text", bin_width=16).collect()
    assert sum(r.cnt for r in hist) == transcripts.count()
    big = [r for r in hist if r.bin == 70000 // 16]
    assert big and big[0].cnt == 1


def test_conversation_stats_salted(transcripts):
    cs = {r.conv_id: r for r in conversation_stats(transcripts).collect()}
    assert cs["c001"].dense_ordered
    assert not cs["c004"].dense_ordered  # duplicate turn 1
    assert not cs["c007"].dense_ordered  # gap
    assert cs["c004"].n_turns == 3 and cs["c004"].n_distinct_turns == 2


def test_verdicts_and_exit_code(transcripts):
    v = all_violations(transcripts, SUITE)
    vd = verdicts(transcripts, v, SUITE, num_buckets=8).cache()
    counts = {
        (r.bucket, r.constraint_id): r
        for r in vd.collect()
    }
    # every (observed bucket, constraint) pair has a verdict row
    n_buckets = (
        transcripts.select(
            F.pmod(F.xxhash64("conv_id"), F.lit(8)).cast("int").alias("b")
        )
        .distinct()
        .count()
    )
    per_constraint = {}
    for (b, cid), r in counts.items():
        if b >= 0:
            per_constraint.setdefault(cid, 0)
            per_constraint[cid] += 1
    assert all(n == n_buckets for n in per_constraint.values())
    # deprecated.role has violations but severity WARNING → still passes
    dep = [r for (b, cid), r in counts.items() if cid == "deprecated.role" and r.violation_count > 0]
    assert dep and all(r.pass_ if hasattr(r, "pass_") else r["pass"] for r in dep)
    # required.role fails in its bucket
    req = [r for (b, cid), r in counts.items() if cid == "required.role" and r.violation_count > 0]
    assert req and not any(r["pass"] for r in req)
    assert exit_code(vd) == 1
    summary = {r.constraint_id: r for r in summarize(vd).collect()}
    assert not summary["required.role"]["pass"]
    assert summary["deprecated.role"]["pass"]
    vd.unpersist()


def test_strict_threshold(transcripts):
    v = all_violations(transcripts, SUITE)
    vd = verdicts(transcripts, v, SUITE, num_buckets=8, threshold=Severity.WARNING)
    summary = {r.constraint_id: r for r in summarize(vd).collect()}
    # under --strict, WARNING-level deprecation now fails (reference
    # runner.py:135-139 strict mode)
    assert not summary["deprecated.role"]["pass"]
