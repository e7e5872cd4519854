"""KS/PSI drift tests — FIXTURES.md scenario 13: a sample with ts
shifted +30d and text lengths doubled must trip both checks; the clean
sample must not."""

from __future__ import annotations

import math

import pytest

from ocsf_validator_spark.drift import (
    drift_findings,
    histogram,
    ks_by_bucket,
    ks_distance,
    psi,
)
from ocsf_validator_spark.synth import (
    synth_drifted,
    synth_reference_sample,
)


@pytest.fixture(scope="module")
def samples(spark):
    ref = synth_reference_sample(spark, n=4000, seed=7).cache()
    same = synth_reference_sample(spark, n=4000, seed=11).cache()
    drifted = synth_drifted(spark, n=4000, seed=13).cache()
    yield ref, same, drifted
    for d in (ref, same, drifted):
        d.unpersist()


def test_psi_no_drift(samples):
    ref, same, _ = samples
    v = psi(same, ref, "length(text)", "floor(_v / 16)")
    assert v < 0.05


def test_psi_detects_length_doubling(samples):
    ref, _, drifted = samples
    v = psi(drifted, ref, "length(text)", "floor(_v / 16)")
    assert v > 0.2


def test_psi_detects_ts_shift(samples):
    ref, _, drifted = samples
    v = psi(drifted, ref, "unix_timestamp(ts)", "floor(_v / 86400)")
    assert v > 0.2


def test_ks_distance_exact(spark):
    # hand-checkable: a={1,2,3,4}, b={3,4,5,6} → D = 0.5 at v=2
    a = spark.createDataFrame([(float(x),) for x in (1, 2, 3, 4)], "v double")
    b = spark.createDataFrame([(float(x),) for x in (3, 4, 5, 6)], "v double")
    d = ks_distance(a, b, "v")
    assert abs(d - 0.5) < 1e-9


def test_ks_distance_identical_is_zero(spark):
    a = spark.createDataFrame([(float(x),) for x in range(50)], "v double")
    assert ks_distance(a, a, "v") < 1e-9


def test_ks_by_bucket_arrow(samples):
    ref, same, drifted = samples
    ref_sample = [r.v for r in ref.selectExpr("length(text) as v").collect()]
    clean = ks_by_bucket(same, ref_sample, "length(text)", num_buckets=4).collect()
    assert all(not r.drifted for r in clean)
    bad = ks_by_bucket(drifted, ref_sample, "length(text)", num_buckets=4).collect()
    assert all(r.drifted for r in bad)
    assert all(r.ks > r.threshold for r in bad)


def test_drift_findings(samples):
    ref, _, drifted = samples
    findings = drift_findings(drifted, ref)
    assert all(f[2] for f in findings)  # all drifted
    assert any("drift.psi.text_len" == f[0] for f in findings)


def test_histogram_counts(samples):
    ref, _, _ = samples
    h = histogram(ref, "length(text)", "floor(_v / 16)")
    assert sum(r.cnt for r in h.collect()) == ref.count()


def test_psi_split_matches_two_df_psi(spark):
    """psi_split (ONE scan: groupBy(bin) with conditional counts) must
    equal psi() over the two filtered halves of the same table."""
    from ocsf_validator_spark.drift import psi_split
    from pyspark.sql import functions as F

    df = spark.range(0, 20000).select(
        F.col("id"), (F.col("id") % 7 * 3 + F.col("id") % 13).alias("v")
    )
    two_scan = psi(
        df.filter(F.col("id") % 2 == 0),
        df.filter(F.col("id") % 2 == 1),
        "v",
        "floor(_v / 4)",
    )
    one_scan = psi_split(df, "id % 2 = 0", "v", "floor(_v / 4)")
    assert math.isclose(two_scan, one_scan, rel_tol=1e-12)
    # explicit ref_pred: rows matching neither predicate are ignored
    part = psi_split(df, "id % 3 = 0", "v", "floor(_v / 4)", ref_pred="id % 3 = 1")
    assert not math.isnan(part)


def test_psi_split_single_scan_plan(spark):
    """The one-scan contract: a single source appears in the plan."""
    from ocsf_validator_spark.drift import _psi_of_counts  # noqa: F401
    from pyspark.sql import functions as F

    df = spark.range(0, 100).select(F.col("id"), (F.col("id") % 5).alias("v"))
    staged = (
        df.select(
            F.expr("v").alias("_v"),
            F.expr("id % 2 = 0").alias("_is_cur"),
            F.expr("NOT (id % 2 = 0)").alias("_is_ref"),
        )
        .filter(F.col("_v").isNotNull() & (F.col("_is_cur") | F.col("_is_ref")))
        .select("_is_cur", "_is_ref", F.expr("floor(_v / 2)").cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(
            F.sum(F.col("_is_cur").cast("long")).alias("c_cnt"),
            F.sum(F.col("_is_ref").cast("long")).alias("r_cnt"),
        )
    )
    plan = staged._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert plan.count("Range (0, 100") == 1, plan


def test_psi_split_by_bucket_matches_per_bucket_psi(spark):
    """Each bucket's PSI from the one-scan partitioned formulation must
    equal psi_split run on that bucket's rows alone."""
    from ocsf_validator_spark.drift import psi_split, psi_split_by_bucket
    from pyspark.sql import functions as F

    df = spark.range(0, 30000).select(
        F.col("id"),
        ((F.col("id") % 7) % 4).cast("int").alias("bucket_src"),
        ((F.col("id") * 7) % 23).alias("v"),
    )
    out = {
        r.bucket: r.psi
        for r in psi_split_by_bucket(
            df,
            "id % 2 = 0",
            "v",
            "floor(_v / 3)",
            bucket_expr=F.col("bucket_src"),
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    for b in range(4):
        solo = psi_split(
            df.filter(F.col("bucket_src") == b), "id % 2 = 0", "v", "floor(_v / 3)"
        )
        assert math.isclose(out[b], solo, rel_tol=1e-9), (b, out[b], solo)
    # a bucket with an empty side degrades to NULL psi + drifted=True,
    # never an ANSI divide-by-zero job failure
    rows = psi_split_by_bucket(
        df, "id % 2 = 0", "v", "floor(_v / 3)",
        bucket_expr=(F.col("id") % 2).cast("int"),  # bucket == side
    ).collect()
    assert all(r.psi is None and r.drifted for r in rows)


def test_volume_anomaly_flags_outage_and_double_load(spark):
    """12 stable days (100±2 rows), one outage day (8 rows), one
    double-load day (210): exactly those two flag; median/MAD fences
    are exact data values."""
    import datetime as dt

    from ocsf_validator_spark import drift

    rows = []
    day0 = dt.datetime(2026, 1, 1)
    sizes = [100, 101, 99, 100, 102, 98, 100, 101, 99, 100, 100, 101]
    for d, n in enumerate(sizes):
        rows += [(day0 + dt.timedelta(days=d, seconds=s),) for s in range(n)]
    rows += [(day0 + dt.timedelta(days=12, seconds=s),) for s in range(8)]
    rows += [(day0 + dt.timedelta(days=13, seconds=s),) for s in range(210)]
    rows.append((None,))  # NULL ts excluded
    df = spark.createDataFrame(rows, "ts timestamp")
    out = drift.volume_anomaly(df, k=3).collect()
    assert len(out) == 14
    flagged = {r.bucket.day: r.cnt for r in out if r.anomaly}
    assert flagged == {13: 8, 14: 210}
    r0 = out[0]
    assert r0.median == 100.0 and r0.mad == 1.0
    assert r0.lo == 97.0 and r0.hi == 103.0


def test_volume_anomaly_empty_and_degenerate(spark):
    import datetime as dt

    from ocsf_validator_spark import drift

    empty = spark.createDataFrame([], "ts timestamp")
    assert drift.volume_anomaly(empty).count() == 0
    # constant series: mad=0, point fence, nothing anomalous
    day0 = dt.datetime(2026, 1, 1)
    const = spark.createDataFrame(
        [(day0 + dt.timedelta(days=d, seconds=s),) for d in range(5) for s in range(10)],
        "ts timestamp",
    )
    out = drift.volume_anomaly(const).collect()
    assert len(out) == 5 and not any(r.anomaly for r in out)


def test_emd_known_answers(spark):
    from ocsf_validator_spark import drift

    # point masses 5 bins apart, equal weight: EMD = 5 exactly —
    # including the empty-bin gap contribution
    df = spark.createDataFrame(
        [(0, True)] * 4 + [(5, False)] * 4, "v long, cur boolean"
    )
    got = drift.emd_split(df, "cur", "v", "_v")
    assert got == 5.0
    # identical slices: 0; PSI needs epsilon floors here, EMD does not
    same = spark.createDataFrame(
        [(i % 3, i % 2 == 0) for i in range(12)], "v long, cur boolean"
    )
    assert drift.emd_split(same, "cur", "v", "_v") == 0.0
    # asymmetric masses: cur = {0:1, 1:1}, ref = {0:2} ->
    # |1*2-2*2|/(2*2) * 1 = 0.5
    df3 = spark.createDataFrame(
        [(0, True), (1, True), (0, False), (0, False)],
        "v long, cur boolean",
    )
    assert drift.emd_split(df3, "cur", "v", "_v") == 0.5
    # empty side -> nan
    import math as m

    one_sided = spark.createDataFrame([(1, True)], "v long, cur boolean")
    assert m.isnan(drift.emd_split(one_sided, "cur", "v", "_v"))


def test_emd_from_histograms_matches_split(spark):
    from pyspark.sql import functions as F

    from ocsf_validator_spark import drift

    rows = [(i % 7 + (3 if i % 2 == 0 else 0),) for i in range(200)]
    df = spark.createDataFrame(rows, "v long").withColumn(
        "cur", (F.col("v") % 2 == 0)
    )
    a = drift.histogram(df.filter("cur"), "v", "_v")
    b = drift.histogram(df.filter("NOT cur"), "v", "_v")
    assert drift.emd_from_histograms(a, b) == drift.emd_split(
        df, "cur", "v", "_v"
    )
