"""Distribution-drift checks — KS and PSI (north-star additions; the
reference has no statistical checks, SURVEY.md §2.10).

Two drift statistics over ``ts`` and ``length(text)`` (or any numeric
expression):

- **PSI** — pure column algebra over fixed-bin histograms: one
  aggregation per side, a tiny full-outer join on bin ids, a sum of
  ``(p - q) * ln(p / q)``. No UDF, fully distributed, scale-free (the
  histograms are ≤ a few hundred rows regardless of input size).

- **KS** (two-sample, exact) — two implementations:

  1. ``ks_distance`` — SQL-expressible: union both samples with
     indicator columns, cumulative counts over a RANGE window ordered by
     value (RANGE so ties are handled exactly), D = max |ECDF_a - ECDF_b|.
     The global ordered window means one reducer touches the union — use
     it on bounded samples/buckets (it doubles as the DuckDB oracle
     formulation).
  2. ``ks_by_bucket`` — the scale path: grouped ``applyInPandas``
     (Arrow-vectorized, per BASELINE.json input_hint "no per-row
     Python"): each conv-hash bucket computes its KS statistic against a
     broadcast reference sample with numpy. 10^12 turns → NB independent
     group tasks, no global sort.

Thresholds: PSI ≥ 0.2 is the conventional "significant shift"; KS uses
the large-sample critical value c(α)·sqrt((n+m)/(n·m)), c(0.05)=1.358.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocsf_validator_spark.localframe import empty_df, local_df

PSI_SIGNIFICANT = 0.2
KS_C_ALPHA_05 = 1.358


def histogram(df: DataFrame, value_expr: str, bin_expr: str) -> DataFrame:
    """(bin bigint, cnt long) histogram of a SQL expression.
    ``bin_expr`` maps value column ``_v`` to an integer bin, e.g.
    ``floor(_v / 16)`` for text length or ``floor(_v / 86400)`` for
    epoch-seconds → days. Fixed bins keep snapshots comparable."""
    return (
        df.select(F.expr(value_expr).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .select(F.expr(bin_expr).cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _psi_of_counts(
    pairs: list[tuple[float, float]], epsilon: float = 1e-6
) -> float:
    """PSI from [(cur_cnt, ref_cnt)] per bin — driver-side arithmetic
    over the (tiny, ≤ a few hundred rows) collected histogram."""
    ct = float(sum(c for c, _ in pairs))
    rt = float(sum(r for _, r in pairs))
    if ct == 0 or rt == 0:
        return float("nan")
    out = 0.0
    for c, r in pairs:
        p, q = c / ct, r / rt
        out += (p - q) * (
            math.log(max(p, epsilon)) - math.log(max(q, epsilon))
        )
    return out


def psi_from_histograms(
    cur: DataFrame, ref: DataFrame, epsilon: float = 1e-6
) -> float:
    """PSI between two (bin, cnt) histograms. Missing bins get an
    ``epsilon`` floor so new/vanished bins contribute finite terms.
    ONE collect: the joined histogram is ≤ a few hundred rows, so the
    totals and the PSI sum are driver-side arithmetic (round 2 ran two
    jobs here — one for totals, one for the sum)."""
    joined = (
        cur.select("bin", F.col("cnt").alias("c_cnt"))
        .join(ref.select("bin", F.col("cnt").alias("r_cnt")), "bin", "full_outer")
        .select(
            F.coalesce("c_cnt", F.lit(0)).alias("c_cnt"),
            F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
        )
    )
    rows = joined.collect()
    return _psi_of_counts(
        [(float(r.c_cnt), float(r.r_cnt)) for r in rows], epsilon
    )


def psi(
    cur_df: DataFrame,
    ref_df: DataFrame,
    value_expr: str,
    bin_expr: str,
) -> float:
    return psi_from_histograms(
        histogram(cur_df, value_expr, bin_expr),
        histogram(ref_df, value_expr, bin_expr),
    )


def psi_split(
    df: DataFrame,
    cur_pred: str,
    value_expr: str,
    bin_expr: str,
    ref_pred: str | None = None,
    epsilon: float = 1e-6,
) -> float:
    """PSI between two slices of the SAME table in ONE scan: rows are
    tagged with the ``cur_pred`` indicator and both histograms come out
    of a single groupBy(bin) with conditional counts — one job, one
    shuffle of ≤ n_bins tiny rows, one driver collect. Use this (not
    ``psi(df.filter(a), df.filter(b), ...)``, which scans the source
    twice) whenever current and reference are partitions of one table —
    the common snapshot-vs-snapshot drift shape. ``ref_pred`` defaults
    to NOT cur_pred; rows matching neither predicate are ignored."""
    rp = f"NOT ({cur_pred})" if ref_pred is None else ref_pred
    staged = (
        df.select(
            F.expr(value_expr).alias("_v"),
            F.expr(cur_pred).alias("_is_cur"),
            F.expr(rp).alias("_is_ref"),
        )
        .filter(F.col("_v").isNotNull() & (F.col("_is_cur") | F.col("_is_ref")))
        .select("_is_cur", "_is_ref", F.expr(bin_expr).cast("bigint").alias("bin"))
    )
    rows = (
        staged.groupBy("bin")
        .agg(
            F.sum(F.col("_is_cur").cast("long")).alias("c_cnt"),
            F.sum(F.col("_is_ref").cast("long")).alias("r_cnt"),
        )
        .collect()
    )
    return _psi_of_counts(
        [(float(r.c_cnt), float(r.r_cnt)) for r in rows], epsilon
    )


def psi_split_by_bucket(
    df: DataFrame,
    cur_pred: str,
    value_expr: str,
    bin_expr: str,
    bucket_expr=None,
    conv_col: str = "conv_id",
    num_buckets: int = 64,
    ref_pred: str | None = None,
    epsilon: float = 1e-6,
    psi_threshold: float = PSI_SIGNIFICANT,
) -> DataFrame:
    """Per-bucket PSI between two slices of the same table — the
    PARTITIONED drift path (north star: per-partition checks). One scan:
    groupBy(bucket, bin) with conditional counts, a window over the
    bucket to attach the per-bucket totals, then one aggregation per
    bucket for the PSI sum. Everything is column algebra; output is one
    row per bucket — at 10^12 turns this is NB independent reductions
    over a histogram that is already tiny after the first map-side
    combine.

    Returns (bucket int, n_cur long, n_ref long, psi double,
    drifted boolean)."""
    rp = f"NOT ({cur_pred})" if ref_pred is None else ref_pred
    if bucket_expr is None:
        bucket_expr = F.pmod(
            F.xxhash64(F.col(conv_col)), F.lit(num_buckets)
        ).cast("int")
    staged = (
        df.select(
            bucket_expr.alias("bucket"),
            F.expr(value_expr).alias("_v"),
            F.expr(cur_pred).alias("_is_cur"),
            F.expr(rp).alias("_is_ref"),
        )
        .filter(F.col("_v").isNotNull() & (F.col("_is_cur") | F.col("_is_ref")))
        .select(
            "bucket",
            "_is_cur",
            "_is_ref",
            F.expr(bin_expr).cast("bigint").alias("bin"),
        )
    )
    hist = staged.groupBy("bucket", "bin").agg(
        F.sum(F.col("_is_cur").cast("long")).alias("c_cnt"),
        F.sum(F.col("_is_ref").cast("long")).alias("r_cnt"),
    )
    w = Window.partitionBy("bucket")
    tot = hist.select(
        "bucket",
        "c_cnt",
        "r_cnt",
        F.sum("c_cnt").over(w).alias("_ct"),
        F.sum("r_cnt").over(w).alias("_rt"),
    )
    # try_divide: a bucket whose cur or ref side is EMPTY must yield a
    # NULL psi (flagged drifted below), not an ANSI divide-by-zero that
    # kills the whole job
    p = F.try_divide(F.col("c_cnt"), F.col("_ct"))
    q = F.try_divide(F.col("r_cnt"), F.col("_rt"))
    term = (p - q) * (
        F.log(F.greatest(p, F.lit(epsilon)))
        - F.log(F.greatest(q, F.lit(epsilon)))
    )
    return (
        tot.groupBy("bucket")
        .agg(
            F.sum("c_cnt").alias("n_cur"),
            F.sum("r_cnt").alias("n_ref"),
            F.sum(term).alias("psi"),
        )
        .withColumn(
            "psi",
            F.when(
                (F.col("n_cur") > 0) & (F.col("n_ref") > 0), F.col("psi")
            ),
        )
        .withColumn(
            "drifted",
            F.coalesce(F.col("psi") >= F.lit(psi_threshold), F.lit(True)),
        )
    )


def ks_distance(a: DataFrame, b: DataFrame, value_expr: str) -> float:
    """Exact two-sample KS D via a RANGE-framed cumulative window —
    the SQL-expressible formulation (usable 1:1 as the DuckDB oracle).
    Single ordered partition → bounded-sample use only."""
    ua = a.select(F.expr(value_expr).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    ub = b.select(F.expr(value_expr).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    u = ua.select("v", F.lit(1).alias("ia"), F.lit(0).alias("ib")).unionAll(
        ub.select("v", F.lit(0).alias("ia"), F.lit(1).alias("ib"))
    )
    w = Window.orderBy("v").rangeBetween(Window.unboundedPreceding, 0)
    cum = u.select(
        F.sum("ia").over(w).alias("ca"), F.sum("ib").over(w).alias("cb")
    )
    row = (
        cum.crossJoin(
            u.agg(F.sum("ia").alias("na"), F.sum("ib").alias("nb"))
        )
        .select(
            F.abs(F.col("ca") / F.col("na") - F.col("cb") / F.col("nb")).alias("d")
        )
        .agg(F.max("d").alias("ks"))
        .collect()[0]
    )
    return float(row.ks if row.ks is not None else float("nan"))


def ks_by_bucket(
    df: DataFrame,
    ref_sample: Sequence[float],
    value_expr: str,
    conv_col: str = "conv_id",
    num_buckets: int = 64,
    bucket_expr=None,
) -> DataFrame:
    """Per-bucket KS vs a broadcast reference sample — the 10^12-turn
    path. Grouped applyInPandas (Arrow batches, vectorized numpy ECDF);
    each bucket is an independent task, so skew is bounded by the hash
    bucketing and there is no global sort.

    Returns (bucket int, n long, ks double, threshold double,
    drifted boolean)."""
    ref = np.sort(np.asarray(list(ref_sample), dtype="float64"))
    m = len(ref)
    if m == 0:
        raise ValueError("reference sample is empty")
    bref = df.sparkSession.sparkContext.broadcast(ref)

    def _ks(pdf: pd.DataFrame) -> pd.DataFrame:
        r = bref.value
        x = np.sort(pdf["_v"].to_numpy(dtype="float64"))
        n = len(x)
        if n == 0:
            return pd.DataFrame(
                {"bucket": pdf["bucket"].iloc[:1], "n": [0], "ks": [np.nan],
                 "threshold": [np.nan], "drifted": [False]}
            )
        allv = np.concatenate([x, r])
        cdf_x = np.searchsorted(x, allv, side="right") / n
        cdf_r = np.searchsorted(r, allv, side="right") / len(r)
        d = float(np.max(np.abs(cdf_x - cdf_r)))
        thr = KS_C_ALPHA_05 * math.sqrt((n + len(r)) / (n * len(r)))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "n": [n],
                "ks": [d],
                "threshold": [thr],
                "drifted": [d > thr],
            }
        )

    if bucket_expr is None:
        bucket_expr = F.pmod(
            F.xxhash64(F.col(conv_col)), F.lit(num_buckets)
        ).cast("int")
    staged = df.select(
        bucket_expr.alias("bucket"),
        F.expr(value_expr).cast("double").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    return staged.groupBy("bucket").applyInPandas(
        _ks, "bucket int, n long, ks double, threshold double, drifted boolean"
    )


def drift_findings(
    cur_df: DataFrame,
    ref_df: DataFrame,
    checks: Sequence[tuple[str, str, str]] = (
        ("drift.psi.text_len", "length(text)", "floor(_v / 16)"),
        ("drift.psi.ts", "unix_timestamp(ts)", "floor(_v / 86400)"),
    ),
    psi_threshold: float = PSI_SIGNIFICANT,
    severity: str = "ERROR",
) -> list[tuple[str, float, bool, str]]:
    """Run PSI drift checks; returns
    [(constraint_id, psi, drifted, reason)] for the verdict layer."""
    out = []
    for cid, vexpr, bexpr in checks:
        val = psi(cur_df, ref_df, vexpr, bexpr)
        drifted = bool(val >= psi_threshold) if not math.isnan(val) else True
        out.append(
            (
                cid,
                val,
                drifted,
                f"PSI({vexpr})={val:.4f} vs threshold {psi_threshold}",
            )
        )
    return out


def volume_anomaly(
    df: DataFrame,
    ts_col: str = "ts",
    granularity: str = "day",
    k: int = 3,
) -> DataFrame:
    """Per-time-bucket row-count anomaly gate — the volume/completeness
    monitor next to the distribution monitors (PSI/KS): a day whose row
    count falls outside ``median ± k * MAD`` of the bucket-count series
    is a missed ingest, a duplicated load, or an upstream outage, none
    of which a distribution check sees (PSI normalizes counts away).

    Shape at scale: ONE partial-agg exchange over the table (groupBy
    date_trunc bucket — map-side combine collapses to |buckets| per
    partition), then the count SERIES is eagerly checkpointed so the
    fence passes (quantiles.exact_quantiles twice: median of counts,
    median of |cnt - median|) run over |buckets| rows, never re-scanning
    the source. Fences are exact order statistics of integer counts —
    engine-replayable to the bit (no mean/stddev, no float sums whose
    rounding depends on partitioning) — with the robust breakdown point
    a mean-based gate lacks (one outage day cannot drag the fence).

    Returns the full series, not only outliers (a volume report that
    hides the normal days can't be eyeballed): ``(bucket, cnt, median,
    mad, lo, hi, anomaly)`` ordered by bucket. NULL timestamps are
    excluded. Empty input returns an empty frame."""
    from ocsf_validator_spark.pipeline.quantiles import _med_mad

    # date_trunc with an unknown unit returns NULL for EVERY row — the
    # series collapses to one NULL bucket that can never be anomalous,
    # so a granularity typo would pass clean forever. A config typo is
    # an error, never a silent keep (the repo-wide rule).
    allowed = (
        "year", "quarter", "month", "week", "day",
        "hour", "minute", "second",
    )
    if granularity.lower() not in allowed:
        raise ValueError(
            f"volume_anomaly: unknown granularity {granularity!r} "
            f"(one of {allowed})"
        )
    spark = df.sparkSession
    schema = (
        "bucket timestamp, cnt bigint, median double, mad double, "
        "lo double, hi double, anomaly boolean"
    )
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.date_trunc(granularity, F.col(ts_col)).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    # one shared-projection median/MAD composition: the tiny bucket
    # series takes the small-n collect path (two jobs, no window/join)
    mm = _med_mad(counts, "cnt", 4096)
    if mm is None:
        return local_df(spark, [], schema)
    med, mad = mm
    lo, hi = med - k * mad, med + k * mad
    c = F.col("cnt").cast("double")
    return counts.select(
        "bucket",
        "cnt",
        F.lit(med).alias("median"),
        F.lit(mad).alias("mad"),
        F.lit(lo).alias("lo"),
        F.lit(hi).alias("hi"),
        ((c < F.lit(lo)) | (c > F.lit(hi))).alias("anomaly"),
    ).orderBy("bucket")


def _emd_of_counts(rows: list[tuple[int, int, int]]) -> float:
    """1-D EMD (Wasserstein-1, in bin-width units) from sorted
    ``(bin, cur_cnt, ref_cnt)`` rows — driver arithmetic over the tiny
    collected histogram, EXACT until the final division:

        EMD = sum over the support range of |CDF_cur − CDF_ref|
            = Σ_i |cum_c_i·n_r − cum_r_i·n_c| · (bin_{i+1} − bin_i)
              / (n_c · n_r)

    Every term is Python big-int (no float accumulation order to
    diverge, no epsilon floors — unlike PSI, EMD is finite for
    disjoint supports); gaps of empty bins between occupied ones
    contribute via the (bin_{i+1} − bin_i) multiplier, not by
    materializing them. The one division is cast-then-divide
    (float(total)/float(n_c·n_r)) to match a SQL replay's
    ``::DOUBLE / ::DOUBLE`` bit-for-bit."""
    rows = sorted(rows)
    nc = sum(c for _, c, _ in rows)
    nr = sum(r for _, _, r in rows)
    if nc == 0 or nr == 0:
        return float("nan")
    total = 0
    cum_c = cum_r = 0
    for i, (b, c, r) in enumerate(rows[:-1]):
        cum_c += c
        cum_r += r
        total += abs(cum_c * nr - cum_r * nc) * (rows[i + 1][0] - b)
    return float(total) / float(nc * nr)


def emd_from_histograms(cur: DataFrame, ref: DataFrame) -> float:
    """EMD between two (bin, cnt) histograms (one collect, like
    psi_from_histograms)."""
    joined = (
        cur.select("bin", F.col("cnt").alias("c_cnt"))
        .join(
            ref.select("bin", F.col("cnt").alias("r_cnt")),
            "bin",
            "full_outer",
        )
        .select(
            "bin",
            F.coalesce("c_cnt", F.lit(0)).alias("c_cnt"),
            F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
        )
    )
    return _emd_of_counts(
        [(int(r.bin), int(r.c_cnt), int(r.r_cnt)) for r in joined.collect()]
    )


def emd_split(
    df: DataFrame,
    cur_pred: str,
    value_expr: str,
    bin_expr: str,
    ref_pred: str | None = None,
) -> float:
    """EMD between two slices of the SAME table in ONE scan (the
    psi_split shape: conditional counts per bin, one shuffle of
    ≤ n_bins tiny rows, one collect). EMD complements PSI/KS in the
    drift triad: PSI is support-sensitive but unordered (shifting mass
    one bin vs fifty bins scores the same per-bin term), KS sees only
    the max CDF gap; EMD integrates the ordered CDF gap, so it scales
    with HOW FAR the distribution moved — the right gate for
    "text lengths drifted longer" magnitude questions."""
    rp = f"NOT ({cur_pred})" if ref_pred is None else ref_pred
    staged = (
        df.select(
            F.expr(value_expr).alias("_v"),
            F.expr(cur_pred).alias("_is_cur"),
            F.expr(rp).alias("_is_ref"),
        )
        .filter(
            F.col("_v").isNotNull() & (F.col("_is_cur") | F.col("_is_ref"))
        )
        .select(
            "_is_cur",
            "_is_ref",
            F.expr(bin_expr).cast("bigint").alias("bin"),
        )
    )
    rows = (
        staged.groupBy("bin")
        .agg(
            F.sum(F.col("_is_cur").cast("long")).alias("c_cnt"),
            F.sum(F.col("_is_ref").cast("long")).alias("r_cnt"),
        )
        .collect()
    )
    return _emd_of_counts(
        [(int(r.bin), int(r.c_cnt), int(r.r_cnt)) for r in rows]
    )
