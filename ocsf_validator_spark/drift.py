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


def psi_from_histograms(
    cur: DataFrame, ref: DataFrame, epsilon: float = 1e-6
) -> float:
    """PSI between two (bin, cnt) histograms. Missing bins get an
    ``epsilon`` floor so new/vanished bins contribute finite terms."""
    joined = (
        cur.select("bin", F.col("cnt").alias("c_cnt"))
        .join(ref.select("bin", F.col("cnt").alias("r_cnt")), "bin", "full_outer")
        .select(
            F.coalesce("c_cnt", F.lit(0)).alias("c_cnt"),
            F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
        )
    )
    agg = joined.agg(
        F.sum("c_cnt").alias("ct"), F.sum("r_cnt").alias("rt")
    ).collect()[0]
    ct, rt = float(agg.ct or 0), float(agg.rt or 0)
    if ct == 0 or rt == 0:
        return float("nan")
    row = joined.select(
        F.sum(
            (F.col("c_cnt") / ct - F.col("r_cnt") / rt)
            * (
                F.log(
                    F.greatest(F.col("c_cnt") / ct, F.lit(epsilon))
                )
                - F.log(F.greatest(F.col("r_cnt") / rt, F.lit(epsilon)))
            )
        ).alias("psi")
    ).collect()[0]
    return float(row.psi)


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
