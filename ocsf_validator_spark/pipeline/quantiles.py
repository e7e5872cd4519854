"""Exact distributed quantiles without a global sort.

``percentile_approx`` is merge-order-dependent and approximate; a naive
exact quantile is ``orderBy(value)`` — a full shuffle + global sort of
the column at 100 TB. This operator computes EXACT order statistics in
two data passes plus a boundary pass:

1. one partial-agg scan for (count, min, max) of the non-null values;
2. one partial-agg histogram scan over ``n_bins`` equi-width bins —
   the exchange carries at most ``n_partitions x n_bins`` fixed-width
   rows; the driver walks the (<= n_bins)-row cumulative histogram to
   locate, for each requested quantile, its bin and rank WITHIN that
   bin;
3. one filtered pass over ONLY the boundary bins (~count/n_bins rows
   each, a handful of bins total): a per-bin ``row_number`` window
   picks the within-bin order statistic.

The result is the exact global order statistic — the float fuzz of the
bin boundaries cannot perturb it, because bins only ROUTE ranks; the
returned value is picked by ordering the VALUES themselves. Rank
convention: ``rank(q) = floor((n - 1) * q) + 1`` (1-based, lower
interpolation — the value at that position of the sorted column),
which the DuckDB oracle replays with an explicit ``row_number``.

Driver-side state is the histogram (<= n_bins rows) and the scalar
(count, min, max) — bounded collects, same budget class as the
token_budget_select cutoff grid.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    n_bins: int = 4096,
) -> DataFrame:
    """Exact quantiles of ``value_col``.

    NULL and NaN are excluded (NaN has no place in a total order);
    ±infinity participate — they route to sentinel bins below/above the
    finite range (-1 / n_bins), which keeps the rank arithmetic exact
    because bins only need to respect the sort order, and the finite
    bin widths come from the FINITE min/max so an infinity can never
    poison the binning arithmetic (an inf lo/hi would make every finite
    bin NaN and blow the ANSI int cast).

    Returns a DataFrame (q double, value double), one row per
    requested quantile, ordered by q.
    """
    spark = df.sparkSession
    vals = df.select(F.col(value_col).cast("double").alias("v")).filter(
        F.col("v").isNotNull() & ~F.isnan("v")
    )
    inf, ninf = float("inf"), float("-inf")
    finite = (F.col("v") > ninf) & (F.col("v") < inf)
    stats = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.when(finite, F.col("v"))).alias("lo"),
        F.max(F.when(finite, F.col("v"))).alias("hi"),
        F.count(F.when(~finite, F.lit(1))).alias("n_inf"),
    ).collect()[0]
    n, lo, hi = stats["n"], stats["lo"], stats["hi"]
    empty = spark.createDataFrame([], "q double, value double")
    if n == 0:
        return empty
    ranks = {q: int(math.floor((n - 1) * q)) + 1 for q in qs}
    if stats["n_inf"] == 0 and lo == hi:
        return spark.createDataFrame(
            [(float(q), float(lo)) for q in sorted(qs)], "q double, value double"
        )

    # degenerate finite range (all-inf, or one distinct finite value
    # alongside infs): park every finite row in bin 0
    if lo is None or lo == hi:
        lo, width = 0.0, 1.0
        finite_bin = F.lit(0)
    else:
        width = (hi - lo) / n_bins
        finite_bin = F.greatest(
            F.lit(0),
            F.least(
                F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
                F.lit(n_bins - 1),
            ),
        )
    bin_expr = (
        F.when(F.col("v") == ninf, F.lit(-1))
        .when(F.col("v") == inf, F.lit(n_bins))
        .otherwise(finite_bin)
    )
    hist = {
        r["b"]: r["c"]
        for r in vals.select(bin_expr.alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    # walk the cumulative histogram: rank -> (bin, rank within bin)
    targets: dict[float, tuple[int, int]] = {}
    cum = 0
    remaining = sorted(ranks.items(), key=lambda kv: kv[1])
    it = iter(sorted(hist.items()))
    b, c = next(it)
    for q, r in remaining:
        while cum + c < r:
            cum += c
            b, c = next(it)
        targets[q] = (b, r - cum)
    need_bins = sorted({b for b, _ in targets.values()})

    w = Window.partitionBy("b").orderBy(F.col("v").asc())
    boundary = (
        vals.select("v", bin_expr.alias("b"))
        .filter(F.col("b").isin(need_bins))
        .select("v", "b", F.row_number().over(w).alias("rn"))
    )
    # broadcast the (q -> bin, within-bin rank) routing table and join:
    # one boundary pass no matter how many quantiles are asked, and
    # several quantiles sharing one (bin, rank) — possible at small n —
    # each get their own output row
    targets_df = spark.createDataFrame(
        [(float(q), b, local) for q, (b, local) in targets.items()],
        "q double, b int, rn int",
    )
    return (
        boundary.join(F.broadcast(targets_df), ["b", "rn"])
        .select("q", F.col("v").alias("value"))
        .orderBy("q")
    )


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    n_bins: int = 1024,
) -> DataFrame:
    """Exact per-group quantiles of ``value_col`` — the per-stratum
    percentile table drift baselines want (per event type, language,
    source, ...).

    Same histogram-narrowing contract as :func:`exact_quantiles`, with
    every driver-side structure bounded by GROUP CARDINALITY x n_bins
    (the token_budget_select budget class): per-group (count, min, max)
    from one partial-agg scan; a (group x bin) histogram scan whose
    exchange carries fixed-width rows; one boundary pass windowed per
    (group, bin) and joined to a broadcast routing table. Designed for
    bounded group cardinality (types/languages/sources) — NOT for
    per-user groups; there the per-group rank table itself is the
    output size and a different operator applies.

    Degenerate groups (all values equal, incl. single-row groups) short
    -circuit to driver literals — a zero bin width never reaches the
    binning expression.

    Returns (group_col, q, value) ordered by (group_col, q).
    """
    spark = df.sparkSession
    inf, ninf = float("inf"), float("-inf")
    vals = df.select(
        # string-normalized so the broadcast grid/routing frames (typed
        # "_g string") join without an implicit cast on the big side
        F.col(group_col).cast("string").alias("_g"),
        F.col(value_col).cast("double").alias("v"),
    ).filter(F.col("v").isNotNull() & ~F.isnan("v") & F.col("_g").isNotNull())
    finite = (F.col("v") > ninf) & (F.col("v") < inf)
    stats = {
        r["_g"]: (r["n"], r["lo"], r["hi"], r["n_inf"])
        for r in vals.groupBy("_g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.when(finite, F.col("v"))).alias("lo"),
            F.max(F.when(finite, F.col("v"))).alias("hi"),
            F.count(F.when(~finite, F.lit(1))).alias("n_inf"),
        )
        .collect()
    }
    schema = f"{group_col} string, q double, value double"
    if not stats:
        return spark.createDataFrame([], schema)

    literal_rows = []  # degenerate groups resolved driver-side
    live = {}  # group -> (lo, width, {q: global rank})
    for g, (n, lo, hi, n_inf) in stats.items():
        ranks = {q: int(math.floor((n - 1) * q)) + 1 for q in qs}
        if n_inf == 0 and lo == hi:
            literal_rows += [(g, float(q), float(lo)) for q in sorted(qs)]
        elif lo is None or lo == hi:
            # all-inf group, or one distinct finite value among infs:
            # finite rows park in bin 0, the inf sentinels do the rest
            live[g] = (0.0, 1.0, ranks)
        else:
            live[g] = (lo, (hi - lo) / n_bins, ranks)
    lit_df = spark.createDataFrame(literal_rows, schema)
    if not live:
        return lit_df.orderBy(group_col, "q")

    grid = spark.createDataFrame(
        [(g, lo, w) for g, (lo, w, _) in live.items()],
        "_g string, _lo double, _w double",
    )
    binned = vals.join(F.broadcast(grid), "_g").select(
        "_g",
        "v",
        F.when(F.col("v") == ninf, F.lit(-1))
        .when(F.col("v") == inf, F.lit(n_bins))
        .otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.floor(
                        (F.col("v") - F.col("_lo")) / F.col("_w")
                    ).cast("int"),
                    F.lit(n_bins - 1),
                ),
            )
        )
        .alias("b"),
    )
    hist: dict[str, dict[int, int]] = {}
    for r in binned.groupBy("_g", "b").agg(F.count(F.lit(1)).alias("c")).collect():
        hist.setdefault(r["_g"], {})[r["b"]] = r["c"]

    routing = []  # (group, bin, within-bin rank, q)
    for g, (_lo, _w, ranks) in live.items():
        cum = 0
        it = iter(sorted(hist[g].items()))
        b, c = next(it)
        for q, r in sorted(ranks.items(), key=lambda kv: kv[1]):
            while cum + c < r:
                cum += c
                b, c = next(it)
            routing.append((g, b, r - cum, float(q)))
    routes = spark.createDataFrame(
        routing, "_g string, b int, rn int, q double"
    )
    w = Window.partitionBy("_g", "b").orderBy(F.col("v").asc())
    picked = (
        binned.join(
            F.broadcast(routes.select("_g", "b").distinct()), ["_g", "b"]
        )
        .select("_g", "b", "v", F.row_number().over(w).alias("rn"))
        .join(F.broadcast(routes), ["_g", "b", "rn"])
        .select(
            F.col("_g").alias(group_col), "q", F.col("v").alias("value")
        )
    )
    return picked.unionByName(lit_df).orderBy(group_col, "q")


def mad_outliers(
    df: DataFrame,
    value_col: str,
    id_cols: tuple[str, ...] = ("event_id",),
    k: int = 3,
    n_bins: int = 4096,
) -> DataFrame:
    """Robust outlier screen: rows whose ``value_col`` falls outside
    ``median ± k * MAD`` (MAD = median absolute deviation, the classic
    breakdown-point-0.5 robust spread — unlike mean/stddev bounds, a
    contaminated tail cannot drag the fence toward itself).

    Composes :func:`exact_quantiles` twice (median of the values, then
    median of ``|v - median|``) — each an exact histogram-narrowed order
    statistic, so the fences are EXACT data values with no global sort:
    ~7 column-pruned scans of one double column total, bounded driver
    state, and the final flag pass is a scan-speed filter. ``k`` is kept
    integral and the fences are computed as ``med - k * mad`` /
    ``med + k * mad`` (one multiply + one add over exact data values, in
    that order) so any engine replays them to the ULP; callers wanting
    the Gaussian-consistency constant (1.4826) fold it into k upstream.

    NULL/NaN values are excluded (as in exact_quantiles). Returns
    ``(*id_cols, value, median, mad, lo, hi)`` — empty when the column
    is empty or the spread degenerates to mad == 0 with nothing outside
    the point fence.
    """
    spark = df.sparkSession
    schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in id_cols]
        + ["value double, median double, mad double, lo double, hi double"]
    )
    med_rows = exact_quantiles(df, value_col, qs=(0.5,), n_bins=n_bins).collect()
    if not med_rows:
        return spark.createDataFrame([], schema)
    med = med_rows[0]["value"]
    dev = df.select(
        F.abs(F.col(value_col).cast("double") - F.lit(med)).alias("_d")
    )
    mad = exact_quantiles(dev, "_d", qs=(0.5,), n_bins=n_bins).collect()[0][
        "value"
    ]
    lo, hi = med - k * mad, med + k * mad
    v = F.col(value_col).cast("double")
    return (
        df.filter(v.isNotNull() & ~F.isnan(v) & ((v < F.lit(lo)) | (v > F.lit(hi))))
        .select(
            *[F.col(c) for c in id_cols],
            v.alias("value"),
            F.lit(med).alias("median"),
            F.lit(mad).alias("mad"),
            F.lit(lo).alias("lo"),
            F.lit(hi).alias("hi"),
        )
    )


def group_mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_cols: tuple[str, ...] = ("event_id",),
    k: int = 3,
    n_bins: int = 1024,
) -> DataFrame:
    """Per-stratum robust outlier screen: rows outside their OWN group's
    ``median ± k * MAD`` — the realistic shape of the data-derived Range
    constraint, since each event type / language / source has its own
    scale (a value ordinary for one type is a gross outlier for
    another; one global fence sees neither).

    Composes :func:`exact_group_quantiles` twice (per-group median of
    the values, then per-group median of ``|v - median_g|``). Driver
    state is two group-cardinality-sized median tables; the fences land
    as a BROADCAST (group, lo, hi) frame, so the flag pass is one
    broadcast-join + filter over the base scan — the big side never
    shuffles. Same bounded-group-cardinality contract as
    exact_group_quantiles (types/languages, not per-user). Fences are
    ``med - k*mad`` / ``med + k*mad`` on exact data values in a fixed
    order (ULP-replayable cross-engine, as in :func:`mad_outliers`).

    NULL/NaN values and NULL groups are excluded. Returns
    ``(group_col, *id_cols, value, median, mad, lo, hi)``; groups whose
    spread degenerates to mad == 0 keep the point fence (off-median
    rows flag, as in the global screen).
    """
    spark = df.sparkSession
    schema = ", ".join(
        [f"`{group_col}` string"]
        + [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in id_cols]
        + ["value double, median double, mad double, lo double, hi double"]
    )
    meds = {
        r[group_col]: r["value"]
        for r in exact_group_quantiles(
            df, group_col, value_col, qs=(0.5,), n_bins=n_bins
        ).collect()
    }
    if not meds:
        return spark.createDataFrame([], schema)
    med_df = spark.createDataFrame(
        list(meds.items()), "_g string, _med double"
    )
    g = F.col(group_col).cast("string")
    dev = (
        df.select(g.alias("_g"), F.col(value_col).cast("double").alias("_v"))
        .join(F.broadcast(med_df), "_g")
        .select("_g", F.abs(F.col("_v") - F.col("_med")).alias("_d"))
    )
    mads = {
        r["_g"]: r["value"]
        for r in exact_group_quantiles(
            dev, "_g", "_d", qs=(0.5,), n_bins=n_bins
        ).collect()
    }
    fences = spark.createDataFrame(
        [
            (grp, med, mads[grp], med - k * mads[grp], med + k * mads[grp])
            for grp, med in meds.items()
        ],
        "_g string, _med double, _mad double, _lo double, _hi double",
    )
    v = F.col(value_col).cast("double")
    return (
        df.filter(v.isNotNull() & ~F.isnan(v) & g.isNotNull())
        .join(F.broadcast(fences), g == F.col("_g"))
        .filter((v < F.col("_lo")) | (v > F.col("_hi")))
        .select(
            F.col("_g").alias(group_col),
            *[F.col(c) for c in id_cols],
            v.alias("value"),
            F.col("_med").alias("median"),
            F.col("_mad").alias("mad"),
            F.col("_lo").alias("lo"),
            F.col("_hi").alias("hi"),
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    id_cols: tuple[str, ...] = ("event_id",),
    n_bins: int = 4096,
) -> DataFrame:
    """Winsorization: clip ``value_col`` to its exact [lo_q, hi_q]
    order-statistic fences — the robust preprocessing step before a
    scale-sensitive consumer (embedding norms into ANN, reward scores
    into a mix weight) where :func:`mad_outliers` would DROP rows this
    op instead retains at the fence.

    Fences come from :func:`exact_quantiles` (histogram-narrowed exact
    order statistics, no global sort) and are applied as LITERALS — the
    clip pass is a scan-speed projection the optimizer can fold into
    any downstream plan, and because the fences are actual data values
    picked by rank (never interpolated), the clipped output is
    engine-replayable bit-for-bit. NULL/NaN values pass through
    unclipped (flagged NULL) — dropping is the caller's policy.

    Returns (*id_cols, value_col, clipped, was_clipped) where
    ``was_clipped`` is NULL for NULL/NaN inputs.
    """
    if not (0.0 <= lo_q < hi_q <= 1.0):
        raise ValueError("need 0 <= lo_q < hi_q <= 1")
    fences = {
        r["q"]: r["value"]
        for r in exact_quantiles(
            df, value_col, qs=(lo_q, hi_q), n_bins=n_bins
        ).collect()
    }
    if not fences:
        return df.select(
            *id_cols,
            F.col(value_col),
            F.col(value_col).cast("double").alias("clipped"),
            F.lit(None).cast("boolean").alias("was_clipped"),
        )
    lo, hi = fences[lo_q], fences[hi_q]
    v = F.col(value_col).cast("double")
    ok = v.isNotNull() & ~F.isnan(v)
    clipped = F.when(ok, F.least(F.greatest(v, F.lit(lo)), F.lit(hi))).otherwise(v)
    return df.select(
        *id_cols,
        F.col(value_col),
        clipped.alias("clipped"),
        F.when(ok, (v < F.lit(lo)) | (v > F.lit(hi))).alias("was_clipped"),
    )


def quantile_bin(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    id_cols: tuple[str, ...] = ("event_id",),
    hist_bins: int = 4096,
) -> DataFrame:
    """Quantile discretization: assign each row the equal-FREQUENCY
    bucket of ``value_col`` (decile/percentile binning — the ML
    preprocessing staple that histogram-equalizes a skewed feature
    before bucketed models or stratified sampling; an equal-WIDTH
    binning puts 99% of a heavy-tailed feature in one bucket).

    Internal fences are the exact order statistics at q = j/n_bins
    (j = 1..n_bins-1) from :func:`exact_quantiles` (histogram-narrowed,
    no global sort), applied as LITERALS in one scan-speed CASE chain —
    bucket j holds values in (fence_{j-1}, fence_j], the SQL-replayable
    right-closed convention, so ties at a fence all land in the lower
    bucket and buckets are only approximately equal-count under heavy
    ties (exactly the standard NTILE caveat, but rank-free and
    engine-exact). NULL/NaN rows carry NULL bucket.

    Returns (*id_cols, value_col, bucket int in [1, n_bins])."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    qs = tuple(j / n_bins for j in range(1, n_bins))
    fences = [
        r["value"]
        for r in exact_quantiles(df, value_col, qs=qs, n_bins=hist_bins)
        .orderBy("q")
        .collect()
    ]
    v = F.col(value_col).cast("double")
    ok = v.isNotNull() & ~F.isnan(v)
    bucket = F.lit(n_bins)
    for j in range(len(fences) - 1, -1, -1):
        bucket = F.when(v <= F.lit(fences[j]), F.lit(j + 1)).otherwise(
            bucket
        )
    return df.select(
        *id_cols,
        F.col(value_col),
        F.when(ok, bucket).cast("int").alias("bucket"),
    )


def robust_scale(
    df: DataFrame,
    value_col: str,
    id_cols: tuple[str, ...] = ("event_id",),
    n_bins: int = 4096,
) -> DataFrame:
    """Robust standardization: ``scaled = (v - median) / mad`` — the
    outlier-immune alternative to z-scoring (a contaminated tail drags
    a mean/stddev scaler; median/MAD have breakdown point 0.5), the
    transform companion to :func:`mad_outliers`' screen and
    :func:`winsorize`'s clip. Callers wanting the Gaussian-consistency
    constant divide by 1.4826 downstream — the raw MAD unit keeps the
    output an exact function of two data values.

    median and MAD are :func:`exact_quantiles` order statistics
    (histogram-narrowed, no global sort) applied as LITERALS, so the
    scale pass is one scan-speed projection and every scaled value is
    one subtract + one divide over exact data values, rounded 6 dp —
    engine-replayable. NULL/NaN inputs and a degenerate mad == 0 yield
    NULL scaled (try_divide); the median/mad columns ride along so a
    consumer can invert the transform.

    Returns (*id_cols, value_col, scaled, median, mad).
    """
    spark = df.sparkSession
    med_rows = exact_quantiles(df, value_col, qs=(0.5,), n_bins=n_bins).collect()
    if not med_rows:
        schema = ", ".join(
            [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in id_cols]
            + [
                f"`{value_col}` {df.schema[value_col].dataType.simpleString()}",
                "scaled double, median double, mad double",
            ]
        )
        return spark.createDataFrame([], schema)
    med = med_rows[0]["value"]
    dev = df.select(
        F.abs(F.col(value_col).cast("double") - F.lit(med)).alias("_d")
    )
    mad = exact_quantiles(dev, "_d", qs=(0.5,), n_bins=n_bins).collect()[0][
        "value"
    ]
    v = F.col(value_col).cast("double")
    ok = v.isNotNull() & ~F.isnan(v)
    return df.select(
        *id_cols,
        F.col(value_col),
        F.when(
            ok, F.round(F.try_divide(v - F.lit(med), F.lit(mad)), 6)
        ).alias("scaled"),
        F.lit(med).alias("median"),
        F.lit(mad).alias("mad"),
    )
