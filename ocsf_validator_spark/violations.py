"""Violation evaluation — the engine's Collector (reference errors.py:6-46).

The reference appends typed exception objects to a Python list; we emit a
violations DataFrame with the machine-readable shape required by the
north rule:

    (constraint_id string, <key cols...>, reason string, severity string)

Three evaluation strategies by constraint class:

1. ROW-LEVEL — one fused projection: per row, an array of
   violation structs (NULL per satisfied constraint), ``array_compact``
   then ``explode``. ONE scan for the whole suite, fully codegen'd; the
   explode emits only violating (row, constraint) pairs, so output is
   proportional to violations, not rows × constraints.

2. GROUP-LEVEL (uniqueness / ordering / monotonicity) — aggregations and
   windows keyed by the conversation. Uniqueness pre-filters duplicate
   keys with a partially-aggregated groupBy and semi-join before the
   first-seen window, so the sort only touches offending keys (at
   10^12 turns a full-table window would dominate the job).

3. DATASET-LEVEL (schema audit, enum coverage) — driver schema diff and
   tiny anti-joins; emitted with NULL row keys.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ocsf_validator_spark.compile import violation_entry
from ocsf_validator_spark.spec import (
    AllowedColumns,
    ConstraintSet,
    EnumCoverage,
    Monotonic,
    TurnOrdering,
    Unique,
)

DEFAULT_KEYS = ("conv_id", "turn_idx")


def _violation_schema(df: DataFrame, keys: Sequence[str]) -> T.StructType:
    fields = [T.StructField("constraint_id", T.StringType(), False)]
    for k in keys:
        # key column may itself be missing (that IS the fatal finding the
        # schema audit reports) — fall back to string
        dt = df.schema[k].dataType if k in df.columns else T.StringType()
        fields.append(T.StructField(k, dt, True))
    fields.append(T.StructField("reason", T.StringType(), True))
    fields.append(T.StructField("severity", T.StringType(), False))
    return T.StructType(fields)


def _empty(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    return df.sparkSession.createDataFrame([], _violation_schema(df, keys))


def _present(df: DataFrame, cols: Sequence[str]) -> bool:
    return all(c in df.columns for c in cols)


def row_violations(
    df: DataFrame, suite: ConstraintSet, keys: Sequence[str] = DEFAULT_KEYS
) -> DataFrame:
    """All row-level constraints in ONE projection over one scan.

    Constraints whose column is absent are skipped (the reference only
    errors on absent keys via the required-keys validator, never by
    crashing another validator); the schema audit in dataset_findings
    reports missing REQUIRED columns as FATAL."""
    cs = [c for c in suite.row_level() if _present(df, [c.column])]
    if not cs or not _present(df, keys):
        return _empty(df, keys)
    entries = F.array_compact(F.array(*[violation_entry(c) for c in cs]))
    return (
        df.select(*keys, F.explode(entries).alias("_v"))
        .select(
            F.col("_v.constraint_id").alias("constraint_id"),
            *keys,
            F.col("_v.reason").alias("reason"),
            F.col("_v.severity").alias("severity"),
        )
    )


def unique_violations(
    df: DataFrame, c: Unique, keys: Sequence[str] = DEFAULT_KEYS
) -> DataFrame:
    """Duplicate keys, reference collision semantics (validators.py:236-262):
    the violation fires for the SECOND AND LATER occurrences, keeping the
    first-seen row, and the reason names the kept peer deterministically
    (first_seen_order breaks ties — the analogue of the reference's
    stable dict-iteration first-seen order; SURVEY.md §7 hard part (b)).
    """
    kcols = list(c.keys)
    # Phase 1: cheap partial-agg shuffle to find offending keys only.
    dup_keys = df.groupBy(*kcols).agg(F.count(F.lit(1)).alias("_n")).filter(
        F.col("_n") > 1
    )
    dups = df.join(dup_keys.select(*kcols), kcols, "semi")
    # Phase 2: window ONLY over duplicate rows (tiny vs the table).
    order = [F.col(o).asc_nulls_last() for o in c.first_seen_order] or [
        F.lit(1)
    ]
    w = Window.partitionBy(*kcols).orderBy(*order)
    ranked = dups.withColumn("_rn", F.row_number().over(w))
    first_seen = (
        F.first(F.concat_ws("|", *[F.col(o).cast("string") for o in c.first_seen_order]))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        if c.first_seen_order
        else F.lit("")
    )
    key_repr = F.concat_ws(",", *[F.col(k).cast("string") for k in kcols])
    out = (
        ranked.withColumn("_first", first_seen)
        .filter(F.col("_rn") > 1)
        .select(
            F.lit(c.constraint_id).alias("constraint_id"),
            *keys,
            F.concat(
                F.lit("duplicate key ("),
                key_repr,
                F.lit(") occurrence "),
                F.col("_rn").cast("string"),
                F.lit("; first seen "),
                F.col("_first"),
            ).alias("reason"),
            F.lit(c.severity.name).alias("severity"),
        )
    )
    return out


def ordering_violations(
    df: DataFrame, c: TurnOrdering, keys: Sequence[str] = DEFAULT_KEYS
) -> DataFrame:
    """Dense turn numbering per conversation (north-star O3): within
    Window.partitionBy(conv_id).orderBy(turn_idx), turn_idx must start
    at 0 and increase by exactly 1. Duplicates and gaps both emit at the
    offending row."""
    part, idx = c.partition_by, c.order_by
    w = Window.partitionBy(part).orderBy(F.col(idx).asc())
    prev = F.lag(F.col(idx)).over(w)
    expected = F.coalesce(prev + F.lit(1), F.lit(0))
    staged = df.select(*keys, F.col(idx).alias("_idx"), prev.alias("_prev"), expected.alias("_exp"))
    is_dup = F.col("_prev").isNotNull() & (F.col("_idx") == F.col("_prev"))
    is_gap = F.col("_idx") > F.col("_exp")
    return (
        staged.filter(is_dup | is_gap)
        .select(
            F.lit(c.constraint_id).alias("constraint_id"),
            *keys,
            F.when(
                F.col("_idx") == F.col("_prev"),
                F.concat(
                    F.lit(f"duplicate {idx} "), F.col("_idx").cast("string")
                ),
            )
            .otherwise(
                F.concat(
                    F.lit(f"{idx} gap: expected "),
                    F.col("_exp").cast("string"),
                    F.lit(" got "),
                    F.col("_idx").cast("string"),
                )
            )
            .alias("reason"),
            F.lit(c.severity.name).alias("severity"),
        )
    )


def monotonic_violations(
    df: DataFrame, c: Monotonic, keys: Sequence[str] = DEFAULT_KEYS
) -> DataFrame:
    """Per-conversation monotonicity of ``column`` under stable turn
    ordering (Window.partitionBy(conv_id).orderBy(turn_idx))."""
    w = Window.partitionBy(c.partition_by).orderBy(F.col(c.order_by).asc())
    prev = F.lag(F.col(c.column)).over(w)
    staged = df.select(*keys, F.col(c.column).alias("_cur"), prev.alias("_prev"))
    bad = (
        (F.col("_cur") < F.col("_prev"))
        if not c.strict
        else (F.col("_cur") <= F.col("_prev"))
    )
    return (
        staged.filter(F.col("_prev").isNotNull() & bad)
        .select(
            F.lit(c.constraint_id).alias("constraint_id"),
            *keys,
            F.concat(
                F.lit(f"{c.column} not monotonic: "),
                F.col("_cur").cast("string"),
                F.lit(" after "),
                F.col("_prev").cast("string"),
            ).alias("reason"),
            F.lit(c.severity.name).alias("severity"),
        )
    )


def group_violations(
    df: DataFrame, suite: ConstraintSet, keys: Sequence[str] = DEFAULT_KEYS
) -> DataFrame:
    out = _empty(df, keys)
    if not _present(df, keys):
        return out
    for c in suite.group_level():
        if isinstance(c, Unique) and _present(df, c.keys):
            out = out.unionByName(unique_violations(df, c, keys))
        elif isinstance(c, TurnOrdering) and _present(df, [c.partition_by, c.order_by]):
            out = out.unionByName(ordering_violations(df, c, keys))
        elif isinstance(c, Monotonic) and _present(
            df, [c.column, c.partition_by, c.order_by]
        ):
            out = out.unionByName(monotonic_violations(df, c, keys))
    return out


def dataset_findings(
    df: DataFrame, suite: ConstraintSet, keys: Sequence[str] = DEFAULT_KEYS
) -> DataFrame:
    """Schema audit (unknown/missing columns — reference
    validators.py:106-158's table-level survival) and enum coverage
    (reference validate_unused_attrs, validators.py:169-198). Emitted
    with NULL row keys, like the reference errors that carry a file but
    no attribute trail."""
    spark = df.sparkSession
    schema = _violation_schema(df, keys)
    rows: list[tuple] = []
    nulls = tuple(None for _ in keys)
    for c in suite.dataset_level():
        if isinstance(c, AllowedColumns):
            present = set(df.columns)
            for col in sorted(present - set(c.allowed)):
                rows.append(
                    (c.constraint_id, *nulls, f"unknown column {col}", c.severity.name)
                )
            for col in sorted(set(c.required) - present):
                rows.append(
                    (
                        c.constraint_id,
                        *nulls,
                        f"missing required column {col}",
                        c.severity.name,
                    )
                )
    findings = spark.createDataFrame(rows, schema)
    # Enum coverage needs the data: anti-join enum values against the
    # observed distinct set (tiny after partial-agg distinct).
    for c in suite.dataset_level():
        if isinstance(c, EnumCoverage):
            if c.column not in df.columns:
                continue
            vals = spark.createDataFrame(
                [(v,) for v in c.values], T.StructType([T.StructField("_val", T.StringType())])
            )
            observed = df.select(F.col(c.column).alias("_val")).distinct()
            missing = vals.join(observed, "_val", "left_anti")
            leg = missing.select(
                F.lit(c.constraint_id).alias("constraint_id"),
                *[F.lit(None).cast(schema[k].dataType).alias(k) for k in keys],
                F.concat(
                    F.lit(f"enum value '"),
                    F.col("_val"),
                    F.lit(f"' never observed in {c.column}"),
                ).alias("reason"),
                F.lit(c.severity.name).alias("severity"),
            )
            findings = findings.unionByName(leg)
    return findings


def all_violations(
    df: DataFrame, suite: ConstraintSet, keys: Sequence[str] = DEFAULT_KEYS
) -> DataFrame:
    """Full suite: row ∪ group ∪ dataset legs (each leg scans once; the
    row leg carries every row-level constraint in a single projection)."""
    return (
        row_violations(df, suite, keys)
        .unionByName(group_violations(df, suite, keys))
        .unionByName(dataset_findings(df, suite, keys))
    )
