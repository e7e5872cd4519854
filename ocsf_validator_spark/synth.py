"""Deterministic synthetic transcript generator (north-rule input shape).

Generates ``transcripts(conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp)`` entirely with Spark column
arithmetic — no driver-side loops, no wall-clock, no RNG state — so the
same (n_turns, seed) always produces identical data at any parallelism
and any scale (this is how we synthesize the 10^12-turn design point's
small-scale stand-in, per BASELINE.md).

Layout: conversation 0 is a single skewed conversation holding
``skew_turns`` turns (exercises salting / AQE skew handling); remaining
rows fill uniform conversations of ``turns_per_conv``. Violations are
injected by hash-derived row selectors at ~1% rate, each tagged by the
kind of defect so tests can derive the exact expected violation set from
the same formulas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ("system", "user", "assistant", "tool")
TOOLS = ("search", "browser", "python", "bash", "none")
DEPRECATED_ROLE = "function"
BASE_TS = "2026-01-01 00:00:00"


def _h(col, seed: int):
    """Deterministic pseudo-random in [0, 2^63) from (row id, seed)."""
    return F.abs(F.xxhash64(col, F.lit(seed)))


def synth_transcripts(
    spark: SparkSession,
    n_turns: int = 100_000,
    seed: int = 42,
    turns_per_conv: int = 20,
    skew_turns: int | None = None,
    violation_rate: int = 100,  # 1-in-N rows get a defect
    partitions: int | None = None,
) -> DataFrame:
    if skew_turns is None:
        skew_turns = max(n_turns // 20, 1)  # 5% of rows in one conversation
    ids = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    in_skew = i < F.lit(skew_turns)
    conv_no = F.when(in_skew, F.lit(0)).otherwise(
        (i - F.lit(skew_turns)) / F.lit(turns_per_conv) + F.lit(1)
    ).cast("bigint")
    turn_idx = F.when(in_skew, i).otherwise(
        (i - F.lit(skew_turns)) % F.lit(turns_per_conv)
    ).cast("int")

    role_pick = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), (_h(i, seed) % 4 + 1).cast("int")
    )
    tool_pick = F.element_at(
        F.array(*[F.lit(t) for t in TOOLS]), (_h(i, seed + 1) % 5 + 1).cast("int")
    )
    words = F.array(
        F.lit("alpha"), F.lit("bravo"), F.lit("charlie"), F.lit("delta"),
        F.lit("echo"), F.lit("foxtrot"), F.lit("golf"), F.lit("hotel"),
    )
    base_text = F.concat_ws(
        " ",
        F.element_at(words, (_h(i, seed + 2) % 8 + 1).cast("int")),
        F.element_at(words, (_h(i, seed + 3) % 8 + 1).cast("int")),
        F.element_at(words, (_h(i, seed + 4) % 8 + 1).cast("int")),
        F.repeat(F.lit("x"), (_h(i, seed + 5) % 64).cast("int")),
    )
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(BASE_TS).cast("timestamp")) + i
    )

    # Violation selectors: disjoint 1-in-violation_rate slots per defect
    # kind, reproducible from (id, seed) alone.
    slot = _h(i, seed + 100) % F.lit(violation_rate * 8)
    df = ids.select(
        F.concat(F.lit("c"), F.lpad(conv_no.cast("string"), 8, "0")).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.when(slot == 0, F.lit(None).cast("string"))        # required.role
        .when(slot == 1, F.lit("supervisor"))                 # ref.role
        .when(slot == 2, F.lit(DEPRECATED_ROLE))              # deprecated.role
        .otherwise(role_pick)
        .alias("role"),
        F.when(slot == 3, F.repeat(F.lit("y"), 300)).otherwise(base_text).alias("text"),
        F.when(slot == 4, F.lit("telnet"))                    # ref.tool
        .when(role_pick == "tool", tool_pick)
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
        F.when(slot == 5, ts - F.expr("INTERVAL 1 HOUR"))     # monotonic.ts
        .otherwise(ts)
        .alias("ts"),
    )
    return df


def synth_reference_sample(
    spark: SparkSession, n: int = 10_000, seed: int = 7
) -> DataFrame:
    """Clean (no injected drift) sample used as the stored baseline for
    the KS/PSI drift checks."""
    return synth_transcripts(spark, n_turns=n, seed=seed, violation_rate=1 << 30)


def synth_drifted(spark: SparkSession, n: int = 10_000, seed: int = 7) -> DataFrame:
    """Sample with ts shifted +30d and text lengths doubled (FIXTURES.md
    scenario 13) to trip the drift constraints."""
    df = synth_reference_sample(spark, n, seed)
    return df.withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAYS")).withColumn(
        "text", F.concat(F.col("text"), F.col("text"))
    )
