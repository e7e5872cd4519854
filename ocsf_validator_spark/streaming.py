"""Structured Streaming validation — continuous ingest of transcript
turns with the same constraint suite.

The reference is batch-only (SURVEY.md §2.10); this module is the
north-star extension for validating an APPEND-ONLY transcript stream
(e.g. the Iceberg table's incoming commits) without re-scanning history:

- ``validate_stream``: readStream → foreachBatch. Every micro-batch runs
  the SAME fused single-scan violation pass as the batch runner (row
  family + conversation-window family share one shuffle), appends
  violations to the sink, and writes a per-batch manifest line. Restart
  resumes from the streaming checkpoint — exactly-once per micro-batch
  because the sink IS (batch_id)-keyed: each batch overwrites its own
  ``batch_id=<n>`` partition, so a replay after a failure between the
  write and the checkpoint commit rewrites the same partition instead
  of duplicating rows.

  Scope note: the conversation-window checks see one micro-batch at a
  time, so they catch intra-batch duplicates/disorder; duplicates that
  STRADDLE batches are caught by the stateful leg below.

- ``cross_batch_duplicates``: stateful uniqueness across batches via
  ``dropDuplicatesWithinWatermark`` — rows evicted as duplicates within
  the watermark horizon are exactly the 2nd+ occurrences the batch
  Unique constraint would flag. State is bounded by the watermark (late
  beyond the horizon is the operator's documented blind spot — the
  nightly batch run remains the ground truth).

- ``streaming_turn_stats``: watermarked event-time windowed stats
  (turns, null-rates, distinct conversations) — the streaming analogue
  of stats.column_stats for dashboards/drift baselines.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocsf_validator_spark.spec import ConstraintSet, transcript_suite
from ocsf_validator_spark.violations import all_violations

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def stream_transcripts(
    spark: SparkSession, path: str, schema: str = TRANSCRIPT_DDL
) -> DataFrame:
    """File-source stream over a directory parquet files land in (the
    local stand-in for an Iceberg streaming read; swap for
    ``spark.readStream.format("iceberg")`` when the runtime is present —
    same downstream code)."""
    return spark.readStream.schema(schema).parquet(path)


def validate_stream(
    sdf: DataFrame,
    violations_out: str,
    checkpoint_dir: str,
    suite: ConstraintSet | None = None,
    manifest_dir: str | None = None,
    available_now: bool = True,
    on_batch: Callable[[int, int, int], None] | None = None,
):
    """Run the constraint suite on each micro-batch via foreachBatch.

    Coverage findings are skipped per batch (enum coverage over a
    micro-batch is meaningless — absence in 10k rows is not absence in
    the table); everything else is the batch engine unchanged.

    Returns the StreamingQuery; with ``available_now`` the caller can
    ``awaitTermination()`` for a drain-and-stop run (used by tests and
    backfills)."""
    suite = suite or transcript_suite()

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        viol = all_violations(batch_df, suite, include_coverage=False)
        viol.cache()
        n_viol = viol.count()
        # idempotent (batch_id)-keyed commit: a replayed batch
        # OVERWRITES its own partition directory — at-least-once
        # foreachBatch delivery becomes exactly-once in the sink
        viol.write.mode("overwrite").parquet(
            os.path.join(violations_out, f"batch_id={int(batch_id)}")
        )
        viol.unpersist()
        if manifest_dir:
            os.makedirs(manifest_dir, exist_ok=True)
            line = {
                "batch_id": int(batch_id),
                "n_violations": int(n_viol),
                "suite_version": suite.version(),
                "wall_sec": round(time.time() - t0, 3),
                "finished_at": time.time(),
            }
            with open(
                os.path.join(manifest_dir, f"batch-{batch_id:012d}.json"), "w"
            ) as f:
                json.dump(line, f)
        if on_batch:
            on_batch(int(batch_id), batch_df.count(), int(n_viol))

    writer = (
        sdf.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cross_batch_duplicates(
    sdf: DataFrame,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    watermark_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming uniqueness: keep only first-seen rows per key within
    the watermark horizon. Downstream subtraction (input minus output,
    per batch) yields the duplicate rows; state is bounded by the
    watermark so 10^12-turn streams don't accumulate unbounded keys."""
    return sdf.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def streaming_turn_stats(
    sdf: DataFrame,
    watermark_col: str = "ts",
    watermark: str = "1 hour",
    window: str = "10 minutes",
) -> DataFrame:
    """Watermarked event-time windowed stats: the streaming analogue of
    the batch stats pass (late rows beyond the watermark are dropped
    from their window — the documented completeness/latency trade)."""
    return (
        sdf.withWatermark(watermark_col, watermark)
        .groupBy(F.window(F.col(watermark_col), window))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.col("role").isNull().cast("long")).alias("role_nulls"),
            F.sum(F.col("text").isNull().cast("long")).alias("text_nulls"),
            F.approx_count_distinct("conv_id").alias("approx_convs"),
            F.min("turn_idx").alias("min_idx"),
            F.max("turn_idx").alias("max_idx"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "n_turns",
            "role_nulls",
            "text_nulls",
            "approx_convs",
            "min_idx",
            "max_idx",
        )
    )
