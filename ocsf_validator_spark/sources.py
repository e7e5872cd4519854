"""Table sources — Iceberg-first with parquet fallback.

The north rule targets Iceberg tables of transcripts. This sandbox has
no Iceberg runtime jar, so the loader probes for one and degrades to
parquet transparently; all downstream phases only see (DataFrame,
snapshot_id), and the checkpoint manifest records whichever lineage id
the source provides:

- Iceberg: the table's current snapshot_id (time-travel-stable — a
  resume against a moved snapshot correctly invalidates, and a
  ``VERSION AS OF`` read of the recorded snapshot reproduces the run).
- Parquet dir: content fingerprint (file count + max mtime) from
  checkpoint.snapshot_of_path — same invalidation semantics, weaker
  reproducibility (no time travel).

Mirrors the reference's single eager source (FileReader._walk,
reference reader.py:205-227) where a parse failure is FATAL: here an
unreadable table raises, and the runner maps that to exit 2.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ocsf_validator_spark.checkpoint import snapshot_of_path


@dataclass(frozen=True)
class TableHandle:
    df: DataFrame
    snapshot_id: str
    format: str  # "iceberg" | "parquet"


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def _iceberg_snapshot_id(spark: SparkSession, table: str) -> str:
    row = spark.sql(
        f"SELECT snapshot_id FROM {table}.snapshots "
        "ORDER BY committed_at DESC LIMIT 1"
    ).collect()
    return f"iceberg:{row[0].snapshot_id}" if row else "iceberg:empty"


def load_table(
    spark: SparkSession,
    location: str,
    snapshot_id: int | None = None,
) -> TableHandle:
    """Load transcripts from an Iceberg table name (when the runtime is
    present and ``location`` is not a filesystem path) or a parquet
    path. ``snapshot_id`` pins an Iceberg time-travel read (resume
    against the exact snapshot a manifest recorded)."""
    looks_like_path = "/" in location or location.endswith(".parquet")
    if not looks_like_path and iceberg_available(spark):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
            snap = f"iceberg:{snapshot_id}"
        else:
            snap = _iceberg_snapshot_id(spark, location)
        return TableHandle(reader.load(location), snap, "iceberg")
    return TableHandle(
        spark.read.parquet(location), snapshot_of_path(location), "parquet"
    )


def write_violations(
    violations: DataFrame, location: str, fmt: str = "parquet"
) -> None:
    """Violation sink. Iceberg appends are atomic snapshot commits;
    parquet append relies on Spark's file committer."""
    if fmt == "iceberg":
        violations.writeTo(location).append()
    else:
        violations.write.mode("append").parquet(location)
