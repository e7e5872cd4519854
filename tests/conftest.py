from __future__ import annotations

import pytest

from ocsf_validator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ocsf-validator-spark-tests", cores=4)
    yield s


@pytest.fixture()
def transcripts(spark):
    """Tiny hand-built fixture mirroring the reference's DictReader test
    style (reference tests/test_validators.py): one row per defect
    scenario from FIXTURES.md §4, plus clean rows."""
    rows = [
        # conv_id, turn_idx, role, text, tool, ts
        ("c001", 0, "user", "hello", None, "2026-01-01 00:00:00"),
        ("c001", 1, "assistant", "hi there", None, "2026-01-01 00:00:01"),
        ("c001", 2, "tool", "ok", "search", "2026-01-01 00:00:02"),
        ("c001", 3, None, "missing role", None, "2026-01-01 00:00:03"),  # 1
        ("c002", 0, "user", "q", None, "2026-01-01 00:01:00"),
        ("c002", 1, "supervisor", "bad role", None, "2026-01-01 00:01:01"),  # 3
        ("c003", 0, "user", "q", None, "2026-01-01 00:02:00"),
        ("c003", 1, "tool", "t", "telnet", "2026-01-01 00:02:01"),  # 3 tool
        ("c004", 0, "user", "first", None, "2026-01-01 00:03:00"),
        ("c004", 1, "user", "dup A", None, "2026-01-01 00:03:01"),
        ("c004", 1, "user", "dup B", None, "2026-01-01 00:03:02"),  # 5 dup key
        ("c005", 0, "user", "y" * 70000, None, "2026-01-01 00:04:00"),  # 9 max_len
        ("c006", 0, "function", "deprecated role", None, "2026-01-01 00:05:00"),  # 10
        ("c007", 0, "user", "a", None, "2026-01-01 00:06:00"),
        ("c007", 1, "user", "b", None, "2026-01-01 00:06:01"),
        ("c007", 3, "user", "gap", None, "2026-01-01 00:06:03"),  # 12 gap
        ("c008", 0, "user", "t0", None, "2026-01-01 00:07:02"),
        ("c008", 1, "user", "ts goes backwards", None, "2026-01-01 00:07:01"),  # mono
        ("c009", 0, "tool", "tool role without tool", None, "2026-01-01 00:08:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    )
    return df.withColumn("ts", df.ts.cast("timestamp"))
