"""Driver-contract consistency: every queries() entry must build a
plan against real testdata (catches broken imports / bad column
references WITHOUT executing the heavy queries), carry an oracle_sql
entry, and entry() must return the flagship frame. Value parity itself
is check_oracle / the driver's CORRECTNESS gate; this file pins the
contract SHAPE so a refactor can't silently drop a query or leave a
dangling oracle key.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as e

SF = "/root/testdata/sf0.001"


def test_every_query_has_an_oracle_and_vice_versa():
    qs, sqls = e.queries(), e.oracle_sql()
    assert set(qs) == set(sqls), (
        sorted(set(qs) - set(sqls)),
        sorted(set(sqls) - set(qs)),
    )


def test_every_query_builds_a_plan(spark):
    """Analysis (schema resolution) must succeed for every entry —
    explain-level only, no execution."""
    for name, fn in e.queries().items():
        df = fn(spark, SF)
        assert df.schema.fields, name
        # column names must be driver-comparable: non-empty, no dots
        for f in df.schema.fields:
            assert f.name and "." not in f.name, (name, f.name)


def test_entry_runs(spark):
    out = e.entry(spark)
    assert out.count() >= 0
    assert [f.name for f in out.schema.fields][:2] == [
        "constraint_id",
        "conv_id",
    ]
