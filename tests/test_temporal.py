"""Temporal operators: as-of join, range join, time rollup.

Each test pins a semantic edge the driver oracle can't isolate at
sf0.01: tie-breaking, tolerance expiry, NULL keys, half-open interval
bounds, exactly-once pair emission across bucket boundaries, and the
rollup's grouping_id tags. Plan-shape tests pin the at-scale contracts:
asof_join is ONE window (no join operator at all), range_join is an
equi-join (never BroadcastNestedLoop).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ocsf_validator_spark.pipeline import temporal


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _left(spark, rows):
    df = _mk(spark, rows, "eid string, k string, ts string")
    return df.withColumn("ts", df.ts.cast("timestamp"))


def _right(spark, rows):
    df = _mk(spark, rows, "k string, rts string, oid long, amt double")
    return df.withColumn("rts", df.rts.cast("timestamp"))


def _asof(left, right, **kw):
    return temporal.asof_join(
        left,
        right,
        on=["k"],
        left_ts="ts",
        right_ts="rts",
        payload=["oid", "amt"],
        tiebreak="oid",
        **kw,
    )


def test_asof_picks_latest_at_or_before(spark):
    left = _left(spark, [("e1", "a", "2024-01-01 10:00:00")])
    right = _right(
        spark,
        [
            ("a", "2024-01-01 09:00:00", 1, 1.0),
            ("a", "2024-01-01 09:30:00", 2, 2.0),  # latest <= ts
            ("a", "2024-01-01 11:00:00", 3, 3.0),  # future: excluded
        ],
    )
    rows = _asof(left, right).collect()
    assert len(rows) == 1 and rows[0].oid == 2


def test_asof_inclusive_equal_timestamp_and_tie(spark):
    # right row AT the left ts matches (<= is inclusive); two right rows
    # sharing the greatest rts break to the greatest tiebreak
    left = _left(spark, [("e1", "a", "2024-01-01 10:00:00")])
    right = _right(
        spark,
        [
            ("a", "2024-01-01 10:00:00", 7, 7.0),
            ("a", "2024-01-01 10:00:00", 9, 9.0),  # wins the tie
        ],
    )
    rows = _asof(left, right).collect()
    assert rows[0].oid == 9


def test_asof_left_outer_and_tolerance(spark):
    left = _left(
        spark,
        [
            ("e1", "a", "2024-01-01 10:00:00"),  # match within horizon
            ("e2", "a", "2024-01-03 10:00:01"),  # latest match too old
            ("e3", "b", "2024-01-01 10:00:00"),  # no right rows at all
        ],
    )
    right = _right(spark, [("a", "2024-01-01 09:00:00", 1, 1.0)])
    got = {
        r.eid: r.oid
        for r in _asof(left, right, tolerance_sec=2 * 86400).collect()
    }
    assert got == {"e1": 1, "e2": None, "e3": None}


def test_asof_null_keys_never_match(spark):
    left = _left(spark, [("e1", None, "2024-01-01 10:00:00")])
    right = _right(
        spark,
        [
            (None, "2024-01-01 09:00:00", 1, 1.0),
            ("a", "2024-01-01 09:00:00", 2, 2.0),
        ],
    )
    rows = _asof(left, right).collect()
    assert len(rows) == 1 and rows[0].oid is None


def test_asof_plan_has_window_and_no_join(spark):
    left = _left(spark, [("e1", "a", "2024-01-01 10:00:00")])
    right = _right(spark, [("a", "2024-01-01 09:00:00", 1, 1.0)])
    plan = _asof(left, right)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # the whole point: no theta-join
    assert "Window" in plan


def test_asof_hot_key_route_parity(spark):
    """A dominant key crossing ``hot_key_threshold`` is auto-routed
    through time-range splits with a seeded cross-split carry; the
    result must be ROW-IDENTICAL to the single-window formulation —
    including left rows whose split holds no right row (the seed path),
    cold keys riding the normal leg, NULL keys never matching, and
    tolerance expiry evaluated after the pick."""
    lrows = [("h%02d" % i, "hot", f"2024-01-01 10:{i:02d}:30") for i in range(40)]
    lrows += [
        ("c1", "cold", "2024-01-01 10:05:00"),
        ("n1", None, "2024-01-01 10:05:00"),
        ("h99", "hot", "2024-01-01 09:00:00"),  # before any right row
    ]
    # right rows only in the FIRST quarter of the hot key's span: later
    # splits must match via the carried seed, not their own window
    rrows = [("hot", f"2024-01-01 10:0{i}:00", i, float(i)) for i in range(10)]
    rrows += [
        ("hot", "2024-01-01 10:09:00", 99, 9.9),  # tie on ts: oid wins
        ("cold", "2024-01-01 10:00:00", 500, 5.0),
        (None, "2024-01-01 10:00:00", 600, 6.0),
    ]
    left, right = _left(spark, lrows), _right(spark, rrows)
    for kw in ({}, {"tolerance_sec": 600}):
        base = _asof(left, right, hot_key_threshold=None, **kw)
        routed = _asof(
            left, right, hot_key_threshold=10, hot_splits=4, **kw
        )
        key = lambda r: (r["eid"],)
        assert sorted(routed.collect(), key=key) == sorted(
            base.collect(), key=key
        )
    # and the seed path really engaged: a late hot row matched the
    # early right row carried across splits
    routed = _asof(left, right, hot_key_threshold=10, hot_splits=4)
    late = {r.eid: r.oid for r in routed.collect() if r.k == "hot"}
    assert late["h39"] == 99  # ts-tied right rows: greatest tiebreak wins
    assert late["h99"] is None


def _points(spark, rows):
    df = _mk(spark, rows, "pid string, ts string")
    return df.withColumn("ts", df.ts.cast("timestamp"))


def _intervals(spark, rows):
    df = _mk(spark, rows, "wid long, s string, e string")
    return df.withColumn("s", df.s.cast("timestamp")).withColumn(
        "e", df.e.cast("timestamp")
    )


def test_range_join_half_open_bounds(spark):
    iv = _intervals(spark, [(1, "2024-01-01 10:00:00", "2024-01-01 11:00:00")])
    pts = _points(
        spark,
        [
            ("at_start", "2024-01-01 10:00:00"),  # included (>= start)
            ("inside", "2024-01-01 10:30:00"),
            ("at_end", "2024-01-01 11:00:00"),  # excluded (< end)
            ("before", "2024-01-01 09:59:59"),
        ],
    )
    got = {r.pid for r in temporal.range_join(pts, "ts", iv, "s", "e").collect()}
    assert got == {"at_start", "inside"}


def test_range_join_exactly_once_across_buckets(spark):
    # interval spans 3 one-hour buckets; a point matching it must appear
    # exactly once even though the interval exploded to 4 bucket rows
    iv = _intervals(spark, [(1, "2024-01-01 10:30:00", "2024-01-01 13:30:00")])
    pts = _points(spark, [("p", "2024-01-01 12:15:00")])
    rows = temporal.range_join(
        pts, "ts", iv, "s", "e", bucket_width_sec=3600
    ).collect()
    assert len(rows) == 1 and rows[0].wid == 1


def test_range_join_overlapping_intervals_and_extra_keys(spark):
    iv = _mk(
        spark,
        [
            (1, "2024-01-01 10:00:00", "2024-01-01 12:00:00", "us"),
            (2, "2024-01-01 11:00:00", "2024-01-01 13:00:00", "us"),
            (3, "2024-01-01 10:00:00", "2024-01-01 13:00:00", "eu"),
        ],
        "wid long, s string, e string, region string",
    )
    iv = iv.withColumn("s", iv.s.cast("timestamp")).withColumn(
        "e", iv.e.cast("timestamp")
    )
    pts = _mk(
        spark,
        [("p", "2024-01-01 11:30:00", "us")],
        "pid string, ts string, region string",
    )
    pts = pts.withColumn("ts", pts.ts.cast("timestamp"))
    got = sorted(
        r.wid
        for r in temporal.range_join(
            pts, "ts", iv, "s", "e", extra_keys=["region"]
        ).collect()
    )
    assert got == [1, 2]  # both overlapping us windows, never the eu one


def test_range_join_plan_is_equi_join(spark):
    iv = _intervals(spark, [(1, "2024-01-01 10:00:00", "2024-01-01 11:00:00")])
    pts = _points(spark, [("p", "2024-01-01 10:30:00")])
    plan = (
        temporal.range_join(pts, "ts", iv, "s", "e")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_rollup_time_grouping_sets(spark):
    df = _mk(
        spark,
        [
            ("click", "2024-01-01 10:00:00", 1.25),
            ("click", "2024-01-02 10:00:00", 2.50),
            ("view", "2024-01-01 10:00:00", 0.25),
        ],
        "event_type string, ts string, value double",
    )
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    out = temporal.rollup_time(df, "ts", "event_type", "value").collect()
    by = {(r.dim, r.day): r for r in out}
    # 4 grouping sets: 3 (dim,day) + 2 dim + 2 day + 1 total = 8 rows
    assert len(out) == 8
    assert by[("click", "2024-01-01")].value_cents == 125
    assert by[("click", None)].value_cents == 375 and by[("click", None)].gid == 1
    assert by[(None, "2024-01-01")].value_cents == 150 and by[(None, "2024-01-01")].gid == 2
    assert by[(None, None)].value_cents == 400 and by[(None, None)].n == 3


def test_funnel_ordered_semantics(spark):
    """funnel: out-of-order steps don't convert, equal timestamps are
    strict, partial depths count correctly, empty steps yield 0 with
    NULL conversions, and invalid step lists raise."""
    import datetime as dt

    import pytest as _pytest

    from ocsf_validator_spark.pipeline.temporal import funnel

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # u1: full ordered funnel
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2: purchase BEFORE click -> depth 1 (view only) ... view,purchase,click
        (2, t(1), "view"), (2, t(2), "purchase"), (2, t(3), "click"),
        # u3: click at the SAME ts as view -> strict 'after' fails -> depth 1
        (3, t(1), "view"), (3, t(1), "click"),
        # u4: click only, never views -> depth 0
        (4, t(1), "click"), (4, t(2), "purchase"),
        # u5: view then click, no purchase -> depth 2; early clicks ignored
        (5, t(1), "click"), (5, t(2), "view"), (5, t(3), "click"),
        # noise type is filtered out
        (1, t(9), "error"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.step_idx: r for r in funnel(df, ("view", "click", "purchase")).collect()}
    # u1 full; u2's click AFTER the early purchase counts (depth 2) but
    # the out-of-order purchase does not; u3 equal-ts strict -> depth 1;
    # u4 never views -> 0; u5 early click ignored, later click counts
    assert [got[i].users_reached for i in (1, 2, 3)] == [4, 3, 1]
    assert got[1].conv_from_prev is None and got[1].conv_from_first == 1.0
    assert got[2].conv_from_prev == 0.75 and got[3].conv_from_prev == round(1 / 3, 6)
    assert got[3].conv_from_first == 0.25
    # a step nobody reaches: conversions go NULL, count 0
    g2 = {r.step_idx: r for r in funnel(df, ("view", "signup", "purchase")).collect()}
    assert g2[2].users_reached == 0 and g2[3].users_reached == 0
    assert g2[3].conv_from_prev is None
    with _pytest.raises(ValueError):
        funnel(df, ())
    with _pytest.raises(ValueError):
        funnel(df, ("view", "view"))


def test_funnel_single_exchange_no_window(spark):
    """The per-user leg is one partial-collect exchange; no Window and
    no per-step self-join of the big side appear in the plan."""
    import datetime as dt

    from ocsf_validator_spark.pipeline.temporal import _funnel_depths

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "view")],
        "user_id long, ts timestamp, event_type string",
    )
    plan = (
        _funnel_depths(df, ("view", "click"), "user_id", "ts", "event_type")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowExec" not in plan and "Window " not in plan, plan
    # partial collect_list before the exchange (ObjectHashAggregate x2)
    assert plan.count("ObjectHashAggregate") >= 2, plan
    assert plan.count("Exchange") == 1, plan


def test_cohort_retention_matrix(spark):
    """cohort_retention: cohorts keyed by first active period, returns
    counted once per (user, period), offset-0 diagonal = cohort size,
    rates exact; NULL user/ts excluded; single exchange, no window."""
    import datetime as dt

    from ocsf_validator_spark.pipeline.temporal import cohort_retention

    d = lambda day: dt.datetime(2024, 1, 1 + day, 12, 0, 0)
    rows = [
        # cohort 0: u1 active wk0, wk1, wk2; u2 active wk0, wk2 (twice
        # in wk2 -> counted once); u3 wk0 only
        (1, d(0)), (1, d(7)), (1, d(14)),
        (2, d(1)), (2, d(15)), (2, d(16)),
        (3, d(2)),
        # cohort 1: u4 active wk1 then wk3
        (4, d(8)), (4, d(22)),
        # excluded
        (None, d(0)), (5, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_period, r.period_offset): (r.users, r.retention_rate)
        for r in cohort_retention(df).collect()
    }
    assert got == {
        (0, 0): (3, 1.0),
        (0, 1): (1, round(1 / 3, 6)),
        (0, 2): (2, round(2 / 3, 6)),
        (1, 0): (1, 1.0),
        (1, 2): (1, 1.0),
    }
    plan = (
        cohort_retention(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowExec" not in plan and "Window " not in plan, plan


def test_sliding_stats_overlap_and_boundaries(spark):
    """sliding_stats: each row lands in exactly window/slide windows,
    start inclusive / end exclusive at microsecond precision, cents
    sums exact, NULLs excluded."""
    import datetime as dt

    from ocsf_validator_spark.pipeline.temporal import sliding_stats

    rows = [
        # 10:00:00.000000 -> windows starting 09:00..10:00 (4 windows)
        (dt.datetime(2024, 1, 1, 10, 0, 0), 10.0),
        # one microsecond before 11:00 -> windows 10:00..10:45 (end-exclusive
        # means the 10:00 window [10:00,11:00) still holds it)
        (dt.datetime(2024, 1, 1, 10, 59, 59, 999999), 1.0),
        (None, 5.0),
        (dt.datetime(2024, 1, 1, 10, 0, 0), None),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {
        r.win_start: (r.n, r.sum_value) for r in sliding_stats(df).collect()
    }
    # every row appears in exactly 4 windows
    assert sum(n for n, _ in got.values()) == 8
    # the 10:00 window holds both rows
    assert got[dt.datetime(2024, 1, 1, 10, 0, 0)] == (2, 11.0)
    # the 11:45-ending window holds only the late row... i.e. starts 10:45
    assert got[dt.datetime(2024, 1, 1, 10, 45, 0)] == (1, 1.0)
    # earliest window for the 10:00 row starts 09:15 (last one covering it)
    assert got[dt.datetime(2024, 1, 1, 9, 15, 0)] == (1, 10.0)
    assert dt.datetime(2024, 1, 1, 9, 0, 0) not in got  # 10:00 = its end, exclusive
