"""FunctionalDependency constraint kind (violations.fd_violations):
determinants -> dependent consistency — the metadata-consistency check
(one source, one language) that no row predicate can express and that
must not break the conversation-window fusion for the rest of the
suite. Pins the NULL algebra (NULL is a value of the dependent, a NULL
determinant is its own group, all-NULL groups pass), the canonical
first-seen analogue (minimum non-null), where-scoping, the suite-as-data
round trip, the unresolvable-column finding, and the at-scale plan
contract (pruned exchange — the table's wide body never shuffles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocsf_validator_spark.inherit import resolve
from ocsf_validator_spark.spec import (
    ConstraintSet,
    FunctionalDependency,
    Severity,
    transcript_suite,
)
from ocsf_validator_spark.verdict import verdicts
from ocsf_validator_spark.violations import all_violations, fd_violations


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            ("c1", 0, "web", "en", "long text body c1-0"),
            ("c1", 1, "web", "fr", "long text body c1-1"),
            ("c2", 0, "web", "en", "long text body c2-0"),
            ("c2", 1, "wiki", "de", "long text body c2-1"),
            ("c3", 0, "wiki", "de", "long text body c3-0"),
            ("c3", 1, None, "xx", "long text body c3-1"),
            ("c4", 0, None, "yy", "long text body c4-0"),
            ("c5", 0, "books", None, "long text body c5-0"),
            ("c5", 1, "books", "pt", "long text body c5-1"),
            ("c6", 0, "allnull", None, "long text body c6-0"),
            ("c6", 1, "allnull", None, "long text body c6-1"),
        ],
        "conv_id string, turn_idx int, source string, lang string, text string",
    )


FD = FunctionalDependency(column="lang", determinants=("source",))


def test_fd_semantics_null_algebra(docs):
    got = {
        (r.conv_id, r.turn_idx): r.reason
        for r in fd_violations(docs, ConstraintSet("t").add(FD)).collect()
    }
    # web -> {en, fr}: canon=en, the fr row violates
    assert got[("c1", 1)] == (
        "fd (source=(web)) -> lang: found fr; expected en; 2 values"
    )
    # NULL determinant is its own group: {xx, yy}, canon=xx, yy violates
    assert got[("c4", 0)] == (
        "fd (source=(<null>)) -> lang: found yy; expected xx; 2 values"
    )
    # NULL dependent is a value: {NULL, pt} violates, canon=pt
    assert got[("c5", 0)] == (
        "fd (source=(books)) -> lang: found <null>; expected pt; 2 values"
    )
    # single-value groups (wiki) and all-NULL groups pass
    assert set(got) == {("c1", 1), ("c4", 0), ("c5", 0)}


def test_fd_where_scope_and_multi_determinant(docs):
    c = FunctionalDependency(
        column="lang",
        determinants=("source", "conv_id"),
        where="turn_idx >= 0",
        severity=Severity.WARNING,
        id_override="fd.multi",
    )
    rows = fd_violations(docs, ConstraintSet("t").add(c)).collect()
    assert sorted((r.conv_id, r.turn_idx) for r in rows) == [
        ("c1", 1),
        ("c5", 0),
    ]
    assert all(
        r.severity == "WARNING" and r.constraint_id == "fd.multi"
        for r in rows
    )
    # where excluding the offending rows silences the check
    c2 = FunctionalDependency(
        column="lang", determinants=("source",), where="turn_idx = 0"
    )
    assert (
        fd_violations(docs, ConstraintSet("t").add(c2))
        .filter(F.col("conv_id") == "c1")
        .count()
        == 0
    )


def test_fd_registry_round_trip(docs):
    """Suite-as-data: fd serializes to the --suite-json registry format
    and resolves back to the identical violation set."""
    from ocsf_validator_spark.spec import suite_to_registry

    suite = ConstraintSet("fdsuite").add(FD)
    reg = suite_to_registry(suite)
    spec = reg["fdsuite"]["constraints"]["fd.source->lang"]
    assert spec["kind"] == "fd" and spec["determinants"] == ["source"]
    rebuilt = resolve(reg, "fdsuite")
    a = sorted(map(tuple, fd_violations(docs, suite).collect()))
    b = sorted(map(tuple, fd_violations(docs, rebuilt).collect()))
    assert a == b and len(a) == 3


def test_fd_unresolvable_column_is_reported_not_silent(docs):
    c = FunctionalDependency(column="nope", determinants=("source",))
    out = all_violations(docs, ConstraintSet("t").add(c)).collect()
    assert len(out) == 1
    assert out[0].constraint_id == c.constraint_id
    assert "do not resolve" in out[0].reason and out[0].conv_id is None


def test_fd_rides_alongside_fused_suite_without_breaking_fusion(spark):
    """An FD in the transcript suite must not knock the conv-window
    family off the fused single-scan plan: the fused group checks stay
    present and FD violations appear as their own leg."""
    from ocsf_validator_spark.synth import synth_transcripts

    df = synth_transcripts(spark, n_turns=4000, seed=11).withColumn(
        "src", F.concat(F.lit("s"), (F.crc32(F.col("conv_id")) % 3).cast("string"))
    ).withColumn(
        # plant: one conversation's lang tag differs within its src group
        "tag",
        F.when(
            (F.crc32(F.col("conv_id")) % 5) == 0, F.lit("odd")
        ).otherwise(F.lit("even")),
    )
    suite = transcript_suite().add(
        FunctionalDependency(column="tag", determinants=("src",))
    )
    v = all_violations(df, suite)
    base = all_violations(df, transcript_suite())
    fd_rows = v.filter(F.col("constraint_id") == "fd.src->tag")
    # the fd leg found the planted inconsistency and the rest of the
    # suite is unchanged row-for-row
    assert fd_rows.count() > 0
    rest = v.filter(F.col("constraint_id") != "fd.src->tag")
    assert sorted(map(tuple, rest.collect())) == sorted(
        map(tuple, base.collect())
    )
    # verdict grid includes the fd constraint
    vd = verdicts(df, v, suite)
    assert vd.filter(F.col("constraint_id") == "fd.src->tag").count() > 0


def test_fd_plan_prunes_wide_body_and_partial_aggs(docs, tmp_path):
    """At-scale contract: the scan prunes to (keys, determinants,
    dependent) — the wide text body never leaves the parquet reader,
    so no exchange can carry it — and the distinct-group count is the
    two-phase partial (map-side combined) aggregate."""
    p = str(tmp_path / "docs.parquet")
    docs.write.parquet(p)
    plan = (
        fd_violations(
            docs.sparkSession.read.parquet(p), ConstraintSet("t").add(FD)
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "text" not in line
    assert "text" not in plan.split("FileScan")[1].split("\n")[0]
    assert "partial" in plan.lower()


def test_closing_role_semantics(spark):
    from ocsf_validator_spark.spec import ClosingRole

    df = spark.createDataFrame(
        [
            ("c1", 0, "user"), ("c1", 1, "assistant"),   # closes ok
            ("c2", 0, "user"),                            # dangling user
            ("c3", 0, "user"), ("c3", 1, None),           # NULL closer
            ("c4", 0, "assistant"), ("c4", 1, "tool"),    # tool dangling
        ],
        "conv_id string, turn_idx int, role string",
    )
    suite = ConstraintSet("cl").add(
        ClosingRole(column="role", allowed=("assistant",))
    )
    got = {r.conv_id: r for r in fd_violations(df, suite).collect()}
    assert set(got) == {"c2", "c3", "c4"}
    assert got[("c2")].turn_idx == 0
    assert "role=user" in got["c2"].reason
    assert "role=<null>" in got["c3"].reason and got["c3"].turn_idx == 1
    assert "role=tool" in got["c4"].reason
    # where-scoping: ignore tool turns when judging the closer
    scoped = ConstraintSet("cl2").add(
        ClosingRole(column="role", allowed=("assistant",),
                    where="role IS DISTINCT FROM 'tool'")
    )
    got2 = {r.conv_id for r in fd_violations(df, scoped).collect()}
    assert "c4" not in got2 and got2 == {"c2", "c3"}


def test_closing_role_never_breaks_fusion(spark):
    """Adding a ClosingRole must leave the base suite's violations
    row-for-row identical (it is a KEY_LEVEL leg, not a window kind)."""
    from ocsf_validator_spark.spec import ClosingRole
    from ocsf_validator_spark.synth import synth_transcripts

    df = synth_transcripts(spark, n_turns=3000, seed=5)
    base = all_violations(df, transcript_suite())
    plus = all_violations(
        df,
        transcript_suite().add(
            ClosingRole(column="role", allowed=("user", "assistant", "tool"))
        ),
    )
    rest = plus.filter(F.col("constraint_id") != "closing.role")
    assert sorted(map(tuple, rest.collect())) == sorted(
        map(tuple, base.collect())
    )
