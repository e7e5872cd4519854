"""Suite-inheritance tests — 1:1 with reference tests/test_dependencies.py
scenarios (include single/list, extends, profiles, dictionary enrichment,
missing target, self-inheritance), FIXTURES.md scenario 11.

Pure driver-side: no SparkSession needed."""

from __future__ import annotations

import pytest

from ocsf_validator_spark.inherit import (
    SelfInheritanceError,
    SuiteResolutionError,
    deep_merge,
    resolve,
)
from ocsf_validator_spark.spec import InEnum, MaxLen, NotNull, Severity


def test_deep_merge_existing_keys_win():
    # reference processor.py:19-40 — subject keys win, dicts recurse
    subj = {"a": 1, "d": {"x": 1}}
    deep_merge(subj, {"a": 2, "b": 3, "d": {"x": 9, "y": 2}})
    assert subj == {"a": 1, "b": 3, "d": {"x": 1, "y": 2}}


def test_deep_merge_exclude():
    subj = {"a": 1}
    deep_merge(subj, {"b": 2, "c": 3}, exclude=["c"])
    assert subj == {"a": 1, "b": 2}


BASE = {
    "constraints": {
        "required.role": {"kind": "required", "column": "role", "severity": "ERROR"},
        "max_len.text": {"kind": "max_len", "column": "text", "max_len": 1000},
    }
}


def test_extends_child_wins():
    # reference tests/test_dependencies.py:110-125 — extends merges the
    # parent, child keys win
    registry = {
        "base": BASE,
        "child": {
            "extends": "base",
            "constraints": {
                "max_len.text": {"kind": "max_len", "column": "text", "max_len": 50},
                "ref.role": {"kind": "ref", "column": "role", "values": ["user"]},
            },
        },
    }
    cs = resolve(registry, "child")
    by_id = cs.by_id()
    assert set(by_id) == {"required.role", "max_len.text", "ref.role"}
    assert by_id["max_len.text"].max_len == 50  # child wins
    assert isinstance(by_id["required.role"], NotNull)  # inherited


def test_include_list():
    # reference tests/test_dependencies.py:25-91 — $include single + list
    registry = {
        "frag1": {"constraints": {"a.x": {"kind": "required", "column": "x"}}},
        "frag2": {"constraints": {"b.y": {"kind": "required", "column": "y"}}},
        "main": {
            "include": ["frag1", "frag2"],
            "constraints": {"a.x": {"kind": "required", "column": "x", "severity": "FATAL"}},
        },
    }
    cs = resolve(registry, "main")
    by_id = cs.by_id()
    assert set(by_id) == {"a.x", "b.y"}
    assert by_id["a.x"].severity == Severity.FATAL  # subject wins over include


def test_profiles_multi_mixin():
    # reference tests/test_dependencies.py:128-197 — multi-target mixins
    registry = {
        "p1": {"constraints": {"c1": {"kind": "required", "column": "a"}}},
        "p2": {"constraints": {"c2": {"kind": "required", "column": "b"}}},
        "main": {"profiles": ["p1", "p2"], "constraints": {}},
    }
    cs = resolve(registry, "main")
    assert set(cs.by_id()) == {"c1", "c2"}


def test_redundant_profile_include_warns():
    # reference processor.py:482-485
    registry = {
        "p": {"constraints": {"c": {"kind": "required", "column": "a"}}},
        "main": {"include": ["p"], "profiles": ["p"], "constraints": {}},
    }
    warnings: list[str] = []
    cs = resolve(registry, "main", warnings=warnings)
    assert set(cs.by_id()) == {"c"}
    assert warnings and "redundant" in warnings[0]


def test_dictionary_enrichment():
    # reference tests/test_dependencies.py:200-222 — record values win,
    # unlisted dictionary attrs NOT pulled in, missing fields backfilled
    registry = {
        "main": {
            "dictionary": {
                "role": {"values": ["user", "assistant"]},
                "text": {"max_len": 4096},
                "unused_col": {"values": ["z"]},  # must NOT create a constraint
            },
            "constraints": {
                "ref.role": {"kind": "ref", "column": "role"},  # backfilled
                "max_len.text": {"kind": "max_len", "column": "text", "max_len": 99},
            },
        }
    }
    cs = resolve(registry, "main")
    by_id = cs.by_id()
    assert set(by_id) == {"ref.role", "max_len.text"}
    assert isinstance(by_id["ref.role"], InEnum)
    assert by_id["ref.role"].values == ("user", "assistant")  # backfilled
    assert by_id["max_len.text"].max_len == 99  # record wins over dictionary


def test_missing_target_raises():
    # reference tests/test_dependencies.py:94-107
    registry = {"main": {"extends": "ghost", "constraints": {}}}
    with pytest.raises(SuiteResolutionError, match="ghost"):
        resolve(registry, "main")


def test_self_extends_raises():
    # reference processor.py:481
    registry = {"main": {"extends": "main", "constraints": {}}}
    with pytest.raises(SelfInheritanceError):
        resolve(registry, "main")


def test_cycle_raises():
    registry = {
        "a": {"extends": "b", "constraints": {}},
        "b": {"extends": "a", "constraints": {}},
    }
    with pytest.raises(SelfInheritanceError):
        resolve(registry, "a")


def test_check_only_dry_run():
    # reference update=False dry-run (processor.py:446-451) used as the
    # include-targets validator (validators.py:161-166)
    registry = {
        "base": BASE,
        "child": {"extends": "base", "constraints": {}},
    }
    assert resolve(registry, "child", check_only=True) is None
    bad = {"child": {"extends": "ghost", "constraints": {}}}
    with pytest.raises(SuiteResolutionError):
        resolve(bad, "child", check_only=True)


def test_grandparent_chain():
    registry = {
        "a": BASE,
        "b": {"extends": "a", "constraints": {"bb": {"kind": "required", "column": "b"}}},
        "c": {"extends": "b", "constraints": {"cc": {"kind": "required", "column": "c"}}},
    }
    cs = resolve(registry, "c")
    assert set(cs.by_id()) == {"required.role", "max_len.text", "bb", "cc"}


def test_unknown_kind_raises():
    registry = {"m": {"constraints": {"x": {"kind": "nope", "column": "a"}}}}
    with pytest.raises(SuiteResolutionError, match="unknown kind"):
        resolve(registry, "m")


def test_imprecise_base_resolution_info_tier():
    """Reference resolve_imprecise_base (processor.py:162-192): an
    extends target that misses at its exact name but resolves via its
    basename (or a unique namespaced key) resolves WITH an INFO warning;
    ambiguous or truly missing targets still error."""
    from ocsf_validator_spark.inherit import SuiteResolutionError, resolve

    registry = {
        "base": {"constraints": {"required.a": {"kind": "required", "column": "a"}}},
        "ns/mix": {"constraints": {"max_len.a": {"kind": "max_len", "column": "a", "max_len": 5}}},
        "child": {
            "extends": "ext/base",     # imprecise: basename exists
            "profiles": ["mix"],        # imprecise: unique ns/ key exists
            "constraints": {"required.b": {"kind": "required", "column": "b"}},
        },
    }
    warnings: list[str] = []
    cs = resolve(registry, "child", warnings=warnings)
    assert set(cs.by_id()) == {"required.a", "required.b", "max_len.a"}
    assert sum("INFO" in w and "imprecise" in w for w in warnings) == 2

    missing = dict(registry)
    missing["child"] = {**registry["child"], "extends": "nowhere/at/all"}
    import pytest as _pytest

    with _pytest.raises(SuiteResolutionError):
        resolve(missing, "child")


def test_suite_registry_round_trip():
    """An in-code suite exports to the SAME registry format
    --suite-json consumes (spec.suite_to_registry -> inherit.resolve),
    field-exact for every file-serializable kind, including the
    round-5 ones (alternation/check/metric/precedence/opening/glob)."""
    import dataclasses

    from ocsf_validator_spark.spec import (
        Alternation,
        Check,
        Glob,
        MetricBound,
        OpeningRole,
        Precedence,
        suite_to_registry,
        transcript_suite,
    )

    s = transcript_suite()
    s.add(
        Alternation(column="role", scope=("user", "assistant")),
        Check(
            column="pairing",
            predicate="NOT (role = 'tool' AND tool = 'none')",
            id_override="check.pairing",
        ),
        MetricBound(column="role", metric="null_rate", hi=0.001),
        Precedence(column="role", trigger="tool", prereq=("assistant",)),
        OpeningRole(column="role", allowed=("system", "user")),
        Glob(column="conv_id", glob="c*"),
    )
    s2 = resolve(suite_to_registry(s), s.name)
    assert [c.constraint_id for c in s.constraints] == [
        c.constraint_id for c in s2.constraints
    ]
    for a, b in zip(s.constraints, s2.constraints):
        fa = {
            f.name: getattr(a, f.name)
            for f in dataclasses.fields(a)
            if f.name != "id_override"
        }
        fb = {
            f.name: getattr(b, f.name)
            for f in dataclasses.fields(b)
            if f.name != "id_override"
        }
        assert type(a) is type(b) and fa == fb


def test_suite_export_rejects_code_carrying_constraints():
    import pytest as _pytest

    from ocsf_validator_spark.spec import (
        ConstraintSet,
        PandasCheck,
        suite_to_registry,
    )

    s = ConstraintSet(
        name="t",
        constraints=[PandasCheck(column="x", columns=("x",), check=len)],
    )
    with _pytest.raises(TypeError, match="not file-serializable"):
        suite_to_registry(s)


def test_runner_dump_suite_reloads_identically(spark, tmp_path):
    """--dump-suite writes a file --suite-json reloads to the same
    verdict grid: CLI-added constraints survive the round trip."""
    import json

    from ocsf_validator_spark.runner import main

    dump = str(tmp_path / "suite.json")
    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    base = ["--synth", "20000", "--buckets", "4"]
    rc1 = main(
        [
            *base,
            "--alternation", "role=assistant",
            "--metric-bound", "conv_id:distinct_count,min=1",
            "--dump-suite", dump,
            "--verdicts-out", v1,
        ]
    )
    reg = json.load(open(dump))
    name = next(iter(reg))
    assert "alternation.role" in reg[name]["constraints"]
    assert "metric.distinct_count.conv_id" in reg[name]["constraints"]
    rc2 = main(
        [
            *base,
            "--suite-json", dump,
            "--suite-name", name,
            "--verdicts-out", v2,
        ]
    )
    assert rc1 == rc2
    g1 = {
        (r.constraint_id, r.pass_)
        if hasattr(r, "pass_")
        else (r.constraint_id, r["pass"])
        for r in spark.read.parquet(v1).collect()
    }
    g2 = {
        (r.constraint_id, r["pass"])
        for r in spark.read.parquet(v2).collect()
    }
    g1 = {(cid, p) for cid, p in g1}
    assert g1 == g2
