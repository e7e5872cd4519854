"""Property-based checks (hypothesis) for the two operators whose
correctness rests on rank/prefix arithmetic rather than per-row
algebra: exact quantiles (histogram narrowing == naive sort) and
sequence packing (two-phase prefix == naive cumsum), plus conservation
invariants for boilerplate stripping.

Examples are kept small and few — each example is a Spark job — but
hypothesis explores the shapes hand fixtures miss: duplicate-heavy
lists, near-equal floats at bin edges, adversarial token counts.
"""

from __future__ import annotations

import math

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocsf_validator_spark.pipeline.boilerplate import strip_boilerplate
from ocsf_validator_spark.pipeline.packing import pack_sequences
from ocsf_validator_spark.pipeline.quantiles import exact_quantiles

QS = (0.1, 0.5, 0.9)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    vals=st.lists(
        st.one_of(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
            st.sampled_from([0.0, 1.0, -1.0, 42.5]),  # force heavy ties
        ),
        min_size=1,
        max_size=120,
    ),
    n_bins=st.sampled_from([2, 7, 64]),
)
@settings(**_SETTINGS)
def test_quantiles_equal_naive(spark, vals, n_bins):
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = {
        r["q"]: r["value"]
        for r in exact_quantiles(df, "value", qs=QS, n_bins=n_bins).collect()
    }
    vs = sorted(vals)
    want = {q: vs[int(math.floor((len(vs) - 1) * q))] for q in QS}
    assert got == want


@given(
    toks=st.lists(st.integers(min_value=-3, max_value=400), min_size=0, max_size=80),
    max_tokens=st.sampled_from([1, 16, 128]),
    parts=st.sampled_from([1, 5]),
)
@settings(**_SETTINGS)
def test_packing_equals_naive(spark, toks, max_tokens, parts):
    rows = [(i, n) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"], r["spans_packs"])
        for r in pack_sequences(
            df, max_tokens, num_partitions=parts
        ).collect()
    }
    want, start = {}, 0
    for i, n in rows:
        if n <= 0:
            continue
        want[i] = (
            start // max_tokens,
            start % max_tokens,
            (start + n - 1) // max_tokens - start // max_tokens + 1,
        )
        start += n
    assert got == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "footer", "x1", "x2"]),
            min_size=1,
            max_size=12,
        ),
        min_size=2,
        max_size=10,
    ),
    frac=st.sampled_from([0.3, 0.6, 1.01]),
)
@settings(**_SETTINGS)
def test_strip_conserves_tokens(spark, docs, frac):
    """kept + removed == original token count for every doc; a
    threshold above 1.0 strips nothing; output never drops rows."""
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in strip_boilerplate(
        df, n=2, min_doc_frac=frac
    ).collect()}
    assert len(out) == len(rows)
    for i, words in enumerate(docs):
        r = out[i]
        kept = r["text_clean"].split(" ") if r["text_clean"] else []
        assert len(kept) + r["n_removed"] == len(words)
        # kept tokens appear in original order as a subsequence
        it = iter(words)
        assert all(any(w == k for w in it) for k in kept)
        if frac > 1.0:
            assert r["text_clean"] == " ".join(words)


# ---------------------------------------------------------------------------
# mad_outliers / weighted_sample_topk / pii_scrub — round-5 additions
# ---------------------------------------------------------------------------

import re

from ocsf_validator_spark.pipeline.quantiles import mad_outliers
from ocsf_validator_spark.pipeline.scrub import PII_PATTERNS, pii_scrub
from ocsf_validator_spark.pipeline.select import weighted_sample_topk


@given(
    vals=st.lists(
        st.one_of(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
            st.sampled_from([5.0, 5.0, -3.25]),  # tie mass
        ),
        min_size=1,
        max_size=100,
    ),
    k=st.sampled_from([1, 3]),
)
@settings(**_SETTINGS)
def test_mad_equal_naive(spark, vals, k):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id int, value double"
    )
    got = {
        (r.id, r.value, r.median, r.mad, r.lo, r.hi)
        for r in mad_outliers(df, "value", id_cols=("id",), k=k, n_bins=16).collect()
    }
    vs = sorted(vals)
    med = vs[(len(vs) - 1) // 2]
    devs = sorted(abs(v - med) for v in vs)
    mad = devs[(len(devs) - 1) // 2]
    lo, hi = med - k * mad, med + k * mad
    want = {
        (i, v, med, mad, lo, hi)
        for i, v in enumerate(vals)
        if v < lo or v > hi
    }
    assert got == want


@given(
    weights=st.lists(
        st.floats(min_value=0.01, max_value=1e4, allow_nan=False),
        min_size=1,
        max_size=60,
    ),
    k=st.sampled_from([1, 5, 100]),
)
@settings(**_SETTINGS)
def test_weighted_sample_equal_replay(spark, weights, k):
    import hashlib

    rows = [(f"d{i}", w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id string, w double")
    got = [
        (r.doc_id, r.weight, r.sample_key)
        for r in weighted_sample_topk(df, "w", k, id_col="doc_id").collect()
    ]
    keyed = []
    for i, w in rows:
        h = int(hashlib.md5(f"{i}|ws0".encode()).hexdigest()[:15], 16)
        keyed.append(
            (round(-math.log((h + 1) / 1152921504606846977.0) / w, 6), i, w)
        )
    keyed.sort(key=lambda t: (t[0], t[1]))
    assert got == [(i, w, key) for key, i, w in keyed[:k]]


_TEXT_ALPHA = st.lists(
    st.sampled_from(
        list("abz09._%+-@ ")
        + ["@example.com", "10.0.0.1", "+1 555-123-4567", "u@x.io"]
    ),
    min_size=0,
    max_size=12,
).map("".join)


@given(texts=st.lists(_TEXT_ALPHA, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_scrub_equal_python_re(spark, texts):
    # the fragment alphabet splices PII-shaped tokens into random noise,
    # hitting partial/adjacent matches hand fixtures don't
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_email, r.n_ipv4, r.n_phone, r.text_scrubbed)
        for r in pii_scrub(df).collect()
    }
    for i, t in enumerate(texts):
        counts = [len(re.findall(p, t)) for _, p, _ in PII_PATTERNS]
        out = t
        for _, p, repl in PII_PATTERNS:
            out = re.sub(p, repl, out)
        assert got[i] == (*counts, out), repr(t)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1", "s2", None]),   # determinant
            st.sampled_from(["a", "b", "c", None]),      # dependent
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_fd_matches_pure_python_reference(spark, rows):
    """fd_violations == the naive per-group reference for every mix of
    NULL determinants, NULL dependents, and all-NULL groups."""
    from ocsf_validator_spark.spec import ConstraintSet, FunctionalDependency
    from ocsf_validator_spark.violations import fd_violations

    data = [(f"c{i}", 0, d, v) for i, (d, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, det string, dep string"
    )
    got = {
        r.conv_id
        for r in fd_violations(
            df,
            ConstraintSet("t").add(
                FunctionalDependency(column="dep", determinants=("det",))
            ),
        ).collect()
    }
    # naive reference: group rows by det (None its own group); canonical
    # = min non-null dep; every row whose dep differs violates
    groups: dict = {}
    for cid, _, d, v in data:
        groups.setdefault(d, []).append((cid, v))
    want = set()
    for members in groups.values():
        vals = [v for _, v in members if v is not None]
        if not vals:
            continue
        canon = min(vals)
        for cid, v in members:
            if v != canon:
                want.add(cid)
    assert got == want
