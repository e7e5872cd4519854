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
