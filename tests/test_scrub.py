"""PII scrubbing (pipeline/scrub.py): counts on original text, chained
redaction, engine parity via a Python ``re`` replay (the patterns are
restricted to the subset where Java regex, RE2, and Python re agree —
that restriction IS the contract this file pins).
"""

from __future__ import annotations

import re

from ocsf_validator_spark.pipeline.scrub import PII_PATTERNS, pii_scrub


def naive_scrub(text):
    if text is None:
        return (0, 0, 0, None)
    counts = [len(re.findall(pat, text)) for _, pat, _ in PII_PATTERNS]
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = re.sub(pat, repl, out)
    return (*counts, out)


FIXTURES = [
    "plain text with no pii at all",
    "mail me at alice.smith+spam@example.co.uk today",
    "two mails a@b.io and c_d%e@sub.domain.org here",
    "server at 10.0.255.3 and backup 192.168.1.1",
    "call +1 555-867-5309 or +44 20 7946 0958 now",
    # email whose domain is a literal IP: counts as BOTH email and ipv4
    # (counts are on the original text); redaction eats it as an email
    "root@1.2.3.4 logged in from 1.2.3.4",
    # dotted version string is NOT an ipv4 (5 octets break the \\b form)
    # -- the first four octets still match, pinned by the replay
    "release 1.2.3.4.5 shipped",
    # bare long number without + is not a phone
    "order 123456789012 confirmed",
    "",
    None,
]


def test_scrub_matches_python_replay(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(FIXTURES)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_email, r.n_ipv4, r.n_phone, r.text_scrubbed)
        for r in pii_scrub(df).collect()
    }
    assert got == {i: naive_scrub(t) for i, t in enumerate(FIXTURES)}


def test_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [(0, "bob@x.io from 8.8.8.8 dial +1 800-555-0100 end")],
        "doc_id long, text string",
    )
    r = pii_scrub(df).collect()[0]
    assert (r.n_email, r.n_ipv4, r.n_phone) == (1, 1, 1)
    assert r.text_scrubbed == "<EMAIL> from <IP> dial <PHONE> end"


def test_scrub_placeholders_never_cascade(spark):
    # an earlier replacement must not create a later match: placeholder
    # text contains no digits, dots, or '@'
    df = spark.createDataFrame(
        [
            (0, "u@x.io and +12 3456 7890"),
            # numeric-only domain is NOT an email (TLD must be alpha);
            # the embedded IP still redacts
            (1, "u@9.9.9.9 and +12 3456 7890"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text_scrubbed for r in pii_scrub(df).collect()}
    assert got == {0: "<EMAIL> and <PHONE>", 1: "u@<IP> and <PHONE>"}


def test_scrub_plan_is_scan_speed(spark):
    df = spark.createDataFrame(
        [(0, "x")], "doc_id long, text string"
    )
    plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_normalize_docs_canonicalization(spark):
    """normalize_docs: controls -> space, runs collapse, trim, lower;
    idempotent; normalization unifies content keys that raw keys split;
    NULL text passes through; plan is zero-Exchange."""
    from ocsf_validator_spark.pipeline.scrub import normalize_docs

    rows = [
        (1, "Hello  World"),
        (2, "hello world"),
        (3, "\thello\x00 world  "),
        (4, None),
        (5, "already clean"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in normalize_docs(df).collect()}
    assert out[1].text_norm == "hello world" and out[1].changed
    assert out[2].text_norm == "hello world" and not out[2].changed
    assert out[3].text_norm == "hello world" and out[3].changed
    # three spellings collapse to ONE normalized key, raw keys differ
    assert out[1].key_norm == out[2].key_norm == out[3].key_norm
    assert len({out[i].key_raw for i in (1, 2, 3)}) == 3
    assert out[4].text_norm is None and not out[4].changed
    assert out[4].key_raw is None and out[4].key_norm is None
    assert not out[5].changed
    # idempotent: normalizing the normalized text changes nothing
    again = normalize_docs(
        spark.createDataFrame(
            [(1, out[1].text_norm)], "doc_id long, text string"
        )
    ).collect()[0]
    assert not again.changed and again.text_norm == out[1].text_norm
    plan = normalize_docs(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
