"""JVM-free property tests (hypothesis) for pure-python laws that back
distributed operators: Drain's seq_dist/merge algebra and the snapshot
manifest codecs. These run without a Spark session, so they exercise
edge spaces (unicode, extreme values) far denser than the Spark suites."""

import datetime as dt
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from hypertrace_ingester_spark.operators.drain import (
    WILDCARD, merge_template, seq_dist)
from hypertrace_ingester_spark.sources.snapshots import (
    _schema_key, _stats_decode, _stats_encode)

token = st.text(
    alphabet=st.characters(blacklist_characters=" ", blacklist_categories=("Cs",)),
    min_size=1, max_size=6)
tokens = st.lists(token, min_size=1, max_size=8)


@settings(max_examples=200)
@given(tokens, tokens)
def test_merge_template_laws(a, b):
    n = min(len(a), len(b))
    m = merge_template(a[:n], b[:n])
    # positional: kept token equals both sides; wildcard only on disagreement
    for x, y, z in zip(m, a, b):
        if x != WILDCARD:
            assert x == y == z
        else:
            assert y != z or y == WILDCARD
    # idempotent + commutative
    assert merge_template(m, m) == m
    assert merge_template(a[:n], b[:n]) == merge_template(b[:n], a[:n]) or \
        any(x == WILDCARD for x in a[:n] + b[:n])


@settings(max_examples=200)
@given(tokens)
def test_seq_dist_laws(a):
    # self-similarity is 1 minus the wildcard fraction
    s, p = seq_dist(a, a)
    n_wild = sum(1 for t in a if t == WILDCARD)
    assert abs(s - (len(a) - n_wild) / len(a)) < 1e-12
    assert p == n_wild
    # similarity never exceeds 1 and param counts template wildcards
    s2, p2 = seq_dist([WILDCARD] * len(a), a)
    assert s2 == 0.0 and p2 == len(a)


@settings(max_examples=200)
@given(st.one_of(
    st.integers(min_value=-2**62, max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
    st.booleans(),
    st.datetimes(min_value=dt.datetime(1970, 1, 1),
                 max_value=dt.datetime(2200, 1, 1)),
    st.dates(),
))
def test_stats_codec_roundtrip_preserves_order(v):
    enc = _stats_encode(v)
    assert enc is not None
    # JSON-safe
    back = _stats_decode(json.loads(json.dumps(enc)))
    assert back == v
    assert type(back) is type(v) or isinstance(v, bool)


def test_stats_codec_rejects_unorderable():
    assert _stats_encode(b"\x00\x01") is None
    import decimal
    assert _stats_encode(decimal.Decimal("1.5")) is None


@settings(max_examples=100)
@given(st.lists(st.tuples(st.text(min_size=1, max_size=8),
                          st.sampled_from(["long", "string", "double"])),
                min_size=1, max_size=5, unique_by=lambda t: t[0]))
def test_schema_key_ignores_nullability(fields):
    def schema_json(nullable):
        return json.dumps({
            "type": "struct",
            "fields": [{"name": n, "type": t, "nullable": nullable,
                        "metadata": {}} for n, t in fields],
        })
    assert _schema_key(schema_json(True)) == _schema_key(schema_json(False))
    # a type change IS a difference
    if fields[0][1] != "string":
        changed = [(fields[0][0], "string")] + fields[1:]
        cj = json.dumps({
            "type": "struct",
            "fields": [{"name": n, "type": t, "nullable": True,
                        "metadata": {}} for n, t in changed],
        })
        assert _schema_key(schema_json(True)) != _schema_key(cj)
