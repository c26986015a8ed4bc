"""Adversarial-input property tests (hypothesis, fixed deterministic
profiles) for the round-5-continuation operators: URL canonicalization
on arbitrary junk, FIM reassembly on arbitrary unicode (incl. non-BMP),
chat span offsets on emoji-bearing contents, WARC parse never raising.

Strategy note: each test drives ONE Spark job over a hypothesis-built
batch (examples as rows) instead of one job per example — hypothesis
shrinks over the batch content, Spark round-trips stay O(1) per test.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# text including non-BMP (emoji plane) and control chars
ANY_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)
URLISH = st.one_of(
    ANY_TEXT,
    st.builds(
        lambda scheme, host, port, path, q, frag: (
            f"{scheme}://{host}{port}{path}{q}{frag}"
        ),
        st.sampled_from(["http", "HTTPS", "ftp", "ws"]),
        st.from_regex(r"[A-Za-z0-9.\-]{1,20}", fullmatch=True),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.from_regex(r"(/[A-Za-z0-9%._\-]{0,8}){0,3}/?", fullmatch=True),
        st.sampled_from(["", "?a=1&b=2", "?utm_source=x&z=%2F", "?&flag"]),
        st.sampled_from(["", "#f", "#a?b=1"]),
    ),
)


@settings(max_examples=30, deadline=None)
@given(st.lists(URLISH, min_size=1, max_size=40))
def test_canonicalize_url_never_raises_and_idempotent(spark, urls):
    from ballista_spark.operators.url import canonicalize_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = [r.c for r in df.select(canonicalize_url("url").alias("c")).collect()]
    df2 = spark.createDataFrame([(u,) for u in once], "url string")
    twice = [r.c for r in df2.select(canonicalize_url("url").alias("c")).collect()]
    assert twice == once  # idempotent on arbitrary junk, no exceptions


@settings(max_examples=30, deadline=None)
@given(st.lists(ANY_TEXT, min_size=1, max_size=40))
def test_fim_reassembles_arbitrary_unicode(spark, texts):
    from ballista_spark.operators.dataset import fim_split

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in fim_split(df).collect():
        want = texts[r.doc_id]
        got = (r.fim_prefix or "") + (r.fim_middle or "") + (r.fim_suffix or "")
        assert got == want, (r.doc_id, want)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(st.sampled_from(["user", "assistant", "system"]), ANY_TEXT),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_chat_spans_slice_back_arbitrary_contents(spark, convs):
    """JVM length/substr and Python slicing must agree on code points —
    emoji (non-BMP) contents are the trap this pins."""
    from ballista_spark.operators.chat import assistant_spans, render_chat

    rows = [(i, [(r, c) for r, c in msgs]) for i, msgs in enumerate(convs)]
    df = spark.createDataFrame(
        rows, "doc_id long, messages array<struct<role string, content string>>"
    )
    out = df.select(
        "doc_id",
        render_chat("messages").alias("t"),
        assistant_spans("messages").alias("spans"),
    ).collect()
    for r in out:
        msgs = convs[r.doc_id]
        contents = [c for role, c in msgs if role == "assistant"]
        assert len(r.spans) == len(contents)
        for s, want in zip(r.spans, contents):
            assert r.t[s.start : s.end] == want


@settings(max_examples=30, deadline=None)
@given(st.binary(max_size=400))
def test_warc_parse_never_raises(data):
    """parse_warc_bytes on arbitrary bytes: returns, never throws; any
    records it does emit carry payloads sliced from the input."""
    from ballista_spark.sources.warc import parse_warc_bytes

    recs, errors = parse_warc_bytes(data)
    assert errors >= 0
    for r in recs:
        assert isinstance(r["payload"], bytes)


@settings(max_examples=30, deadline=None)
@given(st.lists(ANY_TEXT, min_size=2, max_size=30))
def test_char_ngram_features_match_mirror_arbitrary_unicode(spark, texts):
    """Hashed char-n-gram features equal the Python mirror on arbitrary
    unicode — pins JVM vs Python code-point semantics for substr/length
    (and therefore the langid training features)."""
    from ballista_spark.operators.classify import char_ngram_features
    from tests.test_classify import py_features

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in char_ngram_features(df, n_features=2**10, ngrams=(1, 2)).collect():
        got.setdefault(r.key, {})[r.bucket] = r.x
    for i, t in rows:
        want = py_features(t, 2**10, (1, 2))
        assert set(got.get(i, {})) == set(want), (i, t)
