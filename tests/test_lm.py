"""N-gram LM perplexity filter: exact stupid-backoff scores vs a Python
mirror, clean-vs-garbage perplexity ranking, plan gates."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.lm import (
    ngram_lm_fit,
    ngram_lm_score,
    perplexity_filter,
)

TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog sat together",
    "the cat and the dog ran home",
]


def _mirror_scores(train, test, n=3, alpha=0.4):
    """Reference stupid-backoff implementation, plain Python."""
    counts = Counter()
    total = 0
    for t in train:
        toks = t.split()
        total += len(toks)
        for i in range(1, len(toks) + 1):
            for k in range(1, min(n, i) + 1):
                counts[(k, " ".join(toks[i - k : i]))] += 1
    oov = -math.log(total + 1.0)

    def logp(k, gram):
        if (k, gram) not in counts:
            return None
        if k == 1:
            return math.log(counts[(1, gram)] / total)
        ctx = " ".join(gram.split()[: k - 1])
        return math.log(counts[(k, gram)] / counts[(k - 1, ctx)])

    out = {}
    for doc_id, t in test:
        toks = t.split()
        if not toks:
            continue
        lps = []
        for i in range(1, len(toks) + 1):
            k_max = min(n, i)
            lp = None
            for k in range(k_max, 0, -1):
                p = logp(k, " ".join(toks[i - k : i]))
                if p is not None:
                    lp = (k_max - k) * math.log(alpha) + p
                    break
            if lp is None:
                lp = (k_max - 1) * math.log(alpha) + oov
            lps.append(lp)
        avg = sum(lps) / len(lps)
        out[doc_id] = (len(lps), avg, math.exp(-avg))
    return out


@pytest.fixture(scope="module")
def model(spark):
    train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    return ngram_lm_fit(train, n=3)


def test_scores_match_python_mirror(spark, model):
    """Every (n_tokens, avg_logp, ppl) matches the Python mirror exactly:
    seen trigram/bigram/unigram paths, backoff discounts, and the OOV
    floor are all exercised by the fixture."""
    test = [
        (1, "the cat sat on the mat"),     # fully in-domain
        (2, "the dog sat on the mat"),     # mixed orders
        (3, "cat the on mat dog"),         # scrambled -> backoff-heavy
        (4, "zx qv wk"),                   # full OOV
        (5, "the zebra sat"),              # OOV mid-sentence
    ]
    df = spark.createDataFrame(test, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logp"], r["ppl"])
        for r in ngram_lm_score(df, model).collect()
    }
    want = _mirror_scores(TRAIN, test)
    assert set(got) == set(want)
    for doc_id, (nt, avg, ppl) in want.items():
        assert got[doc_id][0] == nt
        assert got[doc_id][1] == pytest.approx(avg, rel=1e-12)
        assert got[doc_id][2] == pytest.approx(ppl, rel=1e-12)


def test_empty_doc_has_no_score_and_is_filtered(spark, model):
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    assert ngram_lm_score(df, model).count() == 1
    kept = perplexity_filter(df, model, max_ppl=1e9)
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_in_domain_beats_garbage(spark, model):
    """The filter's reason to exist: in-domain text scores far lower
    perplexity than scrambled or OOV garbage."""
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the rug"),
            (2, "rug the on sat the cat"),
            (3, "zx qv wk jj pp nn"),
        ],
        "doc_id long, text string",
    )
    ppl = {r["doc_id"]: r["ppl"] for r in ngram_lm_score(df, model).collect()}
    assert ppl[1] < ppl[2] < ppl[3]
    kept = perplexity_filter(df, model, max_ppl=ppl[1] * 1.01)
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_model_table_shape(spark, model):
    """Conditional probabilities sum to 1 within every context (exact
    count ratios — the stupid-backoff invariant), and unigrams to 1."""
    probs = model.table.groupBy(
        F.col("order"),
        F.expr("case when order = 1 then '' else substring_index(gram, ' ', order - 1) end").alias("ctx"),
    ).agg(F.sum(F.exp("logp")).alias("mass")).collect()
    for r in probs:
        assert r["mass"] == pytest.approx(1.0, rel=1e-9), (r["order"], r["ctx"])


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _VOCAB = ["aa", "bb", "cc", "dd", "ee"]
    _doc = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=8).map(" ".join)

    @given(
        train=st.lists(_doc, min_size=1, max_size=5),
        test=st.lists(_doc, min_size=1, max_size=4),
        n=st.integers(min_value=1, max_value=4),
    )
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_property_scores_match_mirror(spark, train, test, n):
        """Random tiny corpora: engine scores equal the Python mirror for
        every n — exercises repeated grams, orders above doc length,
        empty docs, and heavy OOV, beyond the handcrafted fixture."""
        m = ngram_lm_fit(
            spark.createDataFrame([(t,) for t in train], "text string"), n=n
        )
        df = spark.createDataFrame(
            list(enumerate(test)), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["avg_logp"])
            for r in ngram_lm_score(df, m).collect()
        }
        want = _mirror_scores(train, list(enumerate(test)), n=n)
        assert set(got) == set(want)
        for k, (nt, avg, _) in want.items():
            assert got[k][0] == nt
            assert got[k][1] == pytest.approx(avg, rel=1e-12, abs=1e-12)
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_score_plan_no_python_no_cartesian(spark, model):
    df = spark.createDataFrame([(1, "the cat sat")], "doc_id long, text string")
    plan = (
        ngram_lm_score(df, model)._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in plan


def test_perplexity_buckets_head_middle_tail(spark, model):
    """CCNet bucketing: garbage lands in the top bucket, in-domain text in
    the bottom, empty docs carry NULL — and no global window is used."""
    from ballista_spark.operators.lm import perplexity_buckets

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the rug"),
            (3, "a cat and a dog sat together"),
            (4, "zx qv wk jj pp nn"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_buckets(df, model, 2).collect()}
    assert got[5] is None
    assert got[4] == 2                       # OOV garbage: tail
    assert 1 in {got[1], got[2], got[3]}     # in-domain text populates head
    assert all(b in (1, 2) for b in (got[1], got[2], got[3]))
    plan = (
        perplexity_buckets(df, model, 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # bucketing must be map-only comparisons, not a global ntile window
    assert "ntile" not in plan.lower()
