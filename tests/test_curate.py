"""End-to-end curation chain: each stage drops exactly the documents
constructed to trip it, stage counts track, packing lays out survivors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.curate import curate_corpus
from ballista_spark.operators.lm import ngram_lm_fit, ngram_lm_score

CLEAN = [
    "the cat sat on the mat and looked around the warm room",
    "a clear morning with soft light over the green valley and hills",
    "she read the letter slowly and smiled at the familiar handwriting",
    "the train left the station on time under a pale winter sky",
]
BENCH_TEXT = "what is the capital of france paris is the capital of france"


def _corpus(spark):
    rows = [(i, t) for i, t in enumerate(CLEAN)]
    rows += [
        (10, CLEAN[0]),  # exact dup of 0 -> dropped (0 survives as min key)
        (11, CLEAN[1].replace("green", "wide")),  # near-dup of 1 -> dropped
        (12, "tiny doc"),  # 2 tokens -> dropped by min_tokens=4
        (13, BENCH_TEXT + " and some extra words"),  # contaminated -> dropped
        (14, "zx qv wk jj pp nn rr ss tt uu"),  # OOV garbage -> LM-dropped
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stages_drop_expected_docs(spark):
    docs = _corpus(spark)
    bench = spark.createDataFrame([(0, BENCH_TEXT)], "doc_id long, text string")
    # LM fit on the clean docs only (the CCNet in-domain convention);
    # threshold between worst clean and the garbage doc
    clean = docs.where(F.col("doc_id") < 10)
    model = ngram_lm_fit(clean, n=3)
    ppl = {
        r["doc_id"]: r["ppl"]
        for r in ngram_lm_score(docs, model).collect()
    }
    max_clean = max(ppl[i] for i in range(len(CLEAN)))
    assert ppl[14] > max_clean * 2  # garbage is clearly separated
    report = curate_corpus(
        docs,
        near_dup_threshold=0.5,
        min_tokens=4,
        benchmark=bench,
        max_contamination=0.5,
        lm_model=model,
        max_ppl=max_clean * 1.5,
        pack_seq_len=8,
    )
    kept = sorted(r["doc_id"] for r in report.docs.collect())
    assert kept == [0, 1, 2, 3]
    assert report.stage_counts == {
        "input": 9,
        "exact_dedup": 8,   # -10
        "near_dup": 7,      # -11
        "token_band": 6,    # -12
        "decontam": 5,      # -13
        "lm_ppl": 4,        # -14
        "packed_windows": report.stage_counts["packed_windows"],
    }
    # packing: windows cover exactly the survivors' token total
    total_tokens = sum(len(CLEAN[i].split()) for i in range(4))
    assert report.stage_counts["packed_windows"] == -(-total_tokens // 8)
    packed = {r["doc_id"]: r for r in report.packed.collect()}
    assert sorted(packed) == [0, 1, 2, 3]
    assert min(r["pack_start"] for r in packed.values()) == 0


def test_disabled_stages_and_lazy_mode(spark):
    """With everything off the input passes through untouched, lazily."""
    docs = _corpus(spark)
    report = curate_corpus(
        docs, exact=False, near_dup_threshold=None, count_stages=False
    )
    assert report.stage_counts == {}
    assert report.packed is None
    assert report.docs.count() == docs.count()


def test_quality_stage_filters_with_model(spark):
    """The classifier stage inside the chain: a literal weight model whose
    grams hit only the clean docs keeps them and drops the garbage."""
    from ballista_spark.operators.hashing import md5_long
    from ballista_spark.operators.quality import N_FEATURES, LogRegModel

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zx qv wk jj pp")],
        "doc_id long, text string",
    )
    wdf = docs.sparkSession.createDataFrame(
        [("the", 50.0), ("cat", 50.0)], "gram string, w double"
    ).select((md5_long("gram") % N_FEATURES).alias("bucket"), "w")
    report = curate_corpus(
        docs,
        exact=False,
        near_dup_threshold=None,
        quality_model=LogRegModel(wdf, -1.0),
        min_quality=0.5,
    )
    assert [r["doc_id"] for r in report.docs.collect()] == [1]
    assert report.stage_counts["quality"] == 1


def test_quality_stage_requires_model(spark):
    with pytest.raises(ValueError, match="quality_model"):
        curate_corpus(
            _corpus(spark),
            exact=False,
            near_dup_threshold=None,
            min_quality=0.5,
            count_stages=False,
        )


def test_boilerplate_stage_dechromes_before_dedup(spark):
    """The boilerplate stage strips spans shared across docs FIRST, so two
    pages differing only in chrome become exact duplicates and collapse."""
    banner = "ACCEPT COOKIES TO CONTINUE"
    docs = spark.createDataFrame(
        [
            (1, f"{banner}\nunique article text one"),
            (2, f"{banner}\nunique article text two"),
            (3, f"unique article text one\n{banner}"),  # dup of 1 modulo chrome
        ],
        "doc_id long, text string",
    )
    report = curate_corpus(
        docs,
        boilerplate_max_docs=2,
        near_dup_threshold=None,
        count_stages=True,
    )
    rows = {r["doc_id"]: r["text"] for r in report.docs.collect()}
    assert report.stage_counts["boilerplate"] == 3
    # doc 3 became an exact duplicate of doc 1 after chrome removal
    assert sorted(rows) == [1, 2]
    assert all(banner not in t for t in rows.values())


def test_substr_stage_strips_repeated_passages(spark):
    """The substring stage rewrites text in place (first occurrence kept);
    a doc emptied by the strip is dropped at the stage itself (the token
    band is optional and must not be the only thing standing between an
    empty row and the LM/packing stages)."""
    boiler = "all rights reserved contact the webmaster for licensing terms"
    rows = [
        (0, CLEAN[0] + " " + boiler),          # canonical copy survives whole
        (1, boiler + " " + CLEAN[1]),          # passage stripped, prose kept
        (2, boiler),                           # only the passage -> emptied
        (3, CLEAN[2]),                         # untouched
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    report = curate_corpus(
        docs,
        exact=False,
        near_dup_threshold=None,
        substr_window=5,
        min_tokens=4,
        count_stages=True,
    )
    out = {r["doc_id"]: r["text"] for r in report.docs.collect()}
    assert sorted(out) == [0, 1, 3]  # doc 2 emptied -> dropped at the stage
    assert out[0] == CLEAN[0] + " " + boiler
    assert out[1] == CLEAN[1]
    assert out[3] == CLEAN[2]
    assert report.stage_counts["substr_dedup"] == 3  # emptied doc dropped here
    assert report.stage_counts["token_band"] == 3


def test_fuzzy_decontam_stage_drops_paraphrase(spark):
    """Exact decontam keeps a lightly-paraphrased benchmark copy (low
    exact-trigram overlap at a strict threshold is still > it), while the
    fuzzy stage removes it."""
    base = " ".join(f"w{i}" for i in range(60))
    per = base.split(" ")
    for i in range(0, 60, 10):
        per[i] = f"x{i}"
    rows = [(0, CLEAN[0]), (1, " ".join(per))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(100, base)], "doc_id long, text string")
    report = curate_corpus(
        docs,
        exact=False,
        near_dup_threshold=None,
        benchmark=bench,
        max_contamination=0.99,  # exact pass permissive: paraphrase slips
        fuzzy_contamination_threshold=0.5,
    )
    assert sorted(r["doc_id"] for r in report.docs.collect()) == [0]
    assert report.stage_counts["decontam"] == 2
    assert report.stage_counts["fuzzy_decontam"] == 1


def test_curation_is_idempotent_on_its_own_output(spark):
    """Curating an already-curated corpus changes nothing: survivors are
    pairwise non-near-dup by construction (an edge >= threshold would
    have merged their clusters), every duplicated window already lost its
    non-canonical occurrences, and the gates are deterministic."""
    from ballista_spark.sources.registry import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    params = dict(
        near_dup_threshold=0.8,
        substr_window=20,
        min_tokens=3,
        max_dup_ngram_fraction=0.95,
        count_stages=False,
    )
    r1 = curate_corpus(docs, **params)
    first = {r["doc_id"]: r["text"] for r in r1.docs.collect()}
    r2 = curate_corpus(r1.docs, **params)
    second = {r["doc_id"]: r["text"] for r in r2.docs.collect()}
    assert second == first


def test_url_span_and_compression_stages(spark):
    """The late-round stages: URL blocklist gates first (suffix-aware),
    corpus-wide paragraph dedup keeps the globally-first copy, and the
    compression band drops the repetitive-spam tail."""
    synd = "syndicated weather report repeated across publishers"
    rows = [
        (0, "https://good.org/a", f"{synd}\n{CLEAN[0]}"),
        (1, "https://news.example.net/x", f"intro line\n{synd}"),
        (2, "https://ads.example.com/b", CLEAN[1]),   # blocked subdomain
        (3, "https://ok.org/c", "buy now " * 50),     # compresses to ~0.05
        (4, "https://ok.org/d", CLEAN[2]),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    report = curate_corpus(
        docs,
        url_blocklist=["example.com"],
        exact=False,
        near_dup_threshold=None,
        span_dedup_min_count=2,
        compression_band=(0.3, 2.0),
        count_stages=True,
    )
    out = {r["doc_id"]: r["text"] for r in report.docs.collect()}
    assert sorted(out) == [0, 1, 4]
    # doc 0 is the globally-first occurrence -> keeps the paragraph;
    # doc 1 loses it but keeps its own line
    assert out[0] == f"{synd}\n{CLEAN[0]}"
    assert out[1] == "intro line"
    assert report.stage_counts["url_blocklist"] == 4   # -2 (ads.example.com)
    assert report.stage_counts["span_dedup"] == 4      # rewrite, no drop
    assert report.stage_counts["compression"] == 3     # -3 (spam)
    # url column rides through untouched
    assert {r["url"] for r in report.docs.collect()} == {
        "https://good.org/a", "https://news.example.net/x", "https://ok.org/d"
    }


def test_span_dedup_stage_preserves_null_text(spark):
    """Enabling span_dedup must not silently drop NULL-text docs (the
    round-4 advisor lesson for the substr stage, applied here): NULL
    rides through; only strip-emptied docs drop."""
    docs = spark.createDataFrame(
        [(0, "dup para"), (1, "dup para"), (2, None), (3, "solo text")],
        "doc_id long, text string",
    )
    report = curate_corpus(
        docs,
        exact=False,
        near_dup_threshold=None,
        span_dedup_min_count=2,
        count_stages=True,
    )
    out = {r["doc_id"]: r["text"] for r in report.docs.collect()}
    # doc 1's only paragraph deduped away -> dropped; NULL text kept as NULL
    assert out == {0: "dup para", 2: None, 3: "solo text"}
