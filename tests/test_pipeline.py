"""Pipeline corpus vs DuckDB oracle + reference checks for the
hash-dependent operators (SimHash, LSH ANN, multimodal features)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from ballista_spark.queries.pipeline import PIPELINE_QUERIES
from ballista_spark.sources.registry import load_table
from tests.conftest import SF_CORRECT, SF_SMOKE, run_compare

FULL = os.environ.get("BS_TEST_FULL") == "1"


@pytest.mark.parametrize("name", sorted(PIPELINE_QUERIES))
def test_pipeline_smoke_scale(spark, duck, name):
    run_compare(spark, duck, PIPELINE_QUERIES[name], SF_SMOKE, "smoke")


@pytest.mark.skipif(not FULL, reason="set BS_TEST_FULL=1 for sf0.01 scale")
@pytest.mark.parametrize("name", sorted(PIPELINE_QUERIES))
def test_pipeline_correctness_scale(spark, duck, name):
    run_compare(spark, duck, PIPELINE_QUERIES[name], SF_CORRECT, "correct")


def test_dup_ngram_fraction_vs_duckdb(spark, duck):
    """The Gopher-style repetition filter reproduces exactly in DuckDB's
    list dialect (same n-gram construction, same exact division), and edge
    cases (short docs, all-repeat docs) behave as documented."""
    from pyspark.sql import functions as F

    from ballista_spark.operators.text import dup_ngram_fraction

    docs = load_table(spark, SF_SMOKE, "documents")
    got = {
        r["doc_id"]: r["rep"]
        for r in docs.select(
            "doc_id", dup_ngram_fraction("text", 2).alias("rep")
        ).collect()
    }
    oracle = duck.execute(
        f"""
        WITH t AS (
          SELECT doc_id, string_split(trim(text), ' ') AS l
          FROM read_parquet('{SF_SMOKE}/documents.parquet')
        ), g AS (
          SELECT doc_id, len(l) - 1 AS m,
                 list_transform(range(1, greatest(len(l) - 1, 1) + 1),
                                i -> array_to_string(l[i:i+1], ' ')) AS grams
          FROM t
        )
        SELECT doc_id,
               CASE WHEN m >= 1
                    THEN (len(grams) - len(list_distinct(grams)))::double / m
                    ELSE 0.0 END AS rep
        FROM g
        """
    ).fetchall()
    want = {doc_id: rep for doc_id, rep in oracle}
    assert got == want
    # edge cases: < n tokens -> 0.0; pure repetition -> (m - 1) / m
    edge = spark.createDataFrame(
        [(1, "one"), (2, "spam spam spam spam"), (3, "all words differ here")],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r["rep"]
        for r in edge.select(
            "doc_id", dup_ngram_fraction("text", 2).alias("rep")
        ).collect()
    }
    assert rows[1] == 0.0
    assert rows[2] == pytest.approx(2 / 3)
    assert rows[3] == 0.0


def test_int8_quantization_roundtrip_and_recall(spark, duck):
    """Quantize→dequantize error is bounded by scale/2 per dimension, the
    quantization formula reproduces exactly in DuckDB, and quantized
    brute-force top-1 agrees with the float path on >= 90% of queries at
    smoke scale (int8 is a storage trade, not an approximation free-for-all)."""
    from pyspark.sql import functions as F

    from ballista_spark.operators.similarity import (
        cosine_topk,
        dequantize_int8,
        quantize_int8,
        quantized_cosine_topk,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    both = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        quantize_int8("embedding").alias("qs"),
    ).withColumn("dq", dequantize_int8("qs"))
    rows = both.select(
        "vec_id",
        F.col("qs.scale").alias("scale"),
        F.aggregate(
            F.zip_with("v", "dq", lambda a, b: F.abs(a - b)),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("max_err"),
    ).collect()
    for r in rows:
        assert r["max_err"] <= r["scale"] / 2 + 1e-12, r["vec_id"]

    # exact DuckDB twin of the scale + code formula
    spark_q = {
        r["vec_id"]: (r["scale"], r["codes"])
        for r in both.select(
            "vec_id", F.col("qs.scale").alias("scale"), F.col("qs.q").alias("codes")
        ).collect()
    }
    duck_q = duck.execute(
        f"""
        SELECT vec_id,
               list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0
                   AS scale,
               CASE WHEN list_max(list_transform(embedding, x -> abs(x::DOUBLE))) = 0
                    THEN list_transform(embedding, x -> 0)
                    ELSE list_transform(embedding,
                         x -> floor(x::DOUBLE / (list_max(list_transform(embedding,
                              y -> abs(y::DOUBLE))) / 127.0) + 0.5)::TINYINT)
               END AS codes
        FROM read_parquet('{SF_SMOKE}/embeddings.parquet')
        """
    ).fetchall()
    for vec_id, scale, codes in duck_q:
        s_scale, s_codes = spark_q[vec_id]
        assert s_scale == pytest.approx(scale, rel=1e-12), vec_id
        assert list(s_codes) == list(codes), vec_id

    # recall of the quantized scan vs the float scan
    queries = emb.orderBy("vec_id").limit(10)
    top_f = {r["query_id"]: r["neighbor_id"]
             for r in cosine_topk(emb, queries, k=1).collect()}
    top_q = {r["query_id"]: r["neighbor_id"]
             for r in quantized_cosine_topk(emb, queries, k=1).collect()}
    agree = sum(top_f[q] == top_q[q] for q in top_f)
    assert agree >= 9, (agree, top_f, top_q)


# --- pure-Python reference checks (independent of the SQL oracles) ----------


def test_simhash_matches_python_reference(spark):
    """simhash_pairs output equals a pure-Python simhash + brute-force
    hamming scan at smoke scale — fully independent of Spark's hashing
    (hashlib md5 is the shared ground truth)."""
    from ballista_spark.operators.dedup import SIMHASH_BITS, simhash_pairs
    from ballista_spark.operators.hashing import md5_long_py

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").toPandas()
    tokens = {r.doc_id: r.text.strip().split(" ") for r in docs.itertuples()}

    def simhash(toks: list[str]) -> int:
        votes = [0] * SIMHASH_BITS
        for t in toks:
            hv = md5_long_py(t)
            for j in range(SIMHASH_BITS):
                votes[j] += 1 if (hv >> j) & 1 else -1
        return sum(1 << j for j in range(SIMHASH_BITS) if votes[j] > 0)

    sigs = {d: simhash(ts) for d, ts in tokens.items()}
    ids = sorted(sigs)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(sigs[a] ^ sigs[b]).count("1") <= 3:
                expected.add((a, b))

    got = {
        (r["key_a"], r["key_b"])
        for r in simhash_pairs(load_table(spark, SF_SMOKE, "documents")).collect()
    }
    assert got == expected


def test_lsh_ann_recall_vs_brute_force(spark):
    """LSH ANN top-5 must recover >= 60% of the exact top-5 at smoke scale
    (recall is parameter-tunable; this guards against a broken bucketer
    returning junk)."""
    from pyspark.sql import functions as F

    from ballista_spark.operators.similarity import cosine_topk, lsh_ann_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_ann_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH ANN recall too low: {recall:.2f}"


def test_multimodal_features_reference(spark):
    """mapInPandas byte-histogram features equal the Python reference."""
    from ballista_spark.operators.multimodal import (
        N_FEATURES,
        attach_media,
        extract_features,
        _fake_features,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    out = extract_features(attach_media(docs)).orderBy("media_id").limit(20).collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.orderBy("doc_id").limit(20).collect()
    }
    assert len(out) == 20
    for r in out:
        payload = texts[r["media_id"]].encode("utf-8")
        assert r["n_bytes"] == len(payload)
        assert len(r["features"]) == N_FEATURES
        np.testing.assert_allclose(r["features"], _fake_features(payload), rtol=1e-12)


def test_multimodal_external_codec_formats_raise():
    """Formats that genuinely need an external codec stay explicit
    NotImplementedError at the dispatch point; the decodable formats
    (JPEG/PNG/BMP/PPM/PGM/WAV/Y4M) are REAL — see
    test_multimodal_codecs.py and test_jpeg.py."""
    from ballista_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x00\x00\x18ftypmp42", "video/mp4")


def test_ivf_ann_recall_vs_brute_force(spark):
    """IVF (label-centroid cells, 5 probes of 10) must recover >= 50% of
    exact top-5 — guards the cell assignment + probe plumbing (the synthetic
    labels cluster only weakly, so half the cells must be probed)."""
    from pyspark.sql import functions as F

    from ballista_spark.operators.similarity import cosine_topk, ivf_ann_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_ann_topk(emb, queries, k=5, n_probe=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall:.2f}"


def test_ivf_with_kmeans_centroids_recall(spark):
    """The unlabeled-corpus IVF path: kmeans_fit-trained centroids plugged
    into ivf_ann_topk must reach the same recall bar as the label-centroid
    shortcut — the two coarse quantizers are interchangeable."""
    from pyspark.sql import functions as F

    from ballista_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
        kmeans_fit,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    # spherical: ivf_ann_topk assigns cells by cosine, and unit-norm
    # centroids make Euclidean training equivalent to cosine assignment
    cents = kmeans_fit(emb, k=10, max_iters=5, spherical=True)
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_ann_topk(
            emb, queries, k=5, n_probe=5, centroids=cents
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"kmeans-IVF recall too low: {recall:.2f}"


def test_multimodal_resize_and_frame_sample(spark):
    from ballista_spark.operators.multimodal import (
        attach_media,
        resize_images,
        sample_frames,
    )

    media = attach_media(load_table(spark, SF_SMOKE, "documents")).limit(10)
    resized = resize_images(media, width=16, height=16).collect()
    assert len(resized) == 10
    for r in resized:
        assert len(r["payload"]) == 256
        assert r["meta"]["width"] == 16 and r["meta"]["height"] == 16

    frames = sample_frames(media, n_frames=4)
    rows = frames.collect()
    assert len(rows) == 40  # 10 media x 4 frames
    idx = sorted({r["frame_idx"] for r in rows})
    assert idx == [0, 1, 2, 3]
    assert all(isinstance(r["frame_payload"], (bytes, bytearray)) for r in rows)


def test_kmeans_fit_recovers_separated_blobs(spark):
    """Lloyd's trainer on three well-separated Gaussian blobs: centroids
    land within 3 sigma/sqrt(n) of the true means, every point's nearest
    trained centroid is its generating blob, and the result is identical
    under a different partitioning (determinism)."""
    import numpy as np

    from ballista_spark.operators.similarity import kmeans_fit

    rng = np.random.default_rng(42)
    means = [np.array([10.0, 0.0, 0.0]), np.array([0.0, 10.0, 0.0]),
             np.array([0.0, 0.0, 10.0])]
    pts, labels = [], []
    for bi, mu in enumerate(means):
        for _ in range(60):
            pts.append(mu + rng.normal(0, 0.5, 3))
            labels.append(bi)
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(pts)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    cents = kmeans_fit(df, k=3, max_iters=20)
    assert len(cents) == 3 and all(len(c) == 3 for c in cents)
    # each true mean is close to exactly one trained centroid
    matched = set()
    for mu in means:
        dists = [float(np.linalg.norm(mu - np.array(c))) for c in cents]
        j = int(np.argmin(dists))
        assert dists[j] < 0.5, (mu, cents)
        matched.add(j)
    assert matched == {0, 1, 2}
    # assignment purity: nearest trained centroid == generating blob
    cent_arr = np.array(cents)
    blob_of_cent = {}
    for bi, mu in enumerate(means):
        blob_of_cent[int(np.argmin(np.linalg.norm(cent_arr - mu, axis=1)))] = bi
    for p, lbl in zip(pts, labels):
        nearest = int(np.argmin(np.linalg.norm(cent_arr - p, axis=1)))
        assert blob_of_cent[nearest] == lbl
    # determinism under repartitioning
    cents2 = kmeans_fit(df.repartition(7), k=3, max_iters=20)
    for c1, c2 in zip(cents, cents2):
        assert c1 == pytest.approx(c2, abs=1e-9)


def test_kmeans_fit_spherical_unit_centroids(spark):
    """spherical=True trains on L2-normalized inputs and returns unit-norm
    centroids (the consistent coarse quantizer for ivf_ann_topk's cosine
    cell assignment): direction-separated blobs of wildly different
    magnitudes still resolve to their directions."""
    import numpy as np

    from ballista_spark.operators.similarity import kmeans_fit

    rng = np.random.default_rng(7)
    dirs = [np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]),
            np.array([0.0, 0.0, 1.0])]
    rows = []
    i = 0
    for d in dirs:
        for _ in range(50):
            scale = float(rng.uniform(0.1, 100.0))  # magnitude is noise
            p = d * scale + rng.normal(0, 0.02, 3) * scale
            rows.append((i, [float(x) for x in p]))
            i += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_fit(df, k=3, max_iters=10, spherical=True)
    for c in cents:
        assert float(np.linalg.norm(c)) == pytest.approx(1.0, abs=1e-9)
    # each direction captured by exactly one unit centroid
    matched = {int(np.argmax([float(np.dot(d, c)) for c in cents])) for d in dirs}
    assert matched == {0, 1, 2}
    for d in dirs:
        assert max(float(np.dot(d, c)) for c in cents) > 0.99


def test_kmeans_fit_large_k_constant_plan(spark):
    """k=256 x dim=64: the packed-broadcast assignment keeps the plan
    constant-sized, so an iteration is dominated by the inherent O(n*k*dim)
    scan, not by Catalyst analyzing O(k*dim) literal expression nodes.  A
    generous wall-clock bound guards the regression (the literal-inlined
    plan at this size spent its time in plan analysis/codegen)."""
    import time

    import numpy as np

    from ballista_spark.operators.similarity import kmeans_fit

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 64)]) for i in range(2000)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    t0 = time.perf_counter()
    cents = kmeans_fit(df, k=256, max_iters=2, spherical=True)
    elapsed = time.perf_counter() - t0
    assert len(cents) == 256 and all(len(c) == 64 for c in cents)
    assert elapsed < 60.0, f"large-k kmeans took {elapsed:.1f}s"


def test_redact_pii_and_hit_counts(spark, duck):
    """PII scrub + audit counts: exact DuckDB twin on synthetic documents
    (same regexp chain, same counts) and no-PII texts pass through
    untouched."""
    from pyspark.sql import functions as F

    from ballista_spark.operators.text import PII_PATTERNS, pii_hit_counts, redact_pii

    docs = [
        (1, "contact alice@example.com or bob.smith+tag@mail.co.uk today"),
        (2, "call +1 (555) 867-5309 or 020 7946 0958 now"),
        (3, "server at 192.168.1.1 and 10.0.0.255 responded"),
        (4, "mixed: a@b.io via 8.8.8.8 phone 555-123-4567 end"),
        (5, "perfectly clean prose with no identifiers at all"),
        (6, ""),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["red"], r["hits"]["email"], r["hits"]["phone"], r["hits"]["ipv4"])
        for r in df.select(
            "doc_id",
            redact_pii("text").alias("red"),
            pii_hit_counts("text").alias("hits"),
        ).collect()
    }
    duck.execute("CREATE OR REPLACE TEMP TABLE pii_docs(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO pii_docs VALUES (?, ?)", docs)
    em, ph, ip = (PII_PATTERNS[k] for k in ("email", "phone", "ipv4"))
    want = {
        row[0]: tuple(row[1:])
        for row in duck.execute(
            f"""
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '{em}', '<EMAIL>', 'g'),
                       '{ph}', '<PHONE>', 'g'),
                       '{ip}', '<IPV4>', 'g') AS red,
                   len(regexp_extract_all(text, '{em}')) AS email,
                   len(regexp_extract_all(text, '{ph}')) AS phone,
                   len(regexp_extract_all(text, '{ip}')) AS ipv4
            FROM pii_docs
            """
        ).fetchall()
    }
    assert got == want
    assert got[5][0] == docs[4][1]  # clean text unchanged
    assert got[5][1:] == (0, 0, 0)


def test_semdedup_trained_path_is_exact_within_cells(spark):
    """Trained path on blob data: every emitted pair is a true near-dup
    (verify filter = brute-force filter, so got ⊆ brute force always) and
    recall stays high even when Lloyd's lands in a local optimum that
    splits a blob across cells (hash-seeded k-means on this fixture
    yields cells 30/15/11/4 → recall 376/420 ≈ 0.9, deterministic).  The
    plan must stay a cell equi-join — no cartesian product."""
    import numpy as np

    from ballista_spark.operators.similarity import (
        embedding_neardup_pairs,
        semdedup_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(0, 1, (4, 16))
    rows = []
    vid = 0
    for b in base:
        for _ in range(15):  # 15 jittered copies per blob = in-cluster dups
            rows.append((vid, [float(x) for x in b + rng.normal(0, 0.02, 16)]))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    got = semdedup_pairs(df, threshold=0.95, k=4, max_iters=10)
    assert "CartesianProduct" not in got._jdf.queryExecution().executedPlan().toString()
    got_pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    want = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(df, threshold=0.95).collect()
    }
    assert len(want) == 4 * 15 * 14 // 2
    assert got_pairs <= want
    assert len(got_pairs) / len(want) >= 0.8


def test_semdedup_accepts_pretrained_centroids_and_resolves(spark):
    """Pretrained-centroid path + resolve_duplicates survivor selection:
    one survivor per blob."""
    import numpy as np

    from ballista_spark.operators.dedup import resolve_duplicates
    from ballista_spark.operators.similarity import semdedup_pairs

    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, (3, 8))
    rows = [
        (10 * bi + j, [float(x) for x in b + rng.normal(0, 0.01, 8)])
        for bi, b in enumerate(base)
        for j in range(5)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [[float(x) for x in b / np.linalg.norm(b)] for b in base]
    pairs = semdedup_pairs(df, threshold=0.95, centroids=cents)
    out = resolve_duplicates(
        df, pairs, key_col="vec_id", key_a="id_a", key_b="id_b"
    )
    canon = sorted(r["vec_id"] for r in out.collect() if r["is_canonical"])
    assert canon == [0, 10, 20]
