"""Model persistence round-trips: every registered model type saves and
reloads with scoring outputs identical to the in-memory original."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.model_io import load_model, save_model
from ballista_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents").limit(100)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_ngram_lm_roundtrip(spark, tmp_path):
    from ballista_spark.operators.lm import ngram_lm_fit, ngram_lm_score

    docs = _docs(spark)
    model = ngram_lm_fit(docs, n=2)
    save_model(model, str(tmp_path / "lm"))
    loaded = load_model(spark, str(tmp_path / "lm"))
    assert (loaded.n, loaded.alpha, loaded.oov_logp) == (
        model.n, model.alpha, model.oov_logp,
    )
    assert _rows(ngram_lm_score(docs, loaded)) == _rows(ngram_lm_score(docs, model))


def test_logreg_roundtrip(spark, tmp_path):
    from ballista_spark.operators.hashing import md5_long
    from ballista_spark.operators.quality import (
        N_FEATURES,
        LogRegModel,
        quality_classifier_score,
    )

    docs = _docs(spark)
    wdf = spark.createDataFrame(
        [("join", 1.7), ("scan", -1.2)], "gram string, w double"
    ).select((md5_long("gram") % N_FEATURES).alias("bucket"), "w")
    model = LogRegModel(wdf, -0.25)
    save_model(model, str(tmp_path / "q"))
    loaded = load_model(spark, str(tmp_path / "q"))
    assert loaded.bias == model.bias
    assert loaded.ngrams == model.ngrams and isinstance(loaded.ngrams, tuple)
    assert _rows(quality_classifier_score(docs, loaded)) == _rows(
        quality_classifier_score(docs, model)
    )


def test_dsir_roundtrip(spark, tmp_path):
    from ballista_spark.operators.dsir import dsir_fit, dsir_log_weights

    docs = _docs(spark)
    model = dsir_fit(docs.where(F.col("source") == "src1"), docs)
    save_model(model, str(tmp_path / "dsir"))
    loaded = load_model(spark, str(tmp_path / "dsir"))
    assert loaded.default_lr == model.default_lr
    assert _rows(dsir_log_weights(docs, loaded)) == _rows(
        dsir_log_weights(docs, model)
    )


def test_pca_roundtrip(spark, tmp_path):
    from ballista_spark.operators.pca import pca_fit, pca_project

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(200)
    model = pca_fit(emb, k=4)
    save_model(model, str(tmp_path / "pca"))
    loaded = load_model(spark, str(tmp_path / "pca"))
    assert loaded.mean == model.mean  # json float round-trip is exact
    assert loaded.components == model.components
    assert loaded.n == model.n
    assert _rows(pca_project(emb, loaded)) == _rows(pca_project(emb, model))


def test_unsupported_type_raises(spark):
    with pytest.raises(TypeError):
        save_model(("not", "a", "model"), "/tmp/nope")


def test_save_over_own_load_path_roundtrips(spark, tmp_path):
    """save(load(p), p) must not read-after-delete: the frame is
    materialized before the overwrite."""
    from ballista_spark.operators.lm import ngram_lm_fit

    docs = _docs(spark)
    p = str(tmp_path / "lm_self")
    model = ngram_lm_fit(docs, n=2)
    save_model(model, p)
    loaded = load_model(spark, p)
    save_model(loaded, p)  # would FileNotFound without the checkpoint
    again = load_model(spark, p)
    assert _rows(again.table) == _rows(model.table)


def test_torn_save_loads_previous_complete_version(spark, tmp_path):
    """A save that dies after writing field parquet but before meta must
    leave the model loadable as the PREVIOUS consistent version — never
    new frames paired with old scalars (the silent-corruption mode of an
    in-place field overwrite)."""
    from ballista_spark.operators.lm import ngram_lm_fit

    docs = _docs(spark)
    m1 = ngram_lm_fit(docs, n=2)
    path = str(tmp_path / "lm")
    save_model(m1, path)

    # simulate a torn second save: fields of a DIFFERENT model (n=3)
    # land on disk, the meta write never happens
    m2 = ngram_lm_fit(docs, n=3)
    real_create = spark.createDataFrame
    try:
        def boom(*a, **k):  # the meta frame is the only createDataFrame call
            raise RuntimeError("simulated crash before meta write")
        spark.createDataFrame = boom
        with pytest.raises(RuntimeError, match="simulated crash"):
            save_model(m2, path)
    finally:
        spark.createDataFrame = real_create

    loaded = load_model(spark, path)
    assert loaded.n == m1.n  # old scalars ...
    assert _rows(loaded.table) == _rows(m1.table)  # ... with OLD table

    # a subsequent successful save wins and GCs stale version dirs
    save_model(m2, path)
    assert load_model(spark, path).n == 3
    vdirs = [p.name for p in (tmp_path / "lm").iterdir() if p.name.startswith("v-")]
    assert len(vdirs) == 1
