"""Model persistence for the in-engine fitted models (NgramLM,
LogRegModel, DSIRModel, PCAModel): save to / load from a directory on
whatever storage the session can reach (local, HDFS, S3 — everything
goes through Spark writers, no driver-side ``open()``, so the same code
runs on a laptop and a 1000-executor cluster).

Layout: ``<path>/meta`` holds one JSON line (model type + every scalar
field); each DataFrame field lands under ``<path>/<field>`` as parquet.
The scalar sidecar carries the hashing/config fields the model was
trained under (``n_features``/``ngrams``/``alpha``…) — the whole reason
these NamedTuples exist is that scoring MUST replay the training config,
so persistence must round-trip it losslessly.
"""

from __future__ import annotations

import json
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession

from ballista_spark.operators.dsir import DSIRModel
from ballista_spark.operators.lm import NgramLM
from ballista_spark.operators.pca import PCAModel
from ballista_spark.operators.quality import LogRegModel

#: model class -> (DataFrame fields, tuple-valued scalar fields)
_REGISTRY: dict[type, tuple[tuple[str, ...], tuple[str, ...]]] = {
    NgramLM: (("table",), ()),
    LogRegModel: (("weights",), ("ngrams",)),
    DSIRModel: (("log_ratio",), ("ngrams",)),
    PCAModel: ((), ()),
}
_BY_NAME = {cls.__name__: cls for cls in _REGISTRY}


def save_model(model: NamedTuple, path: str) -> None:
    """Persist a fitted model under ``path`` (overwrites)."""
    cls = type(model)
    if cls not in _REGISTRY:
        raise TypeError(f"unsupported model type: {cls.__name__}")
    frame_fields, _ = _REGISTRY[cls]
    spark = None
    scalars = {}
    for field in cls._fields:
        value = getattr(model, field)
        if field in frame_fields:
            # materialize BEFORE the overwrite: a model loaded from this
            # very path holds a lazy scan of the directory the write
            # would first delete (save(load(p), p) must round-trip, not
            # read-after-delete); model frames are bounded, so an eager
            # executor-storage checkpoint is cheap insurance
            value = value.localCheckpoint(eager=True)
            value.write.mode("overwrite").parquet(f"{path}/{field}")
            spark = value.sparkSession
        else:
            scalars[field] = list(value) if isinstance(value, tuple) else value
    meta = json.dumps({"type": cls.__name__, **scalars})
    if spark is None:  # pure-scalar models (PCAModel)
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError("save_model needs an active SparkSession")
    spark.createDataFrame([(meta,)], "meta string").coalesce(1).write.mode(
        "overwrite"
    ).text(f"{path}/meta")


def load_model(spark: SparkSession, path: str) -> NamedTuple:
    """Rebuild a model saved by :func:`save_model`."""
    [row] = spark.read.text(f"{path}/meta").collect()
    meta = json.loads(row["value"])
    cls = _BY_NAME[meta.pop("type")]
    frame_fields, tuple_fields = _REGISTRY[cls]
    kwargs = {}
    for field in cls._fields:
        if field in frame_fields:
            kwargs[field] = spark.read.parquet(f"{path}/{field}")
        else:
            v = meta[field]
            kwargs[field] = tuple(v) if field in tuple_fields else v
    return cls(**kwargs)
