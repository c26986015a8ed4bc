"""Model persistence for the in-engine fitted models (NgramLM,
LogRegModel, DSIRModel, PCAModel, BPEModel, UnigramModel,
SoftmaxModel): save to /
load from a directory on
whatever storage the session can reach (local, HDFS, S3 — everything
goes through Spark writers, no driver-side ``open()``, so the same code
runs on a laptop and a 1000-executor cluster).

Layout: ``<path>/meta`` holds one JSON line (model type, version token +
every scalar field); each DataFrame field lands under
``<path>/v-<token>/<field>`` as parquet, with meta written last so a
torn save can never be loaded as a field/scalar mix (meta keeps naming
the previous complete version until the new one fully exists).
The scalar sidecar carries the hashing/config fields the model was
trained under (``n_features``/``ngrams``/``alpha``…) — the whole reason
these NamedTuples exist is that scoring MUST replay the training config,
so persistence must round-trip it losslessly.
"""

from __future__ import annotations

import json
import uuid
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession

from ballista_spark.operators.bpe import BPEModel
from ballista_spark.operators.classify import SoftmaxModel
from ballista_spark.operators.dsir import DSIRModel
from ballista_spark.operators.lm import NgramLM
from ballista_spark.operators.pca import PCAModel
from ballista_spark.operators.quality import LogRegModel
from ballista_spark.operators.unigram import UnigramModel
from ballista_spark.operators.wordpiece import WordPieceModel

#: model class -> (DataFrame fields, tuple-valued scalar fields)
_REGISTRY: dict[type, tuple[tuple[str, ...], tuple[str, ...]]] = {
    NgramLM: (("table",), ()),
    LogRegModel: (("weights",), ("ngrams",)),
    DSIRModel: (("log_ratio",), ("ngrams",)),
    PCAModel: ((), ()),
    BPEModel: (("merges", "vocab"), ()),
    UnigramModel: (("pieces",), ()),
    SoftmaxModel: (("weights",), ("ngrams",)),
    WordPieceModel: (("vocab",), ()),
}
_BY_NAME = {cls.__name__: cls for cls in _REGISTRY}


def save_model(model: NamedTuple, path: str) -> None:
    """Persist a fitted model under ``path`` (overwrites, torn-safe).

    DataFrame fields land under a fresh ``<path>/v-<token>/<field>``
    directory and ``<path>/meta`` — written LAST — records the token:
    a save that dies between field writes and the meta write leaves
    meta pointing at the previous *complete* version, so
    :func:`load_model` can never pair new field parquet with old
    scalars (the silent-corruption mode of writing fields in place).
    Stale version directories are garbage-collected best-effort through
    the Hadoop FileSystem API after a successful meta write — same
    storage abstraction as the writers, so this still runs unchanged
    against HDFS/S3A.
    """
    cls = type(model)
    if cls not in _REGISTRY:
        raise TypeError(f"unsupported model type: {cls.__name__}")
    frame_fields, _ = _REGISTRY[cls]
    token = uuid.uuid4().hex[:16]
    vdir = f"{path}/v-{token}"
    spark = None
    scalars = {}
    for field in cls._fields:
        value = getattr(model, field)
        if field in frame_fields:
            # materialize BEFORE writing: a model loaded from this very
            # path holds a lazy scan of a version directory the post-save
            # GC deletes (save(load(p), p) must round-trip, not
            # read-after-delete); model frames are bounded, so an eager
            # executor-storage checkpoint is cheap insurance
            value = value.localCheckpoint(eager=True)
            value.write.mode("overwrite").parquet(f"{vdir}/{field}")
            spark = value.sparkSession
        else:
            scalars[field] = list(value) if isinstance(value, tuple) else value
    meta = json.dumps({"type": cls.__name__, "version": token, **scalars})
    if spark is None:  # pure-scalar models (PCAModel)
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError("save_model needs an active SparkSession")
    spark.createDataFrame([(meta,)], "meta string").coalesce(1).write.mode(
        "overwrite"
    ).text(f"{path}/meta")
    _gc_stale_versions(spark, path, keep=token)


def _gc_stale_versions(spark: SparkSession, path: str, keep: str) -> None:
    """Best-effort removal of ``<path>/v-*`` dirs other than ``keep`` —
    leftovers of overwritten or torn saves.  Failures are ignored: a
    stale dir is unreferenced garbage, never a correctness problem."""
    try:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        for status in fs.listStatus(jpath):
            name = status.getPath().getName()
            if name.startswith("v-") and name != f"v-{keep}":
                fs.delete(status.getPath(), True)
    except Exception:
        pass


def load_model(spark: SparkSession, path: str) -> NamedTuple:
    """Rebuild a model saved by :func:`save_model`.

    Reads ``meta`` first and resolves DataFrame fields through the
    version token it names (falling back to the flat pre-versioning
    layout when no token is present), so a torn save — new field
    parquet, old meta — loads the old consistent model, never a mix.
    """
    [row] = spark.read.text(f"{path}/meta").collect()
    meta = json.loads(row["value"])
    cls = _BY_NAME[meta.pop("type")]
    token = meta.pop("version", None)
    vdir = f"{path}/v-{token}" if token else path
    frame_fields, tuple_fields = _REGISTRY[cls]
    kwargs = {}
    for field in cls._fields:
        if field in frame_fields:
            kwargs[field] = spark.read.parquet(f"{vdir}/{field}")
        else:
            v = meta[field]
            kwargs[field] = tuple(v) if field in tuple_fields else v
    return cls(**kwargs)
