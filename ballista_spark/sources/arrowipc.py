"""Arrow IPC (Feather v2) source/sink — the reference's own data-plane format.

Ballista materializes every shuffle partition and every query result as
Arrow IPC files on disk (`rust/core/src/utils.rs:49-84`
write_stream_to_disk; `rust/executor/src/flight_service.rs:104-126`
serves them back as Flight streams), and its clients collect results as
IPC record-batch streams (`rust/core/src/client.rs:122-168`).  Spark has
no built-in IPC file source, so this module provides one, jar-free:

- :func:`read_arrow_ipc` — DataFrame over IPC *file*-format
  (magic ``ARROW1``, random-access footer) or *stream*-format files.
  Distribution follows the WARC/Avro source pattern
  (`sources/warc.py`, `sources/avroio.py`): file PATHS are distributed,
  each task opens its own file and iterates record batches through one
  ``mapInArrow`` stage — batches never cross the JVM as blobs and peak
  memory is O(batch), never O(file).  Unlike the pandas-based sources
  there is no row materialization at all: Arrow in, Arrow out.
- :func:`write_arrow_ipc` — one IPC file per partition, written
  batch-by-batch inside ``mapInArrow`` (O(batch) peak memory); optional
  buffer compression (``lz4``/``zstd``, the two codecs the IPC spec
  defines).

Schema handling: the driver reads ONE file's header (cheap — footer or
first stream message only), maps it through pyspark's own
``from_arrow_schema``, and every task casts each batch to the matching
arrow schema — so large_string/dictionary/timestamp-unit variations
across files normalize to one Spark schema instead of failing the
exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_arrow_ipc", "write_arrow_ipc", "iter_ipc_batches"]

#: IPC file-format magic (Arrow spec: both leading and trailing)
MAGIC = b"ARROW1"


def _local_path(p: str) -> str:
    if p.startswith("file:"):
        p = p[5:]
        while p.startswith("//"):
            p = p[1:]
    return p


def iter_ipc_batches(f):
    """Yield ``pyarrow.RecordBatch`` from an open binary file in either
    IPC format.  File format (``ARROW1`` magic) reads batch-at-a-time
    through the random-access reader; stream format iterates messages.
    Pure core — unit-testable without Spark."""
    import pyarrow.ipc as ipc

    head = f.read(6)
    f.seek(0)
    if head == MAGIC:
        reader = ipc.open_file(f)
        for i in range(reader.num_record_batches):
            yield reader.get_batch(i)
    else:
        with ipc.open_stream(f) as reader:
            yield from reader


def _read_schema(path: str):
    import pyarrow.ipc as ipc

    with open(_local_path(path), "rb") as f:
        head = f.read(6)
        f.seek(0)
        if head == MAGIC:
            return ipc.open_file(f).schema
        with ipc.open_stream(f) as r:
            return r.schema


def read_arrow_ipc(
    spark: SparkSession, path: str, path_glob: str = "*.arrow*"
) -> DataFrame:
    """DataFrame over Arrow IPC file(s) — the reference's shuffle/result
    format (`rust/core/src/utils.rs:49-84`) as a first-class source.

    ``path_glob`` matches ``*.arrow`` and ``*.arrows`` by default; pass
    ``"*.feather"`` for Feather-v2 named files (same format)."""
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.types import from_arrow_schema, to_arrow_schema

    listing = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", path_glob)
        .load(path)
        .select("path")
    )
    first = listing.limit(1).collect()
    if not first:
        raise FileNotFoundError(f"no {path_glob} files under {path!r}")
    spark_schema = from_arrow_schema(_read_schema(first[0]["path"]))
    target = to_arrow_schema(spark_schema)

    def run(batches):
        import pyarrow as pa

        for listing_batch in batches:
            for p in listing_batch.column("path").to_pylist():
                with open(_local_path(p), "rb") as f:
                    for batch in iter_ipc_batches(f):
                        # normalize (large_string, dictionary, ts units,
                        # field order) to the driver-declared schema
                        cols = [batch.column(name) for name in target.names]
                        yield pa.record_batch(cols, names=target.names).cast(
                            target
                        )

    return listing.repartition(F.col("path")).mapInArrow(
        run, schema=spark_schema
    )


def write_arrow_ipc(
    df: DataFrame, path: str, compression: str | None = None
) -> list[str]:
    """Write ``df`` as one Arrow IPC file-format file per partition under
    ``path``; returns the written paths.  Each task streams its batches
    into its file as they arrive (O(batch) peak memory — the same
    discipline as the reference's write_stream_to_disk,
    `rust/core/src/utils.rs:49-84`).  ``compression``: None, ``"lz4"``
    or ``"zstd"`` (IPC buffer compression)."""
    import uuid as _uuid

    from pyspark.sql.pandas.types import to_arrow_schema

    os.makedirs(path, exist_ok=True)
    target = to_arrow_schema(df.schema)
    opts_kw = {"compression": compression} if compression else {}

    def run(batches):
        import pyarrow as pa
        import pyarrow.ipc as ipc

        # stage under a non-matching suffix and rename ONLY on success:
        # a failed/retried task must not leave a structurally-valid
        # partial file that a later read would pick up (review finding —
        # the close() in an except path writes a valid IPC footer)
        writer = None
        uid = _uuid.uuid4().hex
        out = os.path.join(path, f"part-{uid}.arrow")
        # the staging name must NOT contain ".arrow": the default read
        # glob (*.arrow*) would pick up a hard-killed task's leftover
        tmp = os.path.join(path, f".part-{uid}.inprogress")
        try:
            for batch in batches:
                batch = batch.cast(target)
                if writer is None:
                    writer = ipc.new_file(
                        tmp, target, options=ipc.IpcWriteOptions(**opts_kw)
                    )
                writer.write_batch(batch)
        except BaseException:
            if writer is not None:
                writer.close()
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise
        if writer is None:
            return  # empty partition — no file (suppression, like iceberg)
        writer.close()
        os.replace(tmp, out)
        yield pa.record_batch([pa.array([out])], names=["file"])

    files = sorted(
        r["file"]
        for r in df.mapInArrow(run, schema="file string").collect()
        if r["file"] is not None
    )
    if not files:
        # all partitions empty: one empty file so the dataset stays
        # readable (schema survives)
        import pyarrow.ipc as ipc

        out = os.path.join(path, f"part-{_uuid.uuid4().hex}.arrow")
        with ipc.new_file(out, target) as w:  # noqa: F841 — header+footer only
            pass
        files = [out]
    return files
