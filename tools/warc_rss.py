"""Bounded-memory evidence for the streaming WARC ingest.

Generates a synthetic member-gzip ``.warc.gz`` LARGER than 2 GiB on
disk (incompressible random bodies, so compressed ≈ decompressed) —
a file the previous design could not read at all (binaryFile
materializes content into one JVM byte[], hard-capped at 2 GiB) and
would have needed ~3 file-sized allocations to parse.  Then:

1. PURE PATH: stream ``iter_warc_record_batches(_open_chunks(f))`` in
   this process and report ``ru_maxrss`` — the exact code the executor
   runs, so its peak RSS IS the per-task parse footprint.  Expect a few
   hundred MB (python + 4 MiB chunks + 256-record batches of 1 MiB
   payloads), independent of file size.
2. SPARK E2E: ``read_warc`` over the same file, count + sum payload
   sizes — proves the >2 GiB ceiling is gone end-to-end.

Usage: python tools/warc_rss.py [--gib 2.5] [--keep]
Results are recorded in BASELINE.md (round 6).
"""

from __future__ import annotations

import argparse
import gzip
import os
import resource
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BODY = 1 << 20  # 1 MiB per record


def make_archive(path: str, target_bytes: int) -> int:
    rng = np.random.default_rng(42)
    n = 0
    written = 0
    t0 = time.time()
    with open(path, "wb") as f:
        while written < target_bytes:
            body = rng.integers(0, 256, BODY, dtype=np.uint8).tobytes()
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n\r\n"
                + body
            )
            rec = (
                b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Record-ID: <urn:uuid:r%d>\r\n"
                b"WARC-Target-URI: https://example.com/%d\r\n"
                b"Content-Length: %d\r\n\r\n" % (n, n, len(payload))
                + payload
                + b"\r\n\r\n"
            )
            member = gzip.compress(rec, compresslevel=1)
            f.write(member)
            written += len(member)
            n += 1
    print(
        f"# generated {path}: {written / 2**30:.2f} GiB on disk, {n} records,"
        f" {time.time() - t0:.1f}s"
    )
    return n


def maxrss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gib", type=float, default=2.5)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    path = "/tmp/bs_warc_big/big.warc.gz"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not os.path.exists(path) or os.path.getsize(path) < args.gib * 2**30 * 0.95:
        n_records = make_archive(path, int(args.gib * 2**30))
    else:
        n_records = None
        print(f"# reusing {path} ({os.path.getsize(path) / 2**30:.2f} GiB)")
    assert os.path.getsize(path) > (1 << 31), "file must exceed the 2 GiB ceiling"

    # --- 1. pure path: the executor-side parse loop in this process ---
    from ballista_spark.sources.warc import _open_chunks, iter_warc_record_batches

    base = maxrss_mb()
    t0 = time.time()
    n = 0
    nbytes = 0
    errors = 0
    for batch in iter_warc_record_batches(_open_chunks(path), ("response",)):
        for r in batch:
            n += 1
            nbytes += len(r["payload"])
            errors += r["n_parse_errors"]
    dt = time.time() - t0
    peak = maxrss_mb()
    print(
        f"# pure parse: {n} records, {nbytes / 2**30:.2f} GiB payload, "
        f"{errors} errors, {dt:.1f}s "
        f"({nbytes / 2**20 / dt:.0f} MiB/s), peak RSS {peak:.0f} MB "
        f"(baseline {base:.0f} MB)"
    )
    if n_records is not None:
        assert n == n_records
    assert peak < 512, f"parse path not memory-bounded: {peak:.0f} MB"

    # --- 2. Spark e2e over the >2 GiB file ---
    from pyspark.sql import functions as F

    from ballista_spark.session import get_spark
    from ballista_spark.sources.warc import read_warc

    spark = get_spark()
    t0 = time.time()
    row = (
        read_warc(spark, path)
        .select(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("bytes"),
            F.sum("n_parse_errors").alias("errors"),
        )
        .collect()[0]
    )
    print(
        f"# spark e2e: {row['n']} records, {row['bytes'] / 2**30:.2f} GiB payload, "
        f"{row['errors']} errors, {time.time() - t0:.1f}s"
    )
    assert row["n"] == n and row["errors"] == errors

    if not args.keep:
        shutil.rmtree(os.path.dirname(path))
    print("# OK — streaming ingest is memory-bounded and has no 2 GiB ceiling")


if __name__ == "__main__":
    main()
