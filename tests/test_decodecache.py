"""DecodeCache (sources/decodecache.py): the shared LRU behind the
Delta checkpoint and Iceberg manifest decode caches — review findings
from round 9 pinned here (FIFO-vs-LRU, thread safety, mtime-less
stores, stat-verified inserts)."""

from __future__ import annotations

import threading

from ballista_spark.sources import fsio
from ballista_spark.sources.decodecache import DecodeCache


def _mk(tmp_path, name, content=b"x"):
    p = tmp_path / name
    p.write_bytes(content)
    return str(p)


def test_hit_miss_and_invalidation(tmp_path):
    c = DecodeCache(max_items=100)
    p = _mk(tmp_path, "a.bin", b"one")
    calls = []

    def decode():
        calls.append(1)
        return [fsio.read_bytes(p)]

    assert c.get_or_decode(p, decode) == [b"one"]
    assert c.get_or_decode(p, decode) == [b"one"]
    assert len(calls) == 1  # served from cache
    # in-place rewrite with a DIFFERENT size invalidates via the key
    with open(p, "wb") as f:
        f.write(b"twotwo")
    assert c.get_or_decode(p, decode) == [b"twotwo"]
    assert len(calls) == 2


def test_lru_keeps_the_hot_entry(tmp_path):
    """The hot entry must survive cold-table churn (review finding:
    the first Delta implementation was FIFO and evicted the hottest
    table first)."""
    c = DecodeCache(max_items=10)
    hot = _mk(tmp_path, "hot.bin")
    c.get_or_decode(hot, lambda: list(range(6)))
    for i in range(5):
        cold = _mk(tmp_path, f"cold{i}.bin")
        c.get_or_decode(cold, lambda: list(range(3)))
        # touch the hot entry between cold inserts
        decoded_again = []
        c.get_or_decode(hot, lambda: decoded_again.append(1) or list(range(6)))
        assert not decoded_again, "hot entry was evicted by cold churn"


def test_oversized_items_never_cached(tmp_path):
    c = DecodeCache(max_items=3)
    p = _mk(tmp_path, "big.bin")
    calls = []
    c.get_or_decode(p, lambda: calls.append(1) or list(range(10)))
    c.get_or_decode(p, lambda: calls.append(1) or list(range(10)))
    assert len(calls) == 2  # larger than the whole budget: decode always


def test_mtime_less_store_never_cached(tmp_path, monkeypatch):
    """A store with no mtime can't distinguish a same-size rewrite —
    refuse to cache rather than serve stale (review finding)."""
    c = DecodeCache(max_items=100)
    p = _mk(tmp_path, "m.bin", b"aaa")
    monkeypatch.setattr(fsio, "stat_key", lambda _p: (3, 0))
    calls = []
    c.get_or_decode(p, lambda: calls.append(1) or [1])
    c.get_or_decode(p, lambda: calls.append(1) or [1])
    assert len(calls) == 2


def test_concurrent_resolutions_are_safe(tmp_path):
    """Spark drivers resolve snapshots from several user threads; the
    cache must neither corrupt its budget counter nor raise."""
    c = DecodeCache(max_items=1000)
    paths = [_mk(tmp_path, f"t{i}.bin") for i in range(8)]
    errors = []

    def worker():
        try:
            for _ in range(50):
                for p in paths:
                    assert c.get_or_decode(p, lambda: [p] * 10) == [p] * 10
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    # budget counter consistent: exactly the 8 entries' items counted
    assert c._count == 8 * 10
