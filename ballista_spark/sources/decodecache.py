"""LRU cache for decoded IMMUTABLE metadata artifacts (Delta checkpoint
parts, Iceberg manifests) keyed by (path, size, mtime).

Both lakehouse formats write their heavy metadata files exactly once
(version-named checkpoints, uuid-named manifests), so decoded contents
cache across snapshot resolutions — the per-query production pattern.
The (size, mtime) half of the key invalidates in-place rewrites
(fixture/repair flows); paths whose store reports NO mtime (pyarrow
mtime=None → fsio.mtime_ms 0) are never cached, because size alone
cannot distinguish a same-length rewrite.  The stat is taken before
AND after the decode and the entry is cached only when both agree, so
a replace racing the read can't poison the cache.  All operations hold
one lock: Spark drivers routinely resolve snapshots from several user
threads.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from collections.abc import Callable

from ballista_spark.sources import fsio


class DecodeCache:
    """items-budgeted, thread-safe LRU over decoded file contents.

    ``max_items`` bounds the TOTAL decoded items across all cached
    files (1M-entry artifacts are gigabytes decoded — the budget keeps
    driver RSS predictable, evicting least-recently-USED first)."""

    def __init__(self, max_items: int):
        self.max_items = max_items
        self._lock = threading.Lock()
        self._entries: OrderedDict[tuple, list] = OrderedDict()
        self._count = 0

    def _stat_key(self, paths: tuple[str, ...]) -> tuple | None:
        try:
            key = tuple((p, *fsio.stat_key(p)) for p in paths)
        except (OSError, ValueError):
            return None
        # a store that reports no mtime can't distinguish a same-size
        # in-place rewrite — refuse to cache rather than serve stale
        if any(m == 0 for _p, _s, m in key):
            return None
        return key

    def get_or_decode(
        self,
        paths: str | list[str],
        decode: Callable[[], list],
        tag: str | None = None,
    ) -> list:
        """The decoded items for ``paths`` — cached when possible.
        ``decode`` is called outside the lock.  Callers must treat the
        returned list and its items as READ-ONLY.  ``tag``
        discriminates different decoded REPRESENTATIONS of the same
        file (e.g. the Iceberg read path's compact scan rows vs the
        write path's full manifest entries)."""
        ptuple = (paths,) if isinstance(paths, str) else tuple(paths)
        skey = self._stat_key(ptuple)
        key = None if skey is None else (
            (tag, *skey) if tag is not None else skey
        )
        if key is not None:
            with self._lock:
                cached = self._entries.get(key)
                if cached is not None:
                    self._entries.move_to_end(key)
                    return cached
        items = decode()
        # only cache when the files are provably the ones we decoded
        if key is not None and self._stat_key(ptuple) == skey and (
            len(items) <= self.max_items
        ):
            with self._lock:
                if key not in self._entries:
                    self._entries[key] = items
                    self._count += len(items)
                    while self._count > self.max_items:
                        _k, v = self._entries.popitem(last=False)
                        self._count -= len(v)
        return items

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()
            self._count = 0
