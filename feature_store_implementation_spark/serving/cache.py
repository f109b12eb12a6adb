"""Driver-side TTL cache for served feature vectors.

Reference parity (cache.py:12-48): maxsize=1000, ttl=3600 s, key =
md5("entity_id|sorted(feature_names)|version") with empty string for absent
parts (cache.py:22-30). LRU-evicting, lazily-expiring — small and driver-
local by design; Spark is not involved in sub-millisecond point serving."""

from __future__ import annotations

import hashlib
import time
from collections import OrderedDict
from typing import Any


class FeatureCache:
    def __init__(self, maxsize: int = 1000, ttl: float = 3600.0):
        self.maxsize = maxsize
        self.ttl = ttl
        self._data: OrderedDict[str, tuple[float, Any]] = OrderedDict()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def make_key(
        entity_id: str,
        feature_names: list[str] | None = None,
        version: str | None = None,
    ) -> str:
        """Exact reference key semantics (cache.py:22-30): sorted names
        joined by ',', empty strings for absent parts, md5 over
        'entity|names|version'."""
        names = ",".join(sorted(feature_names)) if feature_names else ""
        raw = f"{entity_id}|{names}|{version or ''}"
        return hashlib.md5(raw.encode()).hexdigest()

    def get(self, key: str) -> Any | None:
        item = self._data.get(key)
        if item is None:
            self.misses += 1
            return None
        expires, value = item
        if expires < time.monotonic():
            del self._data[key]
            self.misses += 1
            return None
        self._data.move_to_end(key)
        self.hits += 1
        return value

    def set(self, key: str, value: Any) -> None:
        if key in self._data:
            self._data.move_to_end(key)
        self._data[key] = (time.monotonic() + self.ttl, value)
        while len(self._data) > self.maxsize:
            self._data.popitem(last=False)

    def clear(self) -> None:
        self._data.clear()
