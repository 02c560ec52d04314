"""Query-result cache with TTL (reference C1).

The reference memoizes retrieval results in an in-process dict keyed by
the exact query string, fresh iff ``now - ts <= cache_ttl`` (3600 s)
(src/retrieval/retriever.py:56-93; config/config.py:67-68). The engine
equivalent is a result-snapshot table: results are parquet snapshots
keyed by a query hash, with the entry timestamp in the cache manifest.
Unlike ``df.cache()`` this survives the session — matching the
reference's semantics of "same query within TTL returns the stored
results without recomputation".

``now`` is injected (tests pass fixed values — reference P9 determinism
note: no wall-clock in the engine path).
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class QueryCache:
    def __init__(self, spark: SparkSession, root: str, ttl_s: float = 3600.0):
        self.spark = spark
        self.root = root
        self.ttl_s = ttl_s
        os.makedirs(root, exist_ok=True)
        self._index_path = os.path.join(root, "_cache_index.json")

    def _index(self) -> dict:
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                return json.load(f)
        return {}

    def _save_index(self, idx: dict) -> None:
        tmp = os.path.join(self.root, f".tmp_{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(idx, f)
        os.rename(tmp, self._index_path)

    @staticmethod
    def key_for(query: str) -> str:
        return hashlib.sha256(query.encode("utf-8")).hexdigest()[:16]

    def lookup(self, query: str, now: float) -> DataFrame | None:
        """Fresh cache hit → stored DataFrame; miss/stale → None."""
        entry = self._index().get(self.key_for(query))
        if not entry:
            return None
        if now - entry["ts"] > self.ttl_s:
            return None  # stale (reference: entry expired, recompute)
        return self.spark.read.parquet(entry["path"])

    def store(self, query: str, df: DataFrame, now: float) -> None:
        key = self.key_for(query)
        path = os.path.join(self.root, f"q_{key}_{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(path)
        idx = self._index()
        idx[key] = {"ts": now, "path": path, "query": query}
        self._save_index(idx)

    def get_or_compute(self, query: str, compute, now: float) -> tuple[DataFrame, bool]:
        """(result, was_hit). `compute` is a zero-arg fn → DataFrame."""
        hit = self.lookup(query, now)
        if hit is not None:
            return hit, True
        df = compute()
        self.store(query, df, now)
        return self.lookup(query, now), False
