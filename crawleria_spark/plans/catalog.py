"""Catalog contract: the storage interface the crawl engine runs on.

`SnapshotCatalog` (parquet dirs + atomic manifest rename) is the
production implementation; `MemoryCatalog` below is a driver-memory
test double proving the engine touches storage ONLY through this
interface. `tests/test_catalog_contract.py` runs one conformance suite
— including a full engine crawl — against every implementation, so
"swap in real Iceberg" (SURVEY.md §4) is an executable claim, not a
promise: implement this ABC over Iceberg and pass that suite.

Concrete Iceberg mapping, method by method (needs the
`org.apache.iceberg:iceberg-spark-runtime` jar, absent in this offline
sandbox — which is why the double exists):

- ``commit(replace=, append=)`` → one Iceberg *transaction*:
  ``df.writeTo(tbl).overwritePartitions()`` / ``.append()``; ``meta``
  → snapshot summary properties (``commit.properties``); atomicity is
  Iceberg's metadata-pointer swap instead of our manifest rename.
- ``read`` / ``read_as_of`` → ``spark.read.table`` /
  ``VERSION AS OF`` time travel; ``_versions`` → the snapshot log.
- ``n_dirs`` → data-file count from the snapshot manifest (compaction
  trigger); ``compact`` → ``rewrite_data_files``; ``gc`` →
  ``expire_snapshots``.
- ``published_path`` → not needed: Structured Streaming reads Iceberg
  tables incrementally by snapshot id, replacing the symlink scheme.

The round-commit protocol in `plans/engine.py` (append-only deltas,
pinned base version + in-memory overlay for pipelined commits) relies
on exactly the guarantees this ABC states and the suite checks.
"""

from __future__ import annotations

import threading
import uuid
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession


class Catalog(ABC):
    """Versioned multi-table catalog with atomic cross-table commits.

    Contract (each clause has a conformance test):

    1. ``commit`` publishes ALL its tables + meta atomically: a reader
       sees either the whole commit or the previous version.
    2. APPEND mode accumulates: committed rows are never rewritten by a
       later append; a round commit costs O(round delta).
    3. REPLACE mode supersedes the table's entire prior content.
    4. Tables not named in a commit carry forward unchanged; ``drop``
       removes a table from the new version (data reclaimed by ``gc``).
    5. Versions are monotonically increasing; ``read_as_of(v)`` returns
       the table exactly as committed at v (time travel), for any v a
       ``gc`` has not expired.
    6. ``latest_meta`` returns the meta dict of the newest commit.
    """

    # -- abstract storage core -------------------------------------------

    @abstractmethod
    def _versions(self) -> list[int]:
        """All live manifest versions, ascending."""

    @abstractmethod
    def _load_manifest(self, version: int) -> dict:
        """Manifest dict: {'version', 'tables': {name: [segment,...]}, 'meta'}."""

    @abstractmethod
    def read(self, table: str) -> DataFrame:
        """Latest committed content of `table` (KeyError if absent)."""

    @abstractmethod
    def read_as_of(self, table: str, version: int) -> DataFrame:
        """`table` exactly as committed at `version` (time travel)."""

    @abstractmethod
    def commit(
        self,
        replace: dict[str, DataFrame] | None = None,
        append: dict[str, DataFrame] | None = None,
        meta: dict | None = None,
        drop: list[str] | None = None,
    ) -> int:
        """Atomically publish a new version; returns its number."""

    @abstractmethod
    def gc(self, keep_last: int = 2) -> None:
        """Reclaim data reachable only from versions older than keep_last."""

    @abstractmethod
    def published_path(self, table: str) -> str:
        """Glob root a streaming reader can tail for an append table's
        COMMITTED delta segments (filesystem catalogs only)."""

    # -- derived (manifest-only) ------------------------------------------

    def latest_version(self) -> int | None:
        versions = self._versions()
        return versions[-1] if versions else None

    def latest_manifest(self) -> dict | None:
        v = self.latest_version()
        return self._load_manifest(v) if v is not None else None

    def latest_meta(self) -> dict:
        m = self.latest_manifest()
        return (m or {}).get("meta", {})

    def exists(self, table: str) -> bool:
        m = self.latest_manifest()
        return bool(m) and table in m["tables"]

    def exists_as_of(self, table: str, version: int) -> bool:
        return table in self._load_manifest(version)["tables"]

    def n_dirs(self, table: str) -> int:
        m = self.latest_manifest()
        return len(m["tables"].get(table, [])) if m else 0

    def n_dirs_as_of(self, table: str, version: int) -> int:
        return len(self._load_manifest(version)["tables"].get(table, []))

    def compact(self, table: str, meta: dict | None = None) -> None:
        """Rewrite an append table's accumulated segments into one
        (bounds listing cost on long crawls); atomic like any commit."""
        df = self.read(table)
        self.commit(replace={table: df}, meta=meta or self.latest_meta())


class MemoryCatalog(Catalog):
    """Driver-memory Catalog double: segments are collected row lists.

    Exists to prove interface conformance (the engine crawls identically
    on it — see test_catalog_contract.py), NOT for production: content
    lives in driver memory, so it is bounded by the driver heap and
    `published_path` (filesystem streaming tails) is unsupported.
    Thread-safe for the engine's pipelined-commit background thread."""

    def __init__(self, spark: SparkSession, root: str | None = None):
        self.spark = spark
        self.root = root or f"memory://{uuid.uuid4().hex[:8]}"
        self._lock = threading.Lock()
        self._manifests: dict[int, dict] = {}
        # segment key -> (schema, [Row, ...]); immutable once written
        self._segments: dict[str, tuple] = {}

    # -- storage core ------------------------------------------------------

    def _versions(self) -> list[int]:
        with self._lock:
            return sorted(self._manifests)

    def _load_manifest(self, version: int) -> dict:
        with self._lock:
            return self._manifests[version]

    def _read_segments(self, keys: list[str]) -> DataFrame:
        # snapshot (schema, rows) under the lock: a concurrent gc() from the
        # engine's pipelined-commit thread may delete a segment between the
        # manifest load and this read otherwise.
        with self._lock:
            schema = self._segments[keys[-1]][0]
            rows = [r for k in keys for r in self._segments[k][1]]
        return self.spark.createDataFrame(rows, schema)

    def read(self, table: str) -> DataFrame:
        m = self.latest_manifest()
        if not m or table not in m["tables"]:
            raise KeyError(f"table {table!r} not in catalog at {self.root}")
        return self._read_segments(m["tables"][table])

    def read_as_of(self, table: str, version: int) -> DataFrame:
        m = self._load_manifest(version)
        if table not in m["tables"]:
            raise KeyError(f"table {table!r} not in manifest v{version}")
        return self._read_segments(m["tables"][table])

    def commit(self, replace=None, append=None, meta=None, drop=None) -> int:
        # materialize OUTSIDE the lock: collects run Spark jobs
        staged = [
            (mode, name, df.schema, df.collect())
            for mode, tbls in (("replace", replace), ("append", append))
            for name, df in (tbls or {}).items()
        ]
        with self._lock:
            prev = self._manifests.get(max(self._manifests), None) if self._manifests else None
            version = (prev["version"] + 1) if prev else 0
            tables = {k: list(v) for k, v in (prev["tables"] if prev else {}).items()}
            for name in drop or []:
                tables.pop(name, None)
            for mode, name, schema, rows in staged:
                key = f"{name}/v{version:06d}_{uuid.uuid4().hex[:8]}"
                self._segments[key] = (schema, rows)
                if mode == "replace":
                    tables[name] = [key]
                else:
                    tables.setdefault(name, []).append(key)
            self._manifests[version] = {
                "version": version,
                "tables": tables,
                "meta": meta or {},
            }
            return version

    def gc(self, keep_last: int = 2) -> None:
        with self._lock:
            versions = sorted(self._manifests)
            if not versions:
                return
            keep = set(versions[-keep_last:])
            live = {
                k
                for v in keep
                for keys in self._manifests[v]["tables"].values()
                for k in keys
            }
            for v in versions:
                if v not in keep:
                    del self._manifests[v]
            for k in list(self._segments):
                if k not in live:
                    del self._segments[k]

    def published_path(self, table: str) -> str:
        raise NotImplementedError(
            "MemoryCatalog is a driver-memory test double; streaming "
            "readers tail filesystem segment publications — use "
            "SnapshotCatalog (or an Iceberg-backed Catalog) for streams."
        )
