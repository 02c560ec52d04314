"""Persisted ANN index layout: probe by partition pruning, not rescans.

The scan-time probes in ``operators/ann.py`` (cosine_topk_ivf /
cosine_topk_lsh) are map-only and Arrow-batched, but every query pays a
full-corpus pass to recompute each row's cell/bucket membership before
the (tiny) exact rerank. At 10^9+ vectors the scale-safe shape is an
indexed LAYOUT built once at ingest:

- ``<root>/ivf``: the corpus with its IVF cell assignment, written
  ``partitionBy("ivf_cell")`` — a probe filters on the PARTITION column
  and Spark's partition pruning reads only the ~nprobe/n_centroids
  directories that can match (the engine twin of ColiVara's server-side
  create-or-get index, reference src/document_processor/processor.py:141-147;
  FAISS's IVF inverted lists as a parquet directory layout).
- ``<root>/lsh``: sign-bucket postings, one row per (table_id, code,
  vector), written ``partitionBy("table_id", "code")``. Multi-table LSH
  stores the vector once PER TABLE — the textbook space-for-recall
  trade — so a probe reads exactly the n_tables matching bucket
  directories and nothing else, then dedups ids and reranks exactly.
- ``<root>/meta.json``: centroids, hyperplanes, params — the index is
  self-contained; probes never depend on re-deriving randomness.

Cell/bucket assignment is computed with the SAME numpy expressions as
the scan-time probes (one vectorized pandas UDF pass per layout), so an
indexed probe returns bit-identical candidates to the scan probe with
the same centroids/planes — asserted in tests/test_dedup_ann.py.

At 100 TB: directory-per-partition works to ~10^4 partitions; beyond
that (n_tables × 2^n_planes grows past it) the same columns become
Iceberg identity-partition / bucket transforms and the probe's
partition pruning goes through the manifest instead of the directory
listing — same plan shape, same pruning, no code change in the probe
predicate.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawleria_spark.operators.ann import cosine_topk_brute, ivf_centroids


class AnnIndex:
    """Handle on a built index directory (see module docstring)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        with open(os.path.join(root, "meta.json")) as f:
            m = json.load(f)
        self.vec_col: str = m["vec_col"]
        self.id_col: str = m["id_col"]
        self.centroids = np.asarray(m["centroids"], dtype=np.float64)
        self.planes = np.asarray(m["planes"], dtype=np.float64)
        self.n_planes: int = m["n_planes"]
        self.n_tables: int = m["n_tables"]
        self._dfs: dict[str, DataFrame] = {}

    def _table(self, name: str) -> DataFrame:
        # the index is immutable once built, so the DataFrame handle —
        # and with it the partition-directory listing (InMemoryFileIndex)
        # — is safe to reuse across probes; re-listing the n_tables ×
        # 2^n_planes bucket directories on every query otherwise
        # dominates probe latency at small scale (measured 1.2 s vs a
        # 0.36 s probe at sf0.1)
        if name not in self._dfs:
            self._dfs[name] = self.spark.read.parquet(os.path.join(self.root, name))
        return self._dfs[name]

    def ivf_df(self) -> DataFrame:
        return self._table("ivf")

    def lsh_df(self) -> DataFrame:
        return self._table("lsh")

    @staticmethod
    def exists(root: str) -> bool:
        return os.path.isfile(os.path.join(root, "meta.json"))


def _lsh_planes(n_tables: int, n_planes: int, dim: int, seed: int) -> np.ndarray:
    # identical draw to ann.cosine_topk_lsh — same seed, same buckets
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim)).astype(np.float64)


def build_ann_index(
    df: DataFrame,
    root: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> AnnIndex:
    """One ingest-time pass per layout: assign IVF cells + LSH codes
    with vectorized pandas UDFs, persist partitioned by them."""
    spark = df.sparkSession
    if centroids is None:
        centroids = ivf_centroids(df, vec_col, n_centroids, seed=seed)
    dim = centroids.shape[1]
    planes = _lsh_planes(n_tables, n_planes, dim, seed)
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    bc = spark.sparkContext.broadcast((centroids, planes, weights))

    @F.pandas_udf(T.IntegerType())
    def ivf_cell(vecs: pd.Series) -> pd.Series:
        cents, _, _ = bc.value
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series((mat @ cents.T).argmax(axis=1).astype(np.int32))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def lsh_codes(vecs: pd.Series) -> pd.Series:
        _, p, w = bc.value
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        signs = np.einsum("nd,tpd->ntp", mat, p) > 0  # (n, tables, planes)
        codes = (signs * w[None, None, :]).sum(axis=2)  # (n, tables)
        return pd.Series(list(codes))

    os.makedirs(root, exist_ok=True)
    base = df.select(id_col, vec_col)
    # repartition on the partition column(s) before writing so each
    # bucket directory holds one file per shuffle partition that owns it
    # (without this, every write task sprays a file into every bucket it
    # touches: tasks × buckets small files, and probe-time listing pays
    # for all of them); at petabyte scale size the repartition width to
    # data/128MB per bucket instead
    (
        base.withColumn("ivf_cell", ivf_cell(F.col(vec_col)))
        .repartition("ivf_cell")
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(os.path.join(root, "ivf"))
    )
    (
        base.withColumn("__codes", lsh_codes(F.col(vec_col)))
        .select(
            id_col,
            vec_col,
            F.posexplode("__codes").alias("table_id", "code"),
        )
        .repartition("table_id", "code")
        .write.mode("overwrite")
        .partitionBy("table_id", "code")
        .parquet(os.path.join(root, "lsh"))
    )
    with open(os.path.join(root, "meta.json"), "w") as f:
        json.dump(
            {
                "vec_col": vec_col,
                "id_col": id_col,
                "n_centroids": int(centroids.shape[0]),
                "n_planes": n_planes,
                "n_tables": n_tables,
                "seed": seed,
                "centroids": centroids.tolist(),
                "planes": planes.tolist(),
            },
            f,
        )
    return AnnIndex(spark, root)


def ivf_probe_topk(index: AnnIndex, query_vec, k: int = 5, nprobe: int = 4) -> DataFrame:
    """Exact top-k inside the nprobe cells nearest the query. The
    filter is on the PARTITION column — the scan reads only the probed
    directories (plan-gated in tests/test_plans.py)."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / np.linalg.norm(q)
    cells = [int(c) for c in np.argsort(index.centroids @ q)[::-1][:nprobe]]
    probed = index.ivf_df().filter(F.col("ivf_cell").isin(cells))
    return cosine_topk_brute(probed, query_vec, k, index.vec_col, index.id_col)


def lsh_probe_topk(index: AnnIndex, query_vec, k: int = 5) -> DataFrame:
    """Exact top-k inside the query's n_tables sign buckets. The
    (table_id, code) predicate is an OR of partition-column
    conjunctions — pruned to exactly those bucket directories."""
    q = np.asarray(query_vec, dtype=np.float64)
    weights = 1 << np.arange(index.n_planes, dtype=np.int64)
    pred = F.lit(False)
    for t in range(index.n_tables):
        code = int((((index.planes[t] @ q) > 0) * weights).sum())
        pred = pred | ((F.col("table_id") == t) & (F.col("code") == code))
    cand = index.lsh_df().filter(pred).dropDuplicates([index.id_col])
    return cosine_topk_brute(cand, query_vec, k, index.vec_col, index.id_col)
