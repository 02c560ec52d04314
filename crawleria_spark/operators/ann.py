"""Similarity search over embedding columns (array<float>).

- cosine_topk_brute: exact top-k by cosine against a query vector —
  JVM-side arithmetic (zip_with/aggregate, whole-stage codegen) +
  TakeOrderedAndProject. The baseline and the oracle-checkable path.
- cosine_topk_pandas: same semantics, scoring in one numpy matmul per
  Arrow batch — wins for wide vectors / large batches where the
  per-element JVM expression tree is slower than BLAS.
- cosine_topk_lsh: scale path — random-hyperplane sign buckets
  (multi-table), probe only the query's buckets, exact rerank inside.
  At 10^9 vectors the probe touches ~n/2^planes per table instead of n.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawleria_spark.operators.dedup import cosine_expr


def _query_lit(query_vec) -> "F.Column":
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk_brute(
    df: DataFrame,
    query_vec,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k: (id, cosine) ordered desc, deterministic tiebreak."""
    scored = df.select(
        F.col(id_col), cosine_expr(F.col(vec_col), _query_lit(query_vec)).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def cosine_topk_pandas(
    df: DataFrame,
    query_vec,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Same result as brute; scoring via one numpy matmul per batch."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    bc = df.sparkSession.sparkContext.broadcast(q)

    @F.pandas_udf(T.DoubleType())
    def score(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        sims = mat @ bc.value / (np.linalg.norm(mat, axis=1) * qn)
        return pd.Series(sims)

    scored = df.select(F.col(id_col), score(F.col(vec_col)).alias("cosine"))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 10,
    sample_rows: int = 10_000,
    seed: int = 42,
) -> np.ndarray:
    """Train IVF centroids: mini k-means (Lloyd) on a driver-side sample.

    The sample is a seeded `df.sample()` at fraction sample_rows/n with
    NO limit — uniform across ALL partitions (a bare `.limit()` reads
    only the first partitions and biases centroids on sorted/clustered
    data; a limit AFTER sample() re-introduces the same bias by taking
    sampled rows in partition order). The sample size is ~sample_rows
    ± a few %, which k-means doesn't care about; at 10^9 vectors the
    driver still only sees ~`sample_rows` rows; centroids are
    (n_centroids × dim) floats, trivially broadcastable.
    """
    n = df.count()
    vecs = df.select(vec_col)
    if n > sample_rows:
        vecs = vecs.sample(fraction=min(1.0, sample_rows / n), seed=seed)
    sample = np.stack(
        [np.asarray(r[0], dtype=np.float64) for r in vecs.collect()]
    )
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=n_centroids, replace=False)]
    for _ in range(iters):
        sims = sample @ centroids.T  # cosine on unit vectors
        assign = sims.argmax(axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / np.linalg.norm(v)
    return centroids


def cosine_topk_ivf(
    df: DataFrame,
    query_vec,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF probe: scan only the nprobe cells nearest the query, exact
    rerank inside. The inverted-file analogue of the LSH path — recall
    is tunable via nprobe/n_centroids; precision exact."""
    if centroids is None:
        centroids = ivf_centroids(df, vec_col, n_centroids, seed=seed)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / np.linalg.norm(q)
    probe_cells = set(np.argsort(centroids @ q)[::-1][:nprobe].tolist())
    bc = df.sparkSession.sparkContext.broadcast((centroids, sorted(probe_cells)))

    @F.pandas_udf(T.BooleanType())
    def in_probed_cell(vecs: pd.Series) -> pd.Series:
        cents, cells = bc.value
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        assign = (mat @ cents.T).argmax(axis=1)
        return pd.Series(np.isin(assign, cells))

    probed = df.filter(in_probed_cell(F.col(vec_col)))
    return cosine_topk_brute(probed, query_vec, k, vec_col, id_col)


def cosine_topk_lsh(
    df: DataFrame,
    query_vec,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe only LSH buckets matching the query.

    Recall grows with n_tables (independent chances) and shrinks with
    n_planes (selectivity); rerank inside the probed set is exact.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    dim = len(q)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim)).astype(np.float64)
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    q_codes = {
        int(t * (1 << n_planes) + (((planes[t] @ q) > 0) * weights).sum())
        for t in range(n_tables)
    }
    bc = df.sparkSession.sparkContext.broadcast((planes, sorted(q_codes)))

    @F.pandas_udf(T.BooleanType())
    def in_query_bucket(vecs: pd.Series) -> pd.Series:
        p, codes = bc.value
        codeset = set(codes)
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        signs = np.einsum("nd,tpd->ntp", mat, p) > 0
        row_codes = (signs * weights[None, None, :]).sum(axis=2)  # (n, tables)
        hit = np.zeros(len(mat), dtype=bool)
        for t in range(row_codes.shape[1]):
            hit |= np.isin(row_codes[:, t] + t * (1 << n_planes), list(codeset))
        return pd.Series(hit)

    probed = df.filter(in_query_bucket(F.col(vec_col)))
    return cosine_topk_brute(probed, query_vec, k, vec_col, id_col)
