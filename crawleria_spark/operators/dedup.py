"""Deduplication operators for large-scale training-data pipelines.

Five families, each chosen for a different scale/recall trade-off:

- exact_dedup: hash-groupBy on a fingerprint — one shuffle, exact.
- minhash_lsh: shingle → minhash signature → band buckets → bucket
  self-join → exact-Jaccard verify. The self-join is on (band, bucket),
  so only near-duplicates collide; at 100 TB this is the standard
  near-dup path (the verify join is tiny relative to a full cross-join).
- simhash: 64-bit signature, banded into 16-bit chunks for candidate
  generation (Hamming ≤ 3 ⇒ at least one of 4 bands equal — pigeonhole),
  then exact Hamming verify.
- ngram_jaccard: exact verification primitive (used by the LSH verify
  stage; standalone only for bounded candidate sets).
- embedding near-dup: cosine ≥ t pairs via random-hyperplane LSH buckets
  (scale path) or brute force (small dims × small n; oracle-checkable).

Signatures are computed in vectorized numpy over Arrow batches.
All pair outputs are canonicalized (id_a < id_b) and deduplicated.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawleria_spark.functions.text import fingerprint_md5

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row (min id) per normalized-text fingerprint."""
    fp = df.withColumn("__fp", fingerprint_md5(text_col))
    from pyspark.sql import Window

    w = Window.partitionBy("__fp").orderBy(id_col)
    return (
        fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(fingerprint, n_dups, doc_ids) for groups with >1 member."""
    return (
        df.withColumn("fingerprint", fingerprint_md5(text_col))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_dups"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------

def _shingle_hashes(texts: pd.Series, k: int) -> list[np.ndarray]:
    """Per text: uint64 hashes of its k-word shingles (whitespace tokens)."""
    out = []
    for t in texts.fillna(""):
        toks = t.lower().split()
        if len(toks) < k:
            shingles = [" ".join(toks)] if toks else []
        else:
            shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        arr = np.fromiter(
            (hash_str64(s) for s in set(shingles)), dtype=np.uint64, count=len(set(shingles))
        )
        out.append(arr)
    return out


def hash_str64(s: str) -> int:
    """Deterministic 64-bit string hash (FNV-1a; no PYTHONHASHSEED trap)."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 128,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<long>): minhash over k-word shingles.

    n_hashes universal-hash functions a_i·x + b_i mod p (p Mersenne 61),
    evaluated as one (n_shingles × n_hashes) numpy broadcast per doc.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64).astype(object)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64).astype(object)

    def sig_batch(it):
        for pdf in it:
            sigs = []
            for hs in _shingle_hashes(pdf[text_col], shingle_k):
                if len(hs) == 0:
                    sigs.append([0] * n_hashes)
                    continue
                x = hs.astype(object)[:, None]  # python ints: exact mod-p math
                vals = (a[None, :] * x + b[None, :]) % _MERSENNE
                sigs.append([int(v) for v in vals.min(axis=0)])
            yield pd.DataFrame({id_col: pdf[id_col], "sig": sigs})

    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(sig_batch, schema=schema)


def minhash_lsh_candidates(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = 16
) -> DataFrame:
    """Band the signatures, bucket-join: (id_a, id_b) candidate pairs.

    rows_per_band = n_hashes / bands. Collision probability for Jaccard
    s is 1-(1-s^r)^b — the standard S-curve knob.
    """
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.array(*[F.lit(i) for i in range(bands)]),
                lambda i: F.xxhash64(
                    F.slice(
                        F.col("sig"),
                        i * (F.size("sig") / bands).cast("int") + 1,
                        (F.size("sig") / bands).cast("int"),
                    ).cast("string")
                ),
            )
        ).alias("band", "bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return pairs


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact k-word-shingle Jaccard for candidate (id_a, id_b) pairs."""
    texts = df.select(F.col(id_col), F.col(text_col))
    joined = (
        pairs.join(texts.withColumnsRenamed({id_col: "id_a", text_col: "text_a"}), "id_a")
        .join(texts.withColumnsRenamed({id_col: "id_b", text_col: "text_b"}), "id_b")
    )

    def jac(it):
        for pdf in it:
            ha = _shingle_hashes(pdf["text_a"], shingle_k)
            hb = _shingle_hashes(pdf["text_b"], shingle_k)
            out = []
            for x, y in zip(ha, hb):
                union = len(np.union1d(x, y))
                inter = len(np.intersect1d(x, y))
                out.append(inter / union if union else 1.0)
            yield pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "jaccard": out}
            )

    schema = T.StructType(
        [
            pairs.schema["id_a"],
            pairs.schema["id_b"],
            T.StructField("jaccard", T.DoubleType()),
        ]
    )
    return joined.mapInPandas(jac, schema=schema)


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 128,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Full near-dup pipeline: minhash → LSH candidates → exact verify."""
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k, seed)
    cand = minhash_lsh_candidates(sigs, id_col, bands)
    verified = ngram_jaccard(df, cand, text_col, id_col, shingle_k)
    return verified.filter(F.col("jaccard") >= jaccard_threshold)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash long): 64-bit simhash over whitespace tokens."""

    def sim_batch(it):
        for pdf in it:
            out = []
            for t in pdf[text_col].fillna(""):
                toks = t.lower().split()
                if not toks:
                    out.append(0)
                    continue
                hs = np.fromiter(
                    (hash_str64(tok) for tok in toks), dtype=np.uint64, count=len(toks)
                )
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                    np.int64
                )
                votes = (2 * bits - 1).sum(axis=0)
                sh = np.uint64(0)
                for i in np.nonzero(votes > 0)[0]:
                    sh |= np.uint64(1) << np.uint64(i)
                out.append(int(sh.astype(np.int64)))  # two's-complement long
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    schema = T.StructType(
        [df.schema[id_col], T.StructField("simhash", T.LongType())]
    )
    return df.select(id_col, text_col).mapInPandas(sim_batch, schema=schema)


def simhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Candidates via 4 × 16-bit bands (pigeonhole: ≤3 differing bits can't
    touch all 4 bands), verified with an exact popcount.
    """
    sigs = simhash_signatures(df, text_col, id_col)
    bands = sigs.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("band", "chunk"),
    )
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------

def cosine_expr(vec_a, vec_b):
    """JVM-side cosine similarity of two array<float|double> columns.

    Elements are cast to double BEFORE multiplying so the arithmetic is
    bit-identical to a double-precision oracle (float32 multiply then
    widen would differ in the last ulps)."""
    dot = F.aggregate(
        F.zip_with(vec_a, vec_b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (norm(vec_a) * norm(vec_b))


def embedding_dup_pairs_brute(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs with cosine >= threshold — O(n²) cross join; the exact
    baseline for small n and the verify stage for the LSH variant."""
    l = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    r = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        l.join(r, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_dup_pairs_lsh(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 4,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Scale path: random-hyperplane LSH buckets (n_tables independent
    sign-signatures) → bucket self-join → exact cosine verify. Recall is
    probabilistic per table and boosted by table count; precision is
    exact (verify stage)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim)).astype(np.float32)
    bc = df.sparkSession.sparkContext.broadcast(planes)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bucket_ids(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (n, dim)
        p = bc.value
        out = []
        signs = np.einsum("nd,tpd->ntp", mat, p) > 0  # (n, tables, planes)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        codes = (signs * weights[None, None, :]).sum(axis=2)  # (n, tables)
        for row in codes:
            out.append([int(t * (1 << n_planes) + c) for t, c in enumerate(row)])
        return pd.Series(out)

    bucketed = df.select(
        F.col(id_col), F.col(vec_col), F.explode(bucket_ids(F.col(vec_col))).alias("bucket")
    )
    l, r = bucketed.alias("l"), bucketed.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col(f"l.{vec_col}").alias("va"),
            F.col(f"r.{vec_col}").alias("vb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
