"""Scalable global dense ordinals / global top-k by rank.

``Window.orderBy(...)`` with no partition key collapses to ONE partition
— a driver-killer at 100 TB. The distributed alternative is two-pass:
range-bucket the rows, count per bucket, prefix-sum the offsets, then
partition-local ``row_number`` + offset.

Two bucket strategies:

- ``bucketed_dense_ordinal`` (engine default): when the leading order
  key is a bounded non-negative numeric (the engine's dense priority
  ordinals), the bucket is the PURE EXPRESSION ``floor(key/width)`` —
  no RangePartitioner sampling job, recompute-safe without persist
  pinning, offsets computed distributively.
- ``with_dense_ordinal`` (generic keys): ``repartitionByRange`` +
  persisted two-pass. Carries the documented executor-loss caveat (a
  recomputed block may resample different range boundaries); callers
  needing loss-safety on arbitrary keys should checkpoint.

Used for: priority-ordinal assignment of newly discovered links (crawl
discovery order must be globally dense and deterministic) and for the
page-budget cut (global "first N by priority") when the budget binds —
both via the bucketed variant since r3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_dense_ordinal(
    df: DataFrame,
    order_cols: list[str],
    col_name: str = "ordinal",
    start: int = 0,
    num_partitions: int | None = None,
    registry: list | None = None,
) -> DataFrame:
    """Add a dense 0..n-1 (+start) ordinal in ``order_cols`` order.

    Deterministic provided ``order_cols`` is a total order (pass a
    tie-breaker column). The input is persisted for the two passes
    (count + rank) so the range partitioning cannot diverge between them.

    Pass ``registry`` (a list) to receive the persisted intermediate for
    unpersisting once the result has been fully consumed — otherwise it
    stays cached until LRU eviction (a leak when called every round).

    Caveat at cluster scale: persist survives cache eviction but NOT
    executor loss — a lost block recomputes through repartitionByRange,
    which may resample different range boundaries than the count pass
    saw and mis-assign ordinals. A production deployment that must
    survive executor loss mid-job should swap the persist for
    ``df.checkpoint()`` (reliable storage) at the cost of a write+read;
    the engine consumes ordinals within the round that computes them and
    commits atomically, so a failed round is simply re-run.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *[F.col(c) for c in order_cols]).withColumn(
        "__pid", F.spark_partition_id()
    )
    ranged = ranged.persist()
    if registry is not None:
        registry.append(ranged)
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        ),
        F.col("__pid"),
    ) if offsets else F.lit(start)
    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in order_cols])
    # `ranged` stays persisted until the session evicts it (LRU): the rank
    # pass must see the same range boundaries the count pass saw.
    return ranged.withColumn(
        col_name, (F.row_number().over(w) - F.lit(1) + offset_expr).cast("long")
    ).drop("__pid")


def bucketed_dense_ordinal(
    df: DataFrame,
    bound_col: str,
    order_cols: list[str],
    bound: float,
    col_name: str = "ordinal",
    start: int = 0,
    num_buckets: int | None = None,
) -> DataFrame:
    """Dense 0..n-1 (+start) ordinal, recompute-safe and sampling-free.

    When the LEADING order key is a bounded non-negative numeric (the
    engine's dense priority ordinals, < next_priority from round meta),
    the range partition is the PURE EXPRESSION ``pid = floor(key/width)``
    instead of ``repartitionByRange`` — the same trick as
    politeness.bucketed_host_rank:

    - no RangePartitioner sampling job;
    - deterministic under recompute: a lost block re-derives the same
      pid, so the count pass and the rank pass can never disagree — this
      variant has NO persist-pinning requirement (with_dense_ordinal's
      documented executor-loss caveat does not apply);
    - pid is monotonic in the leading key, so per-pid prefix-sum offsets
      recompose the exact global ordinal.

    The per-pid counts are ≤ num_buckets rows; their prefix-sum window
    and the broadcast join back are negligible at any scale.
    """
    n = num_buckets or df.sparkSession.sparkContext.defaultParallelism
    width = max(1.0, float(bound) / n)
    pid = F.least(F.lit(n - 1), F.floor(F.col(bound_col) / F.lit(width)).cast("int"))
    keyed = df.withColumn("__pid", pid)
    counts = keyed.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
    ).drop("__cnt")
    keyed = keyed.join(F.broadcast(offsets), "__pid", "left")
    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in order_cols])
    return keyed.withColumn(
        col_name,
        (F.row_number().over(w) - 1 + F.coalesce(F.col("__off"), F.lit(0)) + F.lit(start)).cast("long"),
    ).drop("__pid", "__off")


def bucketed_limit_by(
    df: DataFrame,
    bound_col: str,
    order_cols: list[str],
    limit: int,
    bound: float,
    num_buckets: int | None = None,
    registry: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split df into (first `limit` rows by order_cols, the rest) using
    the recompute-safe bucketed ordinal. The persist is a pure
    performance choice (both splits share the rank) — correctness does
    not depend on it, unlike global_limit_by's range-sampled variant."""
    ranked = bucketed_dense_ordinal(
        df, bound_col, order_cols, bound, col_name="__grank",
        num_buckets=num_buckets,
    ).persist()
    if registry is not None:
        registry.append(ranked)
    taken = ranked.filter(F.col("__grank") < limit).drop("__grank")
    rest = ranked.filter(F.col("__grank") >= limit).drop("__grank")
    return taken, rest


def global_limit_by(
    df: DataFrame, order_cols: list[str], limit: int, registry: list | None = None
) -> tuple[DataFrame, DataFrame]:
    """Split df into (first `limit` rows by order_cols, the rest).

    Scalable complement-preserving LIMIT: uses the dense ordinal above
    instead of a single-partition global window. ``registry`` collects
    the persisted intermediates for caller-side unpersist.
    """
    ranked = with_dense_ordinal(
        df, order_cols, col_name="__grank", registry=registry
    ).persist()
    if registry is not None:
        registry.append(ranked)
    taken = ranked.filter(F.col("__grank") < limit).drop("__grank")
    rest = ranked.filter(F.col("__grank") >= limit).drop("__grank")
    return taken, rest


def bucketed_prefix_sum(
    df: DataFrame,
    bound_col: str,
    order_cols: list[str],
    weight_col: str,
    bound: float,
    col_name: str = "cum_before",
    num_buckets: int | None = None,
) -> DataFrame:
    """EXCLUSIVE running sum of ``weight_col`` in ``order_cols`` order —
    the weighted generalization of ``bucketed_dense_ordinal`` (which is
    this with weight 1), same properties: pure-expression bucket from a
    bounded leading key, no sampling job, recompute-safe, offsets are a
    ≤ num_buckets-row aggregate broadcast back. A bare
    ``Window.orderBy`` running sum would collapse to one partition.
    """
    n = num_buckets or df.sparkSession.sparkContext.defaultParallelism
    width = max(1.0, float(bound) / n)
    pid = F.least(F.lit(n - 1), F.floor(F.col(bound_col) / F.lit(width)).cast("int"))
    keyed = df.withColumn("__pid", pid)
    sums = keyed.groupBy("__pid").agg(F.sum(weight_col).alias("__w"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.withColumn(
        "__off", F.coalesce(F.sum("__w").over(w_off), F.lit(0)).cast("long")
    ).drop("__w")
    keyed = keyed.join(F.broadcast(offsets), "__pid", "left")
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return keyed.withColumn(
        col_name,
        (
            F.coalesce(F.sum(weight_col).over(w_in), F.lit(0))
            + F.coalesce(F.col("__off"), F.lit(0))
        ).cast("long"),
    ).drop("__pid", "__off")
