"""Scalable global dense ordinals / global top-k by rank.

``Window.orderBy(...)`` with no partition key collapses to ONE partition
— a driver-killer at 100 TB. The standard distributed alternative:

1. ``repartitionByRange`` on the order keys (rows in partition p all
   sort before partition p+1),
2. count rows per partition (tiny aggregate collected to the driver),
3. cumulative offsets per partition, broadcast back,
4. partition-local ``row_number`` + offset.

Used for: priority-ordinal assignment of newly discovered links (crawl
discovery order must be globally dense and deterministic) and for the
page-budget cut (global "first N by priority") when the budget binds.
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
