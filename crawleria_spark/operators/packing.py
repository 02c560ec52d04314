"""Sequence packing for LLM pretraining batches.

The standard pretraining data shape: concatenate the token streams of
all documents in a fixed deterministic order, then chunk the stream
into ``budget``-token training sequences. A document belongs to the
pack where it STARTS (``pack_id``) at stream offset ``pack_offset``;
documents may straddle pack boundaries — the consumer splits them at
chunk edges, exactly like GPT-style concat-and-chunk loaders. (Greedy
bin packing without splitting is deliberately NOT offered: its pack
assignment is a sequential recurrence — each boundary depends on every
predecessor — which distributes badly and wastes budget tail space the
concat-and-chunk form uses.)

Scale shape: one ≤ num_buckets-row aggregate + broadcast (the bucketed
prefix sum) — no global single-partition window, no shuffle of the
corpus beyond the bucket-local rank. 100 TB of documents pack with the
same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawleria_spark.operators.ordinal import bucketed_prefix_sum


def pack_sequences(
    docs: DataFrame,
    budget: int,
    token_col: str,
    bound_col: str,
    bound: float,
    order_cols: list[str] | None = None,
    num_buckets: int | None = None,
) -> DataFrame:
    """Assign each doc its training pack: ``pack_id`` (which
    budget-token chunk its first token lands in) and ``pack_offset``
    (token offset within that chunk). ``bound_col``/``bound`` feed the
    pure-expression bucketing (leading order key, non-negative, <
    bound — e.g. a dense doc_id)."""
    order_cols = order_cols or [bound_col]
    cum = bucketed_prefix_sum(
        docs, bound_col, order_cols, token_col,
        bound=bound, col_name="__cum", num_buckets=num_buckets,
    )
    return (
        cum.withColumn(
            "pack_id", F.floor(F.col("__cum") / F.lit(budget)).cast("long")
        )
        .withColumn("pack_offset", (F.col("__cum") % F.lit(budget)).cast("long"))
        .drop("__cum")
    )
