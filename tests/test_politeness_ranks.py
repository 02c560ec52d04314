"""Three-implementation agreement for per-host ranking: the plain
window (tail path), the persist-pinned salted range variant, and the
deterministic priority-bucket variant the engine uses (recompute-safe,
no sampling job). All must assign identical politeness slots."""

import pytest
from pyspark.sql import functions as F

from crawleria_spark.operators.politeness import (
    bucketed_host_rank,
    per_host_rank,
    salted_host_rank,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # hub host holds ~30% of rows; priorities are dense global ordinals
    base = spark.range(20_000).withColumn(
        "host",
        F.when(F.col("id") % 10 < 3, F.lit("hub.example.com")).otherwise(
            F.concat(F.lit("h"), (F.col("id") % 37), F.lit(".example.org"))
        ),
    )
    return base.select(
        F.concat(F.lit("https://"), "host", F.lit("/p/"), "id").alias("url_canon"),
        "host",
        F.col("id").cast("double").alias("priority"),
    ).persist()


def _slots(df):
    return {
        r["url_canon"]: r["slot"]
        for r in df.select("url_canon", "slot").collect()
    }


def test_rank_variants_agree(spark, skewed):
    order = ["priority", "url_canon"]
    plain = _slots(per_host_rank(skewed, "host", order, col_name="slot"))
    reg: list = []
    salted = _slots(
        salted_host_rank(skewed, "host", order, col_name="slot", registry=reg)
    )
    bucketed = _slots(
        bucketed_host_rank(
            skewed, "host", "priority", order,
            priority_bound=20_000, col_name="slot", num_buckets=16,
        )
    )
    for df in reg:
        df.unpersist()
    assert bucketed == plain
    assert salted == plain
    # sanity: hub host rank really is a dense 0..m-1 sequence
    hub = sorted(v for k, v in plain.items() if "hub" in k)
    assert hub == list(range(len(hub)))


def test_bucketed_rank_degenerate_bounds(spark, skewed):
    """bound smaller than max priority and a single bucket both stay
    correct (buckets clamp; one bucket degenerates to the plain rank)."""
    order = ["priority", "url_canon"]
    plain = _slots(per_host_rank(skewed, "host", order, col_name="slot"))
    for bound, buckets in ((100, 8), (20_000, 1)):
        got = _slots(
            bucketed_host_rank(
                skewed, "host", "priority", order,
                priority_bound=bound, col_name="slot", num_buckets=buckets,
            )
        )
        assert got == plain, (bound, buckets)
