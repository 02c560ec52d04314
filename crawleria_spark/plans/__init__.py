from crawleria_spark.plans.snapshot import SnapshotCatalog
from crawleria_spark.plans.engine import CrawlEngine

__all__ = ["SnapshotCatalog", "CrawlEngine"]
