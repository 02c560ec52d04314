from crawleria_spark.plans.catalog import Catalog, MemoryCatalog
from crawleria_spark.plans.snapshot import SnapshotCatalog
from crawleria_spark.plans.engine import CrawlEngine

__all__ = ["Catalog", "MemoryCatalog", "SnapshotCatalog", "CrawlEngine"]
