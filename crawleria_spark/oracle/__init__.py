from crawleria_spark.oracle.crawler import OracleCrawler, OracleResult

__all__ = ["OracleCrawler", "OracleResult"]
