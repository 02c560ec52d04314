from crawleria_spark.synthetic.world import WorldConfig, page_for_url, robots_rules, seed_urls

__all__ = ["WorldConfig", "page_for_url", "robots_rules", "seed_urls"]
