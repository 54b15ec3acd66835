from acrawler_spark.plans.engine import CrawlConfig, CrawlEngine  # noqa: F401
