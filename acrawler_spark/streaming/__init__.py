from acrawler_spark.streaming.seeds import SeedFeeder  # noqa: F401
