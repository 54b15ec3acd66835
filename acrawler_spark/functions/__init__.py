from acrawler_spark.functions.url import (  # noqa: F401
    canonicalize_col,
    fingerprint_col,
    host_col,
    score_col,
)
from acrawler_spark.functions.udfs import make_parse_page_udf  # noqa: F401
