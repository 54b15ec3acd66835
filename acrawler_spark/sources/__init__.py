from acrawler_spark.sources.corpus import (  # noqa: F401
    FIXTURE_T0,
    build_fixture_pages,
    corpus_from_documents,
    fixture_corpus_df,
)
from acrawler_spark.sources.store import CheckpointStore  # noqa: F401
