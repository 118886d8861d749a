import pytest

from cs6913_web_search_engines_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").cache()


@pytest.fixture(scope="session")
def built(spark, documents):
    """Shared (postings, doc_stats, stats, lexicon) at sf0.001."""
    from cs6913_web_search_engines_spark.operators import index_build as ib

    postings = ib.build_postings(documents).cache()
    doc_stats = ib.build_doc_stats(documents, postings).cache()
    stats = ib.corpus_stats(doc_stats)
    lexicon = ib.build_lexicon(postings).cache()
    return postings, doc_stats, stats, lexicon
