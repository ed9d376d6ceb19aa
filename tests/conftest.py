from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from elasticsearch_spark.session import get_spark

    s = get_spark(app_name="es-spark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def transcripts(spark, sf_dir):
    from elasticsearch_spark.sources import transcripts as TR

    df = TR.transcripts_view(spark, sf_dir).cache()
    df.count()
    return df
