"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship BM25 match query over the transcripts view at sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2); each
                 callable (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB SQL producing identical rows for each query, generated
                 by elasticsearch_spark.oracle from the same query dicts.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from elasticsearch_spark import oracle  # noqa: E402
from elasticsearch_spark.plans import query_dsl as Q  # noqa: E402
from elasticsearch_spark.queryset import DEFAULT_K, SEARCH_QUERIES  # noqa: E402
from elasticsearch_spark.sources import transcripts as TR  # noqa: E402

KEYS = ["conv_id", "turn_idx"]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 match query on sf0.001 transcripts."""
    docs = TR.transcripts_view(spark, "/root/testdata/sf0.001")
    return Q.search(docs, SEARCH_QUERIES["match_or_topk"], KEYS, k=DEFAULT_K)


def _search_fn(qd: dict) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = TR.transcripts_view(spark, sf_dir)
        return Q.search(docs, qd, KEYS, k=DEFAULT_K)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, qd in SEARCH_QUERIES.items():
        out[f"search_{name}"] = _search_fn(qd)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, qd in SEARCH_QUERIES.items():
        out[f"search_{name}"] = oracle.search_sql(qd, DEFAULT_K)
    return out
