"""Analyzer chains (functions/analyzers.py): executor-side Column expressions
must agree token-for-token with the driver-side Python twin, and each
component must match its reference semantics (modules/analysis-common)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.functions import analyzers
from elasticsearch_spark.operators.suggest import analyze_api

SAMPLES = [
    "The quick brown foxes are jumping over lazy dogs",
    "  spark-SQL   joins: hash_join vs sort-merge!  ",
    "cafés àéîõü résumé naïve",
    "a",
    "",
    "berries boxes classes address",
    "UPPER lower MiXeD 123abc 456",
]

CHAINS = [
    "standard",
    "simple",
    "whitespace",
    "keyword",
    "stop",
    "english_light",
    {"tokenizer": "standard", "filters": ["lowercase", "asciifolding"]},
    {"tokenizer": "letter", "filters": ["lowercase", {"type": "length", "min": 2, "max": 6}]},
    {"tokenizer": "standard", "filters": ["lowercase", "unique", "reverse"]},
    {"tokenizer": "standard", "filters": ["lowercase", {"type": "truncate", "length": 4}]},
    {"tokenizer": "standard", "filters": ["lowercase", {"type": "shingle", "min_shingle_size": 2, "max_shingle_size": 3}]},
    {"tokenizer": "edge_ngram", "min_gram": 1, "max_gram": 3, "filters": ["lowercase"]},
    {"tokenizer": "ngram", "min_gram": 2, "max_gram": 2, "filters": ["lowercase"]},
]


@pytest.mark.parametrize("ci", range(len(CHAINS)))
def test_executor_matches_python_twin(spark, ci):
    chain = CHAINS[ci]
    df = spark.createDataFrame([(s,) for s in SAMPLES], "text string")
    got = df.select(analyzers.tokens("text", chain).alias("t")).collect()
    for row, s in zip(got, SAMPLES):
        assert list(row.t) == analyzers.analyze_text(s, chain), (chain, s)


def test_stop_filter_removes_english_stopwords():
    toks = analyzers.analyze_text("the quick fox is on a log", "stop")
    assert toks == ["quick", "fox", "log"]


def test_minimal_english_stemmer():
    toks = analyzers.analyze_text("berries boxes dogs address is", "english_light")
    # -ies>-y, -es>-e drop, -s drop, -ss kept, stopword 'is' removed
    assert toks == ["berry", "boxe", "dog", "address"]


def test_shingles():
    chain = {
        "tokenizer": "whitespace",
        "filters": [{"type": "shingle", "min_shingle_size": 2, "max_shingle_size": 2}],
    }
    assert analyzers.analyze_text("a b c", chain) == ["a", "b", "c", "a b", "b c"]


def test_keyword_and_whitespace():
    assert analyzers.analyze_text("Foo Bar", "keyword") == ["Foo Bar"]
    assert analyzers.analyze_text("Foo  Bar", "whitespace") == ["Foo", "Bar"]


def test_edge_ngram():
    chain = {"tokenizer": "edge_ngram", "min_gram": 1, "max_gram": 3}
    assert analyzers.analyze_text("spark", chain) == ["s", "sp", "spa"]


def test_analyze_api_with_analyzer(spark):
    rows = analyze_api(spark, "The Quick foxes", "english_light").collect()
    assert [(r.token, r.position) for r in rows] == [("quick", 0), ("foxe", 1)]
    rows = analyze_api(spark, "Thé Quick foxes").collect()
    assert [r.token for r in rows] == ["thé", "quick", "foxes"]
