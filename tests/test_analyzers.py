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
    "<p>Hello &amp; welcome to <b>Spark</b>!</p> &lt;tag&gt;",
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
    # round 4: full Porter + synonym chains (executor/driver twin parity)
    "english_porter",
    {
        "tokenizer": "standard",
        "filters": [
            "lowercase",
            {"type": "synonym", "synonyms": ["quick, fast, rapid", "dogs => canines"]},
        ],
    },
    {
        "tokenizer": "standard",
        "filters": [
            "lowercase",
            {"type": "synonym", "synonyms": ["quick, fast", "a, an"], "expand": False},
            {"type": "stemmer", "language": "porter"},
        ],
    },
    # round 4: char filters (html_strip / mapping / pattern_replace) + trim
    {
        "char_filters": ["html_strip"],
        "tokenizer": "standard",
        "filters": ["lowercase"],
    },
    {
        "char_filters": [
            {"type": "mapping", "mappings": ["- => _", "& => and"]},
            {"type": "pattern_replace", "pattern": "[0-9]+", "replacement": "N"},
        ],
        "tokenizer": "whitespace",
        "filters": ["lowercase", "trim"],
    },
    # round 4: keyword_marker / stemmer_override protect tokens from stemmers
    {
        "tokenizer": "standard",
        "filters": [
            "lowercase",
            {"type": "keyword_marker", "keywords": ["jumping", "foxes"]},
            {"type": "stemmer_override", "rules": ["dogs => doggo"]},
            {"type": "stemmer", "language": "porter"},
        ],
    },
    {
        "tokenizer": "standard",
        "filters": [
            "lowercase",
            {"type": "keyword_marker", "keywords": ["berries"]},
            {"type": "stemmer", "language": "minimal_english"},
        ],
    },
]


def test_keyword_marker_and_override_protect_from_stemmer():
    chain = {"tokenizer": "standard", "filters": [
        "lowercase",
        {"type": "keyword_marker", "keywords": ["running"]},
        {"type": "stemmer_override", "rules": ["ponies => pony"]},
        {"type": "stemmer", "language": "porter"},
    ]}
    got = analyzers.analyze_text("Running ponies are jumping happily", chain)
    # 'running' marked keyword (unstemmed); 'ponies' overridden to 'pony'
    # and NOT re-stemmed (porter would give 'poni'); the rest stem normally
    assert got == ["running", "pony", "ar", "jump", "happili"]


def test_html_strip_semantics():
    chain = {"char_filters": ["html_strip"], "tokenizer": "whitespace",
             "filters": []}
    got = analyzers.analyze_text("<p>a &amp; b</p> &lt;x&gt;", chain)
    assert got == ["a", "&", "b", "<x>"]


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


def test_porter_canonical_vectors():
    """The canonical examples from Porter (1980) §the algorithm — exactly
    Lucene PorterStemmer's outputs."""
    from elasticsearch_spark.functions.porter import porter_stem as p

    vectors = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration", "valenci": "valenc",
        "hesitanci": "hesit", "digitizer": "digit", "conformabli": "conform",
        "radicalli": "radic", "differentli": "differ", "vileli": "vile",
        "analogousli": "analog", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "communism": "commun",
        "activate": "activ", "angulariti": "angular",
        "homologous": "homolog", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
    }
    bad = {w: (p(w), e) for w, e in vectors.items() if p(w) != e}
    assert not bad, bad


def test_synonym_rules():
    from elasticsearch_spark.functions.analyzers import parse_synonym_rules

    m = parse_synonym_rules(["a, b => c, d", "x, y"])
    assert m["a"] == ["c", "d"] and m["b"] == ["c", "d"]
    assert m["x"] == ["x", "y"] and m["y"] == ["x", "y"]
    m2 = parse_synonym_rules(["x, y"], expand=False)
    assert m2["x"] == ["x"] and m2["y"] == ["x"]
    # round 5: multi-word phrases parse to flattened output token lists
    m3 = parse_synonym_rules(["big apple => nyc", "ny, new york"])
    assert m3["big apple"] == ["nyc"]
    assert m3["ny"] == ["ny", "new", "york"]
    assert m3["new york"] == ["ny", "new", "york"]


def test_synonym_expansion_in_chain():
    chain = {
        "tokenizer": "standard",
        "filters": [
            "lowercase",
            {"type": "synonym", "synonyms": ["quick, fast", "dogs => canines"]},
        ],
    }
    assert analyzers.analyze_text("Quick dogs run", chain) == [
        "quick", "fast", "canines", "run",
    ]
