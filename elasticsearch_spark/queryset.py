"""The reference query set (FIXTURES.md F2 shape): match/bool top-k queries
run by both the Spark engine and the DuckDB oracle. Keep query text free of
duplicated terms (BooleanQuery duplicate-clause semantics are out of scope)."""

SEARCH_QUERIES: dict[str, dict] = {
    "match_or_topk": {"match": {"text": "spark query fast"}},
    "match_and_topk": {"match": {"text": {"query": "join table scan", "operator": "and"}}},
    "match_msm_topk": {"match": {"text": {"query": "window agg stream batch", "minimum_should_match": 3}}},
    "match_single_term": {"match": {"text": "customer"}},
    "bool_must_filter": {
        "bool": {
            "must": [{"match": {"text": "join table"}}],
            "filter": [{"term": {"role": "user"}}],
        }
    },
    "bool_must_not": {
        "bool": {
            "must": [{"match": {"text": "data slow"}}],
            "must_not": [{"term": {"tool": "code"}}],
        }
    },
    "bool_should_msm": {
        "bool": {
            "should": [
                {"match": {"text": "sort column"}},
                {"match": {"text": "group row"}},
                {"match": {"text": "stream batch"}},
            ],
            "minimum_should_match": 2,
        }
    },
    "bool_mixed": {
        "bool": {
            "must": [{"match": {"text": "query"}}],
            "should": [{"match": {"text": "fast big"}}],
            "filter": [{"range": {"turn_idx": {"gte": 2, "lt": 18}}}],
            "must_not": [{"term": {"role": "system"}}],
        }
    },
    "bool_filter_only": {
        "bool": {
            "filter": [{"term": {"tool": "search"}}, {"range": {"turn_idx": {"lte": 5}}}],
        }
    },
    "match_phrase_topk": {"match_phrase": {"text": "table hash"}},
    "term_scored": {"term": {"tool": "browser"}},
    "dis_max_topk": {
        "dis_max": {
            "queries": [{"match": {"text": "scan filter"}}, {"match": {"text": "value key"}}],
            "tie_breaker": 0.3,
        }
    },
    "constant_score_topk": {"constant_score": {"filter": {"term": {"role": "tool"}}, "boost": 2.5}},
    "ids_lookup": {"ids": {"values": ["conv_000003#4", "conv_000007#11", "conv_000011#0"]}},
}

DEFAULT_K = 10
