"""The reference query set (FIXTURES.md F2 shape): match/bool top-k queries
run by both the Spark engine and the DuckDB oracle. Keep query text free of
duplicated terms (BooleanQuery duplicate-clause semantics are out of scope)."""

import base64 as _b64

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
    "match_phrase_slop_topk": {"match_phrase": {"text": {"query": "merge sort", "slop": 2}}},
    "term_scored": {"term": {"tool": "browser"}},
    "dis_max_topk": {
        "dis_max": {
            "queries": [{"match": {"text": "scan filter"}}, {"match": {"text": "value key"}}],
            "tie_breaker": 0.3,
        }
    },
    "constant_score_topk": {"constant_score": {"filter": {"term": {"role": "tool"}}, "boost": 2.5}},
    "ids_lookup": {"ids": {"values": ["conv_000003#4", "conv_000007#11", "conv_000011#0"]}},
    "multi_match_best": {
        "multi_match": {
            "query": "search code fast",
            "fields": ["text", "tool"],
            "type": "best_fields",
            "tie_breaker": 0.3,
        }
    },
    "multi_match_most": {
        "multi_match": {
            "query": "search code fast",
            "fields": ["text", "tool"],
            "type": "most_fields",
        }
    },
    "match_bool_prefix_topk": {"match_bool_prefix": {"text": "query fas"}},
    # round 5 — multi_match type=cross_fields (BlendedTermQuery): 'search'
    # lives mostly in the tool field, 'join' in text; the blended (max-df)
    # idf and the per-term dis_max across fields are both load-bearing
    "multi_match_cross": {
        "multi_match": {
            "query": "search join",
            "fields": ["text", "tool"],
            "type": "cross_fields",
        }
    },
    "multi_match_cross_msm": {
        "multi_match": {
            "query": "search join fast",
            "fields": ["text", "tool"],
            "type": "cross_fields",
            "minimum_should_match": 2,
            "tie_breaker": 0.3,
        }
    },
    "match_phrase_prefix_topk": {"match_phrase_prefix": {"text": "table ha"}},
    # round 5: expansion-blended idf with a BINDING cap — "s" expands to 6
    # vocabulary terms (scan slow small sort spark stream), max_expansions=3
    # keeps only {scan, slow, small} in term order, so both the idf blend
    # and the silent truncation are under the gate
    "phrase_prefix_blended": {
        "match_phrase_prefix": {
            "text": {"query": "the s", "max_expansions": 3}
        }
    },
    "terms_set_msm": {
        "terms_set": {
            "text": {
                "terms": ["spark", "query", "fast", "join"],
                "minimum_should_match_script": "least(turn_idx, 3)",
            }
        }
    },
    "distance_feature_topk": {
        "distance_feature": {"field": "turn_idx", "origin": 10, "pivot": 5, "boost": 2.0}
    },
    "function_score_topk": {
        "function_score": {
            "query": {"match": {"text": "query"}},
            "functions": [
                {
                    "field_value_factor": {
                        "field": "turn_idx",
                        "factor": 0.5,
                        "modifier": "log1p",
                        "missing": 1,
                    }
                },
                {"filter": {"term": {"role": "user"}}, "weight": 2.0},
            ],
            "score_mode": "sum",
            "boost_mode": "multiply",
        }
    },
    "more_like_this_topk": {
        "more_like_this": {
            "fields": ["text"],
            "like": [{"_id": "conv_000024#13"}, {"_id": "conv_000024#16"}],
            "max_query_terms": 10,
            "min_term_freq": 2,
            "min_doc_freq": 2,
            "minimum_should_match": "30%",
        }
    },
    "query_string_mix": {
        "query_string": {"query": "+query (fast OR slow) -tool:code"}
    },
    "query_string_phrase_wild": {
        "query_string": {"query": '"table hash" OR fas*'}
    },
    # Lucene full-syntax forms (QueryStringQueryParser.java): inclusive /
    # exclusive / open-ended ranges, ^boost (scoring leaf + group), ~fuzzy,
    # ~slop on phrases, /regex/ — each rewrites to existing DSL so both
    # engine paths and the oracle run them through their normal compilers
    "query_string_range_boost": {
        "query_string": {"query": 'turn_idx:[7 TO 9] query^2 "fast scan"~1'}
    },
    "query_string_fuzzy_regex": {
        "query_string": {"query": "quary~1 OR /ind(ex|ices)/ OR (slow scan)^3"}
    },
    "boosting_demote": {
        "boosting": {
            "positive": {"match": {"text": "query fast"}},
            "negative": {"term": {"role": "tool"}},
            "negative_boost": 0.4,
        }
    },
    # docs-only numeric range: answered from the per-segment doc-value block
    # index (NumberFieldMapper BKD points analog), not a docs scan
    "range_turn_idx_topk": {"range": {"turn_idx": {"gte": 7, "lte": 9}}},
    "regexp_topk": {"regexp": {"text": "quer(y|ies)"}},
    "exists_topk": {"exists": {"field": "tool"}},
    "fuzzy_topk": {"fuzzy": {"text": {"value": "quary", "fuzziness": 1}}},
    "simple_query_string_topk": {
        "simple_query_string": {"query": '+table ("join" | scan)'}
    },
    # Painless expression subset (functions/painless.py): script query +
    # script_score with dict-form scripts (ScriptQueryBuilder reg :827,
    # ScriptScoreFunctionBuilder reg :661-683)
    "script_query_topk": {
        "script": {
            "script": {
                "source": "doc['turn_idx'].value % 3 == 0 && doc['turn_idx'].value < 15",
                "lang": "painless",
            }
        }
    },
    # terms lookup (indices/TermsLookup.java): the filter's terms come from a
    # referenced document's field (GET-then-rewrite)
    "terms_lookup_filter": {
        "bool": {
            "must": [{"match": {"text": "query"}}],
            "filter": [
                {
                    "terms": {
                        "tool": {
                            "index": "transcripts",
                            "id": "conv_000003#0",
                            "path": "tool",
                        }
                    }
                }
            ],
        }
    },
    # rank_feature (mapper-extras RankFeatureQueryBuilder): positive feature
    # column scored through the saturation function
    "rank_feature_sat": {
        "rank_feature": {"field": "turn_idx", "saturation": {"pivot": 5}, "boost": 1.5}
    },
    # wrapper (WrapperQueryBuilder): base64-encoded JSON query, decoded in
    # normalize_query so all three paths share the rewrite
    "wrapper_match": {
        "wrapper": {
            "query": _b64.b64encode(b'{"match": {"text": "spark fast"}}').decode()
        }
    },
    # standalone script_score query (ScriptScoreQueryBuilder reg :837):
    # score REPLACED by the script value; rewrites onto function_score
    # boost_mode=replace in normalize_query
    "script_score_topk": {
        "script_score": {
            "query": {"match": {"text": "vector"}},
            "script": {
                "source": "Math.sqrt(1 + doc['turn_idx'].value) * params.f",
                "params": {"f": 1.5},
            },
        }
    },
    "function_score_painless": {
        "function_score": {
            "query": {"match": {"text": "table"}},
            "functions": [
                {
                    "script_score": {
                        "script": {
                            "source": "Math.log(2 + doc['turn_idx'].value) * params.w",
                            "params": {"w": 2},
                        }
                    }
                }
            ],
            "boost_mode": "multiply",
        }
    },
}

# intervals queries (positions semantics; run on BOTH the logical path and
# the segment-store kernel — IntervalsLeaf decodes the indexed positions)
INTERVALS_QUERIES: dict[str, dict] = {
    "intervals_ordered": {
        "intervals": {"text": {"match": {"query": "join table", "ordered": True, "max_gaps": 2}}}
    },
    "intervals_unordered": {
        "intervals": {"text": {"match": {"query": "scan filter", "max_gaps": 3}}}
    },
    # unordered arity 3 — the merged-stream minimal-covering-window form
    "intervals_unordered3": {
        "intervals": {"text": {"match": {"query": "join table merge", "max_gaps": 6}}}
    },
    # round 5 — IntervalsSourceProvider sources beyond `match`
    # (reg SearchModule.java:841), canonicalized in normalize_query so all
    # three twins share one rewrite:
    # any_of over single terms — union occurrence stream, width-0 intervals
    "intervals_any_of": {
        "intervals": {
            "text": {
                "any_of": {
                    "intervals": [
                        {"match": {"query": "scan"}},
                        {"match": {"query": "merge"}},
                        {"match": {"query": "sort"}},
                    ]
                }
            }
        }
    },
    # all_of ordered chain mixing a concrete term, an any_of position, and
    # a dictionary-expanded prefix position
    "intervals_all_of_mixed": {
        "intervals": {
            "text": {
                "all_of": {
                    "ordered": True,
                    "max_gaps": 4,
                    "intervals": [
                        {"match": {"query": "join"}},
                        {
                            "any_of": {
                                "intervals": [
                                    {"match": {"query": "hash"}},
                                    {"match": {"query": "merge"}},
                                ]
                            }
                        },
                        {"prefix": {"prefix": "ta"}},
                    ],
                }
            }
        }
    },
    # standalone wildcard source — anchored-regex token match
    "intervals_wildcard": {
        "intervals": {"text": {"wildcard": {"pattern": "ta*e"}}}
    },
    # standalone fuzzy source — Fuzziness.AUTO resolves to 1 edit at len 5
    "intervals_fuzzy": {
        "intervals": {"text": {"fuzzy": {"term": "joins"}}}
    },
}

# span family (Span*QueryBuilder.java reg SearchModule.java:803-813), rewritten
# by plans.query_dsl._rewrite_span onto match / intervals; both paths + oracle
SPAN_QUERIES: dict[str, dict] = {
    # round 5: gates the SpanWeight similarity wrap (freq -> SimScorer) on
    # an unordered pair distinct from the older span fixtures
    "span_near_bm25": {
        "span_near": {
            "clauses": [
                {"span_term": {"text": "spark"}},
                {"span_term": {"text": "fast"}},
            ],
            "slop": 4,
            "in_order": False,
        }
    },
    "span_near_ordered": {
        "span_near": {
            "clauses": [
                {"span_term": {"text": "join"}},
                {"span_term": {"text": "table"}},
            ],
            "slop": 2,
            "in_order": True,
        }
    },
    "span_first": {
        "span_first": {"match": {"span_term": {"text": "query"}}, "end": 3}
    },
    "span_not": {
        "span_not": {
            "include": {
                "span_near": {
                    "clauses": [
                        {"span_term": {"text": "join"}},
                        {"span_term": {"text": "table"}},
                    ],
                    "slop": 3,
                    "in_order": True,
                }
            },
            "exclude": {"span_term": {"text": "hash"}},
        }
    },
    "span_or_terms": {
        "span_or": {
            "clauses": [
                {"span_term": {"text": "scan"}},
                {"span_term": {"text": "filter"}},
            ]
        }
    },
    "span_multi_prefix": {
        "span_multi": {"match": {"prefix": {"text": "qu"}}}
    },
    # span_multi NESTED in span_near: the second chain position accepts any
    # term with the prefix (SpanMultiTermQueryBuilder inside SpanNear)
    "span_near_multi": {
        "span_near": {
            "clauses": [
                {"span_term": {"text": "join"}},
                {"span_multi": {"match": {"prefix": {"text": "ta"}}}},
            ],
            "slop": 3,
            "in_order": True,
        }
    },
    # span_gap (SpanGapQueryBuilder reg :811): a fixed 1-position placeholder
    # between the two terms — consumes window, not slop
    "span_gap_near": {
        "span_near": {
            "clauses": [
                {"span_term": {"text": "join"}},
                {"span_gap": {"text": 1}},
                {"span_term": {"text": "table"}},
            ],
            "slop": 2,
            "in_order": True,
        }
    },
    # field_masking_span (FieldMaskingSpanQueryBuilder reg :807): the tool
    # term's positions (from the tool token stream) are masked as `text`
    # positions inside a text span_near — ES's documented best-effort
    # cross-field proximity
    "span_field_masking": {
        "span_near": {
            "clauses": [
                {"span_term": {"text": "merge"}},
                {
                    "field_masking_span": {
                        "query": {"span_term": {"tool": "search"}},
                        "field": "text",
                    }
                },
            ],
            "slop": 6,
            "in_order": False,
        }
    },
    "span_within_near": {
        "span_within": {
            "little": {"span_term": {"text": "hash"}},
            "big": {
                "span_near": {
                    "clauses": [
                        {"span_term": {"text": "join"}},
                        {"span_term": {"text": "table"}},
                    ],
                    "slop": 4,
                    "in_order": True,
                }
            },
        }
    },
    "span_containing_near": {
        "span_containing": {
            "little": {"span_term": {"text": "query"}},
            "big": {
                "span_near": {
                    "clauses": [
                        {"span_term": {"text": "spark"}},
                        {"span_term": {"text": "fast"}},
                    ],
                    "slop": 5,
                    "in_order": True,
                }
            },
        }
    },
}

# parent-join queries (modules/parent-join: HasChildQueryBuilder,
# HasParentQueryBuilder, ParentIdQueryBuilder). Join-field analog on
# transcripts: parent doc = conversation opener (turn_idx 0), children =
# later turns, routing key = conv_id. Logical path only (the result is a
# key-join over full inner match sets, not a top-k postings problem).
JOIN_QUERIES: dict[str, dict] = {
    "has_child_sum": {
        "has_child": {
            "type": "turn",
            "query": {"match": {"text": "join table"}},
            "score_mode": "sum",
        }
    },
    "has_child_min_max": {
        "has_child": {
            "type": "turn",
            "query": {"match": {"text": "query"}},
            "score_mode": "max",
            "min_children": 5,
            "max_children": 15,
        }
    },
    "has_parent_score": {
        "has_parent": {
            "parent_type": "conversation",
            "query": {"match": {"text": "spark fast"}},
            "score": True,
        }
    },
    "parent_id_children": {"parent_id": {"type": "turn", "id": "conv_000007"}},
}

# cursoring fixtures (operators/cursor.py): (sort_cols, after, size) etc.
SEARCH_AFTER_FIXTURE = {
    "query": {"match": {"text": "query"}},
    "sort_cols": ["turn_idx", "conv_id"],
    "after": (5, "conv_000010"),
    "size": 10,
}
COLLAPSE_FIXTURE = {
    "query": {"match": {"text": "query fast"}},
    "field": "role",
    "k": 3,
    "inner_hits": 2,
}
RESCORE_FIXTURE = {
    "query": {"match": {"text": "table"}},
    "rescore_query": {"match_phrase": {"text": "table hash"}},
    "window_size": 20,
    "query_weight": 1.0,
    "rescore_query_weight": 2.0,
    "k": 10,
}
# Painless FIELDS / NUMBER_SORT contexts (ScriptFieldsPhase.java,
# ScriptSortBuilder): per-hit computed fields and script-valued sort
SCRIPT_FIELDS_FIXTURE = {
    "query": {"match": {"text": "spark query"}},
    "fields": {
        "double_idx": {
            "source": "doc['turn_idx'].value * 2 + params.base",
            "params": {"base": 1},
        },
        "idx_bucket": {"source": "doc['turn_idx'].value % 3 == 0 ? 'z' : 'nz'"},
    },
    "k": 10,
}
SCRIPT_SORT_FIXTURE = {
    "query": {"match": {"text": {"query": "hash join", "operator": "and"}}},
    "script": {
        "source": "doc['turn_idx'].value % 7 + params.o",
        "params": {"o": 2},
    },
    "order": "desc",
    "size": 15,
}

DEFAULT_K = 10
