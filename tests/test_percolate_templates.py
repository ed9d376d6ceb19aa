"""Percolate (reverse search) and search-template rendering.

Reference: modules/percolator/ (PercolateQueryBuilder.java, QueryAnalyzer.java
candidate extraction) and modules/lang-mustache/ (MustacheScriptEngine.java).
"""

from __future__ import annotations

import pytest

from elasticsearch_spark.operators import percolate as P
from elasticsearch_spark.plans.templates import render_template


class TestPercolate:
    def test_match_or_and_msm_term(self, spark):
        docs = spark.createDataFrame(
            [
                ("c1", 0, "spark runs the query engine"),
                ("c2", 0, "join the table with another table"),
                ("c3", 0, "window agg over a stream"),
                ("c4", 0, "the customer placed an order"),
                ("c5", 0, "nothing relevant here"),
            ],
            "conv_id string, turn_idx int, text string",
        )
        stored = {
            "q_or": {"match": {"text": "spark query fast"}},
            "q_and": {"match": {"text": {"query": "join table", "operator": "and"}}},
            "q_msm": {"match": {"text": {"query": "window agg stream", "minimum_should_match": 2}}},
            "q_term": {"term": {"text": "customer"}},
        }
        got = {(r.conv_id, r.query_id) for r in P.percolate(docs, stored).collect()}
        assert got == {("c1", "q_or"), ("c2", "q_and"), ("c3", "q_msm"), ("c4", "q_term")}

    def test_and_requires_all_terms(self, spark):
        docs = spark.createDataFrame(
            [("c1", 0, "join without the other word")],
            "conv_id string, turn_idx int, text string",
        )
        stored = {"q": {"match": {"text": {"query": "join table", "operator": "and"}}}}
        assert P.percolate(docs, stored).count() == 0

    def test_terms_query_and_duplicate_doc_tokens(self, spark):
        # duplicate tokens in the doc must not double-count toward msm
        docs = spark.createDataFrame(
            [("c1", 0, "alpha alpha alpha")],
            "conv_id string, turn_idx int, text string",
        )
        stored = {"q": {"match": {"text": {"query": "alpha beta", "minimum_should_match": 2}}}}
        assert P.percolate(docs, stored).count() == 0
        stored2 = {"q": {"terms": {"text": ["alpha", "zzz"]}}}
        assert P.percolate(docs, stored2).count() == 1

    def test_unextractable_kinds_take_scan_arm(self, spark):
        """Round 5: shapes with no extractable positive terms no longer
        refuse — they route through the SCAN arm (exact evaluation over the
        percolated batch; ES's matchAllDocs + MemoryIndex-verify analog)."""
        docs = spark.createDataFrame(
            [("c1", 0, "x y"), ("c2", 1, "z")],
            "conv_id string, turn_idx int, text string",
        )
        # pure-negative bool: matches docs WITHOUT the term
        got = {
            (r.conv_id, r.query_id)
            for r in P.percolate(
                docs, {"q": {"bool": {"must_not": [{"term": {"text": "x"}}]}}}
            ).collect()
        }
        assert got == {("c2", "q")}
        # keyword-only / range-only stored query
        got2 = {
            (r.conv_id, r.query_id)
            for r in P.percolate(
                docs, {"q": {"range": {"turn_idx": {"gte": 1}}}}
            ).collect()
        }
        assert got2 == {("c2", "q")}

    def test_phrase_residual_verify(self, spark):
        docs = spark.createDataFrame(
            [
                ("c1", 0, "merge sort is fast"),      # adjacent, in order
                ("c2", 0, "sort merge join"),          # both terms, wrong order
                ("c3", 0, "merge the sort"),           # both terms, not adjacent
                ("c4", 0, "nothing here"),
            ],
            "conv_id string, turn_idx int, text string",
        )
        stored = {"q": {"match_phrase": {"text": "merge sort"}}}
        got = {r.conv_id for r in P.percolate(docs, stored).collect()}
        assert got == {"c1"}

    def test_bool_residual_verify(self, spark):
        docs = spark.createDataFrame(
            [
                ("c1", 0, "join the table now"),       # must ok, no customer
                ("c2", 0, "join table customer"),      # excluded by must_not
                ("c3", 0, "join only"),                # must fails
            ],
            "conv_id string, turn_idx int, text string",
        )
        stored = {
            "q": {
                "bool": {
                    "must": [{"match": {"text": {"query": "join table", "operator": "and"}}}],
                    "must_not": [{"term": {"text": "customer"}}],
                }
            }
        }
        got = {r.conv_id for r in P.percolate(docs, stored).collect()}
        assert got == {"c1"}

    def test_bool_unextractable_required_takes_scan_arm(self, spark):
        # a bool whose only required clause cannot contribute pruning terms
        # must NOT prune on optional should terms: a doc matching the
        # required clause alone (should is optional when must is present)
        # would be silently dropped by term pruning. Round 5: the scan arm
        # evaluates it exactly — the term-less doc below must still match.
        docs = spark.createDataFrame(
            [("c1", 0, "x")], "conv_id string, turn_idx int, text string"
        )
        q = {
            "bool": {
                "must": [{"range": {"turn_idx": {"gte": 0}}}],
                "should": [{"match": {"text": "alpha"}}],
            }
        }
        got = {(r.conv_id, r.turn_idx) for r in P.percolate(docs, {"q": q}).collect()}
        assert got == {("c1", 0)}

    def test_bool_pure_should_unextractable_child_takes_scan_arm(self, spark):
        # pure-should bool: a doc can match through ANY should child, so one
        # un-extractable child makes term pruning unsound. Round 5: scan arm
        # — the doc matching ONLY through the range child must be found.
        docs = spark.createDataFrame(
            [("c1", 0, "x"), ("c2", 7, "y")],
            "conv_id string, turn_idx int, text string",
        )
        q = {
            "bool": {
                "should": [
                    {"match": {"text": "alpha"}},
                    {"range": {"turn_idx": {"gte": 5}}},
                ]
            }
        }
        got = {(r.conv_id, r.turn_idx) for r in P.percolate(docs, {"q": q}).collect()}
        assert got == {("c2", 7)}

    def test_bool_mixed_required_prunes_on_required_only(self, spark):
        # extractable must + range filter + optional should: candidates come
        # from the must terms; the verify pass applies the range exactly
        docs = spark.createDataFrame(
            [
                ("c1", 3, "join the table"),   # must ok, range ok
                ("c2", 0, "join the table"),   # must ok, range fails
                ("c3", 3, "nothing here"),     # must fails
            ],
            "conv_id string, turn_idx int, text string",
        )
        q = {
            "bool": {
                "must": [{"match": {"text": {"query": "join table", "operator": "and"}}}],
                "filter": [{"range": {"turn_idx": {"gte": 1}}}],
                "should": [{"match": {"text": "bonus"}}],
            }
        }
        got = {r.conv_id for r in P.percolate(docs, {"q": q}).collect()}
        assert got == {"c1"}


class TestTemplates:
    def test_string_interpolation(self):
        out = render_template({"match": {"text": "find {{q}} now"}}, {"q": "spark"})
        assert out == {"match": {"text": "find spark now"}}

    def test_whole_scalar_keeps_native_type(self):
        out = render_template(
            {"match": {"text": {"query": "{{q}}", "minimum_should_match": "{{msm}}"}}},
            {"q": "a b c", "msm": 2},
        )
        assert out["match"]["text"]["minimum_should_match"] == 2
        out2 = render_template({"terms": {"text": "{{vals}}"}}, {"vals": ["x", "y"]})
        assert out2 == {"terms": {"text": ["x", "y"]}}

    def test_conditional_section_key(self):
        tpl = {"bool": {"must": [{"match": {"text": "{{q}}"}}],
                        "{{#use_filter}}filter{{/use_filter}}": [{"term": {"role": "user"}}]}}
        with_f = render_template(tpl, {"q": "a", "use_filter": True})
        without = render_template(tpl, {"q": "a", "use_filter": False})
        assert "filter" in with_f["bool"] and "filter" not in without["bool"]

    def test_missing_param_raises(self):
        with pytest.raises(KeyError, match="missing template param"):
            render_template({"match": {"text": "{{q}}"}}, {})


class TestPercolatePrefix:
    def test_prefix_stored_query(self, spark):
        docs = spark.createDataFrame(
            [
                ("c1", 0, "querying the index"),   # token with prefix "quer"
                ("c2", 0, "quick brown fox"),       # "qu" yes, "quer" no
                ("c3", 0, "nothing here"),
            ],
            "conv_id string, turn_idx int, text string",
        )
        stored = {
            "p1": {"prefix": {"text": "quer"}},
            "p2": {"prefix": {"text": {"value": "qu"}}},
            "m1": {"match": {"text": "fox"}},
        }
        got = {(r.conv_id, r.query_id) for r in P.percolate(docs, stored).collect()}
        assert got == {("c1", "p1"), ("c1", "p2"), ("c2", "p2"), ("c2", "m1")}

    def test_wildcard_stored_query(self, spark):
        docs = spark.createDataFrame(
            [
                ("c1", 0, "querying the index"),
                ("c2", 0, "quick brown fox"),
                ("c3", 0, "quiet query"),
            ],
            "conv_id string, turn_idx int, text string",
        )
        stored = {
            "w1": {"wildcard": {"text": "qu*ing"}},   # querying
            "w2": {"wildcard": {"text": "qui?t"}},    # quiet
        }
        got = {(r.conv_id, r.query_id) for r in P.percolate(docs, stored).collect()}
        assert got == {("c1", "w1"), ("c3", "w2")}
