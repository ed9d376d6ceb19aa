"""Round-3 fixes: percolate percentage msm, intervals validation guards,
hdr percentile accuracy mapping, sloppy match_phrase."""

from __future__ import annotations

import pytest

from elasticsearch_spark import oracle
from elasticsearch_spark.operators import aggs
from elasticsearch_spark.operators import percolate as P
from elasticsearch_spark.plans import query_dsl as Q

KEYS = ["conv_id", "turn_idx"]


class TestPercolateMsm:
    def test_percentage_msm(self, spark):
        docs = spark.createDataFrame(
            [("c1", 0, "window agg here"), ("c2", 0, "nothing relevant")],
            "conv_id string, turn_idx int, text string",
        )
        # 50% of 4 terms -> need 2 distinct matches
        stored = {
            "q": {
                "match": {
                    "text": {
                        "query": "window agg stream batch",
                        "minimum_should_match": "50%",
                    }
                }
            }
        }
        got = {r.conv_id for r in P.percolate(docs, stored).collect()}
        assert got == {"c1"}

    def test_bad_msm_raises(self, spark):
        docs = spark.createDataFrame(
            [("c1", 0, "x")], "conv_id string, turn_idx int, text string"
        )
        stored = {"q": {"match": {"text": {"query": "a b", "minimum_should_match": "two"}}}}
        with pytest.raises(ValueError, match="minimum_should_match"):
            P.percolate(docs, stored)


class TestIntervalsGuards:
    """No silent constraint drops: shapes whose branch would ignore
    not_query/first_end raise on the logical path AND in the oracle
    (mirrors operators/topk.py lowering validations)."""

    UNORDERED_NOT = {
        "intervals": {
            "text": {
                "match": {"query": "join table", "ordered": False, "not_query": "hash"}
            }
        }
    }
    WITHIN_NOT = {
        "intervals": {
            "text": {
                "match": {
                    "query": "hash",
                    "within_query": "join table",
                    "not_query": "scan",
                }
            }
        }
    }

    def test_unordered_not_query_raises_logical(self, transcripts):
        with pytest.raises(ValueError, match="not_query"):
            Q.search(transcripts, self.UNORDERED_NOT, KEYS, k=5)

    def test_unordered_not_query_raises_oracle(self):
        with pytest.raises(ValueError, match="not_query"):
            oracle.search_sql(self.UNORDERED_NOT, 5)

    def test_within_not_query_raises_both(self, transcripts):
        with pytest.raises(ValueError, match="within_query"):
            Q.search(transcripts, self.WITHIN_NOT, KEYS, k=5)
        with pytest.raises(ValueError, match="within_query"):
            oracle.search_sql(self.WITHIN_NOT, 5)


class TestHdrPercentiles:
    def test_hdr_accuracy_mapped(self, transcripts):
        body = {
            "aggs": {
                "p": {
                    "percentiles": {
                        "field": "turn_idx",
                        "percents": [50],
                        "method": "hdr",
                        "hdr": {"number_of_significant_value_digits": 3},
                    }
                }
            }
        }
        row = aggs.aggregate(transcripts, body).collect()[0]
        # turn_idx in [0, 19]; at 10^3 accuracy the GK sketch is near-exact
        assert abs(row["p_p50"] - 9.0) <= 1.0


class TestSloppyPhrase:
    def _search(self, spark, rows, qd, k=10):
        from elasticsearch_spark.plans import query_dsl as Q

        docs = spark.createDataFrame(
            [(f"c{i}", 0, t) for i, t in enumerate(rows)],
            "conv_id string, turn_idx int, text string",
        )
        return {r.conv_id: r.score for r in Q.search(docs, qd, KEYS, k=k).collect()}

    def test_slop_window_and_transposition(self, spark):
        # slop=1 reaches one intervening token; transposed adjacent terms
        # need slop=2 (Lucene adjusted-position semantics)
        rows = ["merge sort now", "merge the sort", "sort merge", "merge a b sort", "none here"]
        hit1 = self._search(spark, rows, {"match_phrase": {"text": {"query": "merge sort", "slop": 1}}})
        assert set(hit1) == {"c0", "c1"}
        # slop=2 reaches both the transposition (c2) and two intervening
        # tokens (c3: "merge a b sort" = two position moves)
        hit2 = self._search(spark, rows, {"match_phrase": {"text": {"query": "merge sort", "slop": 2}}})
        assert set(hit2) == {"c0", "c1", "c2", "c3"}
        # closer windows score higher (1/(1+width) freq saturation)
        assert hit2["c0"] > hit2["c1"] > hit2["c3"]

    def test_slop_zero_unchanged(self, spark):
        rows = ["merge sort", "merge the sort"]
        hit = self._search(spark, rows, {"match_phrase": {"text": {"query": "merge sort", "slop": 0}}})
        assert set(hit) == {"c0"}

    def test_repeated_terms_raise(self, spark, transcripts):
        from elasticsearch_spark.plans import query_dsl as Q

        with pytest.raises(ValueError, match="repeated"):
            Q.search(transcripts, {"match_phrase": {"text": {"query": "a b a", "slop": 1}}}, KEYS, k=5)
        with pytest.raises(ValueError, match="repeated"):
            oracle.search_sql({"match_phrase": {"text": {"query": "a b a", "slop": 1}}}, 5)
