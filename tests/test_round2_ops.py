"""Round-2 operators: terminate_after early exit, intervals semantics,
date_range / ip_range / auto_date_histogram aggs, term-dictionary expansion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.operators import aggs, cursor, index_build, topk
from elasticsearch_spark.plans import query_dsl as Q

KEYS = ["conv_id", "turn_idx"]


@pytest.fixture(scope="module")
def store(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r2_idx"))
    return index_build.build_index(spark, transcripts, root, n_slices=1, partitions=4)


class TestTerminateAfter:
    def test_matches_global_first_n(self, spark, transcripts, store):
        got = cursor.terminate_after_scan(spark, store, "role = 'user'", 17).collect()
        want = (
            transcripts.where("role = 'user'")
            .orderBy("conv_id", "turn_idx")
            .limit(17)
            .select("conv_id", "turn_idx")
            .collect()
        )
        assert [(r.conv_id, r.turn_idx) for r in got] == [
            (r.conv_id, r.turn_idx) for r in want
        ]

    def test_early_exit_reads_fewer_batches(self, spark, store):
        # n=1: every partition stops after its first matching batch; the
        # unterminated scan consumes every batch of every partition.
        acc_small = spark.sparkContext.accumulator(0)
        cursor.terminate_after_scan(
            spark, store, "turn_idx >= 0", 1, batch_counter=acc_small
        ).collect()
        acc_all = spark.sparkContext.accumulator(0)
        cursor.terminate_after_scan(
            spark, store, "turn_idx >= 0", 100_000, batch_counter=acc_all
        ).collect()
        assert acc_small.value <= acc_all.value
        # with BLOCK-sized arrow batches each partition has >= 1 batch; the
        # terminated scan must not have consumed more than one per partition
        n_parts = spark.read.parquet(
            store.docs_path(store.snapshot().segments[0].segment_id)
        ).rdd.getNumPartitions()
        assert acc_small.value <= n_parts


class TestIntervals:
    def _hits(self, spark, rows, qd):
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
        out = Q.search(df, qd, KEYS, k=10).collect()
        return sorted((r.conv_id, r.turn_idx) for r in out)

    def test_ordered_respects_order_and_gaps(self, spark):
        rows = [
            ("a", 0, "join x table"),        # gap 1, ordered -> hit
            ("a", 1, "table join"),          # wrong order -> miss
            ("a", 2, "join x y z table"),    # gap 3 > 2 -> miss
            ("a", 3, "join table"),          # adjacent -> hit
        ]
        qd = {"intervals": {"text": {"match": {"query": "join table", "ordered": True, "max_gaps": 2}}}}
        assert self._hits(spark, rows, qd) == [("a", 0), ("a", 3)]

    def test_unordered_any_order(self, spark):
        rows = [
            ("a", 0, "filter x scan"),       # reversed, gap 1 -> hit
            ("a", 1, "scan q w e filter"),   # gap 3 <= 3 -> hit
            ("a", 2, "scan q w e r filter"),  # gap 4 > 3 -> miss
            ("a", 3, "scan only"),           # missing term -> miss
        ]
        qd = {"intervals": {"text": {"match": {"query": "scan filter", "max_gaps": 3}}}}
        assert self._hits(spark, rows, qd) == [("a", 0), ("a", 1)]


class TestNewAggs:
    def test_ip_helpers(self):
        assert aggs.ip_to_long("10.0.0.1") == (10 << 24) + 1
        assert aggs.cidr_to_range("10.2.0.0/15") == (
            aggs.ip_to_long("10.2.0.0"),
            aggs.ip_to_long("10.4.0.0"),
        )

    def test_date_range_buckets(self, spark, transcripts):
        body = {
            "aggs": {
                "w": {
                    "date_range": {
                        "field": "ts",
                        "ranges": [
                            {"key": "early", "to": "2024-01-01T01:00:00"},
                            {"key": "late", "from": "2024-01-01T01:00:00"},
                        ],
                    }
                }
            }
        }
        rows = {r.w: r.doc_count for r in aggs.aggregate(transcripts, body).collect()}
        n = transcripts.count()
        assert sum(rows.values()) == n and set(rows) <= {"early", "late"}

    def test_auto_date_histogram_bucket_budget(self, spark, transcripts):
        body = {"aggs": {"b": {"auto_date_histogram": {"field": "ts", "buckets": 10}}}}
        out = aggs.aggregate(transcripts, body).collect()
        assert 1 <= len(out) <= 10
        assert sum(r.doc_count for r in out) == transcripts.count()
        # contiguous zero-filled grid
        assert all(r.doc_count >= 0 for r in out)

    def test_sibling_metric_next_to_bucket_raises(self, spark, transcripts):
        body = {
            "aggs": {
                "role": {"terms": {"field": "role"}},
                "total_avg": {"avg": {"field": "turn_idx"}},
            }
        }
        with pytest.raises(ValueError, match="sibling"):
            aggs.aggregate(transcripts, body)


class TestExpansion:
    def test_prefix_expansion_uses_dictionary(self, spark, store):
        snap = store.snapshot()
        terms = topk.expand_terms(spark, store, snap, "text", "prefix", "que")
        assert terms and all(t.startswith("que") for t in terms)

    def test_indexed_regexp_matches_logical(self, spark, transcripts, store):
        qd = {"regexp": {"text": "quer(y|ies)"}}
        got = sorted(
            (r.conv_id, r.turn_idx, r.score)
            for r in topk.search_indexed(spark, store, qd, k=10).collect()
        )
        want = sorted(
            (r.conv_id, r.turn_idx, r.score)
            for r in Q.search(transcripts, qd, KEYS, k=10).collect()
        )
        assert got == want


def test_all_fixture_queries_indexed_equals_logical(spark, transcripts, store):
    """Every SEARCH_QUERIES fixture lowers and matches the logical path —
    the 29/29 indexed-coverage property the driver gate checks at sf0.01."""
    from elasticsearch_spark.queryset import SEARCH_QUERIES

    bad = []
    for name, qd in SEARCH_QUERIES.items():
        got = sorted(
            (r.conv_id, r.turn_idx, r.score)
            for r in topk.search_indexed(spark, store, qd, k=10).collect()
        )
        want = sorted(
            (r.conv_id, r.turn_idx, r.score)
            for r in Q.search(transcripts, qd, KEYS, k=10).collect()
        )
        if got != want:
            bad.append(name)
    assert not bad, f"indexed != logical for {bad}"


class TestReviewRegressions:
    """Fixes from the round-2 code review."""

    def test_terminate_after_exact_with_packed_small_files(
        self, spark, transcripts, tmp_path_factory
    ):
        # many tiny docs files: Spark's size-ordered file packing would break
        # the per-partition prefix property; the per-file union keeps each
        # partition key-ordered so the result stays the exact global first n
        root = str(tmp_path_factory.mktemp("ta_packed"))
        st = index_build.build_index(spark, transcripts, root, n_slices=1, partitions=16)
        got = cursor.terminate_after_scan(spark, st, "role = 'user'", 13).collect()
        want = (
            transcripts.where("role = 'user'")
            .orderBy("conv_id", "turn_idx")
            .limit(13)
            .select("conv_id", "turn_idx")
            .collect()
        )
        assert [(r.conv_id, r.turn_idx) for r in got] == [
            (r.conv_id, r.turn_idx) for r in want
        ]

    def test_span_within_shared_big_slot_term(self, spark, tmp_path_factory):
        # little occurrence coincides with a shared big-slot position
        # ('x z x', big = near ['x','x']): the minimal enclosing pair
        # degenerates to pb == pc and the 2nd-nearest alternatives must fire
        import datetime

        rows = [
            ("c0", 0, "user", "x z x", "t", datetime.datetime(2024, 1, 1)),
            ("c0", 1, "user", "x only once", "t", datetime.datetime(2024, 1, 1)),
        ]
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        )
        root = str(tmp_path_factory.mktemp("deg_span"))
        st = index_build.build_index(spark, df, root, n_slices=1, partitions=2)
        qd = {
            "span_within": {
                "little": {"span_term": {"text": "x"}},
                "big": {
                    "span_near": {
                        "clauses": [
                            {"span_term": {"text": "x"}},
                            {"span_term": {"text": "x"}},
                        ],
                        "slop": 3,
                        "in_order": True,
                    }
                },
            }
        }
        logical = sorted(r.turn_idx for r in Q.search(df, qd, KEYS, k=10).collect())
        indexed = sorted(
            r.turn_idx for r in topk.search_indexed(spark, st, qd, k=10).collect()
        )
        assert logical == indexed == [0]

    def test_match_all_scores_one_on_indexed_path(self, spark, transcripts, store):
        got = topk.search_indexed(spark, store, {"match_all": {}}, k=5).collect()
        want = Q.search(transcripts, {"match_all": {}}, KEYS, k=5).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
        assert all(r.score == 1.0 for r in got)

    def test_unlowerable_shape_falls_back_to_logical(self, spark, transcripts, store):
        # dis_max of filter-context leaves is not anchored in postings; the
        # indexed entrypoint must run the logical plan instead of raising
        qd = {
            "dis_max": {
                "queries": [
                    {"range": {"turn_idx": {"lte": 2}}},
                    {"term": {"role": "system"}},
                ]
            }
        }
        got = topk.search_indexed(spark, store, qd, k=10).collect()
        want = Q.search(transcripts, qd, KEYS, k=10).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]

    def test_from_size_requires_order_for_unscored_frames(self, spark, transcripts):
        with pytest.raises(ValueError, match="order_cols"):
            cursor.from_size(transcripts.select("conv_id", "turn_idx"), 0, 5)
