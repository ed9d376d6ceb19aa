"""Indexed engine vs logical path: identical top-k (the WAND-correctness
property from SURVEY.md §5.3), plus segment/resume invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.operators import index_build, topk
from elasticsearch_spark.plans import query_dsl as Q

KEYS = ["conv_id", "turn_idx"]

INDEXED_QUERIES = [
    {"match": {"text": "spark query fast"}},
    {"match": {"text": {"query": "join table scan", "operator": "and"}}},
    {"match": {"text": {"query": "window agg stream batch", "minimum_should_match": 3}}},
    {"match": {"text": "customer"}},
    {
        "bool": {
            "must": [{"match": {"text": "join table"}}],
            "filter": [{"term": {"role": "user"}}],
        }
    },
    {
        "bool": {
            "must": [{"match": {"text": "data slow"}}],
            "must_not": [{"term": {"tool": "code"}}],
        }
    },
    {
        "bool": {
            "must": [{"match": {"text": "query"}}],
            "filter": [{"range": {"turn_idx": {"gte": 2, "lt": 18}}}],
            "must_not": [{"term": {"role": "system"}}],
        }
    },
    {
        "bool": {
            "must": [{"match": {"text": "merge value"}}],
            "must_not": [{"match": {"text": "vector"}}],
        }
    },
    {"match_phrase": {"text": "table hash"}},
    {
        "bool": {
            "must": [
                {"match_phrase": {"text": "key value"}},
                {"match": {"text": "query"}},
            ],
            "filter": [{"term": {"role": "user"}}],
        }
    },
]


@pytest.fixture(scope="module")
def store(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index"))
    return index_build.build_index(spark, transcripts, root, n_slices=1, partitions=4)


@pytest.fixture(scope="module")
def store_multi(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_multi"))
    return index_build.build_index(spark, transcripts, root, n_slices=3, partitions=4)


def _rows(df):
    return sorted((r.conv_id, r.turn_idx, r.score) for r in df.collect())


@pytest.mark.parametrize("qi", range(len(INDEXED_QUERIES)))
def test_indexed_equals_logical(spark, transcripts, store, qi):
    qd = INDEXED_QUERIES[qi]
    want = _rows(Q.search(transcripts, qd, KEYS, k=10))
    got = _rows(topk.search_indexed(spark, store, qd, k=10))
    assert got == want, f"query {qd}"


@pytest.mark.parametrize("qi", [0, 1, 4, 7])
def test_multi_segment_equals_single(spark, transcripts, store, store_multi, qi):
    """query(S1 ∪ S2 ∪ S3) == query(single segment) — merge invariant."""
    qd = INDEXED_QUERIES[qi]
    one = _rows(topk.search_indexed(spark, store, qd, k=10))
    many = _rows(topk.search_indexed(spark, store_multi, qd, k=10))
    assert one == many


def test_resume_equals_fresh(spark, transcripts, tmp_path_factory):
    """Build killed after 2/4 slices, resumed -> same results as fresh build."""
    r1 = str(tmp_path_factory.mktemp("idx_killed"))
    index_build.build_index(spark, transcripts, r1, n_slices=4, partitions=4, fail_after_slices=2)
    s1 = index_build.SegmentStore(r1)
    assert len(s1.snapshot().segments) == 2
    # resume: skips the 2 committed slices
    index_build.build_index(spark, transcripts, r1, n_slices=4, partitions=4, resume=True)
    assert len(s1.snapshot().segments) == 4

    r2 = str(tmp_path_factory.mktemp("idx_fresh"))
    s2 = index_build.build_index(spark, transcripts, r2, n_slices=4, partitions=4)
    qd = INDEXED_QUERIES[0]
    assert _rows(topk.search_indexed(spark, s1, qd, k=10)) == _rows(
        topk.search_indexed(spark, s2, qd, k=10)
    )


def test_doc_roundtrip_text_equality(spark, transcripts, store):
    """Per-turn text equality under stable turn ordering (input_hint invariant)."""
    snap = store.snapshot()
    docs = topk.read_segment_docs(spark, store, snap)
    got = docs.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").collect()
    want = transcripts.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").collect()
    assert got == want


def test_ordinals_dense_and_key_ordered(spark, store):
    snap = store.snapshot()
    docs = topk.read_segment_docs(spark, store, snap)
    rows = docs.orderBy("ordinal").select("ordinal", "conv_id", "turn_idx").collect()
    assert [r.ordinal for r in rows] == list(range(len(rows)))
    keys = [(r.conv_id, r.turn_idx) for r in rows]
    assert keys == sorted(keys)
