"""Streaming ingest: micro-batch segments == batch index; incremental
arrivals become searchable; compaction folds streamed segments."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.operators import merge, topk, update
from elasticsearch_spark.sources.segment_store import SegmentStore
from elasticsearch_spark.streaming import ingest as sti

KEYS = ["conv_id", "turn_idx"]
QD = {"match": {"text": "spark query fast"}}


def _rows(df):
    return sorted((r.conv_id, r.turn_idx, r.score) for r in df.collect())


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    return {
        "src": str(base / "src"),
        "store": str(base / "store"),
        "ckpt": str(base / "ckpt"),
    }


def test_streaming_ingest_matches_batch(spark, transcripts, dirs):
    half1 = transcripts.where("conv_id < 'conv_000012'")
    half2 = transcripts.where("conv_id >= 'conv_000012'")
    half1.write.mode("append").parquet(dirs["src"])

    q = sti.stream_ingest(spark, dirs["src"], dirs["store"], dirs["ckpt"])
    q.awaitTermination()
    store = SegmentStore(dirs["store"])
    n1 = update.read_snapshot_table(spark, store).count()
    assert n1 == half1.count()

    # late arrivals: drain the new backlog in a second AvailableNow run
    half2.write.mode("append").parquet(dirs["src"])
    q = sti.stream_ingest(spark, dirs["src"], dirs["store"], dirs["ckpt"])
    q.awaitTermination()
    assert update.read_snapshot_table(spark, store).count() == transcripts.count()

    # streamed index answers identically to the logical path
    from elasticsearch_spark.plans import query_dsl as Q

    assert _rows(topk.search_indexed(spark, store, QD, k=10)) == _rows(
        Q.search(transcripts, QD, KEYS, k=10)
    )

    # idempotence: re-running with nothing new changes no snapshot
    before = store.current_snapshot_id()
    q = sti.stream_ingest(spark, dirs["src"], dirs["store"], dirs["ckpt"])
    q.awaitTermination()
    assert store.current_snapshot_id() == before

    # LSM compaction folds the streamed micro-segments; results unchanged
    pre = _rows(topk.search_indexed(spark, store, QD, k=10))
    merge.compact(spark, store, partitions=4)
    assert len(store.snapshot().segments) < len(
        store.snapshot(before).segments
    ) or len(store.snapshot(before).segments) == 1
    assert _rows(topk.search_indexed(spark, store, QD, k=10)) == pre

    # per-turn text equality under stable ordering (input_hint) after
    # stream + merge cycles
    got = (
        update.read_snapshot_table(spark, store)
        .orderBy(*KEYS)
        .select("conv_id", "turn_idx", "text")
        .collect()
    )
    want = transcripts.orderBy(*KEYS).select("conv_id", "turn_idx", "text").collect()
    assert got == want
