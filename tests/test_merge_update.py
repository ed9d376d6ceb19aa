"""LSM merge + update/time-travel tests.

Invariants (SURVEY.md §5.3-5.4):
  * merged segments == pre-merge results == fresh single-segment build;
  * per-turn text equality under stable turn ordering after any
    index/merge/update cycle (input_hint);
  * old snapshots stay readable after merge/update (time travel);
  * the fork's req_old_source/req_new_source semantics (pre/post images,
    includes projection, max_docs_return cap).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.operators import index_build, merge, topk, update
from elasticsearch_spark.plans import query_dsl as Q

KEYS = ["conv_id", "turn_idx"]
Q_OR = {"match": {"text": "spark query fast"}}
Q_BOOL = {
    "bool": {
        "must": [{"match": {"text": "join table"}}],
        "filter": [{"term": {"role": "user"}}],
    }
}


def _rows(df):
    return sorted((r.conv_id, r.turn_idx, r.score) for r in df.collect())


@pytest.fixture()
def store4(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("m4"))
    return index_build.build_index(spark, transcripts, root, n_slices=4, partitions=4)


class TestMerge:
    def test_compact_preserves_results_and_text(self, spark, transcripts, store4):
        pre_or = _rows(topk.search_indexed(spark, store4, Q_OR, k=10))
        pre_snap_id = store4.current_snapshot_id()
        n_merges = merge.compact(spark, store4, partitions=4)
        assert n_merges >= 1
        snap = store4.snapshot()
        assert snap.operation == "merge"
        assert len(snap.segments) < 4
        # results identical post-merge
        assert _rows(topk.search_indexed(spark, store4, Q_OR, k=10)) == pre_or
        assert _rows(topk.search_indexed(spark, store4, Q_BOOL, k=10)) == _rows(
            Q.search(transcripts, Q_BOOL, KEYS, k=10)
        )
        # per-turn text equality under stable ordering
        got = (
            update.read_snapshot_table(spark, store4)
            .orderBy(*KEYS)
            .select("conv_id", "turn_idx", "text")
            .collect()
        )
        want = transcripts.orderBy(*KEYS).select("conv_id", "turn_idx", "text").collect()
        assert got == want
        # time travel: pre-merge snapshot still answers identically
        assert _rows(topk.search_indexed(spark, store4, Q_OR, k=10, snapshot_id=pre_snap_id)) == pre_or

    def test_merged_segment_ordinals_key_ordered(self, spark, store4):
        merge.compact(spark, store4, partitions=4)
        snap = store4.snapshot()
        merged = [s for s in snap.segments if s.slice_id.startswith("merge(")]
        assert merged
        d = spark.read.parquet(store4.docs_path(merged[0].segment_id))
        rows = d.orderBy("ordinal").select("ordinal", *KEYS).collect()
        assert [r.ordinal for r in rows] == list(range(len(rows)))
        keys = [(r.conv_id, r.turn_idx) for r in rows]
        assert keys == sorted(keys)

    def test_pick_merges_tiering(self):
        from elasticsearch_spark.sources.segment_store import SegmentMeta

        small = [
            SegmentMeta(f"s{i}", 10, 100, f"sl{i}", tier_bytes=1000) for i in range(3)
        ]
        big = [SegmentMeta("b0", 10, 100, "bl", tier_bytes=10 * 1024**3)]
        batches = merge.pick_merges(small + big)
        assert batches == [["s0", "s1", "s2"]]


class TestUpdate:
    def test_update_images_and_projection(self, spark, transcripts, store4):
        upd = (
            transcripts.where("role = 'user' and turn_idx = 0")
            .select(*KEYS)
            .limit(3)
            .withColumn("tool", F.lit("patched"))
        )
        res = update.apply_updates(
            spark,
            store4,
            upd,
            partitions=4,
            req_old_source=True,
            req_new_source=["tool"],
        )
        assert res.n_updated == 3 and res.n_inserted == 0
        old = res.old_source.collect()
        new = res.new_source.collect()
        assert len(old) == 3 and len(new) == 3
        # old image has full source; new image projected to keys + tool
        assert set(res.old_source.columns) == set(index_build.DOC_COLS)
        assert res.new_source.columns == ["conv_id", "turn_idx", "tool"]
        assert all(r.tool == "patched" for r in new)
        old_tools = {(r.conv_id, r.turn_idx): r.tool for r in old}
        cur = update.read_snapshot_table(spark, store4)
        # post-image table: updated rows patched, everything else untouched
        assert cur.where("tool = 'patched'").count() == 3
        before_tbl = update.read_snapshot_table(spark, store4, res.before_snapshot)
        for (cid, ti), t in old_tools.items():
            assert t != "patched"  # pre-image caught the OLD value
            r = before_tbl.where(
                (F.col("conv_id") == cid) & (F.col("turn_idx") == ti)
            ).first()
            assert r.tool == t

    def test_update_text_reflected_in_search(self, spark, transcripts, store4):
        key = transcripts.select(*KEYS).orderBy(*KEYS).limit(1)
        upd = key.withColumn("text", F.lit("zzzunique needle phrase"))
        res = update.apply_updates(spark, store4, upd, partitions=4)
        hits = topk.search_indexed(spark, store4, {"match": {"text": "zzzunique"}}, k=5).collect()
        assert len(hits) == 1
        # pre-update snapshot does not see the new text (time travel)
        old_hits = topk.search_indexed(
            spark, store4, {"match": {"text": "zzzunique"}}, k=5,
            snapshot_id=res.before_snapshot,
        ).collect()
        assert len(old_hits) == 0
        # and the old text is gone from the live view
        assert update.read_snapshot_table(spark, store4).where(
            "text = 'zzzunique needle phrase'"
        ).count() == 1

    def test_upsert_and_max_docs_return(self, spark, transcripts, store4):
        n0 = update.read_snapshot_table(spark, store4).count()
        rows = [
            ("conv_999999", i, "user", f"brand new doc {i}", "", None) for i in range(15)
        ]
        upd = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
        res = update.apply_updates(
            spark, store4, upd, partitions=4, req_new_source=True, max_docs_return=10
        )
        assert res.n_inserted == 15 and res.n_updated == 0
        assert res.new_source.count() == 10  # capped (UpdateByQueryRequest.java:52)
        assert update.read_snapshot_table(spark, store4).count() == n0 + 15

    def test_update_by_query_and_delete_by_query(self, spark, store4):
        res = update.update_by_query(
            spark,
            store4,
            "role = 'system' and turn_idx = 2",
            {"tool": "'escalated'"},
            partitions=4,
            req_old_source=True,
            req_new_source=True,
        )
        assert res.n_updated > 0
        assert all(r.tool == "escalated" for r in res.new_source.collect())
        cur = update.read_snapshot_table(spark, store4)
        assert cur.where("tool = 'escalated'").count() == res.n_updated

        n, _ = update.delete_by_query(spark, store4, "tool = 'escalated'")
        assert n == res.n_updated
        assert update.read_snapshot_table(spark, store4).where("tool = 'escalated'").count() == 0
        # deleted docs excluded from search too
        hits = topk.search_indexed(
            spark, store4,
            {"bool": {"filter": [{"term": {"tool": "escalated"}}]}},
            k=5,
        )
        assert hits.count() == 0

    def test_merge_after_update_purges_deletes(self, spark, transcripts, store4):
        key = transcripts.select(*KEYS).orderBy(F.col("conv_id").desc()).limit(2)
        update.apply_updates(spark, store4, key.withColumn("tool", F.lit("post_upd")), partitions=4)
        merge.compact(spark, store4, partitions=4)
        cur = update.read_snapshot_table(spark, store4)
        assert cur.where("tool = 'post_upd'").count() == 2
        # doc count unchanged; no duplicate keys survive the merge
        assert cur.groupBy(*KEYS).count().where("count > 1").count() == 0


def test_expire_snapshots_vacuum(spark, transcripts, store4):
    import os

    from elasticsearch_spark.operators import merge

    pre_segs = [s.segment_id for s in store4.snapshot().segments]
    merge.compact(spark, store4, partitions=4)
    # all snapshots still readable pre-expiry
    assert len(store4.history()) >= 2
    removed = store4.expire_snapshots(keep_last=1)
    assert len(store4.history()) == 1
    # merged-away input segments physically vacuumed
    live = {s.segment_id for s in store4.snapshot().segments}
    for sid in pre_segs:
        if sid not in live:
            assert not os.path.isdir(store4.segment_dir(sid))
    assert removed
    # current snapshot still answers queries
    from elasticsearch_spark.operators import topk

    assert topk.search_indexed(spark, store4, Q_OR, k=5).count() == 5
