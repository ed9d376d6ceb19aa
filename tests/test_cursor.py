"""Cursoring operators vs oracle + scroll snapshot-pinning semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from elasticsearch_spark import oracle
from elasticsearch_spark.operators import cursor, index_build, update
from elasticsearch_spark.queryset import (
    COLLAPSE_FIXTURE,
    RESCORE_FIXTURE,
    SCRIPT_FIELDS_FIXTURE,
    SCRIPT_SORT_FIXTURE,
    SEARCH_AFTER_FIXTURE,
)

KEYS = ["conv_id", "turn_idx"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.select(*sorted(df.columns)).collect())


def _duck(con, sql, cols):
    df = con.execute(sql).df()
    return sorted(tuple(str(x) for x in r) for r in df[sorted(cols)].itertuples(index=False))


def test_search_after_oracle(spark, transcripts, duck):
    f = SEARCH_AFTER_FIXTURE
    got = cursor.search_after(
        transcripts, f["query"], KEYS, f["sort_cols"], f["after"], f["size"]
    )
    sql = oracle.search_after_sql(f["query"], f["sort_cols"], f["after"], f["size"])
    assert _rows(got) == _duck(duck, sql, got.columns)
    assert got.count() > 0


def test_search_after_pages_are_disjoint_and_ordered(spark, transcripts):
    f = SEARCH_AFTER_FIXTURE
    p1 = cursor.search_after(transcripts, f["query"], KEYS, f["sort_cols"], None, 10).collect()
    last = (p1[-1].turn_idx, p1[-1].conv_id)
    p2 = cursor.search_after(transcripts, f["query"], KEYS, f["sort_cols"], last, 10).collect()
    k1 = {(r.conv_id, r.turn_idx) for r in p1}
    k2 = {(r.conv_id, r.turn_idx) for r in p2}
    assert not (k1 & k2)
    assert all((r.turn_idx, r.conv_id) > last for r in p2)


def test_collapse_oracle(spark, transcripts, duck):
    f = COLLAPSE_FIXTURE
    got = cursor.collapse(transcripts, f["query"], KEYS, f["field"], f["k"], f["inner_hits"])
    sql = oracle.collapse_sql(f["query"], f["field"], f["k"], f["inner_hits"])
    assert _rows(got) == _duck(duck, sql, got.columns)
    rows = got.collect()
    assert rows and max(r.hit_rank for r in rows) <= 2


def test_rescore_oracle(spark, transcripts, duck):
    f = RESCORE_FIXTURE
    got = cursor.rescore(
        transcripts, f["query"], f["rescore_query"], KEYS,
        f["window_size"], f["query_weight"], f["rescore_query_weight"], f["k"],
    )
    sql = oracle.rescore_sql(
        f["query"], f["rescore_query"], f["window_size"],
        f["query_weight"], f["rescore_query_weight"], f["k"],
    )
    assert _rows(got) == _duck(duck, sql, got.columns)


def test_from_size(spark, transcripts):
    from elasticsearch_spark.plans import query_dsl as Q

    base = Q.search(transcripts, {"match": {"text": "query"}}, KEYS, k=30)
    page = cursor.from_size(base, from_=10, size=10).collect()
    allr = base.collect()
    assert [tuple(r) for r in page] == [tuple(r) for r in allr[10:20]]


def test_scroll_pinned_snapshot(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scroll_idx"))
    store = index_build.build_index(spark, transcripts, root, n_slices=2, partitions=4)
    sc = cursor.Scroll(spark, store, size=100)
    seen = []
    while True:
        page = sc.next_page()
        if not page:
            break
        seen.extend((r.conv_id, r.turn_idx) for r in page)
        if len(seen) == 100:
            # concurrent writer must not disturb the pinned reader
            upd = transcripts.select(*KEYS).limit(3).withColumn("tool", F.lit("concurrent"))
            update.apply_updates(spark, store, upd, partitions=4)
    want = [(r.conv_id, r.turn_idx) for r in transcripts.select(*KEYS).collect()]
    assert sorted(seen) == sorted(want)
    assert len(seen) == len(set(seen))


def test_sliced_scroll_partitions(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("slice_idx"))
    store = index_build.build_index(spark, transcripts, root, n_slices=1, partitions=4)
    all_keys = set()
    for s in range(3):
        sc = cursor.Scroll(spark, store, size=1000, n_slices=3, slice_id=s)
        page = sc.next_page()
        keys = {(r.conv_id, r.turn_idx) for r in page}
        assert not (keys & all_keys)  # slices are disjoint
        all_keys |= keys
    assert len(all_keys) == transcripts.count()  # and exhaustive


def test_script_fields_oracle(spark, transcripts, duck):
    # Painless FIELDS context (ScriptFieldsPhase.java): per-hit computed
    # columns from the shared expression translator
    f = SCRIPT_FIELDS_FIXTURE
    got = cursor.script_fields(transcripts, f["query"], KEYS, f["fields"], f["k"])
    sql = oracle.script_fields_sql(f["query"], f["fields"], f["k"])
    assert _rows(got) == _duck(duck, sql, got.columns)
    assert got.count() > 0
    r0 = got.orderBy("conv_id", "turn_idx").first()
    assert r0.double_idx == r0.turn_idx * 2 + 1
    assert r0.idx_bucket == ("z" if r0.turn_idx % 3 == 0 else "nz")


def test_script_sort_oracle(spark, transcripts, duck):
    # Painless NUMBER_SORT context (ScriptSortBuilder): matched set ordered
    # by script value desc, ties by doc key
    f = SCRIPT_SORT_FIXTURE
    got = cursor.script_sort(
        transcripts, f["query"], KEYS, f["script"], f["order"], f["size"]
    )
    sql = oracle.script_sort_sql(f["query"], f["script"], f["order"], f["size"])
    assert _rows(got) == _duck(duck, sql, got.columns)
    vals = [r.sort_value for r in got.collect()]
    assert vals == sorted(vals, reverse=True) and len(vals) > 0


def test_script_sort_rejects_bad_order(spark, transcripts):
    with pytest.raises(ValueError, match="asc/desc"):
        cursor.script_sort(transcripts, {"match_all": {}}, KEYS, "turn_idx", "up")


def test_count_oracle(spark, transcripts, duck):
    qd = {"match": {"text": "spark"}}
    got = cursor.count(transcripts, qd, KEYS)
    sql = oracle.count_sql(qd)
    assert _rows(got) == _duck(duck, sql, got.columns)
    assert got.first().cnt > 0


def test_source_filtering_oracle(spark, transcripts, duck):
    qd = {"match": {"text": "hash table"}}
    got = cursor.source_filtering(
        transcripts, qd, KEYS, includes=["role", "ts", "text"],
        excludes=["text"], k=10,
    )
    sql = oracle.source_filtering_sql(qd, ["role", "ts"], 10)
    assert _rows(got) == _duck(duck, sql, got.columns)
    # excluded/unincluded source fields never appear
    assert set(got.columns) == {"conv_id", "turn_idx", "score", "role", "ts"}


def test_source_filtering_prunes_wide_column(spark, sf_dir, tmp_path):
    # a non-text query with text excluded from _source must never touch the
    # wide text column: column pruning reaches every parquet scan. The
    # module fixture caches the view and Spark substitutes the cached
    # relation into any identical plan (hiding the scan) — reading through
    # a symlinked path gives a distinct plan no cache can match.
    import os

    from elasticsearch_spark.sources import transcripts as TR

    link = tmp_path / "sfdir"
    os.symlink(sf_dir, link)
    docs = TR.transcripts_view(spark, str(link))
    out = cursor.source_filtering(
        docs, {"term": {"role": "user"}}, KEYS,
        includes=["role", "ts"], k=10,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan
    assert len(out.collect()) == 10


def test_field_sort_oracle(spark, transcripts, duck):
    # FieldSortBuilder: desc + multi-field, ties by doc key
    qd = {"match": {"text": "table"}}
    sorts = [{"field": "role", "order": "desc"}, {"field": "ts", "order": "asc"}]
    got = cursor.field_sort(transcripts, qd, KEYS, sorts, size=12)
    sql = oracle.field_sort_sql(qd, sorts, 12)
    assert _rows(got) == _duck(duck, sql, got.columns)
    rows = got.collect()
    assert rows and [r.role for r in rows] == sorted(
        [r.role for r in rows], reverse=True
    )


def test_field_sort_rejects_bad_spec(spark, transcripts):
    with pytest.raises(ValueError, match="bad sort spec"):
        cursor.field_sort(
            transcripts, {"match_all": {}}, KEYS,
            [{"field": "role", "order": "up"}],
        )


def test_msearch_oracle(spark, transcripts, duck):
    # _msearch: independent sub-searches flattened to a tagged union
    queries = [
        {"match": {"text": "spark"}},
        {"match_phrase": {"text": "hash table"}},
    ]
    got = cursor.msearch(transcripts, queries, KEYS, k=10)
    sql = oracle.msearch_sql(queries, 10)
    assert _rows(got) == _duck(duck, sql, got.columns)
    reqs = {r.req for r in got.collect()}
    assert reqs == {0, 1}
    with pytest.raises(ValueError, match="at least one"):
        cursor.msearch(transcripts, [], KEYS)
