"""Ingest processors, suggesters, rank-eval, and physical-plan quality
(pushdown / pruning) checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.functions import rank_eval
from elasticsearch_spark.operators import index_build, ingest, suggest, topk


class TestIngest:
    def test_processors_chain(self, spark):
        df = spark.createDataFrame(
            [(1, "  Hello <b>World</b> 99  ", "a=1 b=2", "x,y,z", "3kb")],
            "id int, text string, kvs string, csvs string, size string",
        )
        out = ingest.run_pipeline(
            df,
            [
                {"trim": {"field": "text"}},
                {"html_strip": {"field": "text", "target_field": "clean"}},
                {"gsub": {"field": "clean", "pattern": "[0-9]+", "replacement": "N"}},
                {"kv": {"field": "kvs", "target_field": "kvmap"}},
                {"csv": {"field": "csvs", "target_fields": ["c1", "c2", "c3"]}},
                {"bytes": {"field": "size", "target_field": "nbytes"}},
                {"append": {"field": "tags", "value": ["t1"]}},
            ],
        )
        r = out.first()
        assert r.clean == "Hello World N"
        assert r.kvmap == {"a": "1", "b": "2"}
        assert (r.c1, r.c2, r.c3) == ("x", "y", "z")
        assert r.nbytes == 3 * 1024
        assert r.tags == ["t1"]

    def test_foreach_and_sort(self, spark):
        df = spark.createDataFrame([(["B", "a", "C"],)], "arr array<string>")
        out = ingest.run_pipeline(
            df,
            [
                {"foreach": {"field": "arr", "processor": {"lowercase": {}}}},
                {"sort": {"field": "arr"}},
            ],
        )
        assert out.first().arr == ["a", "b", "c"]

    def test_drop_and_fail(self, spark):
        df = spark.createDataFrame([(1,), (2,)], "v int")
        assert ingest.run_pipeline(df, [{"drop": {"if": "v = 1"}}]).count() == 1
        with pytest.raises(Exception):
            ingest.run_pipeline(df, [{"fail": {"if": "v = 2", "message": "boom"}}]).collect()

    def test_date_and_grok(self, spark):
        df = spark.createDataFrame(
            [("2024-03-01 10:00:00", "GET /index.html 200")],
            "when string, log string",
        )
        out = ingest.run_pipeline(
            df,
            [
                {"date": {"field": "when", "formats": ["yyyy-MM-dd HH:mm:ss"]}},
                {
                    "grok": {
                        "field": "log",
                        "pattern": r"(\w+) (\S+) (\d+)",
                        "captures": ["verb", "path", "status"],
                    }
                },
            ],
        )
        r = out.first()
        assert str(r["@timestamp"]).startswith("2024-03-01 10:00")
        assert (r.verb, r.path, r.status) == ("GET", "/index.html", "200")


class TestSuggest:
    def test_term_suggest_finds_corrections(self, spark, transcripts):
        out = suggest.term_suggest(transcripts, "sparc quer", max_edits=2, size=3).collect()
        by_input = {}
        for r in out:
            by_input.setdefault(r.input, []).append(r.suggestion)
        assert "spark" in by_input.get("sparc", [])
        assert "query" in by_input.get("quer", [])

    def test_phrase_suggest(self, spark, transcripts):
        r = suggest.phrase_suggest(transcripts, "sparc quer", max_edits=2).first()
        assert r.suggestion.split() == ["spark", "query"] or "spark" in r.suggestion

    def test_analyze_api(self, spark):
        rows = suggest.analyze_api(spark, "Foo  Bar-baz 7").collect()
        assert [(r.token, r.position) for r in rows] == [
            ("foo", 0), ("bar", 1), ("baz", 2), ("7", 3),
        ]


class TestRankEval:
    def test_metrics(self):
        ranked = ["a", "b", "c", "d"]
        rel = {"b", "d", "z"}
        assert rank_eval.precision_at_k(ranked, rel, 4) == 0.5
        assert rank_eval.recall_at_k(ranked, rel, 4) == pytest.approx(2 / 3)
        assert rank_eval.mrr(ranked, rel) == 0.5
        grades = {"a": 3, "b": 2, "c": 0, "d": 1}
        assert rank_eval.ndcg_at_k(["a", "b", "d", "c"], grades, 4) == pytest.approx(1.0)
        assert rank_eval.ndcg_at_k(["c", "d", "b", "a"], grades, 4) < 1.0
        assert 0 < rank_eval.err_at_k(ranked, grades, 4) <= 1.0


class TestPlanQuality:
    """The .explain('formatted') checks the brief asks for: filters reach the
    parquet scans, postings reads prune by term."""

    def test_docs_scan_pushes_filters(self, spark, transcripts, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("pq_idx"))
        store = index_build.build_index(spark, transcripts, root, n_slices=1, partitions=4)
        snap = store.snapshot()
        docs = spark.read.parquet(store.docs_path(snap.segments[0].segment_id))
        plan = docs.where("role = 'user'").select("conv_id")._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(role), EqualTo(role,user)]" in plan
        # column pruning: only requested + filter columns are read
        assert "ReadSchema: struct<conv_id:string,role:string>" in plan

    def test_postings_scan_prunes_terms(self, spark, transcripts, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("pq_idx2"))
        store = index_build.build_index(spark, transcripts, root, n_slices=1, partitions=4)
        snap = store.snapshot()
        postings = spark.read.parquet(store.postings_path(snap.segments[0].segment_id))
        plan = (
            postings.where(F.col("term").isin(["spark", "query"]))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PushedFilters: [In(term" in plan


class TestDotExpander:
    def test_expands_dotted_field_to_struct(self, spark):
        from elasticsearch_spark.operators import ingest

        df = spark.createDataFrame([(1, "x")], "id int, `a.b` string")
        out = ingest.run_pipeline(df, [{"dot_expander": {"field": "a.b"}}])
        r = out.first()
        assert r.a.b == "x" and "a.b" not in out.columns

    def test_merges_into_existing_struct(self, spark):
        from pyspark.sql import functions as F

        from elasticsearch_spark.operators import ingest

        df = spark.createDataFrame([(1, "x", "y")], "id int, `a.b` string, c string")
        df = df.withColumn("a", F.struct(F.col("c").alias("c0")))
        out = ingest.run_pipeline(df, [{"dot_expander": {"field": "a.b"}}])
        r = out.first()
        assert r.a.c0 == "y" and r.a.b == "x"

    def test_deep_nesting_raises(self, spark):
        import pytest as _pt

        from elasticsearch_spark.operators import ingest

        df = spark.createDataFrame([(1, "x")], "id int, `a.b.c` string")
        with _pt.raises(ValueError, match="one level"):
            ingest.run_pipeline(df, [{"dot_expander": {"field": "a.b.c"}}])
