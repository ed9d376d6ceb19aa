"""Differential fuzzing for aggregations: seeded random agg specs from the
supported grammar executed by operators/aggs.py (the real compiler) AND by an
independent SQL generator in THIS file against DuckDB — the two share nothing
but the transcripts view. Complements test_differential_fuzz.py (queries) on
the aggregation surface (SearchModule.java:363-460 registrations)."""

from __future__ import annotations

import random

import duckdb
import pytest

from elasticsearch_spark.functions import analysis
from elasticsearch_spark.operators import aggs
from elasticsearch_spark.oracle import TRANSCRIPTS_CTE

N_SPECS = 18
_TOKS = analysis.tokens_sql("text", "duckdb")

METRICS = {
    "avg": "avg({f})",
    "sum": "sum({f})",
    "min": "min({f})",
    "max": "max({f})",
    "value_count": "count({f})",
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


def _gen_spec(rng: random.Random) -> tuple[dict, str]:
    """(aggs.aggregate body, equivalent DuckDB SQL)."""
    where = ""
    body: dict = {}
    if rng.random() < 0.4:
        term = rng.choice(["spark", "join", "table", "merge", "filter"])
        body["query"] = {"match": {"text": term}}
        where = f"WHERE list_contains({_TOKS}, '{term}')"

    msel, magg = [], {}
    for i in range(rng.randint(0, 2)):
        kind = rng.choice(list(METRICS))
        magg[f"m{i}"] = {kind: {"field": "turn_idx"}}
        msel.append(METRICS[kind].format(f="turn_idx") + f" AS m{i}")
    mtail = ("".join(", " + s for s in msel))

    bkind = rng.choice(
        ["terms", "terms", "histogram", "histogram0", "range", "date_histogram"]
    )
    name = "b"
    if bkind == "date_histogram":
        # hourly calendar buckets, optionally with a cumulative_sum pipeline
        # over _count (the shard-partial -> final + second-pass window shape)
        magg = {}
        body.pop("query", None)
        where = ""
        spec = {"date_histogram": {"field": "ts", "calendar_interval": "hour",
                                   "min_doc_count": 1}}
        ptail = ""
        if rng.random() < 0.6:
            spec = {**spec, "aggs": {"m0": {"cumulative_sum": {"buckets_path": "_count"}}}}
            ptail = ", cast(sum(doc_count) OVER (ORDER BY b) as bigint) AS m0"
        body["aggs"] = {name: spec}
        sql = (
            f"SELECT b, doc_count{ptail} FROM "
            f"(SELECT date_trunc('hour', ts) AS b, count(*) AS doc_count "
            f"FROM transcripts GROUP BY 1)"
        )
        return body, TRANSCRIPTS_CTE + "\n" + sql
    if bkind == "terms":
        field = rng.choice(["role", "tool"])
        size = rng.choice([2, 3, 10])
        order = rng.choice([{"_count": "desc"}, {"_key": "asc"}])
        spec: dict = {"terms": {"field": field, "size": size, "order": order}}
        ob = (
            "doc_count DESC, b ASC"
            if "_count" in order
            else "b ASC"
        )
        sql = (
            f"SELECT {field} AS b, count(*) AS doc_count{mtail} "
            f"FROM transcripts {where} GROUP BY 1 ORDER BY {ob} LIMIT {size}"
        )
    elif bkind == "histogram":
        iv = rng.choice([2, 3, 5, 7])
        spec = {"histogram": {"field": "turn_idx", "interval": iv, "min_doc_count": 1}}
        sql = (
            f"SELECT floor(turn_idx / {iv}.0) * {iv}.0 AS b, count(*) AS doc_count{mtail} "
            f"FROM transcripts {where} GROUP BY 1"
        )
    elif bkind == "histogram0":
        # min_doc_count=0 (the ES default): zero-filled grid between the
        # observed extremes; metric-free like the engine's fill (doc_count 0)
        iv = rng.choice([3, 5])
        magg = {}
        spec = {"histogram": {"field": "turn_idx", "interval": iv, "min_doc_count": 0}}
        # extends the transcripts CTE list (no second WITH)
        sql = f""",
hits AS (SELECT floor(turn_idx / {iv}.0) * {iv}.0 AS b, count(*) AS doc_count
         FROM transcripts {where} GROUP BY 1),
grid AS (SELECT unnest(generate_series(cast((SELECT min(b) / {iv} FROM hits) as bigint),
                                       cast((SELECT max(b) / {iv} FROM hits) as bigint))) * {iv}.0 AS b)
SELECT grid.b AS b, coalesce(hits.doc_count, 0) AS doc_count
FROM grid LEFT JOIN hits USING (b)"""
    else:
        lo = rng.randint(2, 8)
        hi = lo + rng.randint(2, 8)
        spec = {
            "range": {
                "field": "turn_idx",
                "ranges": [{"to": lo}, {"from": lo, "to": hi}, {"from": hi}],
            }
        }
        sql = (
            f"SELECT case when turn_idx < {lo} then '-{lo}' "
            f"when turn_idx < {hi} then '{lo}-{hi}' else '{hi}-' end AS b, "
            f"count(*) AS doc_count{mtail} FROM transcripts {where} GROUP BY 1"
        )
    if magg:
        spec = {**spec, "aggs": magg}
    body["aggs"] = {name: spec}
    sep = "" if sql.startswith(",") else "\n"
    return body, TRANSCRIPTS_CTE + sep + sql


def _norm(v):
    # normalize every value to a string so mixed-type columns (range keys
    # like '-5' vs '5-10') sort consistently; numeric-looking values go
    # through the same float rounding on both engines
    if v is None:
        return "~"
    try:
        return format(round(float(v), 4), ".4f")
    except (TypeError, ValueError):
        return str(v)


@pytest.mark.parametrize("seed", range(N_SPECS))
def test_agg_engine_matches_sql(seed, spark, transcripts, duck):
    rng = random.Random(7000 + seed)
    body, sql = _gen_spec(rng)
    got = aggs.aggregate(transcripts, body)
    cols = sorted(got.columns)
    ours = sorted(tuple(_norm(r[c]) for c in cols) for r in got.collect())
    odf = duck.execute(sql).df()
    assert sorted(odf.columns) == cols, f"columns differ for {body}: {sorted(odf.columns)} vs {cols}"
    theirs = sorted(
        tuple(_norm(x) for x in (getattr(row, c) for c in cols))
        for row in odf.itertuples(index=False)
    )
    assert ours == theirs, f"agg mismatch for {body}\n ours={ours[:4]}\n sql ={theirs[:4]}"
