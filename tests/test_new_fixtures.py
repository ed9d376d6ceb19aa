"""Round-2 fixture additions vs their DuckDB oracles, compared with the
driver's convention (columns sorted by name, doubles rounded to 4dp, row
multisets equal)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry

NEW_NAMES = [
    "search_span_near_ordered",
    "search_span_first",
    "search_span_not",
    "search_span_or_terms",
    "indexed_span_near_ordered",
    "indexed_span_first",
    "indexed_span_not",
    "indexed_span_or_terms",
    "indexed_intervals_ordered",
    "indexed_intervals_unordered",
    "agg_rare_terms",
    "agg_adjacency_matrix",
    "agg_scripted_metric",
    "agg_diversified_sampler",
    "doc_get",
    "doc_multi_get",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        return None if math.isnan(v) else round(v, 4)
    return v


@pytest.mark.parametrize("name", NEW_NAMES)
def test_fixture_matches_oracle(name, spark, sf_dir, duck):
    qs, osql = entry.queries(), entry.oracle_sql()
    sdf = qs[name](spark, sf_dir)
    cols = sorted(sdf.columns)
    got = sorted(
        tuple(_norm(v) for v in (getattr(r, c) for c in cols)) for r in sdf.collect()
    )
    cur = duck.execute(osql[name])
    ocols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = [ocols.index(c) for c in sorted(ocols)]
    want = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    assert sorted(ocols) == cols, f"{name}: columns {sorted(ocols)} vs {cols}"
    assert got == want, f"{name}"
