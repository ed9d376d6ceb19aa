"""Hand-written independent oracles vs the engine (handset.py): BM25/phrase/
dis_max/msm algebra and the per-END span_near interval-freq derivation must
agree with the engine's per-START machinery on the sf test corpus."""

from __future__ import annotations

import math

import duckdb
import pytest

from elasticsearch_spark.handset import HAND_ORACLE_SQL, HAND_QUERY_FNS


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


def _norm(v):
    if isinstance(v, float):
        return None if math.isnan(v) else round(v, 4)
    return v


@pytest.mark.parametrize("name", sorted(HAND_QUERY_FNS))
def test_hand_oracle_matches(name, spark, sf_dir, duck):
    sdf = HAND_QUERY_FNS[name](spark, sf_dir)
    cols = sorted(sdf.columns)
    got = sorted(
        tuple(_norm(v) for v in (getattr(r, c) for c in cols))
        for r in sdf.collect()
    )
    cur = duck.execute(HAND_ORACLE_SQL[name])
    ocols = [d[0] for d in cur.description]
    order = [ocols.index(c) for c in sorted(ocols)]
    want = sorted(tuple(_norm(r[i]) for i in order) for r in cur.fetchall())
    assert sorted(ocols) == cols, f"{name}: columns {sorted(ocols)} vs {cols}"
    assert got == want, f"{name}: {got[:3]} vs {want[:3]}"
    assert got, f"{name}: vacuous (0 rows on both sides)"
