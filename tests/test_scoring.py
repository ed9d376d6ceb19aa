"""Unit tests: SmallFloat byte4 codec, BM25 kernel, analyzer parity."""

from __future__ import annotations

import math

from hypothesis import given
from hypothesis import strategies as st

from elasticsearch_spark.functions import analysis, scoring


def test_byte4_known_values():
    # identity below 8 (subnormal), top-4-bit truncation above
    for i in range(8):
        assert scoring.int_to_byte4(i) == i
        assert scoring.quantize_dl(i) == i
    assert scoring.quantize_dl(17) == 16
    assert scoring.quantize_dl(100) == 96
    assert scoring.quantize_dl(255) == 240
    assert scoring.quantize_dl(1000) == 960


@given(st.integers(min_value=0, max_value=2**30))
def test_byte4_roundtrip_properties(i):
    enc = scoring.int_to_byte4(i)
    assert 0 <= enc <= 255
    dec = scoring.byte4_to_int(enc)
    assert dec <= i  # rounds down
    # monotone: encoding is order-preserving
    assert scoring.byte4_to_int(scoring.int_to_byte4(dec)) == dec
    if i >= 8:
        assert dec > i // 2  # within one binade


@given(st.integers(min_value=0, max_value=2**20), st.integers(min_value=0, max_value=2**20))
def test_byte4_monotone(a, b):
    if a <= b:
        assert scoring.quantize_dl(a) <= scoring.quantize_dl(b)


def test_bm25_hand_computed():
    # N=3 docs, term df=1, doc dl=4 (subnormal: exact), avgdl=5.0, tf=2
    idf = math.log(1 + (3 - 1 + 0.5) / (1 + 0.5))
    norm = 1.2 * (1 - 0.75 + 0.75 * 4 / 5.0)
    want = idf * 2.2 * 2 / (2 + norm)
    got = scoring.bm25_term_score(tf=2, dl=4, avgdl=5.0, n_docs=3, df=1)
    assert abs(got - want) < 1e-12


def test_bm25_uses_quantized_dl():
    # dl=100 quantizes to 96 — score must use 96
    a = scoring.bm25_term_score(tf=1, dl=100, avgdl=50.0, n_docs=10, df=2)
    b = scoring.bm25_term_score(tf=1, dl=96, avgdl=50.0, n_docs=10, df=2)
    assert a == b


def test_analyze_matches_standard_analyzer():
    assert analysis.analyze("Hello, World!") == ["hello", "world"]
    assert analysis.analyze("don't stop") == ["don", "t", "stop"]
    assert analysis.analyze("Wörld 42 foo-bar") == ["wörld", "42", "foo", "bar"]
    assert analysis.analyze("") == []
    assert analysis.analyze("!!! ...") == []


def test_explain_match_components(spark, transcripts, sf_dir):
    # _explain analog: per-term BM25 components reconcile with the hit total
    import duckdb

    from elasticsearch_spark import oracle
    from elasticsearch_spark.operators import match as M

    got = M.explain_match(
        transcripts, "hash join table", ["conv_id", "turn_idx"], k=10
    )
    rows = got.collect()
    assert rows
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault((r.conv_id, r.turn_idx), []).append(r)
    for key, parts in by_doc.items():
        total = parts[0].total_score
        assert abs(sum(p.term_score for p in parts) - total) < 2e-3, key
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    cols = sorted(got.columns)
    eng = sorted(tuple(str(getattr(r, c)) for c in cols) for r in rows)
    cur = con.execute(oracle.explain_match_sql("hash join table", 10))
    ocols = [d[0] for d in cur.description]
    order = [ocols.index(c) for c in sorted(ocols)]
    want = sorted(tuple(str(r[i]) for i in order) for r in cur.fetchall())
    assert eng == want
