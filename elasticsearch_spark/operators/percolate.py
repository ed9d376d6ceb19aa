"""Percolate: reverse search — match incoming documents against STORED
queries (reference: modules/percolator/, PercolateQueryBuilder.java; candidate
pruning via extracted query terms in QueryAnalyzer.java — the percolator only
executes queries whose required terms occur in the document).

Spark-first shape: that candidate-extraction design IS a relational plan.
Stored queries decompose to (query_id, term, need) rows; documents tokenize
and explode to (doc_key, term) rows; an equi-join on term + a groupBy
(doc, query) counting distinct matched terms >= need evaluates every
match-style query against every doc in ONE shuffle — no per-(doc, query)
loop, no per-doc memory index. At 100 TB both sides partition by term and the
query side is broadcast when small (the common case: queries are curated).

Supported stored-query shapes (the percolator's core use): match with
operator or/and and minimum_should_match, and term/terms on the analyzed
field. Phrase / keyword-field / compound shapes would add a residual verify
pass over candidates (same two-phase design as ES) — out of scope, raises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import analysis


def _msm(raw, n_terms: int) -> int:
    """minimum_should_match value: int, numeric string, or "30%"-style
    percentage (Queries.calculateMinShouldMatch — truncating, floor 1 here
    since a stored OR query always needs at least one term)."""
    if raw is None:
        return 1
    if isinstance(raw, str):
        raw = raw.strip()
        if raw.endswith("%"):
            return max(1, int(n_terms * int(raw[:-1]) / 100.0))
    try:
        return int(raw)
    except (TypeError, ValueError):
        raise ValueError(
            f"percolate minimum_should_match must be an integer or 'N%': {raw!r}"
        ) from None


def _query_terms(query: dict) -> tuple[list[str], int]:
    """(terms, needed distinct matches) for one stored query dict."""
    (kind, body), = query.items()
    if kind == "match":
        (field, spec), = body.items()
        if field != "text":
            raise ValueError("percolate supports the analyzed `text` field")
        if isinstance(spec, str):
            spec = {"query": spec}
        terms = list(dict.fromkeys(analysis.analyze(spec["query"])))
        op = spec.get("operator", "or").lower()
        need = len(terms) if op == "and" else _msm(spec.get("minimum_should_match"), len(terms))
        return terms, need
    if kind in ("term", "terms"):
        (field, v), = body.items()
        if field != "text":
            raise ValueError("percolate supports the analyzed `text` field")
        vals = list(v) if kind == "terms" else [v["value"] if isinstance(v, dict) else v]
        return [str(x).lower() for x in vals], 1
    raise ValueError(f"percolate cannot index stored query kind: {kind}")


def percolate(
    docs: DataFrame,
    stored_queries: dict[str, dict],
    key_cols: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """(key_cols..., query_id) for every (document, stored query) match."""
    key_cols = key_cols or ["conv_id", "turn_idx"]
    spark = docs.sparkSession
    rows = []
    for qid in sorted(stored_queries):
        terms, need = _query_terms(stored_queries[qid])
        if not terms:
            continue  # zero-term query matches nothing (zero_terms NONE)
        rows += [(qid, t, need) for t in terms]
    qterms = spark.createDataFrame(rows, "query_id string, term string, need int")
    doc_terms = docs.select(
        *key_cols,
        F.explode(F.array_distinct(analysis.tokens(text_col))).alias("term"),
    )
    return (
        doc_terms.join(F.broadcast(qterms), "term")
        .groupBy(*key_cols, "query_id")
        .agg(F.count(F.lit(1)).alias("_m"), F.max("need").alias("_need"))
        .where(F.col("_m") >= F.col("_need"))
        .select(*key_cols, "query_id")
        .orderBy(*key_cols, "query_id")
    )
