"""Match / bool query over a docs DataFrame — the *logical* (index-free) path.

This is the declarative twin of the segment-store query path (operators/topk.py):
the whole plan is built from filters, explodes, groupBys and broadcast joins so
Catalyst handles pushdown, partial aggregation and join strategy. The indexed
path must produce identical results (property-tested); this path doubles as the
oracle-friendly reference and as the ad-hoc path when no index exists yet.

Reference semantics implemented here:
  - `match`: analyze text -> OR (Occur.SHOULD) of per-term queries by default
    (index/search/MatchQuery.java:154); operator AND supported; zero analyzed
    terms => match nothing (zero_terms_query NONE default, MatchQuery.java:115-148);
    minimum_should_match as a matched-distinct-term threshold.
  - BM25 per §2.4 of SURVEY.md: k1=1.2 b=0.75, legacy (k1+1), byte4-quantized dl,
    global stats (reference defaults to 1 shard => its stats are global too,
    cluster/metadata/IndexMetaData.java:143).
  - tie-break: score desc, then index-time doc ordinal asc — our ordinal order
    is (conv_id, turn_idx) asc (SearchPhaseController.java:221-243).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import analysis, scoring


@dataclass
class CorpusStats:
    """Tiny 1-row + per-term stats DataFrames (never collected to the driver)."""

    n_and_avgdl: DataFrame  # columns: n_docs bigint, avgdl double
    term_df: DataFrame  # columns: term string, df bigint (for requested terms)


def doc_tokens(docs: DataFrame, key_cols: list[str], text_col: str = "text") -> DataFrame:
    """(keys..., term, tf, dl) — term frequencies per document."""
    toks = docs.select(*key_cols, analysis.tokens(text_col).alias("toks"))
    toks = toks.select(*key_cols, F.size("toks").alias("dl"), F.explode("toks").alias("term"))
    return toks.groupBy(*key_cols, "dl", "term").agg(F.count(F.lit(1)).alias("tf"))


def corpus_stats(docs: DataFrame, key_cols: list[str], terms: list[str], text_col: str = "text") -> CorpusStats:
    toks = docs.select(analysis.tokens(text_col).alias("toks"))
    n_avg = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.size("toks")) / F.count(F.lit(1))).cast("double").alias("avgdl"),
    )
    term_df = (
        toks.select(F.explode(F.array_distinct("toks")).alias("term"))
        .where(F.col("term").isin(terms) if terms else F.lit(False))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return CorpusStats(n_avg, term_df)


def _scored_terms(
    docs: DataFrame, key_cols: list[str], qterms: list[str], stats: CorpusStats, text_col: str = "text"
) -> DataFrame:
    """(keys..., term, score) for docs containing any query term."""
    tf = doc_tokens(docs, key_cols, text_col).where(F.col("term").isin(qterms))
    j = tf.join(F.broadcast(stats.term_df), "term").crossJoin(F.broadcast(stats.n_and_avgdl))
    dl_q = F.expr(scoring.quantized_dl_sql("dl", "spark"))
    idf = F.expr(scoring.idf_sql("n_docs", "df"))
    norm = F.lit(scoring.K1) * (F.lit(1.0 - scoring.B) + F.lit(scoring.B) * dl_q.cast("double") / F.col("avgdl"))
    score = idf * F.lit(scoring.K1 + 1.0) * F.col("tf") / (F.col("tf") + norm)
    return j.select(*key_cols, "term", score.alias("score"))


def match_scores(
    docs: DataFrame,
    query_text: str,
    key_cols: list[str],
    text_col: str = "text",
    operator: str = "or",
    minimum_should_match: int | None = None,
    stats: CorpusStats | None = None,
    keep_n_matched: bool = False,
) -> DataFrame:
    """(keys..., score) for every doc matching the match query (unsorted, no
    limit). keep_n_matched retains the matched-distinct-term count column for
    per-doc-threshold queries (terms_set)."""
    qterms = list(dict.fromkeys(analysis.analyze(query_text)))
    if not qterms:  # zero_terms_query=NONE
        return docs.select(*key_cols, F.lit(0.0).alias("score")).where(F.lit(False))
    stats = stats or corpus_stats(docs, key_cols, qterms, text_col)
    per_term = _scored_terms(docs, key_cols, qterms, stats, text_col)
    agg = per_term.groupBy(*key_cols).agg(
        F.sum("score").alias("score"), F.count(F.lit(1)).alias("n_matched")
    )
    need = len(qterms) if operator.lower() == "and" else (minimum_should_match or 1)
    out = agg.where(F.col("n_matched") >= need)
    return out if keep_n_matched else out.drop("n_matched")


def top_k(scored: DataFrame, key_cols: list[str], k: int = 10) -> DataFrame:
    """Deterministic top-k: rank by score (rounded for cross-engine stability),
    tie-break by doc key asc = index-time ordinal order."""
    order = [F.round(F.col("score"), 6).desc()] + [F.col(c).asc() for c in key_cols]
    return (
        scored.orderBy(*order)
        .limit(k)
        .select(*key_cols, F.round(F.col("score"), 4).alias("score"))
    )


# ------------------------------------------------------------------ term-level
def term_filter(col: str, value) -> Column:
    """ES `term` query — exact, un-analyzed (index/query/TermQueryBuilder.java)."""
    return F.col(col) == F.lit(value)


def terms_filter(col: str, values: list) -> Column:
    return F.col(col).isin(values)


def range_filter(col: str, gt=None, gte=None, lt=None, lte=None) -> Column:
    conds = []
    if gt is not None:
        conds.append(F.col(col) > F.lit(gt))
    if gte is not None:
        conds.append(F.col(col) >= F.lit(gte))
    if lt is not None:
        conds.append(F.col(col) < F.lit(lt))
    if lte is not None:
        conds.append(F.col(col) <= F.lit(lte))
    return reduce(lambda a, b: a & b, conds) if conds else F.lit(True)


def exists_filter(col: str) -> Column:
    return F.col(col).isNotNull()


def explain_match(
    docs: DataFrame,
    query_text: str,
    key_cols: list[str],
    k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """_explain / _search?explain=true analog (RestExplainAction; Lucene's
    Explanation tree flattened to rows): for each top-k hit of a match
    query, one row per matched term carrying the BM25 components — term
    freq, doc freq, idf, the byte4-quantized doc length, the term's score
    contribution — plus the hit's total. The component math is the exact
    scorer expression, so sum(term_score) reconciles with total_score up to
    the display rounding."""
    qterms = list(dict.fromkeys(analysis.analyze(query_text)))
    if not qterms:
        raise ValueError("explain needs a non-empty analyzed query")
    stats = corpus_stats(docs, key_cols, qterms, text_col)
    tf = doc_tokens(docs, key_cols, text_col).where(F.col("term").isin(qterms))
    j = tf.join(F.broadcast(stats.term_df), "term").crossJoin(
        F.broadcast(stats.n_and_avgdl)
    )
    dl_q = F.expr(scoring.quantized_dl_sql("dl", "spark"))
    idf = F.expr(scoring.idf_sql("n_docs", "df"))
    norm = F.lit(scoring.K1) * (
        F.lit(1.0 - scoring.B)
        + F.lit(scoring.B) * dl_q.cast("double") / F.col("avgdl")
    )
    tscore = idf * F.lit(scoring.K1 + 1.0) * F.col("tf") / (F.col("tf") + norm)
    comp = j.select(
        *key_cols,
        "term",
        F.col("tf").alias("term_freq"),
        F.col("df").alias("doc_freq"),
        F.round(idf, 4).alias("idf"),
        dl_q.cast("double").alias("dl_quantized"),
        F.round(tscore, 4).alias("term_score"),
    )
    hits = top_k(match_scores(docs, query_text, key_cols, text_col), key_cols, k)
    return comp.join(
        hits.select(*key_cols, F.col("score").alias("total_score")), key_cols
    )
