"""Ingest-pipeline / suggester / _analyze fixtures + DuckDB oracle twins."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import analysis
from .operators import ingest, suggest
from .oracle import TRANSCRIPTS_CTE
from .sources import transcripts as TR

_TOKS = analysis.tokens_sql("text", "duckdb")

INGEST_PIPELINE = [
    {"set": {"field": "source_tag", "value": "ingest"}},
    {"lowercase": {"field": "role", "target_field": "role_lc"}},
    {"uppercase": {"field": "tool", "target_field": "tool_uc"}},
    {"gsub": {"field": "text", "target_field": "text_nodigit", "pattern": "[0-9]+", "replacement": "#"}},
    {"convert": {"field": "turn_idx", "type": "string", "target_field": "turn_str"}},
    {"set": {"field": "sz", "value": "concat(cast(turn_idx + 1 as string), 'kb')", "expr": True}},
    {"bytes": {"field": "sz", "target_field": "sz_bytes"}},
    {"split": {"field": "text", "target_field": "words", "separator": " "}},
    {"join": {"field": "words", "target_field": "text_rejoined", "separator": "|"}},
    {"drop": {"if": "role = 'system'"}},
]

_INGEST_ORACLE = f"""{TRANSCRIPTS_CTE}
SELECT conv_id, turn_idx, 'ingest' AS source_tag, lower(role) AS role_lc,
       upper(tool) AS tool_uc,
       regexp_replace(text, '[0-9]+', '#', 'g') AS text_nodigit,
       cast(turn_idx AS varchar) AS turn_str,
       cast((turn_idx + 1) * 1024 AS bigint) AS sz_bytes,
       array_to_string(string_split(text, ' '), '|') AS text_rejoined
FROM transcripts WHERE role <> 'system'"""


def fx_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TR.transcripts_view(spark, sf_dir)
    out = ingest.run_pipeline(docs, INGEST_PIPELINE)
    return out.select(
        "conv_id", "turn_idx", "source_tag", "role_lc", "tool_uc",
        "text_nodigit", "turn_str", "sz_bytes", "text_rejoined",
    )


SUGGEST_TEXT = "sparc quer tabel"

_SUGGEST_ORACLE = f"""{TRANSCRIPTS_CTE},
td AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT conv_id, turn_idx, unnest(list_distinct({_TOKS})) AS term
    FROM transcripts
  ) GROUP BY term
),
inputs AS (SELECT unnest(['sparc', 'quer', 'tabel']) AS input),
cand AS (
  SELECT input, term, df, levenshtein(term, input) AS distance
  FROM td CROSS JOIN inputs
  WHERE abs(length(term) - length(input)) <= 2 AND levenshtein(term, input) <= 2
)
SELECT input, term AS suggestion, distance, df FROM (
  SELECT *, row_number() OVER (
    PARTITION BY input ORDER BY distance, df DESC, term) AS rn
  FROM cand
) WHERE rn <= 5"""


def fx_term_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TR.transcripts_view(spark, sf_dir)
    return suggest.term_suggest(docs, SUGGEST_TEXT, max_edits=2, size=5)


_COMPLETION_ORACLE = f"""{TRANSCRIPTS_CTE},
td AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT conv_id, turn_idx, unnest(list_distinct({_TOKS})) AS term
    FROM transcripts
  ) GROUP BY term
)
SELECT term AS suggestion, df AS weight FROM td
WHERE starts_with(term, 'qu') ORDER BY df DESC, term LIMIT 5"""


def fx_completion_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TR.transcripts_view(spark, sf_dir)
    entries = suggest.term_dictionary(docs).select(
        F.col("term").alias("input"), F.col("df").alias("weight")
    )
    return suggest.completion_suggest(entries, "qu", size=5)


_ANALYZE_ORACLE = """
WITH toks AS (
  SELECT regexp_extract_all(lower('Hello, Spark-Graft 42!'), '[\\pL\\pN]+') AS l
)
SELECT unnest(l) AS token,
       cast(generate_subscripts(l, 1) - 1 AS int) AS position
FROM toks"""


def fx_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    return suggest.analyze_api(spark, "Hello, Spark-Graft 42!")


# --- _analyze with a synonym + full-Porter chain (round 4: the two
# highest-usage analysis components beyond `standard`; ref
# SynonymTokenFilterFactory.java, Lucene PorterStemmer). The oracle is the
# HAND-DERIVED token stream (independently worked through the Solr rules and
# the Porter-1980 steps), so the filters themselves are under the gate:
#   standard+lowercase: the db was quick relational queries happily optimized
#   synonyms (db=>database; fast,quick,rapid expand):
#     the database was fast quick rapid relational queries happily optimized
#   porter: the databas wa fast quick rapid relat queri happili optim
_SYN_PORTER_CHAIN = {
    "tokenizer": "standard",
    "filters": [
        "lowercase",
        {"type": "synonym", "synonyms": ["fast, quick, rapid", "db => database"]},
        {"type": "stemmer", "language": "porter"},
    ],
}


def fx_analyze_synonym_porter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return suggest.analyze_api(
        spark,
        "The DB was quick: relational queries happily optimized",
        _SYN_PORTER_CHAIN,
    )


_ANALYZE_SYN_PORTER_ORACLE = """
SELECT * FROM (VALUES
  ('the', 0), ('databas', 1), ('wa', 2), ('fast', 3), ('quick', 4),
  ('rapid', 5), ('relat', 6), ('queri', 7), ('happili', 8), ('optim', 9)
) AS t(token, position)"""


# --- _analyze with MULTI-WORD synonyms (round 5; ref
# SynonymGraphTokenFilterFactory.java + Lucene FlattenGraphFilter — ES's own
# index-time flattening). Oracle is the HAND-DERIVED flattened stream:
#   standard+lowercase: from ny to the usa a hash table in new york
#   rules (longest-first): "hash table"=>hashmap; "ny, new york" expands
#   both ways to [ny new york]; usa => united states
#   flat: from ny new york to the united states a hashmap in ny new york
_SYN_MULTIWORD_CHAIN = {
    "tokenizer": "standard",
    "filters": [
        "lowercase",
        {"type": "synonym",
         "synonyms": ["ny, new york", "hash table => hashmap",
                      "usa => united states"]},
    ],
}


def fx_analyze_synonym_multiword(spark: SparkSession, sf_dir: str) -> DataFrame:
    return suggest.analyze_api(
        spark,
        "From NY to the USA: a hash table in New York",
        _SYN_MULTIWORD_CHAIN,
    )


_ANALYZE_SYN_MULTIWORD_ORACLE = """
SELECT * FROM (VALUES
  ('from', 0), ('ny', 1), ('new', 2), ('york', 3), ('to', 4), ('the', 5),
  ('united', 6), ('states', 7), ('a', 8), ('hashmap', 9), ('in', 10),
  ('ny', 11), ('new', 12), ('york', 13)
) AS t(token, position)"""


# --- Get / Multi-get (ShardGetService.java:92-125, TransportMultiGetAction):
# point reads by _id = conv_id#turn_idx against the latest snapshot view
_GET_IDS = ["conv_000002#7", "conv_000005#0", "conv_000009#19"]


def _id_col():
    return F.concat_ws(
        "#", F.col("conv_id").cast("string"), F.col("turn_idx").cast("string")
    )


def fx_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TR.transcripts_view(spark, sf_dir)
    return docs.where(_id_col() == _GET_IDS[0]).select(
        "conv_id", "turn_idx", "role", "text", "tool"
    )


def fx_multi_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TR.transcripts_view(spark, sf_dir)
    return (
        docs.where(_id_col().isin(_GET_IDS))
        .select("conv_id", "turn_idx", "role", "text", "tool")
        .orderBy("conv_id", "turn_idx")
    )


def _get_oracle(ids: list[str]) -> str:
    lits = ", ".join(f"'{v}'" for v in ids)
    return (
        TRANSCRIPTS_CTE
        + f"""
SELECT conv_id, turn_idx, role, text, tool FROM transcripts
WHERE conv_id || '#' || cast(turn_idx as varchar) IN ({lits})
ORDER BY conv_id, turn_idx"""
    )


# --- Percolate (modules/percolator/): docs with turn_idx <= 1 percolated
# against four stored match/term queries; oracle = one hand-written SQL arm
# per stored query over the same token algebra
PERCOLATE_QUERIES = {
    "q_match_or": {"match": {"text": "spark query fast"}},
    "q_match_and": {"match": {"text": {"query": "join table", "operator": "and"}}},
    "q_msm": {"match": {"text": {"query": "window agg stream", "minimum_should_match": 2}}},
    "q_term": {"term": {"text": "customer"}},
    # residual-verified shapes (candidate terms prune, exact verify pass):
    "q_phrase": {"match_phrase": {"text": "spark query"}},
    "q_bool": {
        "bool": {
            "must": [{"match": {"text": {"query": "join table", "operator": "and"}}}],
            "must_not": [{"term": {"text": "customer"}}],
        }
    },
    # prefix stored query (PrefixQueryBuilder): candidate == match via the
    # startswith join on distinct tokens
    "q_prefix": {"prefix": {"text": "wind"}},
}


def fx_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import percolate as P

    docs = TR.transcripts_view(spark, sf_dir).where("turn_idx <= 1")
    return P.percolate(docs, PERCOLATE_QUERIES)


def _percolate_arm(qid: str, terms: list[str], need: int) -> str:
    lits = ", ".join(f"'{t}'" for t in terms)
    return (
        f"SELECT conv_id, turn_idx, '{qid}' AS query_id FROM transcripts "
        f"WHERE turn_idx <= 1 AND len(list_filter(list_distinct({_TOKS}), "
        f"t -> list_contains([{lits}], t))) >= {need}"
    )


_PERCOLATE_PHRASE_ARM = (
    "SELECT conv_id, turn_idx, 'q_phrase' AS query_id FROM transcripts "
    f"WHERE turn_idx <= 1 AND len(list_filter(generate_series(1, len({_TOKS}) - 1), "
    f"i -> ({_TOKS})[i] = 'spark' AND ({_TOKS})[i + 1] = 'query')) > 0"
)
_PERCOLATE_PREFIX_ARM = (
    "SELECT conv_id, turn_idx, 'q_prefix' AS query_id FROM transcripts "
    f"WHERE turn_idx <= 1 AND len(list_filter(list_distinct({_TOKS}), "
    "t -> starts_with(t, 'wind'))) > 0"
)
_PERCOLATE_BOOL_ARM = (
    "SELECT conv_id, turn_idx, 'q_bool' AS query_id FROM transcripts "
    f"WHERE turn_idx <= 1 AND list_contains(list_distinct({_TOKS}), 'join') "
    f"AND list_contains(list_distinct({_TOKS}), 'table') "
    f"AND NOT list_contains(list_distinct({_TOKS}), 'customer')"
)

_PERCOLATE_ORACLE = (
    TRANSCRIPTS_CTE
    + "\nSELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        [
            _percolate_arm("q_match_or", ["spark", "query", "fast"], 1),
            _percolate_arm("q_match_and", ["join", "table"], 2),
            _percolate_arm("q_msm", ["window", "agg", "stream"], 2),
            _percolate_arm("q_term", ["customer"], 1),
            _PERCOLATE_PHRASE_ARM,
            _PERCOLATE_BOOL_ARM,
            _PERCOLATE_PREFIX_ARM,
        ]
    )
    + "\n) ORDER BY conv_id, turn_idx, query_id"
)


# --- Percolate scan arm (round 5): keyword-only / pure-negative / range-only
# stored queries — QueryAnalyzer.java marks these matchAllDocs and ES
# verifies per-doc via MemoryIndex; here the scan arm evaluates them exactly
# over the percolated batch. One term-join query rides along to prove the
# two arms union correctly.
PERCOLATE_SCAN_QUERIES = {
    "q_role_kw": {"term": {"role": "user"}},
    "q_negative": {
        "bool": {"must_not": [{"match": {"text": "customer window"}}]}
    },
    "q_range_only": {"range": {"turn_idx": {"gte": 1}}},
    "q_spark": {"match": {"text": "spark"}},
}


def fx_percolate_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import percolate as P

    docs = TR.transcripts_view(spark, sf_dir).where("turn_idx <= 1")
    return P.percolate(docs, PERCOLATE_SCAN_QUERIES)


_PERCOLATE_SCAN_ORACLE = (
    TRANSCRIPTS_CTE
    + "\nSELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        [
            "SELECT conv_id, turn_idx, 'q_role_kw' AS query_id FROM transcripts "
            "WHERE turn_idx <= 1 AND role = 'user'",
            "SELECT conv_id, turn_idx, 'q_negative' AS query_id FROM transcripts "
            f"WHERE turn_idx <= 1 AND len(list_filter(list_distinct({_TOKS}), "
            "t -> list_contains(['customer', 'window'], t))) = 0",
            "SELECT conv_id, turn_idx, 'q_range_only' AS query_id FROM transcripts "
            "WHERE turn_idx <= 1 AND turn_idx >= 1",
            _percolate_arm("q_spark", ["spark"], 1),
        ]
    )
    + "\n) ORDER BY conv_id, turn_idx, query_id"
)

# --- Search template (modules/lang-mustache/): render {{param}} placeholders
# into a query body, then run it; the oracle runs the rendered query
SEARCH_TEMPLATE = {
    "match": {
        "text": {"query": "{{q}}", "minimum_should_match": "{{msm}}"}
    }
}
TEMPLATE_PARAMS = {"q": "window agg stream batch", "msm": 3}


def fx_search_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans import query_dsl as Q
    from .plans.templates import render_template

    body = render_template(SEARCH_TEMPLATE, TEMPLATE_PARAMS)
    docs = TR.transcripts_view(spark, sf_dir)
    return Q.search(docs, body, ["conv_id", "turn_idx"], k=10)


def _template_oracle() -> str:
    from . import oracle
    from .plans.templates import render_template

    return oracle.search_sql(render_template(SEARCH_TEMPLATE, TEMPLATE_PARAMS), 10)


# --- Streaming ingest (streaming/ingest.py, ES refresh analog): stream the
# corpus in as AvailableNow micro-batches (>= 2 batches via 10 source files,
# maxFilesPerTrigger=8), then answer a BM25 top-k on the streamed store —
# must be rank-identical to the batch oracle (streamed == batch)
def fx_stream_ingest_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from .operators import topk
    from .queryset import SEARCH_QUERIES
    from .sources.segment_store import SegmentStore
    from .streaming.ingest import stream_ingest

    base = tempfile.mkdtemp(prefix="es_stream_fx_")
    src = os.path.join(base, "src")
    root = os.path.join(base, "store")
    ckpt = os.path.join(base, "ckpt")
    TR.transcripts_view(spark, sf_dir).repartition(10).write.parquet(src)
    stream_ingest(spark, src, root, ckpt).awaitTermination()
    return topk.search_indexed(
        spark, SegmentStore(root), SEARCH_QUERIES["match_or_topk"], k=10
    )


def _stream_oracle() -> str:
    from . import oracle
    from .queryset import SEARCH_QUERIES

    return oracle.search_sql(SEARCH_QUERIES["match_or_topk"], 10)


# --- Multi-index search (TransportSearchAction.java:464 — several indices
# resolve to a union, each scored with its OWN corpus stats): the corpus is
# split into two disjoint stores by turn_idx parity, multi_store_search
# merges per-index top-k; the oracle runs the SAME BM25 SQL per subset and
# merges, so per-index idf is what the hash-match certifies.
_MIDX_QUERY_NAME = "match_or_topk"
_MIDX_PRED = ["turn_idx % 2 = 0", "turn_idx % 2 = 1"]


def fx_multi_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .operators import index_build, topk
    from .queryset import SEARCH_QUERIES

    docs = TR.transcripts_view(spark, sf_dir)
    stores = []
    for i, pred in enumerate(_MIDX_PRED):
        root = tempfile.mkdtemp(prefix=f"es_spark_midx{i}_")
        stores.append(
            index_build.build_index(
                spark, docs.where(pred), root, n_slices=1, partitions=4
            )
        )
    return topk.multi_store_search(spark, stores, SEARCH_QUERIES[_MIDX_QUERY_NAME], k=10)


def _multi_index_oracle() -> str:
    from . import oracle
    from .queryset import SEARCH_QUERIES

    arms = []
    for pred in _MIDX_PRED:
        sql = oracle.search_sql(SEARCH_QUERIES[_MIDX_QUERY_NAME], 10)
        # per-index corpus stats: re-scope the transcripts CTE to the subset
        filtered = TRANSCRIPTS_CTE[:-1].replace(
            "WITH transcripts AS (", "WITH transcripts AS (SELECT * FROM (", 1
        ) + f") WHERE {pred})"
        arms.append("SELECT * FROM (" + sql.replace(TRANSCRIPTS_CTE, filtered, 1) + ")")
    return (
        "SELECT conv_id, turn_idx, score FROM (\n"
        + "\nUNION ALL\n".join(arms)
        + "\n) ORDER BY round(score, 6) DESC, conv_id, turn_idx LIMIT 10"
    )


# --- Scroll / sliced scroll (point-in-time cursor, search/slice/
# SliceBuilder.java): a read-only store shared across fixtures (Scroll pins
# a snapshot and never writes)
_RO_STORES: dict[str, object] = {}


def _ro_store(spark: SparkSession, sf_dir: str):
    import tempfile

    from .operators import index_build

    if sf_dir not in _RO_STORES:
        root = tempfile.mkdtemp(prefix="es_spark_ro_")
        _RO_STORES[sf_dir] = index_build.build_index(
            spark, TR.transcripts_view(spark, sf_dir), root, n_slices=1, partitions=4
        )
    return _RO_STORES[sf_dir]


def fx_scroll_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three scroll pages of 9 == the first 27 docs in (conv_id, turn_idx)
    order (single-slice stores assign ordinals in exactly that order)."""
    from .operators.cursor import Scroll

    sc = Scroll(spark, _ro_store(spark, sf_dir), size=9, predicate="role = 'user'")
    rows = []
    for _ in range(3):
        rows += [(r.conv_id, r.turn_idx, r.role) for r in sc.next_page()]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")


_SCROLL_ORACLE = f"""{TRANSCRIPTS_CTE}
SELECT conv_id, turn_idx, role FROM transcripts WHERE role = 'user'
ORDER BY conv_id, turn_idx LIMIT 27"""


def fx_sliced_scroll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain all 3 slices to exhaustion: the union must be exactly the
    predicate's doc set (slices disjoint + exhaustive), which is what the
    rows+hash match against the sliceless oracle certifies."""
    from .operators.cursor import Scroll

    store = _ro_store(spark, sf_dir)
    rows = []
    for sid in range(3):
        sc = Scroll(
            spark, store, size=200, predicate="role <> 'system'",
            n_slices=3, slice_id=sid,
        )
        while True:
            page = sc.next_page()
            if not page:
                break
            rows += [(r.conv_id, r.turn_idx) for r in page]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int")


_SLICED_SCROLL_ORACLE = f"""{TRANSCRIPTS_CTE}
SELECT conv_id, turn_idx FROM transcripts WHERE role <> 'system'"""


def fx_from_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset pagination: page 2 (from=10, size=10) of a scored search."""
    from .operators.cursor import from_size
    from .plans import query_dsl as Q
    from .queryset import SEARCH_QUERIES

    docs = TR.transcripts_view(spark, sf_dir)
    scored = Q.search(docs, SEARCH_QUERIES["match_or_topk"], ["conv_id", "turn_idx"], k=20)
    return from_size(scored, from_=10, size=10)


def _from_size_oracle() -> str:
    from . import oracle
    from .queryset import SEARCH_QUERIES

    return oracle.search_sql(SEARCH_QUERIES["match_or_topk"], 10) + " OFFSET 10"


def fx_phrase_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TR.transcripts_view(spark, sf_dir)
    return suggest.phrase_suggest(docs, SUGGEST_TEXT, max_edits=1, size=3)


_PHRASE_SUGGEST_ORACLE = f"""{TRANSCRIPTS_CTE},
td AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT conv_id, turn_idx, unnest(list_distinct({_TOKS})) AS term
    FROM transcripts
  ) GROUP BY term
),
inputs AS (SELECT * FROM (VALUES ('sparc', 1), ('quer', 2), ('tabel', 3)) AS t(input, ord)),
cand AS (
  SELECT input, ord, term, df, levenshtein(term, input) AS distance
  FROM td CROSS JOIN inputs
  WHERE abs(length(term) - length(input)) <= 1 AND levenshtein(term, input) <= 1
),
best AS (
  SELECT input, term, df FROM (
    SELECT *, row_number() OVER (
      PARTITION BY input ORDER BY distance, df DESC, term) AS rn
    FROM cand
  ) WHERE rn = 1
),
tok AS (
  SELECT i.ord, coalesce(b.term, i.input) AS corrected, coalesce(b.df, 0) AS df
  FROM inputs i LEFT JOIN best b ON b.input = i.input
)
SELECT string_agg(corrected, ' ' ORDER BY ord) AS suggestion,
       round(sum(ln(1 + df)), 4) AS score
FROM tok"""


# --- rank-eval (modules/rank-eval, RankEvalRequest -> per-metric response):
# evaluate the match_or_topk run against deterministic graded judgments
# (grade = it-mentions-spark + it-mentions-query, the same rule in both
# engines), metrics over the top-10 ranked by (score_4dp desc, keys) — the
# exact ranked-list evaluation ES performs coordinator-side on fetched hits.
def fx_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions import rank_eval as RE
    from .plans import query_dsl as Q
    from .queryset import SEARCH_QUERIES

    docs = TR.transcripts_view(spark, sf_dir)
    grade = (
        F.array_contains(analysis.tokens("text"), "spark").cast("int")
        + F.array_contains(analysis.tokens("text"), "query").cast("int")
    ).alias("g")
    hits = Q.search(docs, SEARCH_QUERIES["match_or_topk"], ["conv_id", "turn_idx"], k=10).collect()
    ranked = [
        (r.conv_id, r.turn_idx)
        for r in sorted(hits, key=lambda r: (-r.score, r.conv_id, r.turn_idx))
    ]
    gd = docs.select("conv_id", "turn_idx", grade)
    n_rel = gd.where(F.col("g") > 0).count()
    ideal = [r.g for r in gd.orderBy(F.col("g").desc()).limit(10).collect()]
    keys_df = spark.createDataFrame(ranked, "conv_id string, turn_idx int")
    hit_grades = {
        (r.conv_id, r.turn_idx): r.g
        for r in gd.join(F.broadcast(keys_df), ["conv_id", "turn_idx"]).collect()
    }
    relevant = {k for k, g in hit_grades.items() if g > 0}
    # recall denominator is corpus-wide relevant count, not just fetched
    import math

    dcg = RE.dcg_at_k(ranked, hit_grades, 10)
    idcg = sum((2**g - 1) / math.log2(i + 1) for i, g in enumerate(ideal, start=1))
    row = (
        round(RE.precision_at_k(ranked, relevant, 10), 4),
        round((sum(1 for d in ranked[:10] if d in relevant) / n_rel) if n_rel else 0.0, 4),
        round(RE.mrr(ranked, relevant), 4),
        round(dcg, 4),
        round(dcg / idcg if idcg else 0.0, 4),
    )
    return spark.createDataFrame(
        [row],
        "precision_10 double, recall_10 double, mrr double, dcg_10 double, ndcg_10 double",
    )


def _rank_eval_oracle() -> str:
    from . import oracle
    from .queryset import SEARCH_QUERIES

    inner = oracle.search_sql(SEARCH_QUERIES["match_or_topk"], 10)
    return f"""WITH hits AS (
  SELECT conv_id, turn_idx, score,
         row_number() OVER (ORDER BY score DESC, conv_id, turn_idx) AS rnk
  FROM ({inner})
),
grades AS ({oracle.TRANSCRIPTS_CTE}
  SELECT conv_id, turn_idx,
         (list_contains({_TOKS}, 'spark')::int
          + list_contains({_TOKS}, 'query')::int) AS g
  FROM transcripts
),
hg AS (SELECT h.rnk, coalesce(g.g, 0) AS g FROM hits h
       JOIN grades g USING (conv_id, turn_idx)),
ideal AS (SELECT row_number() OVER (ORDER BY g DESC) AS rnk, g
          FROM (SELECT g FROM grades ORDER BY g DESC LIMIT 10)),
m AS (
  SELECT
    sum(CASE WHEN g > 0 THEN 1 ELSE 0 END) / 10.0 AS p10,
    sum(CASE WHEN g > 0 THEN 1 ELSE 0 END)
      / greatest((SELECT count(*) FROM grades WHERE g > 0), 1) AS r10,
    coalesce(1.0 / min(CASE WHEN g > 0 THEN rnk END), 0.0) AS mrr,
    sum((pow(2, g) - 1) / log2(rnk + 1)) AS dcg
  FROM hg
)
SELECT round(p10, 4) AS precision_10, round(r10, 4) AS recall_10,
       round(mrr, 4) AS mrr, round(dcg, 4) AS dcg_10,
       round(dcg / (SELECT sum((pow(2, g) - 1) / log2(rnk + 1)) FROM ideal), 4)
         AS ndcg_10
FROM m"""


def fx_update_old_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fork's signature feature (req_old_source/req_new_source,
    UpdateResponse.java:97-110, FetchSourceContext.java:124-186): an
    _update_by_query capturing capped pre- and post-image sources with an
    includes projection. Builds a PRIVATE store (the update commits a new
    snapshot; the shared per-sf store must stay pristine for the indexed_*
    fixtures that run after this one)."""
    import tempfile

    from .operators import index_build, update

    docs = TR.transcripts_view(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="es_spark_upd_")
    store = index_build.build_index(spark, docs, root, n_slices=1, partitions=4)
    res = update.update_by_query(
        spark,
        store,
        "turn_idx = 4",
        {"tool": "upper(role)", "text": "concat(text, ' [edited]')"},
        req_old_source=["role", "text", "tool"],
        req_new_source=["role", "text", "tool"],
    )
    old = res.old_source.withColumn("img", F.lit("old"))
    new = res.new_source.withColumn("img", F.lit("new"))
    return old.unionByName(new).orderBy("img", "conv_id", "turn_idx")


_UPDATE_OLD_NEW_ORACLE = f"""{TRANSCRIPTS_CTE},
sel AS (SELECT conv_id, turn_idx, role, text, tool FROM transcripts
        WHERE turn_idx = 4 ORDER BY conv_id, turn_idx LIMIT 10)
SELECT conv_id, turn_idx, role, text, tool, 'old' AS img FROM sel
UNION ALL
SELECT conv_id, turn_idx, role, text || ' [edited]' AS text,
       upper(role) AS tool, 'new' AS img FROM sel
ORDER BY img, conv_id, turn_idx"""


# --- Painless update context (UpdateHelper.java:126-145 executeScript):
# ctx._source assignments, if/else, params, and ctx.op='noop' compiled to SQL
# SET expressions + a noop predicate (functions/painless.compile_update). The
# oracle is HAND-WRITTEN DuckDB (not generated from the script), so the
# translator itself is under test.
_UBQS_SCRIPT = {
    "source": (
        "if (ctx._source.role == 'system') { ctx.op = 'noop'; } "
        "ctx._source.tool = params.mark; "
        "if (ctx._source.turn_idx >= params.hi) "
        "{ ctx._source.text = ctx._source.text + ' [late]'; } "
        "else { ctx._source.text = ctx._source.text + ' [early]'; }"
    ),
    "params": {"mark": "scripted", "hi": 10},
    "lang": "painless",
}
_UBQS_PRED = "turn_idx % 5 = 2"


def fx_update_by_query_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .operators import index_build, update

    docs = TR.transcripts_view(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="es_spark_ubqs_")
    store = index_build.build_index(spark, docs, root, n_slices=1, partitions=4)
    res = update.update_by_query(
        spark,
        store,
        _UBQS_PRED,
        script=_UBQS_SCRIPT,
        req_old_source=["role", "text", "tool"],
        req_new_source=["role", "text", "tool"],
    )
    old = res.old_source.withColumn("img", F.lit("old"))
    new = res.new_source.withColumn("img", F.lit("new"))
    return old.unionByName(new).orderBy("img", "conv_id", "turn_idx")


_UBQS_ORACLE = f"""{TRANSCRIPTS_CTE},
sel AS (SELECT conv_id, turn_idx, role, text, tool FROM transcripts
        WHERE ({_UBQS_PRED}) AND NOT (role = 'system')
        ORDER BY conv_id, turn_idx LIMIT 10)
SELECT conv_id, turn_idx, role, text, tool, 'old' AS img FROM sel
UNION ALL
SELECT conv_id, turn_idx, role,
       text || (CASE WHEN turn_idx >= 10 THEN ' [late]' ELSE ' [early]' END)
         AS text,
       'scripted' AS tool, 'new' AS img FROM sel
ORDER BY img, conv_id, turn_idx"""


# --- LSM compaction (EsTieredMergePolicy.java:35-51 / MergePolicyConfig):
# a 3-slice build leaves 3 sub-floor segments in one tier; compact() must
# merge them, and BM25 over the MERGED store must stay rank- and
# score-identical to the whole-corpus oracle — what the hash-match certifies.
_MERGE_QUERY_NAME = "match_and_topk"


def fx_merged_store_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .operators import index_build, merge, topk
    from .queryset import SEARCH_QUERIES

    docs = TR.transcripts_view(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="es_spark_merge_fx_")
    store = index_build.build_index(spark, docs, root, n_slices=3, partitions=4)
    n_before = len(store.snapshot().segments)
    merge.compact(spark, store, partitions=4)
    n_after = len(store.snapshot().segments)
    if not (n_before == 3 and n_after < n_before):
        raise AssertionError(
            f"compaction fixture is vacuous: {n_before} -> {n_after} segments"
        )
    return topk.search_indexed(spark, store, SEARCH_QUERIES[_MERGE_QUERY_NAME], k=10)


def _merged_store_oracle() -> str:
    from . import oracle
    from .queryset import SEARCH_QUERIES

    return oracle.search_sql(SEARCH_QUERIES[_MERGE_QUERY_NAME], 10)


# --- delete-by-query lifecycle (AbstractAsyncBulkByScrollAction +
# Lucene liveDocs purge): positional deletes hide docs immediately; the next
# merge PURGES them and rebuilds postings/stats over the survivors, so a
# scored query over the compacted store must hash-match a BM25 oracle whose
# corpus (df, avgdl, N) is the post-delete corpus.
_DBQ_PRED = "role = 'system'"
_DBQ_QUERY_NAME = "match_or_topk"


def fx_delete_by_query_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .operators import index_build, merge, topk, update
    from .queryset import SEARCH_QUERIES

    docs = TR.transcripts_view(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="es_spark_dbq_fx_")
    store = index_build.build_index(spark, docs, root, n_slices=2, partitions=4)
    n_deleted, _ = update.delete_by_query(spark, store, _DBQ_PRED)
    merge.compact(spark, store, partitions=4)
    snap = store.snapshot()
    if n_deleted == 0 or len(snap.segments) != 1 or snap.delete_files:
        raise AssertionError(
            f"delete/merge fixture is vacuous: deleted={n_deleted}, "
            f"segments={len(snap.segments)}, deletes={len(snap.delete_files)}"
        )
    return topk.search_indexed(spark, store, SEARCH_QUERIES[_DBQ_QUERY_NAME], k=10)


def _dbq_oracle() -> str:
    from . import oracle
    from .queryset import SEARCH_QUERIES
    from .sources.transcripts import transcripts_view_sql

    sql = oracle.search_sql(SEARCH_QUERIES[_DBQ_QUERY_NAME], 10)
    filtered_cte = (
        "WITH transcripts_base AS ("
        + transcripts_view_sql("documents", "duckdb")
        + "),\ntranscripts AS (SELECT * FROM transcripts_base "
        f"WHERE NOT ({_DBQ_PRED}))"
    )
    assert oracle.TRANSCRIPTS_CTE in sql
    return sql.replace(oracle.TRANSCRIPTS_CTE, filtered_cte, 1)


MISC_QUERY_FNS = {
    "merged_store_search": fx_merged_store_search,
    "delete_by_query_search": fx_delete_by_query_search,
    "ingest_pipeline": fx_ingest,
    "update_old_new_source": fx_update_old_new,
    "update_by_query_script": fx_update_by_query_script,
    "multi_index_search": fx_multi_index,
    "cursor_scroll_pages": fx_scroll_pages,
    "cursor_sliced_scroll": fx_sliced_scroll,
    "cursor_from_size": fx_from_size,
    "suggest_phrase": fx_phrase_suggest,
    "rank_eval_match": fx_rank_eval,
    "suggest_term": fx_term_suggest,
    "suggest_completion": fx_completion_suggest,
    "analyze_tokens": fx_analyze,
    "analyze_synonym_porter": fx_analyze_synonym_porter,
    "analyze_synonym_multiword": fx_analyze_synonym_multiword,
    "doc_get": fx_get,
    "doc_multi_get": fx_multi_get,
    "percolate_stored": fx_percolate,
    "percolate_keyword_negative": fx_percolate_scan,
    "search_template_match": fx_search_template,
    "streaming_ingest_search": fx_stream_ingest_search,
}

MISC_ORACLE_SQL = {
    "merged_store_search": _merged_store_oracle(),
    "delete_by_query_search": _dbq_oracle(),
    "ingest_pipeline": _INGEST_ORACLE,
    "update_old_new_source": _UPDATE_OLD_NEW_ORACLE,
    "update_by_query_script": _UBQS_ORACLE,
    "multi_index_search": _multi_index_oracle(),
    "cursor_scroll_pages": _SCROLL_ORACLE,
    "cursor_sliced_scroll": _SLICED_SCROLL_ORACLE,
    "cursor_from_size": _from_size_oracle(),
    "suggest_phrase": _PHRASE_SUGGEST_ORACLE,
    "rank_eval_match": _rank_eval_oracle(),
    "suggest_term": _SUGGEST_ORACLE,
    "suggest_completion": _COMPLETION_ORACLE,
    "analyze_tokens": _ANALYZE_ORACLE,
    "analyze_synonym_porter": _ANALYZE_SYN_PORTER_ORACLE,
    "analyze_synonym_multiword": _ANALYZE_SYN_MULTIWORD_ORACLE,
    "doc_get": _get_oracle(_GET_IDS[:1]),
    "doc_multi_get": _get_oracle(_GET_IDS),
    "percolate_stored": _PERCOLATE_ORACLE,
    "percolate_keyword_negative": _PERCOLATE_SCAN_ORACLE,
    "search_template_match": _template_oracle(),
    "streaming_ingest_search": _stream_oracle(),
}
