"""Training-data pipeline fixtures + DuckDB oracle SQL.

Over the driver's `documents` (doc_id, text, lang, source, n_chars) and
`embeddings` (vec_id, embedding float[], label) tables. Oracle SQL is written
independently in DuckDB's dialect; probabilistic operators (LSH paths,
SimHash) are registered rows-only and property-tested in pytest instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import textstats
from .pipeline import dedup, similarity

_RX = r"[\pL\pN]+"  # DuckDB (RE2) token class — twin of analysis.TOKEN_REGEX_JAVA

_JACCARD_ORACLE = f"""
WITH t AS (
  SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '{_RX}')) AS toks
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.toks, b.toks)) * 1.0 /
             (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 4) AS jaccard
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.toks, b.toks)) * 1.0 /
      (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.7"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _queries_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _emb(spark, sf_dir)
        .where("vec_id < 3")
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )


# ------------------------------------------------------------------ fixtures
def fx_dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(_docs(spark, sf_dir)).select("doc_id")


def fx_dedup_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.7)


def fx_dedup_minhash_lsh(spark, sf_dir):
    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.7)


def fx_dedup_simhash(spark, sf_dir):
    return dedup.simhash_pairs(_docs(spark, sf_dir), max_hamming=8)


def fx_dedup_embedding(spark, sf_dir):
    return dedup.embedding_dup_pairs(_emb(spark, sf_dir), threshold=0.45)


def fx_ann_brute(spark, sf_dir):
    return similarity.brute_force_topk(_emb(spark, sf_dir), _queries_emb(spark, sf_dir), k=5)


def fx_ann_lsh(spark, sf_dir):
    return similarity.lsh_topk(
        _emb(spark, sf_dir), _queries_emb(spark, sf_dir), k=5, bits=6, n_tables=8
    )


def fx_ann_ivf(spark, sf_dir):
    clustered, cents = similarity.ivf_index(_emb(spark, sf_dir), n_centroids=8, iters=2)
    return similarity.ivf_topk(clustered, cents, _queries_emb(spark, sf_dir), k=5, n_probe=4)


def fx_text_lang_id(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", textstats.lang_id("text").alias("lang_pred"))


def fx_text_quality(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        textstats.whitespace_token_count("text").alias("ws_tokens"),
        textstats.bpe_ish_token_count("text").alias("bpe_tokens"),
        F.round(textstats.punct_ratio("text"), 4).alias("punct_ratio"),
        F.round(textstats.stopword_ratio("text"), 4).alias("stop_ratio"),
        F.round(textstats.quality_score("text"), 4).alias("quality"),
    )


def fx_text_fingerprint(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", textstats.fingerprint("text").alias("fp"))


PIPE_QUERY_FNS = {
    "dedup_exact": fx_dedup_exact,
    "dedup_ngram_jaccard": fx_dedup_ngram_jaccard,
    "dedup_minhash_lsh": fx_dedup_minhash_lsh,
    "dedup_simhash": fx_dedup_simhash,  # rows-only: probabilistic fingerprint
    "dedup_embedding_cosine": fx_dedup_embedding,
    "ann_brute_topk": fx_ann_brute,
    "ann_lsh_topk": fx_ann_lsh,  # rows-only: recall property-tested
    "ann_ivf_topk": fx_ann_ivf,  # rows-only: recall property-tested
    "text_lang_id": fx_text_lang_id,
    "text_quality": fx_text_quality,
    "text_fingerprint": fx_text_fingerprint,
}

_STOP_SQL = {
    lang: ", ".join(f"'{w}'" for w in ws) for lang, ws in textstats.LANG_STOPWORDS.items()
}
_HITS = {
    lang: (
        "len(list_filter(string_split_regex(lower(text), '\\s+'), "
        f"x -> x IN ({_STOP_SQL[lang]})))"
    )
    for lang in textstats.LANG_STOPWORDS
}
_BEST = "greatest(" + ", ".join(f"h_{lang}" for lang in textstats.LANG_STOPWORDS) + ")"

PIPE_ORACLE_SQL = {
    "dedup_exact": f"""
WITH fp AS (
  SELECT doc_id,
         md5(array_to_string(regexp_extract_all(lower(text), '{_RX}'), ' ')) AS f
  FROM documents
)
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn FROM fp
) WHERE rn = 1""",
    "dedup_ngram_jaccard": _JACCARD_ORACLE,
    "dedup_minhash_lsh": _JACCARD_ORACLE,
    "dedup_embedding_cosine": """
WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 4) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.45""",
    "ann_brute_topk": """
WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3)
SELECT query_id, vec_id, cosine FROM (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(e.v, q.qv), 4) AS cosine,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY round(list_cosine_similarity(e.v, q.qv), 6) DESC, e.vec_id
         ) AS rn
  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
) WHERE rn <= 5""",
    "text_lang_id": (
        "SELECT doc_id, CASE WHEN best = 0 THEN 'und' "
        + " ".join(
            f"WHEN h_{lang} = best THEN '{lang}'" for lang in textstats.LANG_STOPWORDS
        )
        + " ELSE 'und' END AS lang_pred FROM (SELECT doc_id, "
        + ", ".join(f"{_HITS[lang]} AS h_{lang}" for lang in textstats.LANG_STOPWORDS)
        + f", {_BEST} AS best FROM documents)"
    ),
    "text_quality": f"""
WITH base AS (
  SELECT doc_id, text,
    len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS ws_tokens,
    len(regexp_extract_all(text, '[\\pL]+|[\\pN]+|[^\\s\\pL\\pN]+')) AS bpe_tokens,
    (length(text) - length(regexp_replace(text, '[^\\pL\\pN\\s]', '', 'g'))) * 1.0
      / greatest(length(text), 1) AS praw,
    {_HITS['en']} * 1.0 /
      greatest(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')), 1) AS sraw
  FROM documents
)
SELECT doc_id, ws_tokens, bpe_tokens, round(praw, 4) AS punct_ratio,
       round(sraw, 4) AS stop_ratio,
       round(((CASE WHEN ws_tokens BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.3 END)
            + (CASE WHEN praw < 0.2 THEN 1.0 ELSE 0.5 END)
            + (CASE WHEN sraw > 0.05 THEN 1.0 ELSE 0.6 END)) / 3.0, 4) AS quality
FROM base""",
    "text_fingerprint": f"""
SELECT doc_id,
       md5(array_to_string(regexp_extract_all(lower(text), '{_RX}'), ' ')) AS fp
FROM documents""",
}


def pipe_query_fns():
    return dict(PIPE_QUERY_FNS)


def pipe_oracle_sql():
    return dict(PIPE_ORACLE_SQL)
