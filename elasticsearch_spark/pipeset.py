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

# the engine's default df-cap (dedup.ngram_jaccard_pairs: tokens in more
# than max(5% of docs, 16 docs) are removed from the token universe) —
# mirrored independently here so the skew control itself is under the gate
_JACCARD_CAPPED_ORACLE = f"""
WITH raw AS (
  SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '{_RX}')) AS toks
  FROM documents
),
ex AS (SELECT doc_id, unnest(toks) AS tok FROM raw),
hot AS (
  SELECT tok FROM ex GROUP BY tok
  HAVING count(*) > greatest((SELECT count(*) FROM raw) * 0.05, 16)
),
t AS (
  SELECT doc_id, list(tok) AS toks FROM ex ANTI JOIN hot USING (tok)
  GROUP BY doc_id
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
    # radius 3: the 4x16-bit banding is pigeonhole-COMPLETE at <=3, so the
    # contract is exact ("all pairs with hamming <= 3") and the oracle can be
    # an independent all-pairs DuckDB reimplementation of simhash (md5-based
    # token hashes are engine-agnostic). Radius 8 best-effort recall is
    # property-tested in pytest instead.
    return dedup.simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


def fx_dedup_embedding(spark, sf_dir):
    return dedup.embedding_dup_pairs(_emb(spark, sf_dir), threshold=0.45)


def fx_ann_brute(spark, sf_dir):
    return similarity.brute_force_topk(_emb(spark, sf_dir), _queries_emb(spark, sf_dir), k=5)


def fx_ann_lsh(spark, sf_dir):
    return similarity.lsh_topk(
        _emb(spark, sf_dir), _queries_emb(spark, sf_dir), k=5, bits=6, n_tables=8
    )


def fx_ann_ivf(spark, sf_dir):
    # iters=0: centroids are the 8 lowest-id vectors, so the whole IVF layout
    # (assign -> partition by cluster -> probe n_probe centroids -> exact
    # rerank) is deterministic and SQL-expressible for the oracle; the Lloyd
    # refinement (iters>0) is property-tested in pytest (recall vs brute).
    clustered, cents = similarity.ivf_index(_emb(spark, sf_dir), n_centroids=8, iters=0)
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
    "dedup_simhash": fx_dedup_simhash,
    "dedup_embedding_cosine": fx_dedup_embedding,
    "ann_brute_topk": fx_ann_brute,
    "ann_lsh_topk": fx_ann_lsh,
    "ann_ivf_topk": fx_ann_ivf,
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
    "dedup_ngram_jaccard": _JACCARD_CAPPED_ORACLE,
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


def _simhash_oracle() -> str:
    """Independent DuckDB reimplementation of 64-bit SimHash + all-pairs
    hamming <= 3 (no banding knowledge: radius 3 makes banding complete, so
    the exact all-pairs answer IS the engine's contract). Token hash parity:
    DuckDB md5_number_upper(tok) == int.from_bytes(md5(tok)[:8], 'little'),
    the hash dedup.simhash uses."""
    return f"""
WITH t AS (
  SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '{_RX}')) AS toks
  FROM documents
),
hh AS (SELECT doc_id, md5_number_upper(unnest(toks)) AS h FROM t),
bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS votes
  FROM hh CROSS JOIN (SELECT unnest(range(64)) AS j) js
  GROUP BY doc_id, j
),
sh0 AS (
  SELECT doc_id,
         cast(sum(CASE WHEN votes > 0 THEN
               CASE WHEN j = 63 THEN -9223372036854775808
                    ELSE (1::BIGINT << j::INT) END
             ELSE 0 END) AS BIGINT) AS sim
  FROM bits GROUP BY doc_id
),
sh AS (  -- docs with zero tokens simhash to 0 (engine keeps them, sim=0)
  SELECT d.doc_id, coalesce(sh0.sim, 0) AS sim
  FROM documents d LEFT JOIN sh0 ON d.doc_id = sh0.doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       cast(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= 3"""


def _lsh_planes_sql(n_tables: int = 8, bits: int = 6, dim: int = 64, seed: int = 42) -> str:
    """The exact hyperplanes similarity.random_hyperplane_buckets(seed=42)
    uses, as a VALUES literal (t, b, plane). Deterministic constants of the
    fixture — embedding them keeps the oracle a pure-SQL twin."""
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal((n_tables, bits, dim))
    rows = []
    for t in range(n_tables):
        for b in range(bits):
            vec = ", ".join(repr(float(x)) for x in planes[t, b])
            rows.append(f"({t}, {b}, [{vec}])")
    return ",\n".join(rows)


def _ann_lsh_oracle() -> str:
    """SQL twin of similarity.lsh_topk(bits=6, n_tables=8, seed=42, k=5):
    sign-bucket every vector against the embedded hyperplanes, candidates
    share >= 1 (table, bucket) with the query, exact-cosine top-5 rerank."""
    planes = _lsh_planes_sql()
    bucket = (
        "sum(CASE WHEN list_dot_product(v, p) > 0 THEN (1::BIGINT << b::INT) "
        "ELSE 0 END)"
    )
    return f"""
WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v FROM embeddings),
planes(t, b, p) AS (VALUES
{planes}
),
eb AS (
  SELECT vec_id, t, {bucket} AS bucket
  FROM e CROSS JOIN planes GROUP BY vec_id, t
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
qb AS (
  SELECT query_id, t, {bucket.replace("(v, p)", "(qv, p)")} AS bucket
  FROM q CROSS JOIN planes GROUP BY query_id, t
),
cand AS (
  SELECT DISTINCT qb.query_id, eb.vec_id
  FROM eb JOIN qb ON eb.t = qb.t AND eb.bucket = qb.bucket
  WHERE eb.vec_id <> qb.query_id
),
scored AS (
  SELECT c.query_id, c.vec_id, list_cosine_similarity(e.v, q.qv) AS cs
  FROM cand c JOIN e ON e.vec_id = c.vec_id JOIN q ON q.query_id = c.query_id
)
SELECT query_id, vec_id, cosine FROM (
  SELECT query_id, vec_id, round(cs, 4) AS cosine,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(cs, 6) DESC, vec_id
         ) AS rn
  FROM scored
) WHERE rn <= 5"""


def _ann_ivf_oracle() -> str:
    """SQL twin of the iters=0 IVF fixture: centroids = 8 lowest-id vectors,
    assignment = argmax round(cosine,9) (ties -> lowest centroid id, mirroring
    similarity._assign), probe the 4 nearest centroids per query, exact
    top-5 rerank within the probed clusters."""
    return """
WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v FROM embeddings),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci, v AS cv
  FROM e ORDER BY vec_id LIMIT 8
),
assign AS (
  SELECT vec_id, ci AS cluster FROM (
    SELECT e.vec_id, c.ci,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.v, c.cv), 9) DESC, c.ci
           ) AS rn
    FROM e CROSS JOIN cents c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
probes AS (
  SELECT query_id, ci AS cluster FROM (
    SELECT q.query_id, c.ci,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.ci
           ) AS rn
    FROM q CROSS JOIN cents c
  ) WHERE rn <= 4
),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM probes p JOIN assign a ON a.cluster = p.cluster
  WHERE a.vec_id <> p.query_id
),
scored AS (
  SELECT c.query_id, c.vec_id, list_cosine_similarity(e.v, q.qv) AS cs
  FROM cand c JOIN e ON e.vec_id = c.vec_id JOIN q ON q.query_id = c.query_id
)
SELECT query_id, vec_id, cosine FROM (
  SELECT query_id, vec_id, round(cs, 4) AS cosine,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(cs, 6) DESC, vec_id
         ) AS rn
  FROM scored
) WHERE rn <= 5"""


def pipe_query_fns():
    return dict(PIPE_QUERY_FNS)


def pipe_oracle_sql():
    out = dict(PIPE_ORACLE_SQL)
    out["dedup_simhash"] = _simhash_oracle()
    out["ann_lsh_topk"] = _ann_lsh_oracle()
    out["ann_ivf_topk"] = _ann_ivf_oracle()
    return out
