"""Hand-written-oracle fixtures: DuckDB SQL derived INDEPENDENTLY from the
BM25/phrase specification (SURVEY.md §2.4 / reference
index/similarity/SimilarityProviders.java:272-282), sharing no snippet
generators with elasticsearch_spark.oracle.

Purpose (closes the oracle-independence caveat in oracle.py:1-13): the
generated oracle shares idf/norm SQL fragments with the engine, so a shared
formula bug would pass both sides. These fixtures re-derive every piece by
hand with different algebra and query structure:
  * length quantization via power-of-two division
    (floor(dl / 2^(floor(log2 dl)-3)) * 2^...) instead of shift expressions,
  * BM25 written as idf * 2.2 * tf / (tf + 1.2*(0.25 + 0.75*q/avgdl))
    with literal constants instead of parameterized k1/b snippets,
  * flat single-pass tf computation (list_filter counts) instead of the
    generator's unnest/join CTE chain,
  * phrase freq counted by adjacent-index list_filter instead of the
    generated position-join,
  * dis_max tie_breaker as greatest/least algebra over coalesced clause
    scores (DisMaxQueryBuilder: best + tb * sum(others)),
  * minimum_should_match as boolean-arithmetic clause counting,
  * span_near per-start stream freq derived per-END (each trailing-term
    occurrence q collects every lead strictly between q's closest preceding
    trailing-term occurrence and q — exactly the leads whose greedy
    successor is q) — the engine and the generated oracle both work
    per-START (one greedy chain per lead, NearSpansOrdered's emission); the
    two constructions provably enumerate the same span stream, so agreement
    pins the SpanScorer sloppyFreq summation. The freq then goes through
    the hand-written BM25 (SpanWeight feeds sloppyFreq to SimScorer.score;
    weight = sum of concrete-term idfs),
  * span_near UNORDERED per-start stream derived per-LABEL (each
    occurrence of either term windows to the other term's closest
    occurrence >= it, factor 1/(1 + start-to-start) — Lucene's
    NearSpansUnordered.width() asymmetry) vs the generated oracle's merged
    UNION-ALL stream with window functions,
  * intervals minimal-interval freq derived by BRUTE containment
    minimization over the full cross product of occurrence pairs (packed
    int windows, quadratic list filters) vs the generated oracle's
    last-seen-per-label window-function stream.
Only the data derivation (transcripts view) and the analyzer's token regex
are shared — they define the input contract, not the scoring semantics.
"""

from __future__ import annotations

from .oracle import TRANSCRIPTS_CTE
from .plans import query_dsl as Q
from .sources import transcripts as TR

_RX = r"[\pL\pN]+"
KEYS = ["conv_id", "turn_idx"]

# the effective (lossy) doc length BM25 sees, derived by hand: keep the top 4
# significant bits of dl by dividing/multiplying with 2^(bitlength-4)
_QDL = (
    "(CASE WHEN dl < 8 THEN cast(dl AS double) ELSE "
    "floor(dl / power(2, floor(log2(dl)) - 3)) * power(2, floor(log2(dl)) - 3) "
    "END)"
)


def _bm25(tf: str, idf: str) -> str:
    return f"(({idf}) * 2.2 * ({tf}) / (({tf}) + 1.2 * (0.25 + 0.75 * {_QDL} / avgdl)))"


def _idf(df: str) -> str:
    return f"ln(1.0 + (n - {df} + 0.5) / ({df} + 0.5))"


HAND_QUERIES: dict[str, dict] = {
    "hand_match_or": {"match": {"text": "spark fast"}},
    "hand_match_and": {"match": {"text": {"query": "join table", "operator": "and"}}},
    "hand_match_phrase": {"match_phrase": {"text": "table hash"}},
    "hand_dis_max": {
        "dis_max": {
            "queries": [{"match": {"text": "spark"}}, {"match": {"text": "fast"}}],
            "tie_breaker": 0.3,
        }
    },
    "hand_match_msm": {
        "match": {"text": {"query": "spark join fast", "minimum_should_match": 2}}
    },
    "hand_span_near": {
        "span_near": {
            "clauses": [
                {"span_term": {"text": "hash"}},
                {"span_term": {"text": "join"}},
            ],
            "slop": 3,
            "in_order": True,
        }
    },
    "hand_phrase_prefix": {
        "match_phrase_prefix": {
            "text": {"query": "the s", "max_expansions": 3}
        }
    },
    "hand_span_unordered": {
        "span_near": {
            "clauses": [
                {"span_term": {"text": "scan"}},
                {"span_term": {"text": "filter"}},
            ],
            "slop": 3,
            "in_order": False,
        }
    },
    "hand_intervals_unordered": {
        "intervals": {"text": {"match": {"query": "merge sort", "max_gaps": 4}}}
    },
}


def _match_or_sql(t1: str, t2: str, require_both: bool) -> str:
    where = "tf1 > 0 AND tf2 > 0" if require_both else "tf1 > 0 OR tf2 > 0"
    return f"""{TRANSCRIPTS_CTE},
tok AS (SELECT conv_id, turn_idx,
               regexp_extract_all(lower(text), '{_RX}') AS toks
        FROM transcripts),
tf AS (SELECT conv_id, turn_idx, len(toks) AS dl,
              len(list_filter(toks, x -> x = '{t1}')) AS tf1,
              len(list_filter(toks, x -> x = '{t2}')) AS tf2
       FROM tok),
g AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl,
             count(CASE WHEN tf1 > 0 THEN 1 END) AS df1,
             count(CASE WHEN tf2 > 0 THEN 1 END) AS df2
      FROM tf)
SELECT conv_id, turn_idx, round(score, 4) AS score FROM (
  SELECT conv_id, turn_idx,
         (CASE WHEN tf1 > 0 THEN {_bm25('tf1', _idf('df1'))} ELSE 0 END) +
         (CASE WHEN tf2 > 0 THEN {_bm25('tf2', _idf('df2'))} ELSE 0 END) AS score
  FROM tf, g WHERE {where})
ORDER BY round(score, 6) DESC, conv_id, turn_idx LIMIT 10"""


def _match_phrase_sql(t1: str, t2: str) -> str:
    # phrase freq: adjacent positions i (1-based) with toks[i]=t1, toks[i+1]=t2
    return f"""{TRANSCRIPTS_CTE},
tok AS (SELECT conv_id, turn_idx,
               regexp_extract_all(lower(text), '{_RX}') AS toks
        FROM transcripts),
pf AS (SELECT conv_id, turn_idx, len(toks) AS dl,
              len(list_filter(range(1, len(toks)),
                              i -> toks[i] = '{t1}' AND toks[i + 1] = '{t2}')) AS pfreq,
              len(list_filter(toks, x -> x = '{t1}')) > 0 AS has1,
              len(list_filter(toks, x -> x = '{t2}')) > 0 AS has2
       FROM tok),
g AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl,
             count(CASE WHEN has1 THEN 1 END) AS df1,
             count(CASE WHEN has2 THEN 1 END) AS df2
      FROM pf)
SELECT conv_id, turn_idx, round(score, 4) AS score FROM (
  SELECT conv_id, turn_idx,
         {_bm25('pfreq', _idf('df1') + ' + ' + _idf('df2'))} AS score
  FROM pf, g WHERE pfreq > 0)
ORDER BY round(score, 6) DESC, conv_id, turn_idx LIMIT 10"""


def _dis_max_sql(t1: str, t2: str, tb: float) -> str:
    # DisMaxQueryBuilder: score = best + tie_breaker * sum(others) —
    # written here as greatest/least algebra over two hand-derived BM25s
    s1 = f"(CASE WHEN tf1 > 0 THEN {_bm25('tf1', _idf('df1'))} ELSE NULL END)"
    s2 = f"(CASE WHEN tf2 > 0 THEN {_bm25('tf2', _idf('df2'))} ELSE NULL END)"
    return f"""{TRANSCRIPTS_CTE},
tok AS (SELECT conv_id, turn_idx,
               regexp_extract_all(lower(text), '{_RX}') AS toks
        FROM transcripts),
tf AS (SELECT conv_id, turn_idx, len(toks) AS dl,
              len(list_filter(toks, x -> x = '{t1}')) AS tf1,
              len(list_filter(toks, x -> x = '{t2}')) AS tf2
       FROM tok),
g AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl,
             count(CASE WHEN tf1 > 0 THEN 1 END) AS df1,
             count(CASE WHEN tf2 > 0 THEN 1 END) AS df2
      FROM tf)
SELECT conv_id, turn_idx, round(score, 4) AS score FROM (
  SELECT conv_id, turn_idx,
         greatest(coalesce({s1}, 0), coalesce({s2}, 0)) +
         {tb} * (coalesce({s1}, 0) + coalesce({s2}, 0)
                 - greatest(coalesce({s1}, 0), coalesce({s2}, 0))) AS score
  FROM tf, g WHERE tf1 > 0 OR tf2 > 0)
ORDER BY round(score, 6) DESC, conv_id, turn_idx LIMIT 10"""


def _match_msm_sql(t1: str, t2: str, t3: str, msm: int) -> str:
    # minimum_should_match: count matching clauses by boolean arithmetic,
    # keep docs with >= msm, score = sum of the matching clauses' BM25s
    parts = []
    for i in (1, 2, 3):
        parts.append(
            f"(CASE WHEN tf{i} > 0 THEN {_bm25(f'tf{i}', _idf(f'df{i}'))} ELSE 0 END)"
        )
    return f"""{TRANSCRIPTS_CTE},
tok AS (SELECT conv_id, turn_idx,
               regexp_extract_all(lower(text), '{_RX}') AS toks
        FROM transcripts),
tf AS (SELECT conv_id, turn_idx, len(toks) AS dl,
              len(list_filter(toks, x -> x = '{t1}')) AS tf1,
              len(list_filter(toks, x -> x = '{t2}')) AS tf2,
              len(list_filter(toks, x -> x = '{t3}')) AS tf3
       FROM tok),
g AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl,
             count(CASE WHEN tf1 > 0 THEN 1 END) AS df1,
             count(CASE WHEN tf2 > 0 THEN 1 END) AS df2,
             count(CASE WHEN tf3 > 0 THEN 1 END) AS df3
      FROM tf)
SELECT conv_id, turn_idx, round(score, 4) AS score FROM (
  SELECT conv_id, turn_idx, {' + '.join(parts)} AS score
  FROM tf, g
  WHERE (CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) +
        (CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) +
        (CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) >= {msm})
ORDER BY round(score, 6) DESC, conv_id, turn_idx LIMIT 10"""


def _span_near_pair_sql(t1: str, t2: str, slop: int) -> str:
    # SpanScorer per-start stream freq for an ordered pair, derived per-END
    # (the engine and the generated oracle both work per-START: one greedy
    # chain per lead, no containment minimization): NearSpansOrdered emits
    # (p, q) exactly when q is p's greedy successor, i.e. p lies strictly
    # between q's closest preceding t2 occurrence and q — so each t2
    # occurrence q collects EVERY t1 occurrence in that open window, keeps
    # those within slop, and contributes 1/(1 + (q - p - 1)) = 1/(q-p)
    # apiece. The freq then goes through the hand-derived BM25 like
    # SpanWeight feeds its sloppyFreq through SimScorer.score(freq, norm),
    # with the span weight being the sum of the two concrete terms' idfs.
    leads = (
        f"list_filter(p1, p -> p < q AND p > "
        f"coalesce(list_max(list_filter(p2, r -> r < q)), -1) "
        f"AND q - p - 1 <= {slop})"
    )
    return f"""{TRANSCRIPTS_CTE},
tok AS (SELECT conv_id, turn_idx,
               regexp_extract_all(lower(text), '{_RX}') AS toks
        FROM transcripts),
ps AS (SELECT conv_id, turn_idx, len(toks) AS dl,
              list_transform(list_filter(range(1, len(toks) + 1),
                             i -> toks[i] = '{t1}'), i -> i - 1) AS p1,
              list_transform(list_filter(range(1, len(toks) + 1),
                             i -> toks[i] = '{t2}'), i -> i - 1) AS p2
       FROM tok),
g AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl,
             count(CASE WHEN len(p1) > 0 THEN 1 END) AS df1,
             count(CASE WHEN len(p2) > 0 THEN 1 END) AS df2
      FROM ps),
fr AS (SELECT conv_id, turn_idx, dl,
              list_sum(list_transform(p2, q ->
                coalesce(list_sum(list_transform({leads},
                  p -> 1.0 / (q - p))), 0.0))) AS freq
       FROM ps WHERE len(p1) > 0 AND len(p2) > 0)
SELECT conv_id, turn_idx, round(score, 4) AS score FROM (
  SELECT conv_id, turn_idx,
         {_bm25('freq', _idf('df1') + ' + ' + _idf('df2'))} AS score
  FROM fr, g WHERE freq > 0)
ORDER BY round(score, 6) DESC, conv_id, turn_idx LIMIT 10"""


def _span_unordered_pair_sql(t1: str, t2: str, slop: int) -> str:
    # NearSpansUnordered per-start stream for a distinct pair, derived by
    # hand PER LABEL (the generated oracle builds one merged UNION-ALL
    # stream with window functions): every occurrence s of EITHER term is
    # the min-start of exactly one visited walk configuration, whose end is
    # the other term's closest occurrence >= s. Emitted iff
    # end - s - 1 <= slop; the sloppy factor uses Lucene's
    # NearSpansUnordered.width() = START-TO-START distance, 1/(1 + end - s)
    # (NOT the gap-based 1/(1+slop) ordered factor — the asymmetry this
    # fixture pins). freq = the two per-label sums; BM25 wrap as in
    # hand_span_near.
    def leg(own: str, other: str) -> str:
        return (
            f"list_sum(list_transform({own}, s -> CASE WHEN "
            f"list_min(list_filter({other}, q -> q >= s)) - s - 1 <= {slop} "
            f"THEN 1.0 / (1 + list_min(list_filter({other}, q -> q >= s)) - s) "
            f"ELSE 0.0 END))"
        )

    return f"""{TRANSCRIPTS_CTE},
tok AS (SELECT conv_id, turn_idx,
               regexp_extract_all(lower(text), '{_RX}') AS toks
        FROM transcripts),
ps AS (SELECT conv_id, turn_idx, len(toks) AS dl,
              list_transform(list_filter(range(1, len(toks) + 1),
                             i -> toks[i] = '{t1}'), i -> i - 1) AS p1,
              list_transform(list_filter(range(1, len(toks) + 1),
                             i -> toks[i] = '{t2}'), i -> i - 1) AS p2
       FROM tok),
g AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl,
             count(CASE WHEN len(p1) > 0 THEN 1 END) AS df1,
             count(CASE WHEN len(p2) > 0 THEN 1 END) AS df2
      FROM ps),
fr AS (SELECT conv_id, turn_idx, dl,
              coalesce({leg('p1', 'p2')}, 0.0) +
              coalesce({leg('p2', 'p1')}, 0.0) AS freq
       FROM ps WHERE len(p1) > 0 AND len(p2) > 0)
SELECT conv_id, turn_idx, round(score, 4) AS score FROM (
  SELECT conv_id, turn_idx,
         {_bm25('freq', _idf('df1') + ' + ' + _idf('df2'))} AS score
  FROM fr, g WHERE freq > 0)
ORDER BY round(score, 6) DESC, conv_id, turn_idx LIMIT 10"""


def _intervals_unordered_pair_sql(t1: str, t2: str, mg: int) -> str:
    # IntervalQuery minimal-interval freq for an unordered pair, derived by
    # BRUTE containment minimization (the generated oracle walks a merged
    # occurrence stream with window functions; the engine twins use
    # last-seen-per-label scans): enumerate EVERY covering window from the
    # p1 x p2 cross product, drop any window that strictly contains another,
    # apply max_gaps AFTER minimization, freq = sum of 1/(1 + slop)
    # = 1/(e - s) over the kept windows, then the hand BM25 with
    # w = idf(t1) + idf(t2) (concrete interval terms carry idf).
    # windows packed as s * 2^20 + e (positions are far below 2^20), so the
    # brute cross product dedups with plain int list_distinct
    wins = (
        "list_distinct(flatten(list_transform(p1, p -> list_transform(p2, "
        "q -> least(p, q) * 1048576 + greatest(p, q)))))"
    )
    minimal = (
        "list_filter(wins, w -> len(list_filter(wins, w2 -> "
        "w2 // 1048576 >= w // 1048576 AND w2 % 1048576 <= w % 1048576 AND "
        "w2 != w)) = 0)"
    )
    return f"""{TRANSCRIPTS_CTE},
tok AS (SELECT conv_id, turn_idx,
               regexp_extract_all(lower(text), '{_RX}') AS toks
        FROM transcripts),
ps AS (SELECT conv_id, turn_idx, len(toks) AS dl,
              list_transform(list_filter(range(1, len(toks) + 1),
                             i -> toks[i] = '{t1}'), i -> i - 1) AS p1,
              list_transform(list_filter(range(1, len(toks) + 1),
                             i -> toks[i] = '{t2}'), i -> i - 1) AS p2
       FROM tok),
g AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl,
             count(CASE WHEN len(p1) > 0 THEN 1 END) AS df1,
             count(CASE WHEN len(p2) > 0 THEN 1 END) AS df2
      FROM ps),
wv AS (SELECT conv_id, turn_idx, dl, {wins} AS wins
       FROM ps WHERE len(p1) > 0 AND len(p2) > 0),
fr AS (SELECT conv_id, turn_idx, dl,
              list_sum(list_transform(
                list_filter({minimal},
                  w -> (w % 1048576) - (w // 1048576) - 1 <= {mg}),
                w -> 1.0 / ((w % 1048576) - (w // 1048576))
              )) AS freq
       FROM wv)
SELECT conv_id, turn_idx, round(score, 4) AS score FROM (
  SELECT conv_id, turn_idx,
         {_bm25('freq', _idf('df1') + ' + ' + _idf('df2'))} AS score
  FROM fr, g WHERE freq > 0)
ORDER BY round(score, 6) DESC, conv_id, turn_idx LIMIT 10"""


def _phrase_prefix_sql(lead: str, pref: str, max_exp: int) -> str:
    # match_phrase_prefix with a BINDING expansion cap, derived by hand with
    # different algebra than the generated oracle: the expansion set is the
    # first max_exp elements of the SORTED distinct-token list (list_sort +
    # array slice, vs the generator's ORDER BY term LIMIT), pf counts
    # lead-then-expansion adjacencies by flat list_filter over 1-based
    # indices, and the blended weight sums hand idfs over {lead} UNION exps
    # via a list_aggregate over per-term dfs.
    return f"""{TRANSCRIPTS_CTE},
tok AS (SELECT conv_id, turn_idx,
               regexp_extract_all(lower(text), '{_RX}') AS toks
        FROM transcripts),
voc AS (SELECT list_sort(list(DISTINCT term)) AS vocab FROM (
          SELECT unnest(toks) AS term FROM tok)
        WHERE starts_with(term, '{pref}')),
exp AS (SELECT vocab[1:{max_exp}] AS exps FROM voc),
pf AS (SELECT conv_id, turn_idx, len(toks) AS dl,
              len(list_filter(range(1, len(toks)),
                  i -> toks[i] = '{lead}'
                       AND list_contains(exps, toks[i + 1]))) AS pfreq
       FROM tok CROSS JOIN exp),
wt AS (SELECT list_distinct(list_append(exps, '{lead}')) AS wterms FROM exp),
g AS (SELECT count(*) AS n, sum(len(toks)) * 1.0 / count(*) AS avgdl FROM tok),
idf AS (SELECT sum(ln(1.0 + (n - df + 0.5) / (df + 0.5))) AS w FROM (
          SELECT unnest(wterms) AS term FROM wt) wts, g,
        LATERAL (SELECT count(*) AS df FROM tok
                 WHERE list_contains(toks, wts.term)) d
        WHERE df > 0)
SELECT conv_id, turn_idx, round(score, 4) AS score FROM (
  SELECT conv_id, turn_idx, {_bm25('pfreq', 'w')} AS score
  FROM pf, g, idf WHERE pfreq > 0)
ORDER BY round(score, 6) DESC, conv_id, turn_idx LIMIT 10"""


HAND_ORACLE_SQL = {
    "hand_match_or": _match_or_sql("spark", "fast", require_both=False),
    "hand_match_and": _match_or_sql("join", "table", require_both=True),
    "hand_match_phrase": _match_phrase_sql("table", "hash"),
    "hand_dis_max": _dis_max_sql("spark", "fast", 0.3),
    "hand_match_msm": _match_msm_sql("spark", "join", "fast", 2),
    "hand_span_near": _span_near_pair_sql("hash", "join", 3),
    "hand_phrase_prefix": _phrase_prefix_sql("the", "s", 3),
    "hand_span_unordered": _span_unordered_pair_sql("scan", "filter", 3),
    "hand_intervals_unordered": _intervals_unordered_pair_sql("merge", "sort", 4),
}


def _fn(qd: dict):
    def run(spark, sf_dir):
        return Q.search(TR.transcripts_view(spark, sf_dir), qd, KEYS, k=10)

    return run


HAND_QUERY_FNS = {name: _fn(qd) for name, qd in HAND_QUERIES.items()}
