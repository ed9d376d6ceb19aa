"""Aggregation fixture queries + independent DuckDB oracle SQL.

Each entry runs through operators/aggs.py (the real compiler) on the Spark
side; the oracle SQL is written BY HAND against the same transcripts view, so
the two paths share nothing but the data — exactly what the driver's
correctness gate wants. Double columns are rounded to 4dp on both sides
(driver hash convention); pipeline nulls (first-bucket derivative etc.) are
coalesced to 0 on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions import analysis
from .operators import aggs
from .oracle import TRANSCRIPTS_CTE
from .sources import transcripts as TR

_TOKS = analysis.tokens_sql("text", "duckdb")


def _round_doubles(df: DataFrame) -> DataFrame:
    cols = [
        F.round(F.col(f.name), 4).alias(f.name)
        if isinstance(f.dataType, T.DoubleType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def _fix(body: dict, fill: dict | None = None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = TR.transcripts_view(spark, sf_dir)
        out = aggs.aggregate(docs, body)
        if fill:
            out = out.na.fill(fill)
        return _round_doubles(out)

    return run


AGG_QUERIES: dict[str, dict] = {
    # --- bucket: terms + metrics (terms/TermsAggregationBuilder; Avg/Max agg)
    "agg_terms_role": {
        "body": {
            "aggs": {
                "role": {
                    "terms": {"field": "role", "size": 10},
                    "aggs": {
                        "avg_turn": {"avg": {"field": "turn_idx"}},
                        "max_turn": {"max": {"field": "turn_idx"}},
                    },
                }
            }
        },
        "oracle": f"""{TRANSCRIPTS_CTE}
SELECT role, count(*) AS doc_count, round(avg(turn_idx), 4) AS avg_turn,
       max(turn_idx) AS max_turn
FROM transcripts GROUP BY role ORDER BY doc_count DESC, role LIMIT 10""",
    },
    # --- query-scoped agg (match filter feeding the agg, §3.1 post_filter-ish)
    "agg_terms_tool_match": {
        "body": {
            "query": {"match": {"text": "spark"}},
            "aggs": {"tool": {"terms": {"field": "tool", "size": 10}}},
        },
        "oracle": f"""{TRANSCRIPTS_CTE}
SELECT tool, count(*) AS doc_count FROM transcripts
WHERE list_contains({_TOKS}, 'spark')
GROUP BY tool ORDER BY doc_count DESC, tool LIMIT 10""",
    },
    # --- histogram (HistogramAggregationBuilder)
    "agg_histogram_turns": {
        "body": {
            "aggs": {
                "bucket": {
                    "histogram": {"field": "turn_idx", "interval": 5},
                    "aggs": {"avg_turn": {"avg": {"field": "turn_idx"}}},
                }
            }
        },
        "oracle": f"""{TRANSCRIPTS_CTE}
SELECT floor(turn_idx / 5.0) * 5.0 AS bucket, count(*) AS doc_count,
       round(avg(turn_idx), 4) AS avg_turn
FROM transcripts GROUP BY 1 ORDER BY 1""",
    },
    # --- histogram with empty-bucket fill (min_doc_count=0 ES default)
    "agg_histogram_empty_buckets": {
        "body": {
            "query": {"term": {"tool": "search"}},
            "aggs": {
                "bucket": {
                    "histogram": {"field": "turn_idx", "interval": 2, "min_doc_count": 0},
                }
            }
        },
        "oracle": f"""{TRANSCRIPTS_CTE},
hits AS (SELECT floor(turn_idx / 2.0) * 2.0 AS bucket, count(*) AS doc_count
         FROM transcripts WHERE tool = 'search' GROUP BY 1),
grid AS (SELECT unnest(generate_series(cast((SELECT min(bucket) / 2 FROM hits) as bigint),
                                       cast((SELECT max(bucket) / 2 FROM hits) as bigint))) * 2.0 AS bucket)
SELECT grid.bucket, coalesce(hits.doc_count, 0) AS doc_count
FROM grid LEFT JOIN hits USING (bucket) ORDER BY bucket""",
    },
    # --- date_histogram + cumulative_sum pipeline
    "agg_date_histogram_cumsum": {
        "body": {
            "aggs": {
                "hour": {
                    "date_histogram": {"field": "ts", "calendar_interval": "hour"},
                    "aggs": {"cum_docs": {"cumulative_sum": {"buckets_path": "_count"}}},
                }
            }
        },
        "oracle": f"""{TRANSCRIPTS_CTE}
SELECT hour, doc_count,
       cast(sum(doc_count) OVER (ORDER BY hour) as bigint) AS cum_docs
FROM (SELECT date_trunc('hour', ts) AS hour, count(*) AS doc_count
      FROM transcripts GROUP BY 1) ORDER BY hour""",
    },
    # --- range agg (RangeAggregationBuilder)
    "agg_range_turns": {
        "body": {
            "aggs": {
                "rng": {
                    "range": {
                        "field": "turn_idx",
                        "ranges": [{"to": 5}, {"from": 5, "to": 10}, {"from": 10}],
                    },
                    "aggs": {"avg_turn": {"avg": {"field": "turn_idx"}}},
                }
            }
        },
        "oracle": f"""{TRANSCRIPTS_CTE}
SELECT rng, count(*) AS doc_count, round(avg(turn_idx), 4) AS avg_turn FROM (
  SELECT case when turn_idx < 5 then '-5'
              when turn_idx < 10 then '5-10' else '10-' end AS rng, turn_idx
  FROM transcripts) GROUP BY rng""",
    },
    # --- auto_date_histogram (AutoDateHistogramAggregationBuilder): interval
    # picked from the hybrid ladder (fixed sub-week rungs, calendar
    # week/month/quarter/year rungs) to fit <= `buckets` buckets; oracle
    # reproduces selection, per-rung rounding, and grid in SQL.
    "agg_auto_date_histogram": {
        "body": {"aggs": {"bkt": {"auto_date_histogram": {"field": "ts", "buckets": 10}}}},
        "oracle": None,  # generated below (ladder CASE)
    },
    # --- date_range agg (DateRangeAggregationBuilder): keyed ranges on ts
    "agg_date_range": {
        "body": {
            "aggs": {
                "ts_window": {
                    "date_range": {
                        "field": "ts",
                        "ranges": [
                            {"key": "early", "to": "2024-01-01T02:00:00"},
                            {
                                "key": "mid",
                                "from": "2024-01-01T02:00:00",
                                "to": "2024-01-01T04:00:00",
                            },
                            {"key": "late", "from": "2024-01-01T04:00:00"},
                        ],
                    },
                    "aggs": {"n_convs": {"cardinality": {"field": "conv_id"}}},
                }
            }
        },
        "oracle": f"""{TRANSCRIPTS_CTE}
SELECT ts_window, count(*) AS doc_count,
       cast(count(DISTINCT conv_id) as bigint) AS n_convs FROM (
  SELECT CASE WHEN ts < TIMESTAMP '2024-01-01 02:00:00' THEN 'early'
              WHEN ts < TIMESTAMP '2024-01-01 04:00:00' THEN 'mid'
              ELSE 'late' END AS ts_window, conv_id
  FROM transcripts) GROUP BY ts_window""",
    },
    # --- ip_range agg (IpRangeAggregationBuilder): from/to + CIDR mask over a
    # derived dotted-quad column; overlapping ranges multi-tag (ES semantics).
    # The oracle computes the uint32 numerically — independent of the engine's
    # string-split parsing.
    "agg_ip_range": {
        "body": {
            "aggs": {
                "ips": {
                    "ip_range": {
                        "field": (
                            "concat('10.', cast(turn_idx % 4 as string), '.', "
                            "cast(length(text) % 256 as string), '.', "
                            "cast(turn_idx % 250 as string))"
                        ),
                        "ranges": [
                            {"key": "low", "to": "10.1.0.0"},
                            {"key": "mid", "from": "10.1.0.0", "to": "10.3.0.0"},
                            {"key": "cidr_15", "mask": "10.2.0.0/15"},
                        ],
                    }
                }
            }
        },
        "oracle": f"""{TRANSCRIPTS_CTE},
nums AS (
  SELECT 10 * 16777216 + (turn_idx % 4) * 65536 +
         (length(text) % 256) * 256 + (turn_idx % 250) AS ipn
  FROM transcripts
),
tagged AS (
  SELECT 'low' AS ips FROM nums WHERE ipn < 10 * 16777216 + 65536
  UNION ALL
  SELECT 'mid' FROM nums
  WHERE ipn >= 10 * 16777216 + 65536 AND ipn < 10 * 16777216 + 3 * 65536
  UNION ALL
  SELECT 'cidr_15' FROM nums
  WHERE ipn >= 10 * 16777216 + 2 * 65536 AND ipn < 10 * 16777216 + 4 * 65536
)
SELECT ips, count(*) AS doc_count FROM tagged GROUP BY ips""",
    },
    # --- global stats / extended_stats (single row)
    "agg_extended_stats": {
        "body": {
            "aggs": {"t": {"extended_stats": {"field": "turn_idx"}}}
        },
        "oracle": f"""{TRANSCRIPTS_CTE}
SELECT count(turn_idx) AS t_count, cast(min(turn_idx) as double) AS t_min,
       cast(max(turn_idx) as double) AS t_max, round(avg(turn_idx), 4) AS t_avg,
       cast(sum(turn_idx) as double) AS t_sum,
       round(var_pop(turn_idx), 4) AS t_variance,
       round(stddev_pop(turn_idx), 4) AS t_std_deviation,
       cast(sum(turn_idx * turn_idx) as double) AS t_sum_of_squares
FROM transcripts""",
    },
    # --- exact percentiles (TDigest analog, DFS-exact contract)
    "agg_percentiles": {
        "body": {
            "aggs": {
                "pct": {"percentiles": {"field": "turn_idx", "percents": [25, 50, 75]}}
            }
        },
        "oracle": f"""{TRANSCRIPTS_CTE}
SELECT round(quantile_cont(turn_idx, 0.25), 4) AS pct_p25,
       round(quantile_cont(turn_idx, 0.50), 4) AS pct_p50,
       round(quantile_cont(turn_idx, 0.75), 4) AS pct_p75
FROM transcripts""",
    },
    # --- cardinality + value_count + weighted_avg in one pass
    "agg_cardinality_weighted": {
        "body": {
            "aggs": {
                "n_convs": {"cardinality": {"field": "conv_id"}},
                "n_texts": {"value_count": {"field": "text"}},
                "w_turn": {
                    "weighted_avg": {
                        "value": {"field": "turn_idx"},
                        "weight": {"field": "length(text)"},
                    }
                },
            }
        },
        "oracle": f"""{TRANSCRIPTS_CTE}
SELECT count(DISTINCT conv_id) AS n_convs, count(text) AS n_texts,
       round(sum(turn_idx * length(text)) * 1.0 / sum(length(text)), 4) AS w_turn
FROM transcripts""",
    },
    # --- filters agg (named conditional buckets)
    "agg_filters": {
        "body": {
            "aggs": {
                "grp": {
                    "filters": {
                        "filters": {
                            "users": "role = 'user'",
                            "coders": "tool = 'code'",
                        }
                    },
                    "aggs": {"avg_turn": {"avg": {"field": "turn_idx"}}},
                }
            }
        },
        "oracle": f"""{TRANSCRIPTS_CTE}
SELECT 'users' AS grp, count(*) AS doc_count, round(avg(turn_idx), 4) AS avg_turn
FROM transcripts WHERE role = 'user'
UNION ALL
SELECT 'coders', count(*), round(avg(turn_idx), 4) FROM transcripts WHERE tool = 'code'
ORDER BY grp""",
    },
    # --- composite with after-key pagination
    "agg_composite_role_tool": {
        "body": {
            "aggs": {
                "comp": {
                    "composite": {
                        "size": 5,
                        "sources": [
                            {"role": {"terms": {"field": "role"}}},
                            {"tool": {"terms": {"field": "tool"}}},
                        ],
                        "after": {"role": "assistant", "tool": "code"},
                    }
                }
            }
        },
        "oracle": f"""{TRANSCRIPTS_CTE}
SELECT role, tool, count(*) AS doc_count FROM transcripts
GROUP BY role, tool HAVING (role, tool) > ('assistant', 'code')
ORDER BY role, tool LIMIT 5""",
    },
    # --- top_hits per bucket (InternalTopHits)
    "agg_top_hits_role": {
        "body": {
            "aggs": {
                "role": {
                    "terms": {"field": "role"},
                    "aggs": {
                        "latest": {
                            "top_hits": {
                                "size": 2,
                                "sort": [{"ts": "desc"}],
                                "_source": ["conv_id", "turn_idx"],
                            }
                        }
                    },
                }
            }
        },
        "oracle": f"""{TRANSCRIPTS_CTE}
SELECT role, conv_id, turn_idx FROM (
  SELECT role, conv_id, turn_idx,
         row_number() OVER (PARTITION BY role ORDER BY ts DESC) AS rn
  FROM transcripts) WHERE rn <= 2""",
    },
    # --- derivative pipeline over hourly buckets
    "agg_derivative": {
        "body": {
            "aggs": {
                "hour": {
                    "date_histogram": {"field": "ts", "calendar_interval": "hour"},
                    "aggs": {"delta": {"derivative": {"buckets_path": "_count"}}},
                }
            }
        },
        "fill": {"delta": 0},
        "oracle": f"""{TRANSCRIPTS_CTE}
SELECT hour, doc_count,
       coalesce(doc_count - lag(doc_count) OVER (ORDER BY hour), 0) AS delta
FROM (SELECT date_trunc('hour', ts) AS hour, count(*) AS doc_count
      FROM transcripts GROUP BY 1) ORDER BY hour""",
    },
    # --- moving_fn (trailing window avg, ES MovingFunctions.unweightedAvg)
    "agg_moving_avg": {
        "body": {
            "aggs": {
                "hour": {
                    "date_histogram": {"field": "ts", "calendar_interval": "hour"},
                    "aggs": {
                        "mov": {
                            "moving_fn": {
                                "buckets_path": "_count",
                                "window": 3,
                                "script": "MovingFunctions.unweightedAvg(values)",
                            }
                        }
                    },
                }
            }
        },
        "fill": {"mov": 0.0},
        "oracle": f"""{TRANSCRIPTS_CTE}
SELECT hour, doc_count,
       round(coalesce(avg(doc_count) OVER (ORDER BY hour ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 0), 4) AS mov
FROM (SELECT date_trunc('hour', ts) AS hour, count(*) AS doc_count
      FROM transcripts GROUP BY 1) ORDER BY hour""",
    },
    # --- bucket_script + bucket_selector (HAVING analog)
    "agg_bucket_script_selector": {
        "body": {
            "aggs": {
                "role": {
                    "terms": {"field": "role", "size": 10},
                    "aggs": {
                        "sum_turn": {"sum": {"field": "turn_idx"}},
                        "per_doc": {
                            "bucket_script": {
                                "buckets_path": {"s": "sum_turn", "c": "_count"},
                                "script": "params.s / params.c",
                            }
                        },
                        "keep": {
                            "bucket_selector": {
                                "buckets_path": {"c": "_count"},
                                "script": "params.c >= 50",
                            }
                        },
                    },
                }
            }
        },
        "oracle": f"""{TRANSCRIPTS_CTE}
SELECT role, count(*) AS doc_count, cast(sum(turn_idx) as bigint) AS sum_turn,
       round(sum(turn_idx) * 1.0 / count(*), 4) AS per_doc
FROM transcripts GROUP BY role HAVING count(*) >= 50
ORDER BY doc_count DESC, role LIMIT 10""",
    },
    # --- significant_terms (JLH, SignificantTermsAggregationBuilder)
    "agg_significant_terms": {
        "oracle": f"""{TRANSCRIPTS_CTE},
fg AS (SELECT tool, count(*) AS fg FROM transcripts WHERE list_contains(regexp_extract_all(lower(text), '[\\pL\\pN]+'), 'spark') GROUP BY tool),
bg AS (SELECT tool, count(*) AS bg FROM transcripts GROUP BY tool),
nfg AS (SELECT count(*) AS n FROM transcripts WHERE list_contains(regexp_extract_all(lower(text), '[\\pL\\pN]+'), 'spark')),
nbg AS (SELECT count(*) AS n FROM transcripts)
SELECT fg.tool AS tool, fg.fg AS doc_count, bg.bg AS bg_count,
  round((fg.fg * 1.0 / nfg.n - bg.bg * 1.0 / nbg.n) * ((fg.fg * 1.0 / nfg.n) / (bg.bg * 1.0 / nbg.n)), 4) AS score
FROM fg JOIN bg USING (tool) CROSS JOIN nfg CROSS JOIN nbg
WHERE fg.fg * 1.0 / nfg.n > bg.bg * 1.0 / nbg.n
ORDER BY score DESC, tool LIMIT 10""",
    },
    # --- median_absolute_deviation per role (reg SearchModule.java:388)
    "agg_mad_role": {
        "oracle": f"""{TRANSCRIPTS_CTE},
med AS (SELECT role, quantile_cont(turn_idx, 0.5) AS m FROM transcripts GROUP BY role)
SELECT t.role AS role, round(quantile_cont(abs(t.turn_idx - med.m), 0.5), 4) AS mad
FROM transcripts t JOIN med USING (role) GROUP BY t.role""",
    },
}


# --- rare_terms (reg SearchModule.java:416): conv_ids whose filtered doc
# count is <= max_doc_count. tool='search' AND role='user' selects exactly
# turn 0 of each conversation (doc_id % 20 == 0), so every conv_id is "rare"
# with doc_count 1 at any scale factor — deterministic without tuning.
AGG_QUERIES["agg_rare_terms"] = {
    "body": {
        "query": {
            "bool": {
                "filter": [{"term": {"tool": "search"}}, {"term": {"role": "user"}}]
            }
        },
        "aggs": {"conv": {"rare_terms": {"field": "conv_id", "max_doc_count": 1}}},
    },
    "oracle": f"""{TRANSCRIPTS_CTE}
SELECT conv_id AS conv, count(*) AS doc_count
FROM transcripts WHERE tool = 'search' AND role = 'user'
GROUP BY conv_id HAVING count(*) <= 1 ORDER BY conv_id""",
}

# --- adjacency_matrix (reg SearchModule.java:399): singles + pairwise keys
_ADJ_FILTERS = {
    "late": "turn_idx >= 10",
    "search": "tool = 'search'",
    "user": "role = 'user'",
}
_ADJ_ARMS = []
for _n, _p in sorted(_ADJ_FILTERS.items()):
    _ADJ_ARMS.append(f"SELECT '{_n}' AS key, count(*) AS doc_count FROM transcripts WHERE {_p} HAVING count(*) > 0")
_ADJ_NAMES = sorted(_ADJ_FILTERS)
for _i in range(len(_ADJ_NAMES)):
    for _j in range(_i + 1, len(_ADJ_NAMES)):
        _a, _b = _ADJ_NAMES[_i], _ADJ_NAMES[_j]
        _ADJ_ARMS.append(
            f"SELECT '{_a}&{_b}' AS key, count(*) AS doc_count FROM transcripts "
            f"WHERE ({_ADJ_FILTERS[_a]}) AND ({_ADJ_FILTERS[_b]}) HAVING count(*) > 0"
        )
AGG_QUERIES["agg_adjacency_matrix"] = {
    "oracle": f"{TRANSCRIPTS_CTE}\nSELECT * FROM ({' UNION ALL '.join(_ADJ_ARMS)}) ORDER BY key",
}

# --- scripted_metric (reg SearchModule.java:456): per-role third central
# moment of turn_idx — not a built-in aggregate, computed by the grouped-map
# pandas UDAF on the Spark side and by explicit SQL algebra in the oracle.
AGG_QUERIES["agg_scripted_metric"] = {
    "oracle": f"""{TRANSCRIPTS_CTE},
m AS (SELECT role, avg(turn_idx) AS mu FROM transcripts GROUP BY role)
SELECT t.role AS role,
       round(sum(pow(t.turn_idx - m.mu, 3)) / count(*), 4) AS m3
FROM transcripts t JOIN m USING (role) GROUP BY t.role ORDER BY t.role""",
}

# --- matrix_stats (modules/aggs-matrix-stats): per-role moment vector +
# covariance/correlation matrix over (turn_idx, n_chars). The oracle computes
# the same ES-semantics quantities from POWER SUMS (central moments via
# avg(x^k)) — an independent algebraic route from Spark's streaming
# central-moment updates, so the formulas themselves are cross-checked.
def _ms_oracle() -> str:
    flds = {"a": "turn_idx", "b": "len(text)"}
    stats = []
    for k, e in flds.items():
        stats += [
            f"count(*) AS n",
            f"avg({e}) AS m1_{k}", f"avg(pow({e},2)) AS p2_{k}",
            f"avg(pow({e},3)) AS p3_{k}", f"avg(pow({e},4)) AS p4_{k}",
            f"var_samp({e}) AS var_{k}",
        ]
    stats.append(f"covar_samp({flds['a']}, {flds['b']}) AS cov_ab")
    stats.append(f"corr({flds['a']}, {flds['b']}) AS corr_ab")
    stats = list(dict.fromkeys(stats))
    moments = []
    for k in flds:
        moments += [
            f"m1_{k}", f"(p2_{k} - m1_{k}*m1_{k}) AS c2_{k}",
            f"(p3_{k} - 3*m1_{k}*p2_{k} + 2*pow(m1_{k},3)) AS c3_{k}",
            f"(p4_{k} - 4*m1_{k}*p3_{k} + 6*m1_{k}*m1_{k}*p2_{k}"
            f" - 3*pow(m1_{k},4)) AS c4_{k}",
        ]
    arms = []
    names = {"a": "turn_idx", "b": "n_chars"}
    for x in ("a", "b"):
        for y in ("a", "b"):
            cov = f"var_{x}" if x == y else "cov_ab"
            cor = "1.0" if x == y else "corr_ab"
            arms.append(
                f"SELECT role, '{names[x]}' AS name, '{names[y]}' AS other,\n"
                f"  n AS count, round(m1_{x}, 4) AS mean,\n"
                f"  round(var_{x}, 4) AS variance,\n"
                f"  round(c3_{x} / pow(c2_{x}, 1.5), 4) AS skewness,\n"
                f"  round(c4_{x} / (c2_{x} * c2_{x}), 4) AS kurtosis,\n"
                f"  round({cov}, 4) AS covariance, round({cor}, 4) AS correlation\n"
                f"FROM m"
            )
    return (
        f"{TRANSCRIPTS_CTE},\n"
        f"s AS (SELECT role, {', '.join(stats)} FROM transcripts GROUP BY role),\n"
        f"m AS (SELECT *, {', '.join(moments)} FROM s)\n"
        f"SELECT * FROM ({' UNION ALL '.join(arms)}) ORDER BY role, name, other"
    )


AGG_QUERIES["agg_matrix_stats"] = {"oracle": _ms_oracle()}


def _matrix_stats_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TR.transcripts_view(spark, sf_dir).withColumn(
        "n_chars", F.length("text")
    )
    out = aggs.matrix_stats(docs, ["turn_idx", "n_chars"], group_by=["role"])
    num = ["mean", "variance", "skewness", "kurtosis", "covariance", "correlation"]
    return out.select(
        "role", "name", "other", "count",
        *[F.round(F.col(c), 4).alias(c) for c in num],
    ).orderBy("role", "name", "other")


# --- diversified_sampler (reg SearchModule.java:407): top shard_size docs by
# score with at most max_docs_per_value per role; score = epoch(ts), unique
# per doc, so the ranked window is fully deterministic.
AGG_QUERIES["agg_diversified_sampler"] = {
    "oracle": f"""{TRANSCRIPTS_CTE},
r AS (SELECT conv_id, turn_idx, role, cast(epoch(ts) as double) AS score,
             row_number() OVER (PARTITION BY role ORDER BY epoch(ts) DESC) AS rn
      FROM transcripts)
SELECT conv_id, turn_idx, role, score FROM r WHERE rn <= 2
ORDER BY score DESC LIMIT 6""",
}


def _adjacency_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TR.transcripts_view(spark, sf_dir)
    return aggs.adjacency_matrix(docs, _ADJ_FILTERS)


def _scripted_metric_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    def third_moment(key, pdf: pd.DataFrame) -> pd.DataFrame:
        t = pdf["turn_idx"].to_numpy(dtype="float64")
        mu = t.mean()
        return pd.DataFrame({"role": [key[0]], "m3": [((t - mu) ** 3).sum() / len(t)]})

    docs = TR.transcripts_view(spark, sf_dir)
    out = aggs.scripted_metric(docs, ["role"], third_moment, "role string, m3 double")
    return _round_doubles(out).orderBy("role")


def _div_sampler_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TR.transcripts_view(spark, sf_dir).select(
        "conv_id", "turn_idx", "role",
        F.unix_timestamp("ts").cast("double").alias("score"),
    )
    return aggs.diversified_sampler(docs, "role", max_docs_per_value=2, shard_size=6)


def _sig_terms_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TR.transcripts_view(spark, sf_dir)
    fg = docs.where(F.array_contains(analysis.tokens("text"), "spark"))
    out = aggs.significant_terms(fg, docs, "tool", size=10)
    return _round_doubles(out)


def _mad_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TR.transcripts_view(spark, sf_dir)
    return _round_doubles(aggs.aggregate_mad(docs, "turn_idx", group_by=["role"]))


def _auto_dh_oracle(target: int = 10) -> str:
    """Hand-derived oracle for auto_date_histogram: the hybrid ladder
    (fixed sub-week rungs, calendar week/month/quarter/year rungs —
    operators/aggs.AUTO_DH_LADDER) re-expressed in DuckDB SQL. Selection,
    per-rung rounding, and the zero-fill grid all switch on the selected
    rung; unselected grid arms get inverted bounds so generate_series is
    empty (never materialized)."""
    from .operators.aggs import AUTO_DH_LADDER

    def count_expr(rung) -> str:
        kind, n = rung
        if kind == "fixed":
            return f"(hi // {n}) - (lo // {n}) + 1"
        if kind == "week":
            return (
                "(cast(epoch(date_trunc('week', hits)) as bigint) - "
                "cast(epoch(date_trunc('week', lots)) as bigint)) // 604800 + 1"
            )
        if kind == "month":
            return (
                f"((year(hits) * 12 + month(hits) - 1) // {n}) - "
                f"((year(lots) * 12 + month(lots) - 1) // {n}) + 1"
            )
        return f"(year(hits) // {n}) - (year(lots) // {n}) + 1"

    def tag(rung) -> str:
        return f"{rung[0]}:{rung[1]}"

    def round_expr(rung, ts: str) -> str:
        kind, n = rung
        if kind == "fixed":
            return f"make_timestamp((cast(epoch({ts}) as bigint) // {n}) * {n} * 1000000)"
        if kind == "week":
            return f"date_trunc('week', {ts})"
        if kind == "month":
            return f"date_trunc('{'month' if n == 1 else 'quarter'}', {ts})"
        if n == 1:
            return f"date_trunc('year', {ts})"
        return f"make_timestamp(cast((year({ts}) // {n}) * {n} as bigint), 1, 1, 0, 0, 0)"

    whens = " ".join(
        f"WHEN {count_expr(r)} <= {target} THEN '{tag(r)}'" for r in AUTO_DH_LADDER
    )
    key_case = "CASE (SELECT rung FROM sel) " + " ".join(
        f"WHEN '{tag(r)}' THEN {round_expr(r, 'ts')}" for r in AUTO_DH_LADDER
    ) + " END"
    grid_arms = []
    for r in AUTO_DH_LADDER:
        kind, n = r
        sel = f"(SELECT rung FROM sel) = '{tag(r)}'"
        if kind == "fixed":
            grid_arms.append(
                f"SELECT make_timestamp(b * {n} * 1000000) AS bkt FROM (SELECT "
                f"unnest(generate_series("
                f"CASE WHEN {sel} THEN (SELECT lo FROM s) // {n} ELSE 1 END, "
                f"CASE WHEN {sel} THEN (SELECT hi FROM s) // {n} ELSE 0 END)) AS b)"
            )
        else:
            step = {"week": f"{7 * n} days", "month": f"{n} months", "year": f"{n} years"}[kind]
            lo_k = round_expr(r, "(SELECT lots FROM s)")
            hi_k = round_expr(r, "(SELECT hits FROM s)")
            grid_arms.append(
                f"SELECT unnest(generate_series("
                f"CASE WHEN {sel} THEN {lo_k} ELSE timestamp '1970-01-02' END, "
                f"CASE WHEN {sel} THEN {hi_k} ELSE timestamp '1970-01-01' END, "
                f"interval {step})) AS bkt"
            )
    grid = "\nUNION ALL\n".join(grid_arms)
    return f"""{TRANSCRIPTS_CTE},
s AS (SELECT min(ts) AS lots, max(ts) AS hits,
             cast(epoch(min(ts)) as bigint) AS lo,
             cast(epoch(max(ts)) as bigint) AS hi FROM transcripts),
sel AS (SELECT (CASE {whens} ELSE '{tag(AUTO_DH_LADDER[-1])}' END) AS rung
        FROM s),
grid AS ({grid}),
counted AS (
  SELECT {key_case} AS bkt, count(*) AS doc_count
  FROM transcripts GROUP BY 1)
SELECT g.bkt, coalesce(c.doc_count, 0) AS doc_count
FROM grid g LEFT JOIN counted c USING (bkt) ORDER BY g.bkt"""


AGG_QUERIES["agg_auto_date_histogram"]["oracle"] = _auto_dh_oracle()


# --- missing (reg SearchModule.java registration of MissingAggregationBuilder):
# doc_count + sub-metrics over docs whose field is null. The view's `tool`
# is '' (never null), so the fixture derives a nullable column first.
AGG_QUERIES["agg_missing"] = {
    "oracle": f"""{TRANSCRIPTS_CTE}
SELECT count(*) AS doc_count, round(avg(turn_idx), 4) AS avg_turn
FROM transcripts WHERE tool = ''""",
}


def _missing_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TR.transcripts_view(spark, sf_dir).withColumn(
        "tool_n", F.expr("nullif(tool, '')")
    )
    body = {
        "aggs": {
            "no_tool": {
                "missing": {"field": "tool_n"},
                "aggs": {"avg_turn": {"avg": {"field": "turn_idx"}}},
            }
        }
    }
    return _round_doubles(aggs.aggregate(docs, body))


# --- serial_diff pipeline (SerialDiffPipelineAggregationBuilder): lag-2
# difference over hourly bucket counts
AGG_QUERIES["agg_serial_diff"] = {
    "body": {
        "aggs": {
            "hour": {
                "date_histogram": {"field": "ts", "calendar_interval": "hour"},
                "aggs": {"sdiff": {"serial_diff": {"buckets_path": "_count", "lag": 2}}},
            }
        }
    },
    "fill": {"sdiff": 0},
    "oracle": f"""{TRANSCRIPTS_CTE}
SELECT hour, doc_count,
       coalesce(doc_count - lag(doc_count, 2) OVER (ORDER BY hour), 0) AS sdiff
FROM (SELECT date_trunc('hour', ts) AS hour, count(*) AS doc_count
      FROM transcripts GROUP BY 1) ORDER BY hour""",
}

# --- stats_bucket sibling pipeline (StatsBucketPipelineAggregationBuilder):
# avg/sum/min/max/count over a per-bucket metric (covers the whole
# avg_bucket/sum_bucket/min_bucket/max_bucket family in one fixture)
AGG_QUERIES["agg_stats_bucket"] = {
    "body": {
        "aggs": {
            "role": {
                "terms": {"field": "role", "size": 10},
                "aggs": {
                    "sum_turn": {"sum": {"field": "turn_idx"}},
                    "st": {"stats_bucket": {"buckets_path": "sum_turn"}},
                },
            }
        }
    },
    "oracle": f"""{TRANSCRIPTS_CTE},
b AS (SELECT role, count(*) AS doc_count, cast(sum(turn_idx) as bigint) AS sum_turn
      FROM transcripts GROUP BY role ORDER BY doc_count DESC, role LIMIT 10)
SELECT role, doc_count, sum_turn,
       round(avg(sum_turn) OVER (), 4) AS st_avg,
       cast(sum(sum_turn) OVER () as bigint) AS st_sum,
       min(sum_turn) OVER () AS st_min,
       max(sum_turn) OVER () AS st_max,
       count(sum_turn) OVER () AS st_count
FROM b ORDER BY doc_count DESC, role""",
}

# --- extended_stats_bucket sibling pipeline
# (ExtendedStatsBucketPipelineAggregator.java): count/sum/min/max/sumOfSqrs
# over sibling buckets, population variance derived sumOfSqrs/count - avg^2,
# std bounds avg +/- sigma*std (sigma default 2) — the derivation the
# reference's InternalExtendedStats uses, mirrored in the oracle SQL.
AGG_QUERIES["agg_extended_stats_bucket"] = {
    "body": {
        "aggs": {
            "role": {
                "terms": {"field": "role", "size": 10},
                "aggs": {
                    "sum_turn": {"sum": {"field": "turn_idx"}},
                    "est": {"extended_stats_bucket": {"buckets_path": "sum_turn"}},
                },
            }
        }
    },
    "oracle": f"""{TRANSCRIPTS_CTE},
b AS (SELECT role, count(*) AS doc_count, cast(sum(turn_idx) as bigint) AS sum_turn
      FROM transcripts GROUP BY role ORDER BY doc_count DESC, role LIMIT 10),
s AS (SELECT count(*) AS n, sum(sum_turn) * 1.0 AS s1, sum(sum_turn * sum_turn) * 1.0 AS s2,
             min(sum_turn) * 1.0 AS mn, max(sum_turn) * 1.0 AS mx
      FROM b)
SELECT b.role, b.doc_count, b.sum_turn,
       s.n AS est_count, round(s.mn, 4) AS est_min, round(s.mx, 4) AS est_max,
       round(s.s1 / s.n, 4) AS est_avg, round(s.s1, 4) AS est_sum,
       round(s.s2, 4) AS est_sum_of_squares,
       round(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n), 4) AS est_variance,
       round(sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)), 4) AS est_std_deviation,
       round(s.s1 / s.n + 2 * sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)), 4) AS est_std_upper,
       round(s.s1 / s.n - 2 * sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)), 4) AS est_std_lower
FROM b, s ORDER BY b.doc_count DESC, b.role""",
}

# --- percentiles_bucket sibling pipeline
# (PercentilesBucketPipelineAggregator.java): sorted sibling values indexed
# at round(p/100 * (n-1)) — nearest-rank with half-up rounding, no
# interpolation (deliberately different from the percentiles metric agg).
AGG_QUERIES["agg_percentiles_bucket"] = {
    "body": {
        "aggs": {
            "role": {
                "terms": {"field": "role", "size": 10},
                "aggs": {
                    "sum_turn": {"sum": {"field": "turn_idx"}},
                    "pb": {"percentiles_bucket": {"buckets_path": "sum_turn",
                                                  "percents": [25, 50, 75]}},
                },
            }
        }
    },
    "oracle": f"""{TRANSCRIPTS_CTE},
b AS (SELECT role, count(*) AS doc_count, cast(sum(turn_idx) as bigint) AS sum_turn
      FROM transcripts GROUP BY role ORDER BY doc_count DESC, role LIMIT 10),
v AS (SELECT list_sort(list(cast(sum_turn as double))) AS vals, count(*) AS n FROM b)
SELECT b.role, b.doc_count, b.sum_turn,
       round(v.vals[cast(round(0.25 * (v.n - 1)) as int) + 1], 4) AS pb_p25,
       round(v.vals[cast(round(0.50 * (v.n - 1)) as int) + 1], 4) AS pb_p50,
       round(v.vals[cast(round(0.75 * (v.n - 1)) as int) + 1], 4) AS pb_p75
FROM b, v ORDER BY b.doc_count DESC, b.role""",
}

# --- bucket_sort pipeline (BucketSortPipelineAggregationBuilder): re-sort
# buckets by a metric and truncate
AGG_QUERIES["agg_bucket_sort"] = {
    "body": {
        "aggs": {
            "role": {
                "terms": {"field": "role", "size": 10},
                "aggs": {
                    "sum_turn": {"sum": {"field": "turn_idx"}},
                    "srt": {"bucket_sort": {"sort": [{"sum_turn": "desc"}], "size": 3}},
                },
            }
        }
    },
    "oracle": f"""{TRANSCRIPTS_CTE}
SELECT role, count(*) AS doc_count, cast(sum(turn_idx) as bigint) AS sum_turn
FROM transcripts GROUP BY role
ORDER BY sum_turn DESC LIMIT 3""",
}

# --- sampler (SamplerAggregationBuilder): sub-aggs over only the top
# shard_size docs by relevance. Score = epoch(ts) (strictly increasing in
# doc_id => unique, so the top-N set is deterministic).
AGG_QUERIES["agg_sampler"] = {
    "oracle": f"""{TRANSCRIPTS_CTE},
s AS (SELECT conv_id, turn_idx, role, cast(epoch(ts) as double) AS score
      FROM transcripts ORDER BY score DESC LIMIT 50)
SELECT role, count(*) AS doc_count FROM s GROUP BY role ORDER BY role""",
}


def _sampler_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TR.transcripts_view(spark, sf_dir).select(
        "conv_id", "turn_idx", "role",
        F.unix_timestamp("ts").cast("double").alias("score"),
    )
    sampled = aggs.sampler(docs, shard_size=50)
    return sampled.groupBy("role").agg(F.count(F.lit(1)).alias("doc_count")).orderBy("role")


# --- significant_text (reg SearchModule.java:426): JLH over analyzed tokens,
# foreground = docs containing 'spark', background = whole corpus
AGG_QUERIES["agg_significant_text"] = {
    "oracle": f"""{TRANSCRIPTS_CTE},
toks AS (SELECT conv_id, turn_idx,
                unnest(list_distinct(regexp_extract_all(lower(text), '[\\pL\\pN]+'))) AS term
         FROM transcripts),
fg_docs AS (SELECT DISTINCT conv_id, turn_idx FROM toks WHERE term = 'spark'),
fg AS (SELECT term, count(*) AS fg FROM toks JOIN fg_docs USING (conv_id, turn_idx)
       GROUP BY term HAVING count(*) >= 3),
bg AS (SELECT term, count(*) AS bg FROM toks GROUP BY term),
nfg AS (SELECT count(*) AS n FROM fg_docs),
nbg AS (SELECT count(*) AS n FROM transcripts)
SELECT fg.term AS term, fg.fg AS doc_count, bg.bg AS bg_count,
  round((fg.fg * 1.0 / nfg.n - bg.bg * 1.0 / nbg.n) * ((fg.fg * 1.0 / nfg.n) / (bg.bg * 1.0 / nbg.n)), 4) AS score
FROM fg JOIN bg USING (term) CROSS JOIN nfg CROSS JOIN nbg
WHERE fg.fg * 1.0 / nfg.n > bg.bg * 1.0 / nbg.n
ORDER BY score DESC, term LIMIT 10""",
}


def _sig_text_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TR.transcripts_view(spark, sf_dir)
    fg = docs.where(F.array_contains(analysis.tokens("text"), "spark"))
    return _round_doubles(aggs.significant_text(fg, docs, size=10, min_doc_count=3))


# --- percentile_ranks (PercentileRanksAggregationBuilder reg :384): exact
# CDF — percent of values <= v (documented exact-vs-TDigest divergence,
# same stance as percentiles)
AGG_QUERIES["agg_percentile_ranks"] = {
    "body": {
        "aggs": {"pr": {"percentile_ranks": {"field": "turn_idx", "values": [5, 12]}}}
    },
    "oracle": f"""{TRANSCRIPTS_CTE}
SELECT round(100.0 * avg(case when turn_idx <= 5 then 1.0 else 0.0 end), 4) AS pr_rank_5,
       round(100.0 * avg(case when turn_idx <= 12 then 1.0 else 0.0 end), 4) AS pr_rank_12
FROM transcripts""",
}

# --- global (GlobalAggregationBuilder reg :393): bucket over ALL docs,
# ignoring the request query — here the query filters to role='user' but the
# global bucket still aggregates the whole corpus
AGG_QUERIES["agg_global"] = {
    "body": {
        "query": {"term": {"role": "user"}},
        "aggs": {
            "all": {
                "global": {},
                "aggs": {"avg_turn": {"avg": {"field": "turn_idx"}}},
            }
        },
    },
    "oracle": f"""{TRANSCRIPTS_CTE}
SELECT count(*) AS all_doc_count, round(avg(turn_idx), 4) AS avg_turn
FROM transcripts""",
}


def agg_query_fns() -> dict:
    out = {}
    for name, spec in AGG_QUERIES.items():
        if name == "agg_significant_terms":
            out[name] = _sig_terms_fix
        elif name == "agg_mad_role":
            out[name] = _mad_fix
        elif name == "agg_adjacency_matrix":
            out[name] = _adjacency_fix
        elif name == "agg_matrix_stats":
            out[name] = _matrix_stats_fix
        elif name == "agg_scripted_metric":
            out[name] = _scripted_metric_fix
        elif name == "agg_diversified_sampler":
            out[name] = _div_sampler_fix
        elif name == "agg_missing":
            out[name] = _missing_fix
        elif name == "agg_sampler":
            out[name] = _sampler_fix
        elif name == "agg_significant_text":
            out[name] = _sig_text_fix
        else:
            out[name] = _fix(spec["body"], spec.get("fill"))
    return out


def agg_oracle_sql() -> dict[str, str]:
    return {name: spec["oracle"] for name, spec in AGG_QUERIES.items()}
