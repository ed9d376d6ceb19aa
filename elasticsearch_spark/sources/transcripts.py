"""The transcripts input table: schema, deterministic views, synthetic generator.

Input contract (BASELINE.json input_hint): an Iceberg-style table of multi-turn
conversation/agent transcripts with columns
  (conv_id: string, turn_idx: int32, role: string, text: string,
   tool: string, ts: timestamp)
One row = one turn = one document; doc key = (conv_id, turn_idx).

Two deterministic sources:
  1. `transcripts_view(spark, sf_dir)` — derives a transcripts-shaped table from
     the driver's documents.parquet with pure SQL arithmetic, so the DuckDB
     oracle can construct the *identical* table (see `TRANSCRIPTS_VIEW_SQL`).
  2. `generate_transcripts(spark, ...)` — a seeded zipf-ish corpus (per
     FIXTURES.md F1) for property tests and the scale bench; hot terms exist so
     skew handling is exercised, lengths span byte4-quantization buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["", "search", "code", "browser"]

# Deterministic documents -> transcripts mapping, expressible identically in
# Spark SQL and DuckDB (doc_id is a 0..N-1 bigint in the driver's table).
# 20 turns per conversation; ts strictly increasing within a conversation.
_VIEW_TEMPLATE = """
SELECT
  'conv_' || lpad(cast(cast(floor(doc_id / 20.0) as bigint) as varchar), 6, '0') AS conv_id,
  cast(doc_id % 20 as int)                                              AS turn_idx,
  (case cast(doc_id % 4 as int) when 0 then 'user' when 1 then 'assistant'
        when 2 then 'system' else 'tool' end)                           AS role,
  text                                                                  AS text,
  (case cast(doc_id % 5 as int) when 0 then 'search' when 1 then 'code'
        when 2 then 'browser' else '' end)                              AS tool,
  cast('2024-01-01 00:00:00' as timestamp)
    + to_interval_seconds(cast(doc_id as bigint) * 37)                  AS ts
FROM {documents}
"""


def transcripts_view_sql(documents_rel: str, dialect: str) -> str:
    """The derivation as SQL for either engine (only interval syntax differs)."""
    sql = _VIEW_TEMPLATE.replace("{documents}", documents_rel)
    if dialect == "spark":
        sql = sql.replace(
            "to_interval_seconds(cast(doc_id as bigint) * 37)",
            "make_interval(0, 0, 0, 0, 0, 0, cast(doc_id as bigint) * 37)",
        )
        sql = sql.replace("as varchar", "as string")
    elif dialect == "duckdb":
        sql = sql.replace(
            "to_interval_seconds(cast(doc_id as bigint) * 37)",
            "to_seconds(cast(doc_id as bigint) * 37)",
        )
    else:
        raise ValueError(dialect)
    return sql


def transcripts_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcripts-shaped DataFrame derived from {sf_dir}/documents.parquet."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "__es_documents_src"
    )
    return spark.sql(transcripts_view_sql("__es_documents_src", "spark"))


# ------------------------------------------------------------------ generator
# Seeded synthetic corpus. Vocabulary is zipf-ish: term_i chosen with weight
# ~ 1/(i+1); realized via a power transform of a splitmix-style hash so the
# generator is pure-SQL (deterministic, distributed, no Python RNG state).
VOCAB_SIZE = 5000


def generate_transcripts(
    spark: SparkSession,
    n_turns: int,
    n_convs: int | None = None,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic transcripts; same (seed, n_turns) => same bytes.

    Distributed: spark.range drives generation; every column is a pure
    function of (id, seed) via xxhash64 — no driver-side data, no Python UDF.
    """
    n_convs = n_convs or max(1, n_turns // 20)
    df = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)
    h = lambda *cols: F.abs(F.xxhash64(F.lit(seed), *cols))  # noqa: E731
    conv = (F.col("id") % n_convs).cast("long")
    turn = (F.col("id") / n_convs).cast("int")
    # token count 1..200 (log-uniform-ish so quantization buckets all hit)
    n_tok = (
        F.pow(F.lit(200.0), (h(F.lit("len"), F.col("id")) % 10000) / 10000.0)
        .cast("int")
        + 1
    )
    # text: n_tok terms; zipf via rank = floor(VOCAB * u^4) (power transform)
    u = (h(F.lit("tok"), F.col("id"), F.col("s")) % 100003) / 100003.0
    term_rank = F.floor(F.lit(VOCAB_SIZE) * F.pow(u, F.lit(4.0))).cast("int")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_tok - 1),
            lambda s: F.concat(
                F.lit("w"),
                F.floor(
                    F.lit(VOCAB_SIZE)
                    * F.pow(
                        (F.abs(F.xxhash64(F.lit(seed), F.lit("tok"), F.col("id"), s)) % 100003)
                        / 100003.0,
                        F.lit(4.0),
                    )
                ).cast("int"),
            ),
        ),
        " ",
    )
    _ = (u, term_rank)  # documented shape; realized inline above
    out = df.select(
        F.concat(F.lit("conv_"), F.lpad(conv.cast("string"), 6, "0")).alias("conv_id"),
        turn.alias("turn_idx"),
        F.element_at(F.array(*[F.lit(r) for r in ROLES]), (h(F.lit("role"), F.col("id")) % 4 + 1).cast("int")).alias("role"),
        text.alias("text"),
        F.element_at(F.array(*[F.lit(t) for t in TOOLS]), (h(F.lit("tool"), F.col("id")) % 4 + 1).cast("int")).alias("tool"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("id").cast("long"))).alias("ts"),
    )
    return out
