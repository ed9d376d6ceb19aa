"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k (exact; the oracle). Scale paths:
  * random-hyperplane LSH bucketing — candidates share >= 1 of `n_tables`
    16-bit sign-buckets; per-bucket verify. Linear-ish candidate volume.
  * IVF — deterministic k-means-lite coarse quantizer (seeded centroid init
    from hashed ids, fixed iteration count, all DataFrame ops), probe the
    `n_probe` nearest centroids only. The classic 100-TB ANN layout: cluster
    assignment is the partition key, so a query touches n_probe partitions
    instead of the full corpus.

All distance math is JVM-side (zip_with/aggregate) in double precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_expr


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the (small) query set against
    the corpus — one scan, no shuffle of the big side; ties by vec_id asc."""
    q = queries.select(F.col(q_id_col).alias("query_id"), F.col(q_vec_col).alias("qv"))
    joined = emb.crossJoin(F.broadcast(q)).where(F.col(id_col) != F.col("query_id"))
    cos = cosine_expr(F.col(vec_col), F.col("qv"))
    scored = joined.select("query_id", F.col(id_col).alias("vec_id"), cos.alias("_c"))
    return _topk_per_query(scored, k)




def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """(query_id, vec_id, _c) -> top-k per query, ties by vec_id asc."""
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("_c"), 6).desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("query_id", "vec_id", F.round(F.col("_c"), 4).alias("cosine"))
    )


def random_hyperplane_buckets(
    emb: DataFrame,
    n_tables: int = 4,
    bits: int = 12,
    dim: int = 64,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Add (table, bucket) LSH keys: bucket = sign bits against `bits`
    deterministic pseudo-random hyperplanes (splitmix-seeded, generated
    JVM-side so the plan is a pure column expression)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    out = emb
    planes = rng.standard_normal((n_tables, bits, dim))
    tables = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("long")
        for b in range(bits):
            plane = planes[t, b]
            dot = F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in plane]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bucket = bucket + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
        tables.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
    return out.select("*", F.explode(F.array(*tables)).alias("_lsh")).select(
        "*", F.col("_lsh.table").alias("table"), F.col("_lsh.bucket").alias("bucket")
    ).drop("_lsh")


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_tables: int = 4,
    bits: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: verify only corpus vectors sharing an LSH bucket with the
    query in any table. Recall < 1 by construction; property-tested >= 0.8
    vs brute force at bench scale."""
    ce = random_hyperplane_buckets(emb, n_tables, bits, dim, vec_col, seed)
    qe = random_hyperplane_buckets(
        queries.select(
            F.col(q_id_col).alias("query_id"), F.col(q_vec_col).alias(vec_col)
        ),
        n_tables,
        bits,
        dim,
        vec_col,
        seed,
    ).select("query_id", F.col(vec_col).alias("qv"), "table", "bucket")
    cand = (
        ce.join(qe, ["table", "bucket"])
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, vec_col, "qv")
        .distinct()
    )
    cos = cosine_expr(F.col(vec_col), F.col("qv"))
    scored = cand.select("query_id", F.col(id_col).alias("vec_id"), cos.alias("_c"))
    return _topk_per_query(scored, k)


def ivf_index(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[list[float]]]:
    """Deterministic IVF coarse quantizer: centroids init from the n_centroids
    lowest-id vectors, `iters` Lloyd rounds as DataFrame aggs; returns
    (emb + `cluster` column, centroid list). Cluster is the partition key of
    the at-rest layout at scale (repartition by it before writing)."""
    cents = [
        [float(x) for x in r[vec_col]]
        for r in emb.orderBy(id_col).limit(n_centroids).collect()
    ]
    for _ in range(iters):
        assigned = _assign(emb, cents, vec_col)
        rows = (
            assigned.select("cluster", F.posexplode(vec_col).alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(F.sort_array(F.collect_list(F.struct("i", "m"))).alias("ms"))
            .select("cluster", F.col("ms.m").alias("centroid"))
            .collect()
        )
        new = {r.cluster: list(r.centroid) for r in rows}
        cents = [new.get(i, cents[i]) for i in range(len(cents))]
    return _assign(emb, cents, vec_col), cents


def _assign(emb: DataFrame, cents: list[list[float]], vec_col: str) -> DataFrame:
    """Nearest-centroid assignment via a broadcast numpy matmul (Arrow
    batches): one (batch x dim) @ (dim x n_centroids) product per batch, so
    expression size is independent of n_centroids — the earlier per-centroid
    nested-CASE expression hit Catalyst codegen limits past a few hundred
    centroids. Ties keep the lowest centroid index (first argmax), matching
    the previous strictly-greater CASE chain; cosine rounded to 9 dp before
    the argmax exactly as before."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(cents, dtype=np.float64).T  # (dim, n_centroids)
    cn = np.linalg.norm(C, axis=0)

    def _best_cluster(v):
        M = np.array(v.tolist(), dtype=np.float64)  # (batch, dim)
        if M.size == 0:
            return pd.Series(np.zeros(len(v), dtype=np.int32))
        sims = (M @ C) / (np.linalg.norm(M, axis=1, keepdims=True) * cn)
        # np.argmax returns the FIRST max; all-NaN rows (zero-norm vectors)
        # also resolve to index 0 — both match the old CASE-chain semantics
        return pd.Series(np.argmax(np.round(sims, 9), axis=1).astype(np.int32))

    best_cluster = pandas_udf(_best_cluster, "int")
    return emb.select("*", best_cluster(F.col(vec_col)).alias("cluster"))


def ivf_topk(
    emb_clustered: DataFrame,
    cents: list[list[float]],
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
) -> DataFrame:
    """Probe the n_probe nearest centroids per query; exact rerank inside."""
    import numpy as np

    qrows = queries.select(q_id_col, q_vec_col).collect()
    C = np.array(cents)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    probe_rows = []
    for r in qrows:
        v = np.array(r[q_vec_col], dtype=float)
        v = v / (np.linalg.norm(v) or 1.0)
        order = np.argsort(-(Cn @ v), kind="stable")[:n_probe]
        for c in order:
            probe_rows.append((r[q_id_col], int(c), [float(x) for x in r[q_vec_col]]))
    spark = emb_clustered.sparkSession
    probes = spark.createDataFrame(
        probe_rows, f"query_id long, cluster int, qv array<double>"
    )
    cand = emb_clustered.join(F.broadcast(probes), "cluster").where(
        F.col(id_col) != F.col("query_id")
    )
    cos = cosine_expr(F.col(vec_col), F.col("qv"))
    scored = cand.select("query_id", F.col(id_col).alias("vec_id"), cos.alias("_c"))
    return _topk_per_query(scored, k)
