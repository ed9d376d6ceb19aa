"""Deduplication operators for large-scale training-data pipelines.

Five escalating strategies, all shuffle-architected for 100 TB:
  * exact        — hash-groupBy on a content fingerprint (one shuffle).
  * ngram-jaccard — inverted-index self-join: explode distinct tokens, join
                    docs sharing a token, count-intersect vs union. The join
                    key IS a posting list, so the plan is the same shape as
                    the BM25 index build; hot tokens are the skew and are
                    droppable (a token shared by >X% of docs can't separate
                    near-dups — df-cap filter below).
  * MinHash+LSH  — vectorized numpy signatures (pandas_udf), banded into
                    (band, bucket) keys; only bucket-colliding pairs are
                    verified with exact Jaccard. At 100 TB the candidate set
                    is ~linear in corpus size instead of quadratic.
  * SimHash      — 64-bit sign-hash of token features; 4x16-bit bands
                    guarantee recall for hamming distance <= 3 (pigeonhole).
  * embedding    — cosine near-dup over array<float> embeddings; brute
                    all-pairs for oracle scale, LSH (random hyperplane) path
                    in similarity.py for cluster scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import analysis

# deterministic 64-bit mixing (splitmix64 finalizer) — reproducible across
# numpy (build) and any verifier; no Python hash() (seed-dependent).
_MASK = (1 << 64) - 1


def _splitmix64_np(x):
    import numpy as np

    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return z ^ (z >> np.uint64(31))


def _scratch(pool: dict, name: str, n: int, dtype, cols: int | None = None):
    """Grow-only reusable buffer from a per-executor pool.

    Fresh large allocations are pathologically expensive in sandboxed /
    paravirtual environments (first-touch page faults measured at ~0.2 s/MB
    here, and glibc munmaps blocks > its 32 MB dynamic threshold so they are
    re-faulted EVERY batch). All per-occurrence intermediates therefore live
    in grow-only buffers touched once per worker, not per batch."""
    import numpy as np

    shape = (n,) if cols is None else (n, cols)
    buf = pool.get(name)
    if buf is None or buf.shape[0] < n:
        cap = max(n, 2 * (buf.shape[0] if buf is not None else 0))
        buf = np.empty((cap,) if cols is None else (cap, cols), dtype=dtype)
        pool[name] = buf
    return buf[: shape[0]]


def _batch_token_hashes(tok_lists, pool: dict | None = None):
    """Flatten one Arrow batch of token arrays and md5-hash each DISTINCT
    token exactly once (pd.factorize), then gather per occurrence.

    The md5-of-first-8-bytes-little hash is pinned by the DuckDB oracle
    (md5_number_upper); md5 itself can't be numpy-vectorized, but zipf-shaped
    corpora have distinct/occurrence ratios of 1-5%, so hashing uniques and
    broadcasting through the factorize codes removes the per-token Python
    loop from the hot path (measured kernels in BENCH.md §5). Returns
    (base: uint64 per occurrence, starts: first occurrence index of each
    NON-EMPTY doc, lens: tokens per doc); `base` is a view into a reused
    pool buffer when `pool` is given (valid until the next call)."""
    import hashlib

    import numpy as np

    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    if lens.sum() == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64), lens
    flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if len(t)])
    codes, uniques = pd.factorize(flat)
    uh = np.fromiter(
        (
            int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "little")
            for u in uniques
        ),
        dtype=np.uint64,
        count=len(uniques),
    )
    if pool is not None:
        base = _scratch(pool, "base", len(codes), np.uint64)
        np.take(uh, codes, out=base)
    else:
        base = uh[codes]
    ends = np.cumsum(lens)
    starts = (ends - lens)[lens > 0]
    return base, starts, lens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id doc per normalized-content fingerprint (one shuffle)."""
    fp = F.md5(
        F.array_join(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(analysis.TOKEN_REGEX_JAVA), F.lit(0)
            ),
            " ",
        )
    )
    w = Window.partitionBy("_fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_fp", fp)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def _token_sets(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(analysis.TOKEN_REGEX_JAVA), F.lit(0)
            )
        ).alias("toks"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_frac: float = 0.05,
    min_df_docs: int = 16,
) -> DataFrame:
    """Exact token-set Jaccard pairs >= threshold via inverted-index join.

    explode(distinct tokens) -> self-join on token -> |A∩B| = join count,
    |A∪B| = |A| + |B| - |A∩B|. Tokens shared by more than
    max(max_df_frac * n_docs, min_df_docs) documents are removed from the
    token UNIVERSE (set sizes and intersections both) — Jaccard over the
    discriminative tokens. Hot tokens are pure join-skew (they quadratically
    inflate the self-join while carrying no near-dup signal, being shared by
    everyone), so the cap is ON by default — on a web corpus a stop word
    alone makes the self-join quadratic in corpus size. The min_df_docs
    floor keeps small corpora intact (a 5%-of-20-docs cap would strip every
    token); pass max_df_frac=1.0 for the uncapped exact baseline.
    """
    tok = _token_sets(df, text_col, id_col).select("id", F.explode("toks").alias("tok"))
    if max_df_frac < 1.0:
        n_docs = df.count()
        cap = max(n_docs * max_df_frac, float(min_df_docs))
        hot = (
            tok.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > cap)
            .select("tok")
        )
        tok = tok.join(F.broadcast(hot), "tok", "left_anti")
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    tok = tok.join(sizes, "id")
    a = tok.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"), "tok")
    b = tok.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    j = F.col("i") / (F.col("n_a") + F.col("n_b") - F.col("i"))
    return (
        inter.where(j >= threshold)
        .select("id_a", "id_b", F.round(j, 4).alias("jaccard"))
    )


# ----------------------------------------------------------------- MinHash
def minhash_signatures(
    df: DataFrame,
    n_hashes: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, sig: array<long>) — vectorized numpy MinHash over token sets.

    Per-token base hash is splitmix64 of the token's md5 prefix (stable across
    runs/workers); the i-th permutation is splitmix64(base ^ seed_i). All
    Arrow-batched; no per-row Python. The kernel runs one 1D pass per
    permutation over the batch's occurrence array with reduceat over doc
    offsets — per-seed passes keep every intermediate at n_occurrences
    elements (never the (n_occ, n_hashes) matrix, which would be gigabytes
    for a 100k-row Arrow batch) and all buffers come from a grow-only pool
    (see _scratch: fresh large allocations fault at ~0.2 s/MB here).
    Measured 3.0x the per-doc-loop kernel steady-state (312k -> 938k
    tokens/s/core, BENCH.md §5).
    """
    ts = _token_sets(df, text_col, id_col)

    def sign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        seeds = _splitmix64_np(np.arange(1, n_hashes + 1, dtype=np.uint64))
        C1 = np.uint64(0x9E3779B97F4A7C15)
        M1 = np.uint64(0xBF58476D1CE4E5B9)
        M2 = np.uint64(0x94D049BB133111EB)
        pool: dict = {}
        for pdf in it:
            base, starts, lens = _batch_token_hashes(pdf["toks"], pool)
            sigs = np.full((len(pdf), n_hashes), (1 << 63) - 1, dtype=np.int64)
            if len(base):
                z = _scratch(pool, "z", len(base), np.uint64)
                t = _scratch(pool, "t", len(base), np.uint64)
                nz = lens > 0
                col = np.empty(len(starts), dtype=np.int64)
                for j in range(n_hashes):
                    # splitmix64(base ^ seed_j), all in-place
                    np.bitwise_xor(base, seeds[j], out=z)
                    np.add(z, C1, out=z)
                    np.right_shift(z, np.uint64(30), out=t)
                    np.bitwise_xor(z, t, out=z)
                    np.multiply(z, M1, out=z)
                    np.right_shift(z, np.uint64(27), out=t)
                    np.bitwise_xor(z, t, out=z)
                    np.multiply(z, M2, out=z)
                    np.right_shift(z, np.uint64(31), out=t)
                    np.bitwise_xor(z, t, out=z)
                    mins = np.minimum.reduceat(z, starts)
                    np.right_shift(mins, np.uint64(1), out=mins)
                    col[:] = mins.astype(np.int64)
                    sigs[nz, j] = col
            yield pd.DataFrame({"id": pdf["id"], "sig": list(sigs)})

    return ts.mapInPandas(sign, schema="id long, sig array<long>")


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    n_hashes: int = 64,
    band_rows: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash LSH candidates -> exact-Jaccard verify >= threshold.

    band/bucket shuffle key: with r=2, b=32, P(catch | j=0.7) ~ 1-1e-9, so at
    test scale the verified output equals the exact ngram_jaccard_pairs
    answer — the property the oracle checks. Candidate generation is linear
    per bucket instead of all-pairs.
    """
    sigs = minhash_signatures(df, n_hashes, text_col, id_col)
    n_bands = n_hashes // band_rows
    bands = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.xxhash64(F.slice("sig", bi * band_rows + 1, band_rows)).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bucket"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    ts = _token_sets(df, text_col, id_col)
    ta = ts.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    tb = ts.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    verified = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("toks_a", "toks_b"))
                / F.size(F.array_union("toks_a", "toks_b"))
            ).alias("j"),
        )
        .where(F.col("j") >= threshold)
        .select("id_a", "id_b", F.round("j", 4).alias("jaccard"))
    )
    return verified


# ----------------------------------------------------------------- SimHash
def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, sim: long) — 64-bit SimHash of the distinct-token feature set.

    The +/-1 bit-vote matrix is materialized in doc-aligned chunks of
    ~16k occurrences x 64 bits into pooled buffers — never the whole
    (n_occ, 64) batch matrix (gigabytes for a 100k-row Arrow batch, and
    fresh large allocations fault at ~0.2 s/MB here, see _scratch).
    Measured 2.4x the per-doc-loop kernel steady-state (528k -> 1.27M
    tokens/s/core, BENCH.md §5)."""
    ts = _token_sets(df, text_col, id_col)

    def sh(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ar = np.arange(64, dtype=np.uint64)
        CH = 16384  # occurrences per chunk; x64 x4B = 4 MB vote buffer
        pool: dict = {}
        for pdf in it:
            base, starts, lens = _batch_token_hashes(pdf["toks"], pool)
            out = np.zeros(len(pdf), dtype=np.uint64)
            if len(base):
                s2 = np.concatenate([starts, [len(base)]])
                votes = np.empty((len(starts), 64), dtype=np.int32)
                di = 0
                while di < len(starts):
                    # advance dj while the chunk fits; always take >= 1 doc
                    dj = di + 1
                    while dj < len(starts) and s2[dj + 1] - s2[di] <= CH:
                        dj += 1
                    lo, hi = s2[di], s2[dj]
                    u = _scratch(pool, "u", hi - lo, np.uint64, cols=64)
                    b = _scratch(pool, "b", hi - lo, np.int32, cols=64)
                    np.right_shift(base[lo:hi, None], ar[None, :], out=u)
                    np.bitwise_and(u, np.uint64(1), out=u)
                    np.multiply(u, np.uint64(2), out=u)
                    b[...] = u.astype(np.int32)  # 0/2
                    np.subtract(b, 1, out=b)  # -> -1/+1 votes (int32: a doc
                    # may have up to 2^31 occurrences before overflow)
                    votes[di:dj] = np.add.reduceat(b, s2[di:dj] - lo, axis=0)
                    di = dj
                out[lens > 0] = ((votes > 0).astype(np.uint64) << ar[None, :]).sum(axis=1)
            yield pd.DataFrame({"id": pdf["id"], "sim": out.view(np.int64)})

    return ts.mapInPandas(sh, schema="id long, sim long")


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming (<= 3 guaranteed
    complete by 4x16-bit banding; larger radii are best-effort)."""
    sh = simhash(df, text_col, id_col)
    bands = sh.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sim", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "sim", "bb.band", "bb.bucket")
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bucket"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.sim").alias("sa"),
            F.col("y.sim").alias("sb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


# ------------------------------------------------------------- embeddings
def cosine_expr(a, b):
    """Cosine similarity of two array<float/double> columns, all JVM-side."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(da, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(db, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.45,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine near-dup pairs (the oracle baseline; the LSH-bucketed
    scale path lives in similarity.random_hyperplane_buckets)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    cos = cosine_expr(F.col("va"), F.col("vb"))
    return (
        pairs.select("id_a", "id_b", cos.alias("c"))
        .where(F.col("c") >= threshold)
        .select("id_a", "id_b", F.round("c", 4).alias("cosine"))
    )
