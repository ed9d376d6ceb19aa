"""Inverted-index build: transcripts DataFrame -> segment tables.

Spark shape (SURVEY.md §3.2): tokenize (JVM regex) -> explode -> tf per
(term, doc) -> shuffle by (term, block) -> encode delta+varbyte postings in
bounded Arrow kernels -> write sorted segment parquet + manifest checkpoint.

Scale design decisions:
  * Doc ordinals: dense per segment, assigned by range-repartition on the doc
    key + per-partition row_number + broadcast partition offsets — stable
    under repartitioning, never monotonically_increasing_id (SURVEY §7).
  * Postings blocks are FIXED ORDINAL RANGES (BLOCK_RANGE ordinals), not fixed
    posting counts: every pandas group is <= BLOCK_RANGE rows, so a hot term
    ("the", df=every doc) is automatically split across (term, block) shuffle
    keys — the salted-key skew handling the north rule asks for, with the salt
    being the block id, and block-max metadata stays exact after any merge.
  * Encoding runs in mapInPandas over partitions sorted by (term, block):
    one Arrow pass, vectorized numpy codec, no per-row Python.
  * A segment is the unit of resumability: one committed snapshot per input
    slice (ES translog-checkpoint analog, Checkpoint.java:43-106); a killed
    build resumes by skipping slice_ids already in the manifest.

Per-block metadata for block-max WAND (TopDocsCollectorContext.java:212-296
enables the threshold; skipping machinery is Lucene impacts): max_tf and
min_dlq (the quantized length minimizing the BM25 norm) give an exact upper
bound for the block's best score at query time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import analysis, codec, scoring
from ..sources.segment_store import SegmentMeta, SegmentStore

BLOCK_RANGE = 4096  # ordinals per postings block

DOC_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

# fields with full-text postings (DOCS_AND_FREQS_AND_POSITIONS). The reference
# indexes every mapped text field into the same per-segment inverted index
# (index/mapper/TextFieldMapper.java); here `text` is the body and `tool` the
# secondary match/multi_match-able field. Keyword-style filters (role, tool
# equality, turn_idx ranges) stay on the docs tables = the doc-values path.
INDEXED_FIELDS = ["text", "tool"]


def dl_col(f: str) -> str:
    return "dl" if f == "text" else f"dl_{f}"


def norm_col(f: str) -> str:
    return "norm" if f == "text" else f"norm_{f}"


POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType()),
        T.StructField("term", T.StringType()),
        T.StructField("bk", T.IntegerType()),  # block key = ordinal // BLOCK_RANGE
        T.StructField("n", T.IntegerType()),  # postings in block
        T.StructField("max_tf", T.IntegerType()),
        T.StructField("min_dlq", T.LongType()),  # min quantized dl in block
        T.StructField("docs", T.BinaryType()),  # delta+varbyte ordinals
        T.StructField("tfs", T.BinaryType()),  # varbyte tfs
        T.StructField("norms", T.BinaryType()),  # byte4 norm per posting
        # token positions (DOCS_AND_FREQS_AND_POSITIONS, TextFieldMapper.java:341):
        # per posting, tf positions delta+varbyte encoded; postings concatenated
        # in block order — the tf stream gives the split offsets
        T.StructField("poss", T.BinaryType()),
    ]
)

# byte4-encode SQL (storage form of the norm, 1 byte/doc like Lucene norms)
def _norm_byte_sql(dl: str = "dl") -> str:
    return (
        f"case when {dl} < 8 then {dl} else "
        f"((shiftright(cast({dl} as bigint), cast(floor(log2(cast({dl} as double))) as int) - 3) & 7) "
        f"| shiftleft(cast(floor(log2(cast({dl} as double))) as int) - 2, 3)) end"
    )


_NORM_BYTE_SQL = _norm_byte_sql("dl")


def assign_ordinals(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Add a dense 0-based `ordinal` in (conv_id, turn_idx) order.

    Range-partition + sort once, cache, collect only per-partition COUNTS
    (tiny), then stamp ordinal = partition offset + running row index in a
    zero-shuffle Arrow pass over the already-sorted cached partitions. A
    row_number window here would shuffle AND re-sort the whole table a second
    time (Spark cannot see the existing sort) — measured 3x slower. Never
    monotonically_increasing_id: offsets derive from deterministic key ranges,
    stable under recompute (SURVEY.md §7 hard part).
    """
    from pyspark import StorageLevel

    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.repartitionByRange(p, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        r._pid: r.c
        for r in base.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(list(base.schema.fields) + [T.StructField("ordinal", T.LongType())])

    def stamp(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        off = offsets.get(TaskContext.get().partitionId(), 0)
        for pdf in it:
            n = len(pdf)
            pdf = pdf.copy(deep=False)
            pdf["ordinal"] = range(off, off + n)
            off += n
            yield pdf

    return base.mapInPandas(stamp, schema=out_schema)


def _encode_runs(pdf: pd.DataFrame, hold_last: bool):
    """Vectorized encode of raw token rows sorted by (term, bk, ordinal).

    Input rows are one per TOKEN OCCURRENCE (term, bk, ordinal, norm) — tf is
    the count of adjacent duplicates, aggregated here instead of by a groupBy
    upstream, saving a full shuffle of the exploded tokens. Block groups are
    contiguous runs (the shuffle sorted within partitions), so boundaries come
    from neighbor comparison — no pandas groupby, no per-row Python beyond
    three bytes slices per block. Returns (encoded DataFrame | None, remainder
    rows of the trailing possibly-incomplete group).
    """
    import numpy as np

    empty = pdf.iloc[0:0]
    if pdf.empty:
        return None, empty
    fld = pdf["field"].to_numpy(dtype=object)
    term = pdf["term"].to_numpy(dtype=object)
    bk = pdf["bk"].to_numpy(dtype=np.int64)
    new_run = np.empty(len(pdf), dtype=bool)
    new_run[0] = True
    new_run[1:] = (fld[1:] != fld[:-1]) | (term[1:] != term[:-1]) | (bk[1:] != bk[:-1])
    starts = np.flatnonzero(new_run)
    if hold_last:
        if len(starts) == 1:
            return None, pdf  # single (possibly incomplete) group: buffer all
        cut = int(starts[-1])
        remainder = pdf.iloc[cut:]
        pdf = pdf.iloc[:cut]
        fld, term, bk = fld[:cut], term[:cut], bk[:cut]
        starts = starts[:-1]
    else:
        remainder = empty

    ords = pdf["ordinal"].to_numpy(dtype=np.int64)
    norms = pdf["norm"].to_numpy().astype(np.uint8)
    poss = pdf["pos"].to_numpy(dtype=np.int64)
    decode_tbl = np.array([scoring.byte4_to_int(b) for b in range(256)], dtype=np.int64)

    # collapse duplicate (term, bk, ordinal) occurrences into postings with tf
    new_post = np.empty(len(pdf), dtype=bool)
    new_post[0] = True
    new_post[1:] = (ords[1:] != ords[:-1]) | new_run[1 : len(pdf)]
    new_post[starts] = True
    post_starts = np.flatnonzero(new_post)
    tfs = np.diff(np.append(post_starts, len(pdf)))
    p_ords = ords[post_starts]
    p_norms = norms[post_starts]
    # group boundaries in posting index space (every run start is a posting start)
    g_starts = np.searchsorted(post_starts, starts)
    g_ends = np.append(g_starts[1:], len(post_starts))

    # per-run delta of ordinals (run heads keep their absolute ordinal)
    deltas = np.diff(p_ords, prepend=np.int64(0))
    deltas[g_starts] = p_ords[g_starts]
    docs_buf, docs_nb = codec.varbyte_encode_sized(deltas.astype(np.uint64))
    tfs_buf, tfs_nb = codec.varbyte_encode_sized(tfs.astype(np.uint64))
    # positions: delta within each posting (input sorted by pos inside each
    # (term, bk, ordinal) run; posting heads keep their absolute position)
    pos_deltas = np.diff(poss, prepend=np.int64(0))
    pos_deltas[post_starts] = poss[post_starts]
    poss_buf, poss_nb = codec.varbyte_encode_sized(pos_deltas.astype(np.uint64))
    docs_off = np.concatenate([[0], np.cumsum(docs_nb)])
    tfs_off = np.concatenate([[0], np.cumsum(tfs_nb)])
    poss_off = np.concatenate([[0], np.cumsum(poss_nb)])
    docs_all, tfs_all = docs_buf.tobytes(), tfs_buf.tobytes()
    poss_all = poss_buf.tobytes()
    norms_all = p_norms.tobytes()
    # positions byte-range per block spans occurrence rows [starts, ends)
    ends_occ = np.append(starts[1:], len(pdf))

    out = pd.DataFrame(
        {
            "field": fld[starts],
            "term": term[starts],
            "bk": bk[starts].astype(np.int32),
            "n": (g_ends - g_starts).astype(np.int32),
            "max_tf": np.maximum.reduceat(tfs, g_starts).astype(np.int32),
            "min_dlq": np.minimum.reduceat(decode_tbl[p_norms], g_starts),
            "docs": [docs_all[docs_off[s] : docs_off[e]] for s, e in zip(g_starts, g_ends)],
            "tfs": [tfs_all[tfs_off[s] : tfs_off[e]] for s, e in zip(g_starts, g_ends)],
            "norms": [norms_all[s:e] for s, e in zip(g_starts, g_ends)],
            "poss": [poss_all[poss_off[s] : poss_off[e]] for s, e in zip(starts, ends_occ)],
        }
    )
    return out, remainder


def _encode_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encode (term, bk, ordinal, tf, norm) rows -> one row per (term, block).

    Input partitions are hash-partitioned by (term, bk) and sorted by
    (term, bk, ordinal); Arrow may split a run across batches, so the trailing
    group of each batch is buffered until the key changes.
    """
    pending: pd.DataFrame | None = None
    for batch in it:
        pdf = (
            pd.concat([pending, batch], ignore_index=True)
            if pending is not None and len(pending)
            else batch
        )
        out, pending = _encode_runs(pdf, hold_last=True)
        if out is not None and len(out):
            yield out
    if pending is not None and len(pending):
        out, _ = _encode_runs(pending, hold_last=False)
        if out is not None and len(out):
            yield out


def build_segment(
    spark: SparkSession,
    store: SegmentStore,
    slice_df: DataFrame,
    slice_id: str,
    partitions: int | None = None,
) -> SegmentMeta:
    """Build one immutable segment (docs + postings) from a transcripts slice."""
    seg_id = store.new_segment_id()
    docs = assign_ordinals(slice_df, partitions)
    for f in INDEXED_FIELDS:
        # dl NULL (field absent) stays NULL: absent fields contribute no
        # postings and are excluded from the field's sum_dl, mirroring the
        # logical path's corpus_stats (sum skips NULL token arrays).
        docs = docs.withColumn(dl_col(f), analysis.token_count(f)).withColumn(
            norm_col(f), F.expr(_norm_byte_sql(dl_col(f))).cast("int")
        )
    docs.persist()

    extra_cols = [c for f in INDEXED_FIELDS for c in (dl_col(f), norm_col(f))]
    # assign_ordinals output is already range-partitioned by (conv_id,
    # turn_idx) == ordinal order; write directly (no extra shuffle/sample job),
    # files stay ordinal-sorted for row-group pruning on fetch.
    (
        docs.select("ordinal", *DOC_COLS, *extra_cols)
        .write.mode("overwrite")
        .parquet(store.docs_path(seg_id))
    )

    # ONE shuffle for the whole postings build: raw token occurrences are
    # hash-repartitioned by (field, term, bk) and sorted; tf is the count of
    # adjacent duplicate ordinals, aggregated inside the Arrow encoder (a
    # groupBy here would add a second full shuffle for ~25% less shuffle
    # volume — a loss). The bk component of the key IS the salt for hot
    # terms: a term with df = all docs spreads over n_docs/BLOCK_RANGE keys
    # (north_rule's salted-key skew handling), and block-max metadata stays
    # exact. All indexed fields ride the same shuffle (field is just a key
    # prefix), like Lucene's single per-segment terms dictionary.
    occ = None
    for f in INDEXED_FIELDS:
        o = (
            docs.select(
                "ordinal",
                F.lit(f).alias("field"),
                F.col(norm_col(f)).alias("norm"),
                F.posexplode(analysis.tokens(f)).alias("pos", "term"),
            )
            .withColumn("bk", (F.col("ordinal") / BLOCK_RANGE).cast("int"))
        )
        occ = o if occ is None else occ.unionByName(o)
    p = partitions or spark.sparkContext.defaultParallelism
    postings = (
        occ.repartition(p, "field", "term", "bk")
        .sortWithinPartitions("field", "term", "bk", "ordinal", "pos")
        .mapInPandas(_encode_partition, schema=POSTINGS_SCHEMA)
    )
    # write straight from the encode pass: files are (field, term, bk)-sorted
    # within each hash partition, so parquet row-group min/max stats prune term
    # scans; a range repartition here would re-run the whole encode chain to
    # sample.
    postings.write.mode("overwrite").parquet(store.postings_path(seg_id))

    # term dictionary: (field, term, df) aggregated from the written postings
    # (cheap columnar re-read of small columns) — query-time stats become a
    # term-pruned point read instead of a per-query aggregation job.
    written = spark.read.parquet(store.postings_path(seg_id))
    (
        written.groupBy("field", "term")
        .agg(
            F.sum("n").alias("df"),
            F.sum("max_tf").alias("cf_ub"),  # upper bound; exact cf needs tf sums
        )
        .sortWithinPartitions("field", "term")
        .write.mode("overwrite")
        .parquet(store.term_stats_path(seg_id))
    )

    sums = docs.agg(
        F.count(F.lit(1)),
        *[F.coalesce(F.sum(dl_col(f)), F.lit(0)) for f in INDEXED_FIELDS],
    ).first()
    n_docs = int(sums[0])
    field_sum_dl = {f: int(sums[1 + i]) for i, f in enumerate(INDEXED_FIELDS)}
    docs.unpersist()
    meta = SegmentMeta(
        segment_id=seg_id,
        n_docs=n_docs,
        sum_dl=field_sum_dl["text"],
        slice_id=slice_id,
        tier_bytes=store.dir_size(seg_id),
        metrics={"partitions": p},
        field_sum_dl=field_sum_dl,
    )
    return meta


def build_index(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    n_slices: int = 1,
    resume: bool = False,
    partitions: int | None = None,
    fail_after_slices: int | None = None,
) -> SegmentStore:
    """Full index build, one committed snapshot per slice (resumable).

    Slices are deterministic hash buckets of conv_id (ES routing analog:
    floorMod(hash(routing), shards), OperationRouting.java:283-310).
    `fail_after_slices` simulates a mid-build crash for resume tests.
    """
    store = SegmentStore(root)
    done = store.completed_slices() if resume else set()
    built = 0
    for i in range(n_slices):
        slice_id = f"slice_{i:04d}_of_{n_slices}"
        if slice_id in done:
            continue
        part = df.where(F.pmod(F.xxhash64("conv_id"), F.lit(n_slices)) == i) if n_slices > 1 else df
        meta = build_segment(spark, store, part, slice_id, partitions)
        snap = store.snapshot()
        live = (snap.segments if snap else []) + [meta]
        dels = snap.delete_files if snap else []
        store.commit(live, "append", delete_files=dels, summary={"slice": slice_id})
        built += 1
        if fail_after_slices is not None and built >= fail_after_slices:
            break
    return store
