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
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import analysis, codec, scoring
from ..sources.segment_store import SegmentMeta, SegmentStore

BLOCK_RANGE = 4096  # ordinals per postings block

DOC_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("bk", T.IntegerType()),  # block key = ordinal // BLOCK_RANGE
        T.StructField("n", T.IntegerType()),  # postings in block
        T.StructField("max_tf", T.IntegerType()),
        T.StructField("min_dlq", T.LongType()),  # min quantized dl in block
        T.StructField("docs", T.BinaryType()),  # delta+varbyte ordinals
        T.StructField("tfs", T.BinaryType()),  # varbyte tfs
        T.StructField("norms", T.BinaryType()),  # byte4 norm per posting
    ]
)

# byte4-encode SQL (storage form of the norm, 1 byte/doc like Lucene norms)
_NORM_BYTE_SQL = (
    "case when dl < 8 then dl else "
    "((shiftright(cast(dl as bigint), cast(floor(log2(cast(dl as double))) as int) - 3) & 7) "
    "| shiftleft(cast(floor(log2(cast(dl as double))) as int) - 2, 3)) end"
)


def assign_ordinals(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Add a dense 0-based `ordinal` in (conv_id, turn_idx) order.

    Range-partition -> per-partition row_number -> broadcast cumulative
    offsets. Only the tiny per-partition counts hit the driver.
    """
    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.repartitionByRange(p, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r._pid: r.c for r in base.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(int(k), int(v)) for k, v in offsets.items()], "_pid int, _off long"
        )
    )
    w = Window.partitionBy("_pid").orderBy("conv_id", "turn_idx")
    out = (
        base.withColumn("_rn", F.row_number().over(w))
        .join(off_df, "_pid")
        .withColumn("ordinal", (F.col("_rn") - 1 + F.col("_off")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )
    return out


def _encode_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encode (term, bk, ordinal, tf, norm) rows -> one row per (term, block).

    Input partitions are hash-partitioned by (term, bk) and sorted by
    (term, bk, ordinal); Arrow may split a group across batches, so buffer
    rows until the (term, bk) key changes.
    """
    import numpy as np

    decode_tbl = np.array([scoring.byte4_to_int(b) for b in range(256)], dtype=np.int64)
    buf: list[pd.DataFrame] = []

    def flush(pdf: pd.DataFrame, complete_only: bool):
        out_rows = []
        if pdf.empty:
            return pdf.iloc[0:0], None
        last_key = (pdf["term"].iloc[-1], int(pdf["bk"].iloc[-1]))
        for (term, bk), g in pdf.groupby(["term", "bk"], sort=True):
            if complete_only and (term, int(bk)) == last_key:
                continue
            ords = g["ordinal"].to_numpy()
            order = np.argsort(ords, kind="stable")
            ords = ords[order]
            tfs = g["tf"].to_numpy()[order]
            norms = g["norm"].to_numpy()[order].astype(np.uint8)
            dlqs = decode_tbl[norms]
            out_rows.append(
                {
                    "term": term,
                    "bk": int(bk),
                    "n": len(ords),
                    "max_tf": int(tfs.max()),
                    "min_dlq": int(dlqs.min()),
                    "docs": codec.delta_encode(ords),
                    "tfs": codec.varbyte_encode(tfs),
                    "norms": norms.tobytes(),
                }
            )
        if complete_only:
            remainder = pdf[(pdf["term"] == last_key[0]) & (pdf["bk"] == last_key[1])]
        else:
            remainder = pdf.iloc[0:0]
        out = pd.DataFrame(
            out_rows,
            columns=["term", "bk", "n", "max_tf", "min_dlq", "docs", "tfs", "norms"],
        )
        return remainder, out

    for batch in it:
        buf.append(batch)
        merged = pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0]
        # flush only when we have multiple (term,bk) groups buffered
        remainder, out = flush(merged, complete_only=True)
        if out is not None and len(out):
            yield out
        buf = [remainder]
    if buf and len(buf[0]):
        _, out = flush(buf[0], complete_only=False)
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
    docs = docs.withColumn("dl", analysis.token_count("text")).withColumn(
        "norm", F.expr(_NORM_BYTE_SQL).cast("int")
    )
    docs.persist()

    (
        docs.select("ordinal", *DOC_COLS, "dl", "norm")
        .repartitionByRange(max(1, docs.sparkSession.sparkContext.defaultParallelism // 4), "ordinal")
        .sortWithinPartitions("ordinal")
        .write.mode("overwrite")
        .parquet(store.docs_path(seg_id))
    )

    tf = (
        docs.select("ordinal", "norm", F.explode(analysis.tokens("text")).alias("term"))
        .groupBy("term", "ordinal", "norm")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bk", (F.col("ordinal") / BLOCK_RANGE).cast("int"))
    )
    p = partitions or spark.sparkContext.defaultParallelism
    postings = (
        tf.repartition(p, "term", "bk")
        .sortWithinPartitions("term", "bk", "ordinal")
        .mapInPandas(_encode_partition, schema=POSTINGS_SCHEMA)
    )
    (
        postings.repartitionByRange(max(1, p // 4), "term", "bk")
        .sortWithinPartitions("term", "bk")
        .write.mode("overwrite")
        .parquet(store.postings_path(seg_id))
    )

    n_docs, sum_dl = docs.agg(F.count(F.lit(1)), F.coalesce(F.sum("dl"), F.lit(0))).first()
    docs.unpersist()
    meta = SegmentMeta(
        segment_id=seg_id,
        n_docs=int(n_docs),
        sum_dl=int(sum_dl),
        slice_id=slice_id,
        tier_bytes=store.dir_size(seg_id),
        metrics={"partitions": p},
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
