"""spark-submit entrypoints (north rule: runs via spark-submit --py-files
on multi-executor clusters).

Package and launch:

    cd /root/repo && zip -qr /tmp/es_spark.zip elasticsearch_spark
    spark-submit --py-files /tmp/es_spark.zip \
        --conf spark.sql.shuffle.partitions=<4x total cores> \
        elasticsearch_spark/cli.py build \
        --input /data/transcripts_parquet --store /data/index --slices 64

Subcommands:
    build      transcripts parquet -> segment store (resumable: rerun with
               --resume to skip committed slices)
    merge      tiered LSM compaction to fixpoint
    search     run an ES-style query JSON against the store, print top-k
    update-by-query / delete-by-query
    stream     Structured Streaming ingest from an arriving-files directory

The session is taken from spark-submit (`getOrCreate`); nothing here assumes
local mode.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv=None):
    p = argparse.ArgumentParser(prog="elasticsearch-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True, help="transcripts parquet path")
    b.add_argument("--store", required=True, help="segment store root")
    b.add_argument("--slices", type=int, default=1)
    b.add_argument("--partitions", type=int, default=None)
    b.add_argument("--resume", action="store_true")

    m = sub.add_parser("merge")
    m.add_argument("--store", required=True)
    m.add_argument("--partitions", type=int, default=None)

    s = sub.add_parser("search")
    s.add_argument("--store", required=True)
    s.add_argument("--query", required=True, help="ES query dict as JSON")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--snapshot", type=int, default=None)

    u = sub.add_parser("update-by-query")
    u.add_argument("--store", required=True)
    u.add_argument("--where", required=True, help="SQL predicate")
    u.add_argument("--set", required=True, help='JSON {"col": "sql expr"}')
    u.add_argument("--old-source", action="store_true")
    u.add_argument("--new-source", action="store_true")

    d = sub.add_parser("delete-by-query")
    d.add_argument("--store", required=True)
    d.add_argument("--where", required=True)

    st = sub.add_parser("stream")
    st.add_argument("--input", required=True, help="arriving-files directory")
    st.add_argument("--store", required=True)
    st.add_argument("--checkpoint", required=True)
    st.add_argument("--continuous", action="store_true", help="1s refresh cadence instead of AvailableNow")

    args = p.parse_args(argv)
    spark = SparkSession.builder.appName(f"es-spark-{args.cmd}").getOrCreate()

    from .operators import index_build, merge as merge_op, topk, update
    from .sources.segment_store import SegmentStore

    if args.cmd == "build":
        df = spark.read.parquet(args.input)
        store = index_build.build_index(
            spark, df, args.store, n_slices=args.slices,
            resume=args.resume, partitions=args.partitions,
        )
        snap = store.snapshot()
        print(json.dumps({"snapshot": snap.snapshot_id, "segments": len(snap.segments),
                          "n_docs": snap.n_docs}))
    elif args.cmd == "merge":
        store = SegmentStore(args.store)
        n = merge_op.compact(spark, store, partitions=args.partitions)
        print(json.dumps({"merges": n, "segments": len(store.snapshot().segments)}))
    elif args.cmd == "search":
        store = SegmentStore(args.store)
        out = topk.search_indexed(
            spark, store, json.loads(args.query), k=args.k, snapshot_id=args.snapshot
        )
        for r in out.collect():
            print(json.dumps({"conv_id": r.conv_id, "turn_idx": r.turn_idx, "score": r.score}))
    elif args.cmd == "update-by-query":
        store = SegmentStore(args.store)
        res = update.update_by_query(
            spark, store, args.where, json.loads(getattr(args, "set")),
            req_old_source=args.old_source, req_new_source=args.new_source,
        )
        print(json.dumps({"updated": res.n_updated, "before": res.before_snapshot,
                          "after": res.after_snapshot}))
        for label, df in (("req_old_source", res.old_source), ("req_new_source", res.new_source)):
            if df is not None:
                print(label, json.dumps([r.asDict(recursive=True) for r in df.collect()], default=str))
    elif args.cmd == "delete-by-query":
        store = SegmentStore(args.store)
        n, snap_id = update.delete_by_query(spark, store, args.where)
        print(json.dumps({"deleted": n, "snapshot": snap_id}))
    elif args.cmd == "stream":
        from .streaming import ingest as sti

        q = sti.stream_ingest(
            spark, args.input, args.store, args.checkpoint,
            available_now=not args.continuous,
        )
        q.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
