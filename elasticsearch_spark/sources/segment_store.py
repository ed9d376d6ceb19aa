"""SegmentStore — an Iceberg-style snapshot/manifest table format on parquet.

Plays the role of ES's translog-checkpoint + Lucene segment files
(index/translog/Checkpoint.java:43-106; segments created by refresh at
InternalEngine.java:889-968) AND of Iceberg snapshots for time-travel:

  <root>/
    CURRENT                      -> current snapshot id (atomic rename write)
    snapshots/v{n}.json          -> manifest: live segments + delete files +
                                    per-segment lineage/metrics (resumability)
    seg_<id>/docs.parquet        -> ordinal, conv_id, turn_idx, role, text,
                                    tool, ts, dl, norm  (sorted by ordinal)
    seg_<id>/postings.parquet    -> term, df, cf, max_tf, blocks[...]
    deletes/<id>.parquet         -> (segment string, ordinal long) positional
                                    deletes (Lucene liveDocs analog)

Commit protocol (mirrors Iceberg): write all data files, write the new
snapshot json, then atomically swap CURRENT via os.rename. A killed build
leaves CURRENT at the previous snapshot => resumable, never corrupt.

On a real deployment this module is swapped for Iceberg catalog calls
(writeTo(...).append() / MERGE INTO / VERSION AS OF); the sandbox has no
Iceberg runtime jars, so the same semantics are implemented on plain parquet.
Everything above this layer (indexer, queries, updates) is storage-agnostic.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any


@dataclass
class SegmentMeta:
    segment_id: str
    n_docs: int
    sum_dl: int
    slice_id: str  # lineage: which input slice produced this segment
    tier_bytes: int = 0  # on-disk size, drives LSM tier selection
    metrics: dict[str, Any] = field(default_factory=dict)
    # constituent input slices carried through merges: a merged segment keeps
    # every original slice_id so completed_slices() (idempotent-replay guard
    # for streaming/resume) still recognizes them after compaction rewrites
    # slice_id to "merge(...)".
    source_slices: list[str] = field(default_factory=list)
    # per-indexed-field token-count sums (BM25 avgdl numerators); sum_dl stays
    # the `text` field's for manifest back-compat.
    field_sum_dl: dict[str, int] = field(default_factory=dict)

    @property
    def effective_slices(self) -> set[str]:
        out = set(self.source_slices)
        if self.slice_id and not self.slice_id.startswith("merge("):
            out.add(self.slice_id)
        return out

    def to_json(self) -> dict:
        return self.__dict__.copy()

    @staticmethod
    def from_json(d: dict) -> "SegmentMeta":
        return SegmentMeta(**d)


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    operation: str  # "append" | "merge" | "update" | "delete"
    segments: list[SegmentMeta]
    delete_files: list[str]
    committed_at: float
    summary: dict[str, Any] = field(default_factory=dict)

    @property
    def n_docs(self) -> int:
        return sum(s.n_docs for s in self.segments)

    @property
    def sum_dl(self) -> int:
        return sum(s.sum_dl for s in self.segments)

    def field_sum_dl(self, field_name: str) -> int:
        """Per-field sum of token counts (falls back to sum_dl for `text` on
        manifests written before multi-field indexing)."""
        return sum(
            s.field_sum_dl.get(field_name, s.sum_dl if field_name == "text" else 0)
            for s in self.segments
        )


class SegmentStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(root, "deletes"), exist_ok=True)

    # ------------------------------------------------------------ snapshots
    def current_snapshot_id(self) -> int | None:
        p = os.path.join(self.root, "CURRENT")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def snapshot(self, snapshot_id: int | None = None) -> Snapshot | None:
        """Read a snapshot (time-travel: pass an older id == VERSION AS OF)."""
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
        if sid is None:
            return None
        with open(os.path.join(self.root, "snapshots", f"v{sid}.json")) as f:
            d = json.load(f)
        return Snapshot(
            snapshot_id=d["snapshot_id"],
            parent_id=d["parent_id"],
            operation=d["operation"],
            segments=[SegmentMeta.from_json(s) for s in d["segments"]],
            delete_files=d["delete_files"],
            committed_at=d["committed_at"],
            summary=d.get("summary", {}),
        )

    def history(self) -> list[int]:
        out = []
        for name in os.listdir(os.path.join(self.root, "snapshots")):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def commit(
        self,
        segments: list[SegmentMeta],
        operation: str,
        delete_files: list[str] | None = None,
        summary: dict | None = None,
    ) -> Snapshot:
        """Atomically publish a new snapshot with the given live set."""
        parent = self.current_snapshot_id()
        sid = (parent or 0) + 1
        snap = {
            "snapshot_id": sid,
            "parent_id": parent,
            "operation": operation,
            "segments": [s.to_json() for s in segments],
            "delete_files": delete_files or [],
            "committed_at": time.time(),
            "summary": summary or {},
        }
        spath = os.path.join(self.root, "snapshots", f"v{sid}.json")
        with open(spath, "w") as f:
            json.dump(snap, f, indent=1)
        tmp = os.path.join(self.root, f".CURRENT.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(sid))
        os.rename(tmp, os.path.join(self.root, "CURRENT"))  # atomic swap
        return self.snapshot(sid)

    # ------------------------------------------------------------ file paths
    def new_segment_id(self) -> str:
        return f"seg_{uuid.uuid4().hex[:12]}"

    def segment_dir(self, segment_id: str) -> str:
        return os.path.join(self.root, segment_id)

    def docs_path(self, segment_id: str) -> str:
        return os.path.join(self.root, segment_id, "docs.parquet")

    def postings_path(self, segment_id: str) -> str:
        return os.path.join(self.root, segment_id, "postings.parquet")

    def term_stats_path(self, segment_id: str) -> str:
        """Per-segment term dictionary (term, df, cf) — the Lucene terms-dict
        metadata analog; makes the query stats phase a pruned point read."""
        return os.path.join(self.root, segment_id, "term_stats.parquet")

    def dv_stats_path(self, segment_id: str) -> str:
        """Per-segment numeric doc-value block index (col, val, bk) sorted by
        (col, val) — the Lucene BKD-points analog (ES answers numeric ranges
        from points, index/mapper/NumberFieldMapper.java): a range query reads
        this tiny value-sorted table with the range pushed down and gets the
        candidate ordinal blocks, instead of scanning the docs tables."""
        return os.path.join(self.root, segment_id, "dv_stats.parquet")

    def new_delete_file(self) -> str:
        return os.path.join(self.root, "deletes", f"del_{uuid.uuid4().hex[:12]}.parquet")

    # ------------------------------------------------------------ retention
    def expire_snapshots(self, keep_last: int = 1) -> list[str]:
        """Iceberg expire_snapshots analog: drop all but the newest
        `keep_last` snapshots and DELETE segment dirs / delete files no
        longer referenced by any retained snapshot. Returns removed paths."""
        import shutil

        ids = self.history()
        if len(ids) <= keep_last:
            return []
        keep_ids = set(ids[-keep_last:])
        keep_segs: set[str] = set()
        keep_dels: set[str] = set()
        for sid in keep_ids:
            snap = self.snapshot(sid)
            keep_segs.update(s.segment_id for s in snap.segments)
            keep_dels.update(snap.delete_files)
        removed: list[str] = []
        for sid in ids:
            if sid in keep_ids:
                continue
            snap = self.snapshot(sid)
            for s in snap.segments:
                if s.segment_id not in keep_segs:
                    d = self.segment_dir(s.segment_id)
                    if os.path.isdir(d):
                        shutil.rmtree(d, ignore_errors=True)
                        removed.append(d)
                        keep_segs.add(s.segment_id)  # don't re-remove
            for df in snap.delete_files:
                if df not in keep_dels and os.path.exists(df):
                    os.remove(df)
                    removed.append(df)
                    keep_dels.add(df)
            os.remove(os.path.join(self.root, "snapshots", f"v{sid}.json"))
        return removed

    # ------------------------------------------------------------ lineage
    def completed_slices(self) -> set[str]:
        """Slice ids already committed (resume support: skip finished slices).

        Unions each segment's constituent slices so a post-merge replay of an
        already-indexed micro-batch / build slice is still skipped (the
        exactly-once guard survives compaction)."""
        snap = self.snapshot()
        if snap is None:
            return set()
        out: set[str] = set()
        for s in snap.segments:
            out |= s.effective_slices
            if s.slice_id:
                out.add(s.slice_id)
        return out

    def dir_size(self, segment_id: str) -> int:
        total = 0
        d = self.segment_dir(segment_id)
        for base, _, files in os.walk(d):
            total += sum(os.path.getsize(os.path.join(base, f)) for f in files)
        return total
