"""Indexed top-k search: postings scan -> block-max pruned scoring kernel ->
per-partition heaps -> global merge.

Direct analog of the reference's query-then-fetch (SURVEY.md §3.1):
  1. term stats lookup (global N/avgdl from the manifest, df(term) from a
     term-pruned postings aggregate) — the DFS/stats phase,
  2. per-(segment, bucket) Arrow kernel scores candidates with BM25 and prunes
     whole ordinal-range blocks whose upper bound can't reach the running
     threshold — block-max WAND/MaxScore semantics
     (TopDocsCollectorContext.java:212-296 + Lucene impacts, re-expressed on a
     fixed ordinal-range block grid so the bound math is fully vectorized),
  3. tiny per-group top-k unions merged by a global orderBy/limit — the
     SearchPhaseController.java:154-243 shard-merge analog,
  4. fetch phase = broadcast join of <= buckets*k winners back to the docs
     tables for (conv_id, turn_idx) (+ any _source columns).

Filter / must_not clauses become allow/deny ordinal sets computed by a
predicate-pushdown scan of the docs tables, cogrouped into the kernel —
ES filter-context: no score contribution, pure candidate masking. Positional
deletes from updates are a deny set the same way (Lucene liveDocs analog).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import analysis, scoring
from ..sources.segment_store import SegmentStore, Snapshot
from .index_build import BLOCK_RANGE

BUCKET_BLOCKS = 64  # blocks per kernel group: intra-segment parallelism unit


@dataclass
class TermGroup:
    """One scoring clause: doc must match >= need of the group's terms
    (need=0: optional, scores only; forbidden: doc must match none)."""

    terms: list[str]
    need: int = 1
    forbidden: bool = False
    weighted: bool = True  # contribute BM25 score


@dataclass
class PhraseGroup:
    """Exact-adjacency phrase (match_phrase slop=0): doc must contain the
    terms at consecutive positions; scores idf_sum * BM25-saturated phrase
    freq (the logical path's formula, plans/query_dsl._match_phrase)."""

    terms: list[str]
    weight: float = 0.0  # idf sum over distinct terms


@dataclass
class KernelSpec:
    groups: list[TermGroup]
    weights: dict[str, float]  # term -> idf
    avgdl: float
    k: int
    score_filtered_zero: bool = False  # bool-with-only-filters semantics
    phrases: list[PhraseGroup] = None  # positions-verified clauses

    @property
    def all_terms(self) -> list[str]:
        out: list[str] = []
        for g in self.groups:
            out.extend(g.terms)
        return sorted(set(out))


def read_segment_postings(
    spark: SparkSession, store: SegmentStore, snap: Snapshot, terms: list[str]
) -> DataFrame:
    parts = []
    for seg in snap.segments:
        parts.append(
            spark.read.parquet(store.postings_path(seg.segment_id))
            .where(F.col("term").isin(terms))
            .withColumn("segment", F.lit(seg.segment_id))
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def read_segment_docs(spark: SparkSession, store: SegmentStore, snap: Snapshot) -> DataFrame:
    parts = []
    for seg in snap.segments:
        parts.append(
            spark.read.parquet(store.docs_path(seg.segment_id)).withColumn(
                "segment", F.lit(seg.segment_id)
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def global_term_stats(postings: DataFrame) -> dict[str, int]:
    """df(term) summed across segments (a few rows — the ES stats lookup)."""
    rows = postings.groupBy("term").agg(F.sum("n").alias("df")).collect()
    return {r.term: int(r.df) for r in rows}


def term_stats_lookup(
    spark: SparkSession, store: SegmentStore, snap: Snapshot, terms: list[str]
) -> dict[str, int]:
    """df(term) from the per-segment term-dictionary tables — a term-pruned
    point read (the Lucene terms-dict seek analog), summed across segments.
    Falls back to aggregating postings for pre-dictionary segments."""
    import os

    out: dict[str, int] = {}
    legacy = []
    for seg in snap.segments:
        p = store.term_stats_path(seg.segment_id)
        if not os.path.exists(p):
            legacy.append(seg)
            continue
        for r in (
            spark.read.parquet(p).where(F.col("term").isin(terms)).select("term", "df").collect()
        ):
            out[r.term] = out.get(r.term, 0) + int(r.df)
    if legacy:
        posts = None
        for seg in legacy:
            d = spark.read.parquet(store.postings_path(seg.segment_id)).where(
                F.col("term").isin(terms)
            )
            posts = d if posts is None else posts.unionByName(d)
        for t, df_ in global_term_stats(posts).items():
            out[t] = out.get(t, 0) + df_
    return out


def _make_kernel(spec: KernelSpec):
    """Build the cogrouped-Arrow kernel closure. Pure numpy inside."""
    import numpy as np

    k1, b = scoring.K1, scoring.B
    decode_tbl = np.array([scoring.byte4_to_int(x) for x in range(256)], dtype=np.float64)
    term_entries: dict[str, list[tuple[int, float]]] = {}
    for gi, g in enumerate(spec.groups):
        for t in g.terms:
            w = spec.weights.get(t, 0.0) if g.weighted else 0.0
            term_entries.setdefault(t, []).append((gi, w))
    needs = np.array([g.need for g in spec.groups], dtype=np.int64)
    forb = np.array([g.forbidden for g in spec.groups], dtype=bool)
    n_groups = len(spec.groups)
    avgdl, k = spec.avgdl, spec.k
    kp1 = k1 + 1.0
    phrases = spec.phrases or []
    phrase_terms = sorted({t for p in phrases for t in p.terms})

    def kernel(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        from elasticsearch_spark.functions.codec import delta_decode, varbyte_decode

        if left.empty:
            return pd.DataFrame({"segment": [], "ordinal": [], "score": []}).astype(
                {"segment": str, "ordinal": "int64", "score": "float64"}
            )
        segment = left["segment"].iloc[0]
        has_allow = bool((right["kind"] == "allow").any()) if len(right) else False
        allow = (
            np.sort(right.loc[right["kind"] == "allow", "ordinal"].to_numpy(dtype=np.int64))
            if has_allow
            else None
        )
        deny_rows = right.loc[right["kind"] == "deny", "ordinal"] if len(right) else None
        deny = (
            np.sort(deny_rows.to_numpy(dtype=np.int64))
            if deny_rows is not None and len(deny_rows)
            else None
        )

        # ---- block-level upper bounds on the shared bk grid
        mtf = left["max_tf"].to_numpy(dtype=np.float64)
        mdl = left["min_dlq"].to_numpy(dtype=np.float64)
        w_row = np.array(
            [sum(w for _, w in term_entries.get(t, [])) for t in left["term"]],
            dtype=np.float64,
        )
        row_ub = w_row * kp1 * mtf / (mtf + k1 * (1.0 - b + b * mdl / avgdl))
        bks = left["bk"].to_numpy(dtype=np.int64)
        uniq_bks, inv = np.unique(bks, return_inverse=True)
        bk_ub = np.zeros(len(uniq_bks))
        np.add.at(bk_ub, inv, row_ub)

        order = np.argsort(-bk_ub, kind="stable")
        cand_ord: list[np.ndarray] = []
        cand_score: list[np.ndarray] = []
        theta = -np.inf
        n_kept = 0

        by_bk: dict[int, list[int]] = {}
        for i, bkv in enumerate(bks):
            by_bk.setdefault(int(bkv), []).append(i)

        for oi in order:
            if not phrases and n_kept >= k and bk_ub[oi] < theta:
                break  # block-max prune: no remaining block can enter top-k
                # (disabled under phrase clauses: phrase freq has no block
                # bound in the metadata, so every block must be verified)
            rows = by_bk[int(uniq_bks[oi])]
            ords_l, score_l, gid_l = [], [], []
            pos_map: dict[str, dict] = {t: {} for t in phrase_terms}
            for ri in rows:
                r = left.iloc[ri]
                ords = delta_decode(r["docs"])
                tfs_i = varbyte_decode(r["tfs"]).astype(np.int64)
                tfs = tfs_i.astype(np.float64)
                dlq = decode_tbl[np.frombuffer(r["norms"], dtype=np.uint8)]
                tfn = kp1 * tfs / (tfs + k1 * (1.0 - b + b * dlq / avgdl))
                for gi, w in term_entries.get(r["term"], []):
                    ords_l.append(ords)
                    score_l.append(w * tfn)
                    gid_l.append(np.full(len(ords), gi, dtype=np.int64))
                if r["term"] in pos_map:
                    # reconstruct per-posting absolute positions from the
                    # concatenated delta stream (posting heads are absolute)
                    d = varbyte_decode(r["poss"]).astype(np.int64)
                    cs = np.cumsum(d)
                    starts_p = np.concatenate([[0], np.cumsum(tfs_i)[:-1]])
                    base = np.concatenate([[0], cs[np.cumsum(tfs_i)[:-1] - 1]]) if len(tfs_i) > 1 else np.array([0])
                    offs = np.repeat(base, tfs_i)
                    pos_abs = cs - offs
                    m = pos_map[r["term"]]
                    for pi, o in enumerate(ords):
                        sl = slice(starts_p[pi], starts_p[pi] + tfs_i[pi])
                        m[int(o)] = (pos_abs[sl], float(dlq[pi]))
            if not ords_l:
                continue
            o = np.concatenate(ords_l)
            s = np.concatenate(score_l)
            g = np.concatenate(gid_l)
            so = np.argsort(o, kind="stable")
            o, s, g = o[so], s[so], g[so]
            starts = np.flatnonzero(np.concatenate([[True], o[1:] != o[:-1]]))
            docs_u = o[starts]
            score_u = np.add.reduceat(s, starts)
            ok = np.ones(len(docs_u), dtype=bool)
            if n_groups:
                for gi in range(n_groups):
                    cnt = np.add.reduceat((g == gi).astype(np.int64), starts)
                    if forb[gi]:
                        ok &= cnt == 0
                    elif needs[gi] > 0:
                        ok &= cnt >= needs[gi]
            if allow is not None:
                pos = np.searchsorted(allow, docs_u)
                ok &= (pos < len(allow)) & (allow[np.minimum(pos, len(allow) - 1)] == docs_u)
            if deny is not None:
                pos = np.searchsorted(deny, docs_u)
                ok &= ~((pos < len(deny)) & (deny[np.minimum(pos, len(deny) - 1)] == docs_u))
            docs_u, score_u = docs_u[ok], score_u[ok]
            if not len(docs_u):
                continue
            if phrases:
                keep = np.ones(len(docs_u), dtype=bool)
                for ph in phrases:
                    for di, doc in enumerate(docs_u):
                        if not keep[di]:
                            continue
                        entry = pos_map.get(ph.terms[0], {}).get(int(doc))
                        if entry is None:
                            keep[di] = False
                            continue
                        cand, dlq_d = entry
                        for i, t in enumerate(ph.terms[1:], start=1):
                            nxt = pos_map.get(t, {}).get(int(doc))
                            if nxt is None:
                                cand = cand[:0]
                                break
                            cand = cand[np.isin(cand + i, nxt[0])]
                        pf = len(cand)
                        if pf == 0:
                            keep[di] = False
                        else:
                            norm_d = k1 * (1.0 - b + b * dlq_d / avgdl)
                            score_u[di] += ph.weight * kp1 * pf / (pf + norm_d)
                docs_u, score_u = docs_u[keep], score_u[keep]
                if not len(docs_u):
                    continue
            cand_ord.append(docs_u)
            cand_score.append(score_u)
            n_kept += len(docs_u)
            if n_kept >= k:
                allsc = np.concatenate(cand_score)
                if len(allsc) >= k:
                    theta = np.partition(allsc, -k)[-k]

        if not cand_ord:
            return pd.DataFrame({"segment": [], "ordinal": [], "score": []}).astype(
                {"segment": str, "ordinal": "int64", "score": "float64"}
            )
        o = np.concatenate(cand_ord)
        s = np.concatenate(cand_score)
        # local top-k with deterministic tie-break (ordinal asc == key asc)
        idx = np.lexsort((o, -s))[:k]
        return pd.DataFrame({"segment": segment, "ordinal": o[idx], "score": s[idx]})

    return kernel


def run_kernel(
    postings: DataFrame,
    extras: DataFrame,
    spec: KernelSpec,
) -> DataFrame:
    """Cogroup postings + allow/deny rows by (segment, bucket), run the kernel."""
    pb = postings.withColumn("bucket", (F.col("bk") / BUCKET_BLOCKS).cast("int"))
    eb = extras.withColumn(
        "bucket", (F.col("ordinal") / (BLOCK_RANGE * BUCKET_BLOCKS)).cast("int")
    )
    kernel = _make_kernel(spec)
    return (
        pb.groupBy("segment", "bucket")
        .cogroup(eb.groupBy("segment", "bucket"))
        .applyInPandas(kernel, schema="segment string, ordinal long, score double")
    )


@dataclass
class IndexedQuery:
    """match / match_phrase / limited-bool query lowered onto the index."""

    groups: list[TermGroup] = field(default_factory=list)
    filter_pred: str | None = None  # SQL over docs columns -> allow set
    score_zero: bool = False
    phrases: list[list[str]] = field(default_factory=list)


def _phrase_terms(body) -> list[str]:
    (field_, spec), = body.items()
    if isinstance(spec, str):
        spec = {"query": spec}
    if field_ != "text":
        raise ValueError("indexed path indexes the text field")
    return analysis.analyze(spec["query"])


def lower_query(query: dict) -> IndexedQuery:
    """Lower a match / match_phrase / bool query dict to an IndexedQuery."""
    (kind, body), = query.items()
    if kind == "match_phrase":
        qterms = _phrase_terms(body)
        distinct = sorted(set(qterms))
        return IndexedQuery(
            groups=[TermGroup(terms=distinct, need=len(distinct), weighted=False)],
            phrases=[qterms],
        )
    if kind == "match":
        (field_, spec), = body.items()
        if isinstance(spec, str):
            spec = {"query": spec}
        if field_ != "text":
            raise ValueError("indexed path indexes the text field")
        terms = list(dict.fromkeys(analysis.analyze(spec["query"])))
        op = spec.get("operator", "or").lower()
        need = len(terms) if op == "and" else int(spec.get("minimum_should_match") or 1)
        return IndexedQuery(groups=[TermGroup(terms=terms, need=need)])
    if kind == "bool":
        iq = IndexedQuery()
        preds: list[str] = []

        def pred_sql(q: dict) -> str:
            (lk, lb), = q.items()
            if lk == "term":
                (f_, v), = lb.items()
                v = v["value"] if isinstance(v, dict) else v
                lit = f"'{v}'" if isinstance(v, str) else str(v)
                return f"{f_} = {lit}"
            if lk == "terms":
                (f_, vs), = lb.items()
                lits = ", ".join(f"'{v}'" if isinstance(v, str) else str(v) for v in vs)
                return f"{f_} IN ({lits})"
            if lk == "range":
                (f_, spec_), = lb.items()
                ops = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}
                return " AND ".join(
                    f"{f_} {ops[o]} {repr(v) if not isinstance(v, str) else chr(39) + v + chr(39)}"
                    for o, v in spec_.items()
                    if o in ops
                )
            if lk == "exists":
                return f"{lb['field']} IS NOT NULL"
            raise ValueError(f"indexed path cannot lower predicate: {lk}")

        def match_group(q: dict, need_override: int | None = None) -> TermGroup:
            (f_, spec_), = q["match"].items()
            if isinstance(spec_, str):
                spec_ = {"query": spec_}
            terms = list(dict.fromkeys(analysis.analyze(spec_["query"])))
            op = spec_.get("operator", "or").lower()
            need = len(terms) if op == "and" else int(spec_.get("minimum_should_match") or 1)
            return TermGroup(terms=terms, need=need_override if need_override is not None else need)

        def as_list(x):
            return [] if x is None else (x if isinstance(x, list) else [x])

        for q in as_list(body.get("must")):
            mk = next(iter(q))
            if mk == "match_phrase":
                qterms = _phrase_terms(q["match_phrase"])
                distinct = sorted(set(qterms))
                iq.groups.append(TermGroup(terms=distinct, need=len(distinct), weighted=False))
                iq.phrases.append(qterms)
            elif mk == "match":
                iq.groups.append(match_group(q))
            else:
                raise ValueError("indexed-bool must clauses must be match/match_phrase")
        for q in as_list(body.get("filter")):
            preds.append(pred_sql(q))
        for q in as_list(body.get("must_not")):
            (lk, _), = q.items()
            if lk == "match":
                g = match_group(q)
                iq.groups.append(TermGroup(terms=g.terms, need=0, forbidden=True, weighted=False))
            else:
                preds.append(f"NOT ({pred_sql(q)})")
        should = as_list(body.get("should"))
        msm = body.get("minimum_should_match")
        has_anchor = bool(body.get("must") or body.get("filter"))
        if should:
            # lower each should clause as optional scoring; msm>0 over clauses
            # is only supported for a single should clause or msm across terms
            eff = int(msm) if msm is not None else (0 if has_anchor else 1)
            if len(should) == 1:
                g = match_group(should[0])
                if eff == 0:
                    g.need = 0
                iq.groups.append(g)
            else:
                if eff > 1:
                    raise ValueError("indexed path: multi-clause should msm>1 unsupported")
                terms: list[str] = []
                for q in should:
                    terms.extend(match_group(q).terms)
                iq.groups.append(TermGroup(terms=list(dict.fromkeys(terms)), need=eff))
        if not iq.groups:
            iq.score_zero = True
        iq.filter_pred = " AND ".join(f"({p})" for p in preds) if preds else None
        return iq
    raise ValueError(f"indexed path cannot lower: {kind}")


def search_indexed(
    spark: SparkSession,
    store: SegmentStore,
    query: dict,
    k: int = 10,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Top-k over the segment store; returns (conv_id, turn_idx, score)."""
    snap = store.snapshot(snapshot_id)
    if snap is None or not snap.segments:
        raise ValueError("empty index")
    iq = lower_query(query)
    terms = sorted({t for g in iq.groups for t in g.terms} | {t for p in iq.phrases for t in p})

    n_docs, sum_dl = snap.n_docs, snap.sum_dl
    avgdl = sum_dl / n_docs if n_docs else 1.0

    docs = read_segment_docs(spark, store, snap)

    if iq.score_zero or not terms:
        base = docs
        if iq.filter_pred:
            base = base.where(iq.filter_pred)
        base = _apply_deletes(spark, store, snap, base)
        return (
            base.select("conv_id", "turn_idx", F.lit(0.0).alias("score"))
            .orderBy("conv_id", "turn_idx")
            .limit(k)
        )

    postings = read_segment_postings(spark, store, snap, terms)
    dfs = term_stats_lookup(spark, store, snap, terms)
    weights = {
        t: __import__("math").log(1.0 + (n_docs - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5))
        for t in terms
        if t in dfs
    }
    # drop groups' unknown terms (df=0 terms can never match)
    for g in iq.groups:
        g.terms = [t for t in g.terms if t in dfs]
    live_groups = [g for g in iq.groups if g.terms or g.forbidden]
    for g in live_groups:
        if not g.forbidden and g.need > len(g.terms):
            # an AND/msm group lost terms entirely absent from the corpus:
            # no doc can satisfy it
            return (
                docs.select("conv_id", "turn_idx", F.lit(0.0).alias("score")).where(F.lit(False))
            )

    extras_parts = []
    if iq.filter_pred:
        extras_parts.append(
            docs.where(iq.filter_pred).select(
                "segment", "ordinal", F.lit("allow").alias("kind")
            )
        )
    del_df = _deletes_df(spark, store, snap)
    if del_df is not None:
        extras_parts.append(del_df.select("segment", "ordinal", F.lit("deny").alias("kind")))
    if extras_parts:
        extras = extras_parts[0]
        for p in extras_parts[1:]:
            extras = extras.unionByName(p)
    else:
        extras = spark.createDataFrame([], "segment string, ordinal long, kind string")

    phrase_groups = []
    for pterms in iq.phrases:
        if any(t not in dfs for t in pterms):
            # a phrase term absent from the corpus: phrase can never match
            return docs.select("conv_id", "turn_idx", F.lit(0.0).alias("score")).where(F.lit(False))
        w = sum(weights[t] for t in sorted(set(pterms)))
        phrase_groups.append(PhraseGroup(terms=pterms, weight=w))
    spec = KernelSpec(
        groups=live_groups, weights=weights, avgdl=avgdl, k=k, phrases=phrase_groups
    )
    local = run_kernel(postings, extras, spec)
    # FETCH PHASE (SearchPhaseController analog): the kernels return at most
    # buckets*k winners — collect that tiny set to the coordinator and
    # re-read ONLY their rows from the docs tables with an ordinal IN-filter
    # per segment. Parquet pushes In(ordinal) into row-group pruning (docs
    # files are ordinal-sorted), so fetch cost is O(k) point reads, not a
    # full docs scan joined against k rows.
    winners = local.collect()
    if not winners:
        return docs.select("conv_id", "turn_idx", F.lit(0.0).alias("score")).where(F.lit(False))
    by_seg: dict[str, dict[int, float]] = {}
    for r in winners:
        by_seg.setdefault(r.segment, {})[int(r.ordinal)] = float(r.score)
    parts = []
    for seg, ordmap in by_seg.items():
        d = (
            spark.read.parquet(store.docs_path(seg))
            .where(F.col("ordinal").isin(list(ordmap)))
            .select("ordinal", "conv_id", "turn_idx")
            .withColumn("segment", F.lit(seg))
        )
        parts.append(d)
    fetched = parts[0]
    for p in parts[1:]:
        fetched = fetched.unionByName(p)
    score_rows = [(seg, o, s) for seg, m in by_seg.items() for o, s in m.items()]
    scores = F.broadcast(
        spark.createDataFrame(score_rows, "segment string, ordinal long, score double")
    )
    out = (
        fetched.join(scores, ["segment", "ordinal"])
        .orderBy(F.round(F.col("score"), 6).desc(), F.col("conv_id").asc(), F.col("turn_idx").asc())
        .limit(k)
        .select("conv_id", "turn_idx", F.round(F.col("score"), 4).alias("score"))
    )
    return out


def multi_store_search(
    spark: SparkSession,
    stores: list[SegmentStore],
    query: dict,
    k: int = 10,
) -> DataFrame:
    """Multi-index search (TransportSearchAction.java:464 resolving several
    indices == UNION ALL of tables): each store answers with its OWN corpus
    stats — exactly ES's per-index idf under default query_then_fetch — and
    the coordinator merges the per-index top-k by (score, key)."""
    parts = [search_indexed(spark, s, query, k=k) for s in stores]
    uni = parts[0]
    for p in parts[1:]:
        uni = uni.unionByName(p)
    return (
        uni.orderBy(F.round(F.col("score"), 6).desc(), F.col("conv_id").asc(), F.col("turn_idx").asc())
        .limit(k)
    )


def _deletes_df(spark: SparkSession, store: SegmentStore, snap: Snapshot) -> DataFrame | None:
    if not snap.delete_files:
        return None
    df = spark.read.parquet(*snap.delete_files)
    return df


def _apply_deletes(spark, store, snap, docs: DataFrame) -> DataFrame:
    d = _deletes_df(spark, store, snap)
    if d is None:
        return docs
    return docs.join(d, ["segment", "ordinal"], "left_anti")
