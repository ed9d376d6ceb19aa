"""Indexed top-k search: postings scan -> block-max pruned scoring kernel ->
per-partition heaps -> global merge.

Direct analog of the reference's query-then-fetch (SURVEY.md §3.1):
  1. term stats lookup (global N/avgdl from the manifest, df(field, term) from
     the per-segment term dictionaries) — the DFS/stats phase,
  2. per-(segment, bucket) Arrow kernel evaluates a SCORE-EXPRESSION TREE over
     the block's postings with BM25 weights and prunes whole ordinal-range
     blocks whose upper bound can't reach the running threshold — block-max
     WAND/MaxScore semantics (TopDocsCollectorContext.java:212-296 + Lucene
     impacts, re-expressed on a fixed ordinal-range block grid so the bound
     math is fully vectorized). The tree mirrors Lucene's Query/Weight/Scorer
     composition (BooleanWeight, DisjunctionMaxQuery, FunctionScoreQuery):
     every SearchModule.java-registered query the engine supports lowers to
     TermsLeaf / PhraseLeaf / ChannelLeaf composed under Bool / DisMax /
     ConstScore / FuncScore / Boosting nodes,
  3. tiny per-group top-k unions merged by a global orderBy/limit — the
     SearchPhaseController.java:154-243 shard-merge analog,
  4. fetch phase = ordinal-pruned point reads of <= buckets*k winners from the
     docs tables (+ any _source columns).

Doc-field-dependent clauses (term/range filters, function_score field values,
terms_set per-doc thresholds, boosting demotions) become CHANNELS: columnar
(ordinal, value) reads of the docs tables cogrouped into the kernel by bucket
— the Lucene doc-values / FieldData read path. Positional deletes from updates
ride the same stream as a deny channel (liveDocs analog).

Queries whose scoring needs no postings at all (term/ids/range/exists-only,
constant_score over filters, distance_feature) run a DOCS-ONLY plan: a
predicate-pushdown scan of the docs tables with the score as a column
expression — the doc-values-only execution ES uses for filter-context-only
searches.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import analysis, scoring
from ..sources.segment_store import SegmentStore, Snapshot
from .index_build import BLOCK_RANGE, INDEXED_FIELDS, KEYWORD_FIELDS, kw_field

BUCKET_BLOCKS = 64  # blocks per kernel group: intra-segment parallelism unit
DENY_FID = -1  # channel id reserved for positional deletes

# Multi-term expansion bounds (ES/Lucene parity). ES sets
# BooleanQuery.setMaxClauseCount from indices.query.bool.max_clause_count
# (default 1024, SearchModule.java:792) and refuses broader rewrites with
# TooManyClauses; fuzzy / match_phrase_prefix default max_expansions=50
# (FuzzyQueryBuilder.java / MatchQuery.java); Lucene's Intervals.prefix caps
# at 128 (Intervals.DEFAULT_MAX_EXPANSIONS) and throws IllegalStateException.
# At 10^12-turn scale the term dictionary has hundreds of millions of terms;
# these caps keep every expansion collect O(cap), never O(dictionary).
MAX_CLAUSE_COUNT = 1024
DEFAULT_MAX_EXPANSIONS = 50
INTERVALS_MAX_EXPANSIONS = 128


class TooManyClauses(ValueError):
    """A prefix/wildcard/regexp expanded past max_clause_count terms — the
    analog of Lucene's IndexSearcher.TooManyClauses, raised loudly instead of
    collecting an unbounded term list to the driver (ES raises the same via
    BooleanQuery.setMaxClauseCount, SearchModule.java:792)."""


class IndexedFallbackWarning(UserWarning):
    """search_indexed could not lower the query to the postings kernel or the
    doc-values plan and ran the logical full-scan plan instead — correct, but
    O(corpus) at scale. Filter or assert on this to keep lowering coverage
    visible (tests treat it as an error for every registered fixture)."""
_POS_SHIFT = 32  # occurrence key = ordinal << 32 | position


# --------------------------------------------------------------- score tree
@dataclass
class TermsLeaf:
    """Sum-of-BM25 over `terms` on an indexed field; matches when the count of
    distinct matched terms >= need (Lucene BooleanQuery-of-TermQuery with
    minimumNumberShouldMatch). const_score switches to the multi-term
    constant-score rewrite (prefix/wildcard/fuzzy/regexp expansions,
    MultiTermQuery CONSTANT_SCORE_REWRITE). need_fid reads the per-doc
    threshold from a value channel (terms_set, TermsSetQueryBuilder)."""

    field: str
    terms: list[str]
    need: int = 1
    const_score: float | None = None
    need_fid: int | None = None
    # keyword term/terms leaf: const_score is the matched term's idf, bound at
    # stats time (bind_weights) from the same term-dictionary lookup that
    # serves every other leaf — no extra per-leaf stats job at lowering.
    const_from_idf: bool = False
    # multi_match cross_fields (Lucene BlendedTermQuery): score with the
    # BLENDED idf — blended df = max df across this field group, i.e. idf =
    # min over the group's per-field idfs (same N). bind_weights fills
    # idf_override from the shared stats job; block bounds keep the field's
    # own idf (>= the blend), which stays a sound overestimate.
    idf_blend_fields: list[str] | None = None
    idf_override: dict | None = None


@dataclass
class PhraseLeaf:
    """Phrase over positions (match_phrase, MatchQuery.java:144).
    slop=0: exact adjacency. slop>0: Lucene sloppy-phrase window semantics
    (MatchPhraseQueryBuilder slop param / SloppyPhraseMatcher) — term i at
    position p participates with ADJUSTED position p - i; the phrase matches
    wherever every term has an adjusted occurrence inside a window of width
    <= slop, and phrase freq is the sum over minimal windows of
    1/(1 + width) (documented divergence: Lucene's greedy SloppyPhraseScorer
    can count overlapping matches slightly differently; doc sets are
    identical for duplicate-free phrases, which the lowering enforces).
    prefix_expansions: term-dictionary expansions for the trailing position
    (match_phrase_prefix); weight = idf sum (bound at stats time)."""

    field: str
    terms: list[str]
    prefix_expansions: list[str] | None = None
    weight: float = 0.0
    slop: int = 0


@dataclass
class IntervalsLeaf:
    """intervals `match` source / span_near positions algebra
    (IntervalQueryBuilder.java reg SearchModule.java:835,
    SpanNearQueryBuilder.java reg :804): ordered = exists p1<...<pm with
    pm-p1-(m-1) <= max_gaps; unordered = plain distinct terms via a
    merged-occurrence-stream minimal-covering-window scan (any arity),
    non-plain pairs (prefix-expanded / masked / duplicate-term steps, where
    the two occurrence sets may OVERLAP) via per-end minimal windows.
    Scoring (round 5, Lucene-faithful, both algebras): freq follows the
    family that owns the shape. Plain intervals (span_stream=False): sum of
    1/(1 + slop) over the MINIMAL interval set (interval minimization — no
    kept interval contains another; IntervalQuery's minimal-interval
    algebra). Span rewrites (span_stream=True): SpanScorer's PER-START
    stream with NO containment minimization — NearSpansOrdered emits the
    greedy (stretchToOrder) chain per lead occurrence, sloppy factor
    1/(1 + gap sum) ('a a b' near(a,b) scores 0.5 + 1.0 = 1.5);
    NearSpansUnordered emits one window per min-advance step
    ([s, max over labels of next-occurrence >= s]), slop CHECK
    end - s - (m-1) <= slop but sloppy factor 1/(1 + (end - s)) — width()
    is START-TO-START, Lucene's ordered/unordered asymmetry. Unordered
    NON-PLAIN pairs (overlapping occurrence sets) keep per-end minimal
    windows under both algebras (Lucene's walk is heap-tie-order-dependent
    there; ES calls masked proximity best-effort). Single-term shapes
    (span_term/span_first/span_not) contribute 1 per surviving occurrence
    (width-0 spans) under both. The freq is then fed through the field
    similarity exactly as SpanWeight does
    (Similarity.SimScorer.score(freq, norm)): score = weight * (k1+1) *
    freq / (freq + k1*(1-b+b*dl_q/avgdl)), weight = idf summed over the
    query's distinct concrete terms (SpanWeight.buildSimWeight over
    getTermStates; tuple/expansion steps contribute no idf, and span_not
    exclusions never boost the weight — both documented).
    first_end (span_first, SpanFirstQueryBuilder reg :803): single-term
    occurrence must sit at position < first_end. not_terms (span_not,
    SpanNotQueryBuilder reg :806): single-term occurrence must not share a
    position with any excluded term. within_terms (span_within /
    span_containing, reg :805,809): the single little term must sit inside
    an ordered big chain [pb, pc] with pc-pb-1 <= within_gaps; both builders
    match the same DOCUMENT set but score different streams (within_mode):
    "little" counts enclosed little occurrences, "big" scores the big spans
    that contain a little occurrence at 1/(1+slop) each. Under span_stream,
    containment is tested against EMITTED big spans only — the greedy chain
    per lead. Checking only pb* = max lead <= q suffices for "little": if
    greedy_end(pb*) < q then some big-end occurrence sits in (pb*, q) and
    every earlier lead's greedy end is <= it, so no emitted span reaches q;
    if greedy_end(pb*) >= q, earlier leads either share that end at larger
    width or fall short the same way — pb* dominates."""

    field: str
    terms: list[str]
    ordered: bool = False
    max_gaps: int = -1
    first_end: int | None = None
    not_terms: list[str] | None = None
    within_terms: list[str] | None = None
    within_gaps: int = -1
    within_mode: str = "little"
    # per-step source field (field_masking_span inside span_near,
    # FieldMaskingSpanQueryBuilder reg SearchModule.java:807): step i's
    # positions come from term_fields[i]'s postings; None = all steps on
    # `field`. Cross-field occurrence-key math is sound because the ordinal
    # occupies the high bits of every field's keys.
    term_fields: list[str] | None = None
    # span_gap separations (SpanGapQueryBuilder reg SearchModule.java:811):
    # gaps[i] positions must sit strictly between step i and step i+1; gap
    # widths consume window, not slop. Ordered chains only.
    gaps: list[int] | None = None
    # idf sum over the query's distinct concrete terms (SpanWeight's
    # simWeight), bound at stats time like PhraseLeaf.weight
    weight: float = 0.0
    # True for span-query rewrites: score the SpanScorer per-start stream;
    # False for intervals queries: minimal-interval summation (see above)
    span_stream: bool = False

    def step_field(self, i: int) -> str:
        return self.term_fields[i] if self.term_fields else self.field

    def weight_fts(self) -> set:
        """(field, term) pairs contributing idf to the SpanWeight: distinct
        concrete step terms on their source fields + within-chain terms;
        tuple (expansion) steps and span_not exclusions contribute none."""
        fts = {
            (self.step_field(i), t)
            for i, t in enumerate(self.terms)
            if not isinstance(t, tuple)
        }
        fts |= {(self.field, t) for t in (self.within_terms or [])}
        return fts


@dataclass
class ChannelLeaf:
    """Docs-side clause: matches when the doc has a row in channel `fid`.
    Scores `const` (ConstantScore rewrites: term-filter 1.0, keyword-idf) or
    the channel's per-doc value when const is None (distance_feature)."""

    fid: int
    const: float | None = 1.0


@dataclass
class BoolNode:
    """BoolQueryBuilder.java:306-318 semantics on the kernel: must AND+score,
    filter_fids AND no-score, should score with clause-count msm, must_not
    excludes."""

    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    msm: int = 0
    filter_fids: list[int] = field(default_factory=list)


@dataclass
class DisMaxNode:
    children: list
    tie: float = 0.0


@dataclass
class ConstScoreNode:
    child: object
    boost: float = 1.0


@dataclass
class FuncScoreNode:
    """function_score: the whole functions list is pre-compiled to ONE docs
    SQL expression feeding value channel `fid`; boost_mode folds it into the
    child score (functionscore/FunctionScoreQueryBuilder)."""

    child: object
    fid: int
    boost_mode: str = "multiply"


@dataclass
class BoostingNode:
    positive: object
    neg_fid: int
    negative_boost: float = 0.5


@dataclass
class Channel:
    fid: int
    expr: str  # SQL over docs columns
    mode: str  # 'allow' (presence of a true predicate) | 'value' (double)
    ub: float = float("inf")  # max value (pruning bound) for value channels


@dataclass
class KernelPlan:
    tree: object
    channels: list[Channel]
    ft_pairs: list[tuple[str, str]]  # postings (field, term) reads
    phrase_fts: set[tuple[str, str]]  # need positions decoded


@dataclass
class DocsPlan:
    tree: object
    channels: list[Channel]


# ------------------------------------------------------------------ reading
def read_segment_postings(
    spark: SparkSession, store: SegmentStore, snap: Snapshot,
    ft_pairs: list[tuple[str, str]],
) -> DataFrame:
    by_field: dict[str, list[str]] = {}
    for f, t in ft_pairs:
        by_field.setdefault(f, []).append(t)
    pred = None
    for f, ts in by_field.items():
        c = (F.col("field") == f) & F.col("term").isin(ts)
        pred = c if pred is None else (pred | c)
    parts = []
    for seg in snap.segments:
        d = spark.read.parquet(store.postings_path(seg.segment_id))
        if "field" not in d.columns:  # pre-multi-field segment: text only
            d = d.withColumn("field", F.lit("text"))
        parts.append(d.where(pred).withColumn("segment", F.lit(seg.segment_id)))
    df = parts[0]
    for p in parts[1:]:
        # allowMissingColumns: a legacy segment without position streams
        # null-fills them (term scoring stays exact; a phrase/intervals query
        # touching such a segment raises a clear error in the kernel)
        df = df.unionByName(p, allowMissingColumns=True)
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


def term_stats_lookup(
    spark: SparkSession, store: SegmentStore, snap: Snapshot,
    ft_pairs: list[tuple[str, str]],
) -> dict[tuple[str, str], int]:
    """df(field, term) from the per-segment term-dictionary tables — a
    term-pruned point read (the Lucene terms-dict seek analog), summed across
    segments."""
    if not ft_pairs:
        return {}
    terms = sorted({t for _, t in ft_pairs})
    parts = []
    for seg in snap.segments:
        d = spark.read.parquet(store.term_stats_path(seg.segment_id)).where(
            F.col("term").isin(terms)
        )
        if "field" not in d.columns:  # pre-multi-field segment: text only
            d = d.withColumn("field", F.lit("text"))
        parts.append(d.select("field", "term", "df"))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    # ONE job for the whole stats phase, not one sequential job per segment
    out: dict[tuple[str, str], int] = {}
    for r in df.groupBy("field", "term").agg(F.sum("df").alias("df")).collect():
        out[(r.field, r.term)] = int(r.df)
    return {k: v for k, v in out.items() if k in set(ft_pairs)}


def expand_terms(
    spark: SparkSession, store: SegmentStore, snap: Snapshot,
    field_name: str, kind: str, value, max_expansions: int | None = None,
    max_clause_count: int | None = None,
) -> list[str]:
    """Multi-term expansion against the term dictionary (Lucene
    MultiTermQuery term enumeration over the terms dict). prefix pushes a
    StringStartsWith filter into the parquet scan; wildcard/regexp push rlike;
    fuzzy scans the (small) dictionary with a levenshtein expression.

    ALWAYS bounded: the collect is LIMIT-ed inside the job, so the driver
    never holds more than max(max_expansions, max_clause_count)+1 terms.
    max_expansions truncates silently in term order (ES fuzzy /
    match_phrase_prefix semantics); max_clause_count raises TooManyClauses
    past the cap (ES prefix/wildcard/regexp → BooleanQuery rewrite guard).
    With neither given, MAX_CLAUSE_COUNT applies as the backstop."""
    parts = []
    for seg in snap.segments:
        d = spark.read.parquet(store.term_stats_path(seg.segment_id))
        if "field" in d.columns:
            d = d.where(F.col("field") == field_name)
        elif field_name != "text":
            continue
        if kind == "prefix":
            d = d.where(F.col("term").startswith(value))
        elif kind == "wildcard":
            d = d.where(F.col("term").rlike(analysis.wildcard_regex(value)))
        elif kind == "regexp":
            d = d.where(F.col("term").rlike(f"^{value}$"))
        elif kind == "anchored_regex":
            # caller supplies an already-anchored regex (canonical intervals
            # wildcard steps carry analysis.wildcard_regex output verbatim)
            d = d.where(F.col("term").rlike(value))
        elif kind == "fuzzy":
            val, fz = value
            d = d.where(F.levenshtein(F.col("term"), F.lit(val)) <= fz)
        else:
            raise ValueError(kind)
        parts.append(d.select("term"))
    if not parts:
        return []
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    # one expansion job across all segments' dictionaries, LIMIT-ed in-plan:
    # the sort + limit run distributed (TakeOrderedAndProject) and the driver
    # receives at most cap+1 rows regardless of dictionary size
    if max_expansions is not None:
        cap, loud = int(max_expansions), False
    else:
        cap = int(MAX_CLAUSE_COUNT if max_clause_count is None else max_clause_count)
        loud = True
    rows = df.distinct().orderBy("term").limit(cap + 1).collect()
    terms = [r.term for r in rows]
    if len(terms) > cap:
        if loud:
            raise TooManyClauses(
                f"{kind} on {field_name!r} expands to more than {cap} terms "
                f"(max_clause_count); narrow the pattern or raise the cap"
            )
        terms = terms[:cap]
    return terms


# ------------------------------------------------------------------ lowering
class _Lowerer:
    """ES query dict -> (score tree, channels). Runs tiny stats jobs (term
    dictionary point reads, keyword df counts) exactly where ES's query
    rewrite/Weight creation consults the terms dict and doc values."""

    def __init__(self, spark, store, snap, docs: DataFrame):
        self.spark, self.store, self.snap, self.docs = spark, store, snap, docs
        self.channels: list[Channel] = []

    def chan(self, expr: str, mode: str, ub: float = float("inf")) -> int:
        fid = len(self.channels)
        self.channels.append(Channel(fid, expr, mode, ub))
        return fid

    # -- predicate SQL for filter-context leaves (doc-values path)
    def pred_sql(self, q: dict) -> str:
        from ..plans.query_dsl import normalize_query

        q = normalize_query(q)
        (lk, lb), = q.items()
        if lk == "term":
            (f_, v), = lb.items()
            v = v["value"] if isinstance(v, dict) else v
            lit = f"'{v}'" if isinstance(v, str) else str(v)
            return f"{f_} = {lit}"
        if lk == "terms":
            (f_, vs), = lb.items()
            if isinstance(vs, dict):
                # terms lookup: resolve the point-read here (the GET analog),
                # then lower like a literal terms filter
                from ..plans.query_dsl import _Ctx, _terms_lookup

                vs = _terms_lookup(_Ctx(self.docs, [], "text"), vs)
                if not vs:
                    return "false"
            lits = ", ".join(f"'{v}'" if isinstance(v, str) else str(v) for v in vs)
            return f"{f_} IN ({lits})"
        if lk == "range":
            (f_, spec_), = lb.items()
            ops = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}
            return " AND ".join(
                f"{f_} {ops[o]} {chr(39) + v + chr(39) if isinstance(v, str) else repr(v)}"
                for o, v in spec_.items()
                if o in ops
            )
        if lk == "exists":
            return f"{lb['field']} IS NOT NULL"
        if lk == "ids":
            idc = "concat_ws('#', cast(conv_id as string), cast(turn_idx as string))"
            lits = ", ".join(f"'{v}'" for v in lb["values"])
            return f"{idc} IN ({lits})"
        if lk == "match_all":
            return "true"
        if lk == "match_none":
            return "false"
        if lk == "script":
            # ScriptQueryBuilder: Painless-subset -> SQL predicate over the
            # docs columns (functions/painless.py) — same doc-values shape
            # as term/range, evaluated on the pruned docs scan
            from ..functions import painless

            return f"({painless.script_sql(lb['script'])})"
        raise ValueError(f"indexed path cannot lower predicate: {lk}")

    def keyword_postings_leaf(self, field_: str, values: list[str]):
        """term/terms in scoring context on a keyword subfield: anchored
        const-score leaves answered from the untokenized postings (the
        TermStates lookup, O(df) candidates like the reference's
        TermQueryBuilder) instead of a full docs scan + count job. The
        dictionary df of a keyword subfield IS the exact-equality doc count
        (index_build.KEYWORD_FIELDS), so scores match keyword_idf_leaf
        exactly: idf of the doc's matched value, bound at stats time
        (const_from_idf) by the one shared term-stats job."""
        if len(values) == 1:
            return TermsLeaf(
                field=field_, terms=[values[0]], need=1,
                const_score=0.0, const_from_idf=True,
            )
        # single-valued field => exactly one child matches; dis_max(max)
        # reproduces the per-value idf of keyword_idf_leaf's CASE channel
        return DisMaxNode(
            children=[
                TermsLeaf(
                    field=field_, terms=[v], need=1,
                    const_score=0.0, const_from_idf=True,
                )
                for v in values
            ],
            tie=0.0,
        )

    def keyword_idf_leaf(self, col: str, values: list) -> ChannelLeaf:
        """term/terms in scoring context: score = idf(doc's value) on a
        norms-less keyword field (query_dsl._keyword_idf_scored twin).

        df per value comes from the keyword subfield's term dictionary when
        the store has one — an O(values) point lookup, the same TermStates
        seek every postings leaf does — and falls back to a docs-column
        count only for true legacy segments or stores with deletes (the
        dictionary df still counts deleted docs; the oracle view doesn't)."""
        n = self.snap.n_docs
        dfs: dict | None = None
        if (
            not self.snap.delete_files
            and all(isinstance(v, str) for v in values)
            and all(
                kw_field(col) in (seg.metrics.get("posting_fields") or ())
                for seg in self.snap.segments
            )
        ):
            kwf = kw_field(col)
            stats = term_stats_lookup(
                self.spark, self.store, self.snap, [(kwf, v) for v in values]
            )
            dfs = {v: stats.get((kwf, v), 0) for v in values}
        if dfs is None:
            rows = (
                self.docs.where(F.col(col).isin(values))
                .groupBy(col).agg(F.count(F.lit(1)).alias("df")).collect()
            )
            dfs = {r[0]: int(r[1]) for r in rows}
        if len(values) == 1:
            v = values[0]
            idf = math.log(1.0 + (n - dfs.get(v, 0) + 0.5) / (dfs.get(v, 0) + 0.5))
            lit = f"'{v}'" if isinstance(v, str) else str(v)
            fid = self.chan(f"case when {col} = {lit} then 1.0 end", "allow")
            return ChannelLeaf(fid, const=idf)
        arms = []
        ub = 0.0
        for v in values:
            idf = math.log(1.0 + (n - dfs.get(v, 0) + 0.5) / (dfs.get(v, 0) + 0.5))
            ub = max(ub, idf)
            lit = f"'{v}'" if isinstance(v, str) else str(v)
            arms.append(f"when {col} = {lit} then cast({idf!r} as double)")
        fid = self.chan("case " + " ".join(arms) + " end", "value", ub=ub)
        return ChannelLeaf(fid, const=None)

    def match_leaf(self, body: dict) -> TermsLeaf:
        (field_, spec), = body.items()
        if isinstance(spec, str):
            spec = {"query": spec}
        if field_ not in INDEXED_FIELDS:
            raise ValueError(f"field {field_} has no postings (indexed: {INDEXED_FIELDS})")
        # zero analyzed terms => never matches (zero_terms_query NONE): a
        # TermsLeaf with no terms has need=1 unreachable, so it prunes clean
        terms = list(dict.fromkeys(analysis.analyze(spec["query"])))
        op = spec.get("operator", "or").lower()
        need = len(terms) if op == "and" else int(spec.get("minimum_should_match") or 1)
        return TermsLeaf(field=field_, terms=terms, need=need)

    def phrase_leaf(self, body: dict, prefix: bool = False):
        (field_, spec), = body.items()
        if isinstance(spec, str):
            spec = {"query": spec}
        if field_ not in INDEXED_FIELDS:
            raise ValueError(f"field {field_} has no postings")
        qterms = analysis.analyze(spec["query"])
        slop = int(spec.get("slop", 0))
        if slop:
            if prefix:
                raise ValueError("slop > 0 with match_phrase_prefix is unsupported")
            if len(set(qterms)) != len(qterms):
                raise ValueError("slop > 0 with repeated phrase terms is unsupported")
        if not prefix or not qterms:
            return PhraseLeaf(field=field_, terms=qterms, slop=slop)
        lead, pref = qterms[:-1], qterms[-1]
        # ES MatchQuery default: match_phrase_prefix truncates its trailing
        # expansion at max_expansions (50) silently, in term order
        exps = expand_terms(
            self.spark, self.store, self.snap, field_, "prefix", pref,
            max_expansions=int(spec.get("max_expansions", DEFAULT_MAX_EXPANSIONS)),
        )
        return PhraseLeaf(field=field_, terms=lead, prefix_expansions=exps)

    def expansion_leaf(
        self, field_: str, kind: str, value, max_expansions: int | None = None
    ) -> object:
        # fuzzy truncates at max_expansions (ES default 50); prefix/wildcard/
        # regexp have no truncation in ES — they raise TooManyClauses past
        # max_clause_count, mirrored here (expand_terms loud path)
        caps = dict(max_expansions=max_expansions) if max_expansions is not None else {}
        if field_ in INDEXED_FIELDS:
            exps = expand_terms(
                self.spark, self.store, self.snap, field_, kind, value, **caps
            )
            return TermsLeaf(field=field_, terms=exps, need=1, const_score=1.0)
        if field_ in KEYWORD_FIELDS and all(
            kw_field(field_) in (seg.metrics.get("posting_fields") or ())
            for seg in self.snap.segments
        ):
            # MultiTermQuery enumeration over the keyword subfield's term
            # dictionary (whole raw values) — O(dictionary), not O(corpus)
            exps = expand_terms(
                self.spark, self.store, self.snap, kw_field(field_), kind, value,
                **caps,
            )
            return TermsLeaf(field=kw_field(field_), terms=exps, need=1, const_score=1.0)
        # keyword field without subfield postings: whole-value test via SQL
        # where expressible
        if kind == "prefix":
            fid = self.chan(f"case when {field_} like '{value}%' then 1.0 end", "allow")
            return ChannelLeaf(fid, const=1.0)
        raise ValueError(f"{kind} on non-indexed field {field_}")

    def mlt_leaf(self, body: dict) -> object:
        """more_like_this: liked docs fetched by id (point read), salient
        terms = top max_query_terms by tf*idf with df from the term
        dictionary (MoreLikeThisQueryBuilder's coordinator-side term
        selection); runs as an OR TermsLeaf with % msm, liked ids excluded.

        Term selection is ONE DataFrame job mirroring the logical path
        (plans/query_dsl._more_like_this): liked-doc tokens aggregate to
        (term, ltf), join the per-segment term dictionaries for df, salience
        = ltf * idf, and the driver collects only the <= max_query_terms
        winners — never liked-doc text or the candidate vocabulary."""
        field_ = (body.get("fields") or ["text"])[0]
        like = body["like"] if isinstance(body["like"], list) else [body["like"]]
        mqt = int(body.get("max_query_terms", 25))
        mtf = int(body.get("min_term_freq", 2))
        mdf = int(body.get("min_doc_freq", 5))
        msm_raw = body.get("minimum_should_match", "30%")
        like_ids = [x["_id"] for x in like if isinstance(x, dict)]
        like_texts = [x for x in like if isinstance(x, str)]
        idc = F.concat_ws("#", F.col("conv_id").cast("string"), F.col("turn_idx").cast("string"))
        liked_tok = None
        if like_ids:
            liked_tok = self.docs.where(idc.isin(like_ids)).select(
                F.explode(analysis.tokens(field_)).alias("term")
            )
        if like_texts:
            txt = self.spark.createDataFrame(
                [(t,) for t in like_texts], f"{field_} string"
            ).select(F.explode(analysis.tokens(field_)).alias("term"))
            liked_tok = txt if liked_tok is None else liked_tok.unionByName(txt)
        if liked_tok is None:
            raise ValueError("more_like_this: no likes")
        ltf = (
            liked_tok.groupBy("term")
            .agg(F.count(F.lit(1)).alias("ltf"))
            .where(F.col("ltf") >= mtf)
        )
        # df from the per-segment term dictionaries, candidate-pruned by a
        # broadcast join (the dictionary scan streams; nothing is collected)
        dict_parts = []
        for seg in self.snap.segments:
            d = self.spark.read.parquet(self.store.term_stats_path(seg.segment_id))
            if "field" not in d.columns:  # pre-multi-field segment: text only
                d = d.withColumn("field", F.lit("text"))
            dict_parts.append(d.where(F.col("field") == field_).select("term", "df"))
        stats = dict_parts[0]
        for p in dict_parts[1:]:
            stats = stats.unionByName(p)
        stats = stats.groupBy("term").agg(F.sum("df").alias("df"))
        n = self.snap.n_docs
        sal = F.col("ltf") * F.expr(scoring.idf_sql(str(n), "df"))
        sel = [
            r.term
            for r in stats.join(F.broadcast(ltf), "term")
            .where(F.col("df") >= mdf)
            .select("term", sal.alias("sal"))
            .orderBy(F.desc("sal"), F.asc("term"))
            .limit(mqt)
            .collect()
        ]
        if not sel:
            raise ValueError("more_like_this: no selected terms")
        if isinstance(msm_raw, str) and msm_raw.endswith("%"):
            need = max(1, int(len(sel) * int(msm_raw[:-1]) / 100.0))
        else:
            need = int(msm_raw)
        leaf = TermsLeaf(field=field_, terms=sel, need=need)
        if not like_ids:
            return leaf
        lits = ", ".join(f"'{v}'" for v in like_ids)
        ex = (
            "concat_ws('#', cast(conv_id as string), cast(turn_idx as string)) "
            f"IN ({lits})"
        )
        fid = self.chan(f"case when {ex} then 1.0 end", "allow")
        return BoolNode(must=[leaf], must_not=[ChannelLeaf(fid, const=1.0)])

    def function_value_sql(self, functions: list, score_mode: str) -> tuple[str, bool]:
        """Compile the functions list to one SQL expression (the combined
        function value; query_dsl._function_score twin). Returns (sql, total)
        where total means the expression is defined for every doc."""
        parts = []
        for fn in functions:
            if "weight" in fn and not ({"field_value_factor", "script_score"} & fn.keys()):
                val = repr(float(fn["weight"]))
            elif "field_value_factor" in fn:
                fv = fn["field_value_factor"]
                v = (
                    f"coalesce(cast({fv['field']} as double), "
                    f"cast({float(fv.get('missing', 1.0))!r} as double)) * "
                    f"cast({float(fv.get('factor', 1.0))!r} as double)"
                )
                mod = fv.get("modifier", "none")
                if mod == "log1p":
                    v = f"log10(({v}) + 1.0)"  # ES log1p is log10(v+1)
                elif mod == "sqrt":
                    v = f"sqrt({v})"
                elif mod != "none":
                    raise ValueError(f"modifier {mod} unsupported")
                val = f"({v}) * cast({float(fn.get('weight', 1.0))!r} as double)"
            elif "script_score" in fn:
                from ..functions import painless

                _ss = painless.script_sql(fn["script_score"]["script"])
                val = (
                    f"(cast(({_ss}) as double)) * "
                    f"cast({float(fn.get('weight', 1.0))!r} as double)"
                )
            else:
                raise ValueError(f"unsupported function: {list(fn)}")
            if "filter" in fn:
                ident = 1.0 if score_mode == "multiply" else 0.0
                val = (
                    f"case when {self.pred_sql(fn['filter'])} then ({val}) "
                    f"else cast({ident!r} as double) end"
                )
            parts.append(f"({val})")
        if score_mode in ("multiply", "sum"):
            op = " * " if score_mode == "multiply" else " + "
            sql = op.join(parts)
        elif score_mode == "max":
            sql = "greatest(" + ", ".join(parts) + ")"
        elif score_mode == "min":
            sql = "least(" + ", ".join(parts) + ")"
        elif score_mode == "avg":
            sql = "(" + " + ".join(parts) + f") / {float(len(parts))!r}"
        else:
            raise ValueError(score_mode)
        return sql, True

    # -- scoring-context lowering (mirrors query_dsl._scored_leaf/_compile)
    def lower(self, q: dict) -> object:
        from ..plans.query_dsl import normalize_query

        q = normalize_query(q)
        (kind, body), = q.items()
        if kind == "match":
            return self.match_leaf(body)
        if kind == "match_phrase":
            return self.phrase_leaf(body)
        if kind == "match_phrase_prefix":
            return self.phrase_leaf(body, prefix=True)
        if kind in ("term", "terms"):
            (col, v), = body.items()
            vals = list(v) if kind == "terms" else [v["value"] if isinstance(v, dict) else v]
            if (
                col in KEYWORD_FIELDS
                and not self.snap.delete_files
                and all(isinstance(x, str) for x in vals)
            ):
                # exact values answered from the keyword-subfield postings in
                # O(df). Stores with deletes stay on the channel path: the
                # dictionary df still counts deleted docs, the doc-count job
                # doesn't. Segments from manifests written before keyword
                # subfields existed would silently have df=0 for every value,
                # so the capability marker gates the rewrite per snapshot.
                if all(
                    kw_field(col) in (seg.metrics.get("posting_fields") or ())
                    for seg in self.snap.segments
                ):
                    return self.keyword_postings_leaf(kw_field(col), vals)
            return self.keyword_idf_leaf(col, vals)
        if kind in ("range", "exists", "ids", "match_all", "match_none", "script"):
            fid = self.chan(f"case when {self.pred_sql(q)} then 1.0 end", "allow")
            return ChannelLeaf(fid, const=1.0)
        if kind in ("prefix", "wildcard", "regexp"):
            (col, v), = body.items()
            v = v["value"] if isinstance(v, dict) else v
            return self.expansion_leaf(col, kind, v)
        if kind == "fuzzy":
            (col, v), = body.items()
            spec = v if isinstance(v, dict) else {"value": v}
            return self.expansion_leaf(
                col, "fuzzy", (spec["value"], int(spec.get("fuzziness", 2))),
                max_expansions=int(spec.get("max_expansions", DEFAULT_MAX_EXPANSIONS)),
            )
        if kind == "constant_score":
            inner = self.lower(body["filter"])
            return ConstScoreNode(inner, float(body.get("boost", 1.0)))
        if kind == "bool":
            return self.lower_bool(body)
        if kind == "dis_max":
            qs = body.get("queries") or []
            return DisMaxNode([self.lower(x) for x in qs], float(body.get("tie_breaker", 0.0)))
        if kind == "boosting":
            pos = self.lower(body["positive"])
            fid = self.chan(
                f"case when {self.pred_sql(body['negative'])} then 1.0 end", "allow"
            )
            return BoostingNode(pos, fid, float(body.get("negative_boost", 0.5)))
        if kind == "function_score":
            child = self.lower(body.get("query", {"match_all": {}}))
            functions = body.get("functions", [])
            if not functions:
                return child
            sql, _ = self.function_value_sql(functions, body.get("score_mode", "multiply"))
            # pruning bound comes from the per-bucket channel max inside the
            # kernel (chan_ub) — no full-table max aggregation at lowering
            fid = self.chan(sql, "value")
            return FuncScoreNode(child, fid, body.get("boost_mode", "multiply"))
        if kind == "distance_feature":
            f_, origin, pivot = body["field"], body["origin"], float(body["pivot"])
            boost = float(body.get("boost", 1.0))
            sql = (
                f"case when {f_} is not null then cast({boost!r} as double) * "
                f"cast({pivot!r} as double) / (cast({pivot!r} as double) + "
                f"abs(cast({f_} as double) - cast({float(origin)!r} as double))) end"
            )
            fid = self.chan(sql, "value", ub=boost)
            return ChannelLeaf(fid, const=None)
        if kind == "rank_feature":
            # mapper-extras RankFeatureQueryBuilder.java:47-294 — docs-only
            # value channel like distance_feature; saturation/sigmoid are
            # bounded by boost (WAND ub), log is unbounded (ub=inf)
            f_ = body["field"]
            boost = float(body.get("boost", 1.0))
            vv = f"cast({f_} as double)"
            specs = {k: body[k] for k in ("saturation", "log", "sigmoid") if k in body}
            if len(specs) != 1:
                raise ValueError("rank_feature needs exactly one of saturation/log/sigmoid")
            (fn_, spec), = specs.items()
            if fn_ == "saturation":
                if "pivot" not in spec:
                    raise ValueError("rank_feature saturation requires an explicit pivot")
                e = f"{vv} / ({vv} + {float(spec['pivot'])!r})"
                ub = boost
            elif fn_ == "log":
                e = f"ln({float(spec['scaling_factor'])!r} + {vv})"
                ub = float("inf")
            else:
                p, x = float(spec["pivot"]), float(spec["exponent"])
                e = f"power({vv}, {x!r}) / (power({vv}, {x!r}) + {p ** x!r})"
                ub = boost
            sql = (
                f"case when {f_} is not null and {vv} > 0 "
                f"then cast({boost!r} as double) * ({e}) end"
            )
            fid = self.chan(sql, "value", ub=ub)
            return ChannelLeaf(fid, const=None)
        if kind == "terms_set":
            (col, spec), = body.items()
            if col not in INDEXED_FIELDS:
                raise ValueError(f"terms_set on non-indexed field {col}")
            terms = [t.lower() for t in spec["terms"]]
            msm_expr = spec.get("minimum_should_match_field") or spec.get(
                "minimum_should_match_script"
            )
            fid = self.chan(f"cast(({msm_expr}) as double)", "value")
            return TermsLeaf(field=col, terms=list(dict.fromkeys(terms)), need_fid=fid)
        if kind == "more_like_this":
            return self.mlt_leaf(body)
        if kind == "multi_match_cross":
            # cross_fields: per analyzed term a dis_max over one blended
            # single-term leaf per field (BlendedTermQuery — idf_override
            # bound at stats time), terms combined bool-should with msm
            # (or need=all for operator and). Twin of
            # plans/query_dsl._multi_match_cross and the oracle's
            # _multi_match_cross_sql.
            qterms = list(dict.fromkeys(analysis.analyze(body["query"])))
            if not qterms:
                return TermsLeaf(field="text", terms=[], need=1)
            fields = list(body["fields"])
            for f in fields:
                if f not in INDEXED_FIELDS:
                    raise ValueError(f"cross_fields on non-indexed field {f}")
            op = str(body.get("operator", "or")).lower()
            need = (
                len(qterms) if op == "and"
                else int(body.get("minimum_should_match") or 1)
            )
            return BoolNode(
                should=[
                    DisMaxNode(
                        children=[
                            TermsLeaf(
                                field=f, terms=[t], need=1,
                                idf_blend_fields=fields,
                            )
                            for f in fields
                        ],
                        tie=float(body.get("tie_breaker", 0.0)),
                    )
                    for t in qterms
                ],
                msm=need,
            )
        if kind == "intervals":
            (field_, spec), = body.items()
            if field_ not in INDEXED_FIELDS:
                raise ValueError(f"intervals on non-indexed field {field_}")
            src = spec["match"]
            steps = src.get("steps")
            if steps:
                # per-position term specs (span_multi nested in span_near):
                # a {"prefix": v} step expands against the term dictionary —
                # the chain position accepts ANY expanded term (tuple step)
                qterms = []
                for st in steps:
                    if isinstance(st, str):
                        qterms.append(st)
                        continue
                    if set(st) == {"any"}:
                        # Intervals.or over single terms: the position
                        # accepts any member — tuple step, no expansion job
                        qterms.append(tuple(t.lower() for t in st["any"]))
                        continue
                    if set(st) == {"prefix"}:
                        ekind, eval_ = "prefix", st["prefix"]
                    elif set(st) == {"pattern"}:
                        # Intervals.wildcard — the canonical step carries the
                        # shared anchored-regex translation already
                        ekind, eval_ = "anchored_regex", st["pattern"]
                    elif set(st) == {"fuzzy"}:
                        # Intervals.fuzzy — AUTO already resolved to an edit
                        # count at canonicalization; raises past the 128-term
                        # cap like prefix steps (documented divergence from
                        # FuzzyQuery's silent 50-term truncation: a silent
                        # cap would diverge from the logical/oracle twins)
                        ekind, eval_ = "fuzzy", tuple(st["fuzzy"])
                    else:
                        raise ValueError(f"unsupported intervals step: {st}")
                    exps = expand_terms(
                        self.spark, self.store, self.snap, field_, ekind,
                        eval_,
                        max_clause_count=INTERVALS_MAX_EXPANSIONS,
                    )
                    if not exps:
                        return TermsLeaf(field=field_, terms=[], need=1)
                    qterms.append(tuple(exps))
            else:
                qterms = analysis.analyze(src["query"])
            ordered = bool(src.get("ordered", False))
            not_q = src.get("not_query")
            not_terms = analysis.analyze(not_q) if not_q else None
            first_end = src.get("first_end")
            within_q = src.get("within_query")
            within_terms = analysis.analyze(within_q) if within_q else None
            if within_terms is not None:
                if len(qterms) != 1 or not_terms or first_end is not None:
                    raise ValueError("within_query needs a bare single term")
                if not 1 <= len(within_terms) <= 2:
                    raise ValueError("within_query big chain supports arity <= 2")
            if len(qterms) > 2 and not ordered:
                # merged-stream minimal-covering-window kernel: needs plain
                # distinct single-field terms (tuple steps / masked fields /
                # duplicate terms would allow position overlap, a different
                # algebra) and no positional side-constraints
                if (
                    any(isinstance(t, tuple) for t in qterms)
                    or src.get("fields")
                    or not_terms
                    or first_end is not None
                    or within_q
                    or len(set(qterms)) != len(qterms)
                ):
                    raise ValueError(
                        "unordered intervals with arity > 2 need plain "
                        "distinct single-field terms"
                    )
            if first_end is not None and len(qterms) != 1:
                raise ValueError("first_end (span_first) supports a single term")
            if not_terms and not (ordered or len(qterms) == 1):
                raise ValueError("not_query (span_not) needs ordered or single-term")
            if not qterms:
                return TermsLeaf(field=field_, terms=[], need=1)  # matches nothing
            term_fields = src.get("fields")
            if term_fields is not None:
                if len(term_fields) != len(qterms):
                    raise ValueError("intervals `fields` must align with the steps")
                if within_terms is not None or first_end is not None:
                    raise ValueError(
                        "per-step fields support plain ordered/unordered chains"
                    )
                if any(isinstance(st, tuple) for st in qterms):
                    raise ValueError("per-step fields cannot combine with span_multi")
            step_gaps = src.get("gaps")
            if step_gaps is not None:
                if len(step_gaps) != max(len(qterms) - 1, 0):
                    raise ValueError("intervals `gaps` must have one entry per adjacency")
                if sum(step_gaps) and (
                    not ordered or within_terms is not None or first_end is not None
                ):
                    raise ValueError("gaps (span_gap) need a plain ordered chain")
            return IntervalsLeaf(
                field=field_,
                terms=qterms,
                ordered=ordered,
                max_gaps=int(src.get("max_gaps", -1)),
                first_end=None if first_end is None else int(first_end),
                not_terms=not_terms,
                within_terms=within_terms,
                within_gaps=int(src.get("within_gaps", -1)),
                within_mode=src.get("within_mode", "little"),
                term_fields=term_fields,
                gaps=step_gaps,
                span_stream=bool(src.get("span_stream", False)),
            )
        raise ValueError(f"indexed path cannot lower: {kind}")

    def lower_bool(self, body: dict) -> BoolNode:
        def as_list(x):
            return [] if x is None else (x if isinstance(x, list) else [x])

        node = BoolNode()
        for q in as_list(body.get("must")):
            node.must.append(self.lower(q))
        for q in as_list(body.get("filter")):
            try:
                pred = self.pred_sql(q)
                node.filter_fids.append(self.chan(f"case when {pred} then 1.0 end", "allow"))
            except ValueError:
                # analyzed clause in filter context: matches, contributes 0
                node.must.append(ConstScoreNode(self.lower(q), 0.0))
        for q in as_list(body.get("must_not")):
            try:
                pred = self.pred_sql(q)
                # SQL tri-state parity with the logical path: candidates must
                # satisfy NOT(pred) being TRUE (docs where pred is NULL drop)
                node.filter_fids.append(
                    self.chan(f"case when not ({pred}) then 1.0 end", "allow")
                )
            except ValueError:
                node.must_not.append(self.lower(q))
        should = as_list(body.get("should"))
        msm = body.get("minimum_should_match")
        has_anchor = bool(body.get("must") or body.get("filter"))
        node.msm = int(msm) if msm is not None else (0 if has_anchor else 1)
        for q in should:
            node.should.append(self.lower(q))
        if not (node.must or node.should or node.must_not or node.filter_fids):
            raise ValueError("empty bool lowers to match_all (docs-only)")
        return node


# ------------------------------------------------------- tree introspection
def _tree_children(node) -> list:
    if isinstance(node, BoolNode):
        return node.must + node.should + node.must_not
    if isinstance(node, DisMaxNode):
        return node.children
    if isinstance(node, (ConstScoreNode, FuncScoreNode)):
        return [node.child]
    if isinstance(node, BoostingNode):
        return [node.positive]
    return []


def _collect_ft(node, out: set, phrases: set):
    if isinstance(node, TermsLeaf):
        out.update((node.field, t) for t in node.terms)
    elif isinstance(node, IntervalsLeaf):
        # a step is a term, or a tuple of expanded terms (span_multi step);
        # a masked step (field_masking_span) reads its own field's postings
        fts = {
            (node.step_field(i), t)
            for i, st in enumerate(node.terms)
            for t in (st if isinstance(st, tuple) else (st,))
        }
        fts |= {(node.field, t) for t in (node.not_terms or [])}
        fts |= {(node.field, t) for t in (node.within_terms or [])}
        out.update(fts)
        phrases.update(fts)  # positions must be decoded
    elif isinstance(node, PhraseLeaf):
        fts = {(node.field, t) for t in node.terms}
        if node.prefix_expansions is not None:
            fts |= {(node.field, t) for t in node.prefix_expansions}
        out.update(fts)
        phrases.update(fts)
    for c in _tree_children(node):
        _collect_ft(c, out, phrases)


def _anchored(node) -> bool:
    """True iff every match of `node` requires >= 1 postings-leaf hit, so the
    kernel candidate set (docs appearing in the query terms' postings) is
    complete. Non-anchored trees run the docs-only plan."""
    if isinstance(node, (TermsLeaf, PhraseLeaf, IntervalsLeaf)):
        return True
    if isinstance(node, ChannelLeaf):
        return False
    if isinstance(node, BoolNode):
        if any(_anchored(c) for c in node.must):
            return True
        return node.msm >= 1 and bool(node.should) and all(
            _anchored(c) for c in node.should
        )
    if isinstance(node, DisMaxNode):
        return bool(node.children) and all(_anchored(c) for c in node.children)
    if isinstance(node, (ConstScoreNode, FuncScoreNode)):
        return _anchored(node.child)
    if isinstance(node, BoostingNode):
        return _anchored(node.positive)
    raise TypeError(type(node))


def lower_query(spark, store, snap, docs: DataFrame, query: dict):
    """Lower an ES query dict to a KernelPlan (postings-anchored) or a
    DocsPlan (pure doc-values). Raises ValueError for shapes neither plan can
    express (those run the logical path)."""
    lw = _Lowerer(spark, store, snap, docs)
    tree = lw.lower(query)
    if _anchored(tree):
        fts: set = set()
        phrases: set = set()
        _collect_ft(tree, fts, phrases)
        return KernelPlan(tree, lw.channels, sorted(fts), phrases)
    return DocsPlan(tree, lw.channels)


# -------------------------------------------------------------- the kernel
def _make_kernel(spec_tree, weights, avgdl, k, phrase_fts):
    """Build the cogrouped-Arrow kernel closure. Pure numpy inside.

    Value-channel pruning bounds are derived per bucket from the channel
    rows themselves (chan_ub) — no precomputed global bound is needed.
    """
    import numpy as np

    k1, b = scoring.K1, scoring.B
    kp1 = k1 + 1.0
    decode_tbl = np.array([scoring.byte4_to_int(x) for x in range(256)], dtype=np.float64)

    def kernel(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        from elasticsearch_spark.functions.codec import delta_decode, varbyte_decode

        empty = pd.DataFrame({"segment": [], "ordinal": [], "score": []}).astype(
            {"segment": str, "ordinal": "int64", "score": "float64"}
        )
        if left.empty:
            return empty
        segment = left["segment"].iloc[0]

        chan_ord: dict[int, np.ndarray] = {}
        chan_val: dict[int, np.ndarray] = {}
        if len(right):
            fids = right["fid"].to_numpy(dtype=np.int64)
            ords_r = right["ordinal"].to_numpy(dtype=np.int64)
            vals_r = right["val"].to_numpy(dtype=np.float64)
            for fid in np.unique(fids):
                m = fids == fid
                o, v = ords_r[m], vals_r[m]
                si = np.argsort(o)
                chan_ord[int(fid)] = o[si]
                chan_val[int(fid)] = v[si]
        deny = chan_ord.get(DENY_FID)
        # per-bucket value-channel upper bounds: tighter than any global
        # bound and computed from rows already shuffled here — no dedicated
        # full-table aggregation job at lowering time
        chan_ub = {
            fid: (float(np.nanmax(v)) if len(v) else 0.0)
            for fid, v in chan_val.items()
        }

        # ---- group postings rows by bk; per-(field,term) block bound data
        bks = left["bk"].to_numpy(dtype=np.int64)
        by_bk: dict[int, list[int]] = {}
        for i, bkv in enumerate(bks):
            by_bk.setdefault(int(bkv), []).append(i)

        flds = left["field"].to_numpy(dtype=object)
        terms_a = left["term"].to_numpy(dtype=object)
        mtf_a = left["max_tf"].to_numpy(dtype=np.float64)
        mdl_a = left["min_dlq"].to_numpy(dtype=np.float64)

        def block_present(rows):
            pres = {}
            for ri in rows:
                ft = (flds[ri], terms_a[ri])
                w = weights.get(ft, 0.0)
                ad = avgdl.get(flds[ri], 1.0)
                ub_t = w * kp1 * mtf_a[ri] / (
                    mtf_a[ri] + k1 * (1.0 - b + b * mdl_a[ri] / ad)
                )
                pres[ft] = (ub_t, mtf_a[ri], mdl_a[ri])
            return pres

        def node_bound(node, pres):
            """(possible, upper bound) of `node` within a block."""
            if isinstance(node, TermsLeaf):
                hit = [pres[(node.field, t)] for t in node.terms if (node.field, t) in pres]
                # a doc's postings live wholly in its ordinal's block, so a
                # block holding < need of the leaf's terms cannot match
                need = 1 if node.need_fid is not None else max(node.need, 1)
                if len(hit) < need:
                    return False, 0.0
                if node.const_score is not None:
                    return True, node.const_score
                return True, float(sum(h[0] for h in hit))
            if isinstance(node, PhraseLeaf):
                slots = [[t] for t in node.terms]
                if node.prefix_expansions is not None:
                    slots.append(list(node.prefix_expansions))
                if not slots:
                    return False, 0.0
                m = np.inf
                tot = 0.0
                mindlq = np.inf
                for slot in slots:
                    best = 0.0
                    for t in slot:
                        h = pres.get((node.field, t))
                        if h is not None:
                            best = max(best, h[1])
                            mindlq = min(mindlq, h[2])
                    if best == 0.0:
                        return False, 0.0
                    m = min(m, best)
                    tot += best
                if node.slop > 0:
                    # sloppy pf can exceed any single term's tf (several
                    # minimal windows may share one occurrence) but never the
                    # total number of anchors = sum of term occurrences
                    m = tot
                ad = avgdl.get(node.field, 1.0)
                ub = node.weight * kp1 * m / (m + k1 * (1.0 - b + b * mindlq / ad))
                return True, float(ub)
            if isinstance(node, IntervalsLeaf):
                # every interval step must sit in the doc => in the doc's
                # block; a tuple step (span_multi expansion) needs ANY member
                # (within-chain terms are required too; not_terms are not).
                # Freq bound: every minimal interval consumes at least one
                # occurrence of some involved term, so pf <= sum of block-max
                # tfs; the BM25 wrap is monotone in freq, so plugging the
                # over-estimate in gives a sound block upper bound (the old
                # raw-freq scoring had no finite bound — constant 1.0 was an
                # under-estimate whenever pf > 1).
                tot = 0.0
                mindlq = np.inf
                for i, st in enumerate(node.terms):
                    opts = st if isinstance(st, tuple) else (st,)
                    fld = node.step_field(i)
                    hit = [pres[(fld, t)] for t in opts if (fld, t) in pres]
                    if not hit:
                        return False, 0.0
                    tot += sum(h[1] for h in hit)
                    mindlq = min(mindlq, min(h[2] for h in hit))
                for t in node.within_terms or []:
                    h = pres.get((node.field, t))
                    if h is None:
                        return False, 0.0
                    tot += h[1]
                    mindlq = min(mindlq, h[2])
                ad = avgdl.get(node.field, 1.0)
                ub = node.weight * kp1 * tot / (
                    tot + k1 * (1.0 - b + b * mindlq / ad)
                )
                return True, float(ub)
            if isinstance(node, ChannelLeaf):
                if node.const is not None:
                    return True, node.const
                return True, chan_ub.get(node.fid, 0.0)
            if isinstance(node, BoolNode):
                ub = 0.0
                for c in node.must:
                    p, u = node_bound(c, pres)
                    if not p:
                        return False, 0.0
                    ub += u
                sh = [node_bound(c, pres) for c in node.should]
                n_poss = sum(1 for p, _ in sh if p)
                if node.msm > 0 and n_poss < node.msm:
                    return False, 0.0
                ub += sum(u for p, u in sh if p)
                return True, ub
            if isinstance(node, DisMaxNode):
                ubs = [u for p, u in (node_bound(c, pres) for c in node.children) if p]
                if not ubs:
                    return False, 0.0
                mx, sm = max(ubs), sum(ubs)
                return True, mx + node.tie * (sm - mx)
            if isinstance(node, ConstScoreNode):
                p, _ = node_bound(node.child, pres)
                return p, node.boost
            if isinstance(node, FuncScoreNode):
                p, u = node_bound(node.child, pres)
                if not p:
                    return False, 0.0
                bmax = max(chan_ub.get(node.fid, 0.0), 0.0)
                if node.boost_mode == "multiply":
                    # a matching doc absent from the channel scores factor 1
                    return True, u * max(bmax, 1.0)
                if node.boost_mode == "sum":
                    return True, u + bmax
                return True, bmax  # replace
            if isinstance(node, BoostingNode):
                p, u = node_bound(node.positive, pres)
                return p, u * max(1.0, node.negative_boost)
            raise TypeError(type(node))

        uniq_bks = sorted(by_bk)
        bounds = []
        pres_by_bk = {}
        for bkv in uniq_bks:
            pres = block_present(by_bk[bkv])
            pres_by_bk[bkv] = pres
            possible, ub = node_bound(spec_tree, pres)
            bounds.append(ub if possible else -1.0)
        bound_arr = np.array(bounds)
        order = np.argsort(-bound_arr, kind="stable")

        def chan_presence(fid, docs_u):
            co = chan_ord.get(fid)
            if co is None:
                return np.zeros(len(docs_u), dtype=bool)
            pos = np.searchsorted(co, docs_u)
            return (pos < len(co)) & (co[np.minimum(pos, len(co) - 1)] == docs_u)

        def chan_value(fid, docs_u, default=np.nan):
            co = chan_ord.get(fid)
            out = np.full(len(docs_u), default, dtype=np.float64)
            if co is None:
                return out
            pos = np.searchsorted(co, docs_u)
            ok = (pos < len(co)) & (co[np.minimum(pos, len(co) - 1)] == docs_u)
            out[ok] = chan_val[fid][np.minimum(pos, len(co) - 1)][ok]
            return out

        def eval_node(node, env, docs_u):
            n = len(docs_u)
            if isinstance(node, TermsLeaf):
                cnt = np.zeros(n, dtype=np.int64)
                score = np.zeros(n)
                for t in node.terms:
                    e = env.get((node.field, t))
                    if e is None:
                        continue
                    ii = np.searchsorted(docs_u, e[0])
                    cnt[ii] += 1
                    if node.const_score is None:
                        w = (
                            node.idf_override.get(t, 0.0)
                            if node.idf_override is not None
                            else weights.get((node.field, t), 0.0)
                        )
                        score[ii] += w * e[1]
                if node.need_fid is not None:
                    needv = chan_value(node.need_fid, docs_u, default=np.inf)
                    match = cnt >= np.maximum(needv, 1.0)
                else:
                    match = cnt >= max(node.need, 1)
                if node.const_score is not None:
                    score = np.where(match, node.const_score, 0.0)
                return match, score
            if isinstance(node, PhraseLeaf):
                slots = [[t] for t in node.terms]
                if node.prefix_expansions is not None:
                    slots.append(list(node.prefix_expansions))
                if not slots:
                    return np.zeros(n, dtype=bool), np.zeros(n)
                if node.slop > 0:
                    # sloppy phrase: adjusted occurrence keys k + (m-1-i) put
                    # every legal window inside one doc's key range (positions
                    # are << 2^32 so the +offset cannot cross an ordinal)
                    m_ = len(node.terms)
                    adj = []
                    for i, t in enumerate(node.terms):
                        e = env.get((node.field, t))
                        if e is None or e[3] is None or not len(e[3]):
                            return np.zeros(n, dtype=bool), np.zeros(n)
                        adj.append(e[3] + (m_ - 1 - i))
                    anchors = np.unique(np.concatenate(adj))
                    hi = anchors >> _POS_SHIFT
                    good = np.ones(len(anchors), dtype=bool)
                    mx = anchors.copy()
                    for arr in adj:
                        idx = np.searchsorted(arr, anchors)
                        ok = idx < len(arr)
                        v = arr[np.minimum(idx, len(arr) - 1)]
                        ok &= (v >> _POS_SHIFT) == hi
                        ok &= (v - anchors) <= node.slop
                        good &= ok
                        mx = np.where(ok, np.maximum(mx, v), mx)
                    if not good.any():
                        return np.zeros(n, dtype=bool), np.zeros(n)
                    contrib = 1.0 / (1.0 + (mx[good] - anchors[good]))
                    pdocs, inv = np.unique(hi[good], return_inverse=True)
                    pf = np.bincount(inv, weights=contrib)
                else:
                    surv = None
                    for i, slot in enumerate(slots):
                        keys = [env[(node.field, t)][3] for t in slot if (node.field, t) in env]
                        keys = [kk for kk in keys if kk is not None and len(kk)]
                        if not keys:
                            return np.zeros(n, dtype=bool), np.zeros(n)
                        kcat = keys[0] if len(keys) == 1 else np.concatenate(keys)
                        if surv is None:
                            surv = np.unique(kcat)
                        else:
                            surv = np.intersect1d(surv + 1, kcat, assume_unique=False)
                        if not len(surv):
                            return np.zeros(n, dtype=bool), np.zeros(n)
                    pdocs, pf = np.unique(surv >> _POS_SHIFT, return_counts=True)
                # dlq per matched doc from the first slot's postings
                dlq = np.full(len(pdocs), np.nan)
                for t in slots[0]:
                    e = env.get((node.field, t))
                    if e is None:
                        continue
                    pos = np.searchsorted(e[0], pdocs)
                    ok = (pos < len(e[0])) & (e[0][np.minimum(pos, len(e[0]) - 1)] == pdocs)
                    dlq[ok] = e[2][np.minimum(pos, len(e[0]) - 1)][ok]
                ad = avgdl.get(node.field, 1.0)
                norm = k1 * (1.0 - b + b * dlq / ad)
                sc = node.weight * kp1 * pf / (pf + norm)
                match = np.zeros(n, dtype=bool)
                score = np.zeros(n)
                ii = np.searchsorted(docs_u, pdocs)
                match[ii] = True
                score[ii] = sc
                return match, score
            if isinstance(node, IntervalsLeaf):
                # all occurrence-key math stays inside one doc because the
                # ordinal occupies the high bits: a searchsorted neighbor from
                # another doc fails the high-bits equality check
                def keys_of(t, fld=node.field):
                    if isinstance(t, tuple):
                        # span_multi step: any expanded term fills the
                        # position — union of the members' occurrence keys
                        parts = [
                            env[(fld, x)][3]
                            for x in t
                            if env.get((fld, x)) is not None
                        ]
                        parts = [p for p in parts if len(p)]
                        if not parts:
                            return None
                        return np.unique(np.concatenate(parts))
                    e = env.get((fld, t))
                    return None if e is None else e[3]

                m_ = len(node.terms)
                ks = [keys_of(t, node.step_field(i)) for i, t in enumerate(node.terms)]
                if m_ == 0 or any(kk is None or not len(kk) for kk in ks):
                    return np.zeros(n, dtype=bool), np.zeros(n)
                def _sumfreq_scores(occ, slops):
                    # per-doc freq = sum of 1/(1 + slop) over the MINIMAL
                    # intervals (callers pass one row per minimal interval),
                    # then fed through the field similarity exactly as
                    # SpanWeight does: SimScorer.score(freq, norm)
                    hd = occ >> _POS_SHIFT
                    hit, inv = np.unique(hd, return_inverse=True)
                    pf = np.bincount(
                        inv, weights=1.0 / (1.0 + slops.astype(np.float64))
                    )
                    # dl_q per hit doc from any involved term's postings
                    # (norms of the query's field; masked steps fall back to
                    # their own field's dl — FieldMaskingSpanQuery's
                    # documented cross-field norms caveat)
                    dlq = np.full(len(hit), np.nan)
                    cand_fts = sorted(node.weight_fts()) + [
                        (node.step_field(i), t)
                        for i, st in enumerate(node.terms)
                        if isinstance(st, tuple)
                        for t in st
                    ]
                    for ft in cand_fts:
                        if not np.isnan(dlq).any():
                            break
                        e = env.get(ft)
                        if e is None or not len(e[0]):
                            continue
                        pos = np.searchsorted(e[0], hit)
                        ok = (pos < len(e[0])) & (
                            e[0][np.minimum(pos, len(e[0]) - 1)] == hit
                        )
                        todo = ok & np.isnan(dlq)
                        dlq[todo] = e[2][np.minimum(pos, len(e[0]) - 1)][todo]
                    ad = avgdl.get(node.field, 1.0)
                    dlq = np.where(np.isnan(dlq), ad, dlq)
                    norm = k1 * (1.0 - b + b * dlq / ad)
                    sc = node.weight * kp1 * pf / (pf + norm)
                    match = np.zeros(n, dtype=bool)
                    score = np.zeros(n)
                    ii = np.searchsorted(docs_u, hit)
                    match[ii] = True
                    score[ii] = sc
                    return match, score

                if node.within_terms is not None:
                    q = ks[0]
                    wks = [keys_of(t) for t in node.within_terms]
                    if any(w is None or not len(w) for w in wks):
                        return np.zeros(n, dtype=bool), np.zeros(n)
                    if node.within_mode == "big":
                        # span_containing scores the BIG span stream: per-
                        # start greedy big spans that contain a little each
                        # contribute 1/(1 + slop); under span_stream every
                        # EMITTED span counts (SpanContainingQuery — no
                        # containment minimization), the intervals algebra
                        # additionally dedups same-end spans
                        if len(wks) == 1:
                            # width-0 big spans: contain a little iff they
                            # share its position; slop 0
                            inter = wks[0][np.isin(wks[0], q)]
                            return _sumfreq_scores(
                                inter, np.zeros(len(inter), np.int64)
                            )
                        barr, carr = wks[0], wks[1]
                        idx = np.searchsorted(carr, barr + 1)
                        ok = idx < len(carr)
                        e = carr[np.minimum(idx, len(carr) - 1)]
                        ok &= (e >> _POS_SHIFT) == (barr >> _POS_SHIFT)
                        s_, e_ = barr[ok], e[ok]
                        sl = e_ - s_ - 1
                        keep = np.ones(len(e_), dtype=bool)
                        if len(e_) > 1 and not node.span_stream:
                            keep[:-1] = e_[:-1] != e_[1:]
                        if node.within_gaps >= 0:
                            keep &= sl <= node.within_gaps
                        # containment: first little occurrence >= start must
                        # not exceed the end (keys pack ordinal|pos, so a
                        # numeric hit is automatically same-doc)
                        iq = np.searchsorted(q, s_)
                        has = (iq < len(q)) & (
                            q[np.minimum(iq, len(q) - 1)] <= e_
                        )
                        keep &= has
                        return _sumfreq_scores(s_[keep], sl[keep])
                    # span_within scores the LITTLE span stream: each
                    # enclosed little occurrence is a width-0 span (freq 1).
                    # The minimal-width ENCLOSING pair is (max pb <= q,
                    # min pc >= q), so if that pair violates within_gaps no
                    # other enclosing pair can satisfy it.
                    if len(wks) == 1:
                        # big = single-term span [pb, pb]: q must equal pb
                        good = np.isin(q, wks[0])
                    elif node.span_stream:
                        # SpanWithinQuery tests containment against EMITTED
                        # big spans: the greedy chain of the latest lead
                        # pb* <= q dominates (see class docstring proof)
                        barr, carr = wks[0], wks[1]
                        ib = np.searchsorted(barr, q, side="right") - 1
                        okb = ib >= 0
                        pb = barr[np.maximum(ib, 0)]
                        okb &= (pb >> _POS_SHIFT) == (q >> _POS_SHIFT)
                        ic = np.searchsorted(carr, pb + 1)
                        okc = ic < len(carr)
                        e = carr[np.minimum(ic, len(carr) - 1)]
                        okc &= (e >> _POS_SHIFT) == (q >> _POS_SHIFT)
                        good = okb & okc & (e >= q)
                        if node.within_gaps >= 0:
                            good &= (e - pb - 1) <= node.within_gaps
                    else:
                        barr, carr = wks[0], wks[1]

                        def _near(arr, idx, ref):
                            ok = (idx >= 0) & (idx < len(arr))
                            v = arr[np.clip(idx, 0, len(arr) - 1)]
                            ok &= (v >> _POS_SHIFT) == (ref >> _POS_SHIFT)
                            return ok, v

                        ib = np.searchsorted(barr, q, side="right") - 1
                        okb, pb = _near(barr, ib, q)
                        ic = np.searchsorted(carr, q, side="left")
                        okc, pc = _near(carr, ic, q)

                        def _pair_ok(ok1, v1, ok2, v2):
                            g2 = ok1 & ok2 & (v2 > v1)
                            if node.within_gaps >= 0:
                                g2 &= (v2 - v1 - 1) <= node.within_gaps
                            return g2

                        good = _pair_ok(okb, pb, okc, pc)
                        # degenerate minimal pair (pb == pc: the little
                        # occurrence coincides with a shared big-slot
                        # position, only possible when the two big slots hold
                        # the same term) — try the 2nd-nearest on each side;
                        # wider pairs can only increase the window, so these
                        # two alternatives are exhaustive
                        deg = okb & okc & (pb == pc)
                        if deg.any():
                            okb2, pb2 = _near(barr, ib - 1, q)
                            okc2, pc2 = _near(carr, ic + 1, q)
                            good |= deg & (
                                _pair_ok(okb2, pb2, okc, pc)
                                | _pair_ok(okb, pb, okc2, pc2)
                            )
                    kq = q[good]
                    return _sumfreq_scores(kq, np.zeros(len(kq), np.int64))

                if m_ == 1:
                    k0 = ks[0]
                    if node.first_end is not None:
                        k0 = k0[(k0 & ((1 << _POS_SHIFT) - 1)) < node.first_end]
                    if node.not_terms:
                        ex = [keys_of(t) for t in node.not_terms]
                        ex = [e for e in ex if e is not None and len(e)]
                        if ex:
                            k0 = k0[~np.isin(k0, np.concatenate(ex))]
                    # each surviving occurrence is a width-0 minimal
                    # interval: freq = occurrence count (SpanTermQuery /
                    # span_first / span_not sloppyFreq == 1 per span)
                    return _sumfreq_scores(k0, np.zeros(len(k0), np.int64))
                elif node.ordered:
                    # greedy minimal chain per start: the smallest valid
                    # successor at every step minimizes final width, so a
                    # failed greedy chain has no valid chain from that start.
                    # span_gap separations shift each successor search by the
                    # gap width (positions sit in the key's low bits; gap
                    # offsets stay far below 2^20 so the add cannot cross an
                    # ordinal — the high-bits check catches doc boundaries)
                    g = node.gaps or [0] * (m_ - 1)
                    g_total = sum(g)
                    start = ks[0]
                    cur = start.copy()
                    alive = np.ones(len(cur), dtype=bool)
                    for i in range(1, m_):
                        arr = ks[i]
                        idx = np.searchsorted(arr, cur + 1 + g[i - 1])
                        ok = idx < len(arr)
                        cand = arr[np.minimum(idx, len(arr) - 1)]
                        ok &= (cand >> _POS_SHIFT) == (cur >> _POS_SHIFT)
                        alive &= ok
                        cur = np.where(alive, cand, cur)
                    good = alive
                    if node.max_gaps >= 0:
                        good = good & (
                            (cur - start - (m_ - 1) - g_total) <= node.max_gaps
                        )
                    if node.not_terms:
                        # span_not over a span_near include: drop chains whose
                        # [start, end] window contains an excluded occurrence.
                        # The greedy (minimal) chain suffices: a wider chain
                        # from the same start spans a superset of positions.
                        ex = [keys_of(t) for t in node.not_terms]
                        ex = [e for e in ex if e is not None and len(e)]
                        if ex:
                            exk = np.unique(np.concatenate(ex))
                            idx_e = np.searchsorted(exk, start)
                            in_win = (idx_e < len(exk)) & (
                                exk[np.minimum(idx_e, len(exk) - 1)] <= cur
                            )
                            good = good & ~in_win
                    # greedy end is the minimal end from each start, so
                    # cur - start - (m-1) is the per-start minimal slop.
                    # span_stream (NearSpansOrdered): every per-lead chain is
                    # an emitted span — no minimization. Intervals algebra:
                    # minimal-INTERVAL set (no kept interval contains
                    # another): starts ascend and greedy ends are
                    # non-decreasing in start, so an interval contains
                    # exactly the later ones sharing its end — keep the
                    # largest start per distinct end (= narrowest).
                    s_, e_ = start[good], cur[good]
                    sl = (cur - start - (m_ - 1) - g_total)[good]
                    keep = np.ones(len(e_), dtype=bool)
                    if len(e_) > 1 and not node.span_stream:
                        keep[:-1] = e_[:-1] != e_[1:]
                    return _sumfreq_scores(s_[keep], sl[keep])
                elif m_ > 2 or (
                    all(isinstance(t, str) for t in node.terms)
                    and len(set(node.terms)) == m_
                    and not node.term_fields
                ):
                    # unordered, plain distinct single-field terms (arity
                    # >= 3 enforced at lowering; arity 2 routed here when
                    # eligible so pairs get the same freq-sum scoring):
                    # merged occurrence stream +
                    # running last-seen key per label. The minimal covering
                    # window ending at stream element e is
                    # [min_i last_i(e), e]; scanning every e finds the
                    # per-doc global minimum (minimum-window-covering). Keys
                    # pack (ordinal | pos), so a stale last-seen from an
                    # earlier doc fails the high-bits equality check.
                    labels = np.concatenate(
                        [np.full(len(kk), i, np.int64) for i, kk in enumerate(ks)]
                    )
                    allk = np.concatenate(ks)
                    o = np.argsort(allk, kind="stable")
                    allk, labels = allk[o], labels[o]
                    if node.span_stream:
                        # NearSpansUnordered min-advance walk: one window per
                        # merged occurrence s — [s, max over labels of that
                        # label's next occurrence >= s] (s is the min-start
                        # of exactly one visited configuration). Slop CHECK
                        # end - s - (m-1) <= slop; sloppy factor
                        # 1/(1 + (end - s)) (width() is START-TO-START —
                        # Lucene's ordered/unordered asymmetry). No
                        # minimization; distinct plain terms cannot tie.
                        int_max = np.iinfo(np.int64).max
                        end = np.full(len(allk), np.int64(-1))
                        cov = np.ones(len(allk), dtype=bool)
                        for i in range(m_):
                            v = np.where(labels == i, allk, int_max)
                            v = np.minimum.accumulate(v[::-1])[::-1]
                            ok_i = (v != int_max) & (
                                (v >> _POS_SHIFT) == (allk >> _POS_SHIFT)
                            )
                            cov &= ok_i
                            np.maximum(end, v, out=end)
                        slop = end - allk - (m_ - 1)
                        keep = cov
                        if node.max_gaps >= 0:
                            keep = keep & (slop <= node.max_gaps)
                        return _sumfreq_scores(
                            allk[keep], (end - allk)[keep]
                        )
                    min_last = np.full(len(allk), np.iinfo(np.int64).max)
                    for i in range(m_):
                        v = np.where(labels == i, allk, np.int64(-1))
                        np.maximum.accumulate(v, out=v)
                        np.minimum(min_last, v, out=min_last)
                    good = (min_last >= 0) & (
                        (min_last >> _POS_SHIFT) == (allk >> _POS_SHIFT)
                    )
                    # minimal-interval filter: window i (ending at allk[i],
                    # starting at min_last[i]) contains an earlier window j
                    # iff min_last[i] <= min_last[j]; keep i iff its start
                    # strictly exceeds the running max of previous covered
                    # starts. Keys carry the ordinal in the high bits, so a
                    # previous doc's start is always smaller — the running
                    # max needs no per-doc reset.
                    int_min = np.iinfo(np.int64).min
                    st = np.where(good, min_last, int_min)
                    run = np.maximum.accumulate(st)
                    prev = np.concatenate(([int_min], run[:-1]))
                    keep = good & (st > prev)
                    slop = allk - min_last - (m_ - 1)
                    if node.max_gaps >= 0:
                        keep &= slop <= node.max_gaps
                    return _sumfreq_scores(allk[keep], slop[keep])
                else:  # unordered pair with prefix/masked/duplicate steps
                    # per-END minimal windows over possibly-OVERLAPPING
                    # occurrence sets (prefix expansion / masked fields /
                    # duplicate terms can put both steps on one position; a
                    # window needs two DISTINCT positions, so the merged-
                    # stream per-label last-seen is unsound here). Every
                    # window ends at some occurrence x; the narrowest window
                    # ending at x pairs it with the closest strictly-earlier
                    # occurrence of the OTHER step (either role when x
                    # satisfies both). Minimality (running-max of starts),
                    # max_gaps after minimization, and freq-sum follow the
                    # merged-stream convention.
                    A, B = ks[0], ks[1]
                    ends = np.unique(np.concatenate([A, B]))
                    int_min = np.iinfo(np.int64).min

                    def _prev_lt(arr, x):
                        # max element of arr strictly below x, same doc
                        i = np.searchsorted(arr, x) - 1
                        ok = i >= 0
                        v = arr[np.maximum(i, 0)]
                        ok &= (v >> _POS_SHIFT) == (x >> _POS_SHIFT)
                        return np.where(ok, v, int_min)

                    inA = np.isin(ends, A)
                    inB = np.isin(ends, B)
                    pa = np.where(inB, _prev_lt(A, ends), int_min)
                    pb = np.where(inA, _prev_lt(B, ends), int_min)
                    st = np.maximum(pa, pb)
                    good = st > int_min
                    run = np.maximum.accumulate(np.where(good, st, int_min))
                    prev = np.concatenate(([int_min], run[:-1]))
                    keep = good & (st > prev)
                    slop = ends - st - 1
                    if node.max_gaps >= 0:
                        keep &= slop <= node.max_gaps
                    return _sumfreq_scores(ends[keep], slop[keep])
            if isinstance(node, ChannelLeaf):
                m = chan_presence(node.fid, docs_u)
                if node.const is not None:
                    return m, np.where(m, node.const, 0.0)
                v = chan_value(node.fid, docs_u)
                return m, np.where(m, v, 0.0)
            if isinstance(node, BoolNode):
                match = np.ones(n, dtype=bool)
                score = np.zeros(n)
                for c in node.must:
                    m, s = eval_node(c, env, docs_u)
                    match &= m
                    score += np.where(m, s, 0.0)
                for fid in node.filter_fids:
                    match &= chan_presence(fid, docs_u)
                if node.should:
                    cnt = np.zeros(n, dtype=np.int64)
                    for c in node.should:
                        m, s = eval_node(c, env, docs_u)
                        cnt += m
                        score += np.where(m, s, 0.0)
                    if node.msm > 0:
                        match &= cnt >= node.msm
                for c in node.must_not:
                    m, _ = eval_node(c, env, docs_u)
                    match &= ~m
                return match, score
            if isinstance(node, DisMaxNode):
                match = np.zeros(n, dtype=bool)
                smax = np.full(n, -np.inf)
                ssum = np.zeros(n)
                for c in node.children:
                    m, s = eval_node(c, env, docs_u)
                    match |= m
                    sm = np.where(m, s, -np.inf)
                    smax = np.maximum(smax, sm)
                    ssum += np.where(m, s, 0.0)
                # neutralize the -inf placeholder on non-matching rows BEFORE
                # the arithmetic (0 * -inf = nan trips numpy's invalid-add
                # warning even though np.where would mask it)
                smax = np.where(match, smax, 0.0)
                score = np.where(match, smax + node.tie * (ssum - smax), 0.0)
                return match, score
            if isinstance(node, ConstScoreNode):
                m, _ = eval_node(node.child, env, docs_u)
                return m, np.where(m, node.boost, 0.0)
            if isinstance(node, FuncScoreNode):
                m, s = eval_node(node.child, env, docs_u)
                # missing channel row = the functions' SQL evaluated to NULL
                # for that doc: identity per mode (never NaN — a NaN score
                # would poison the running top-k threshold)
                if node.boost_mode == "multiply":
                    s = s * chan_value(node.fid, docs_u, default=1.0)
                elif node.boost_mode == "sum":
                    s = s + chan_value(node.fid, docs_u, default=0.0)
                elif node.boost_mode == "replace":
                    s = chan_value(node.fid, docs_u, default=0.0)
                else:
                    raise ValueError(node.boost_mode)
                return m, np.where(m, s, 0.0)
            if isinstance(node, BoostingNode):
                m, s = eval_node(node.positive, env, docs_u)
                demote = chan_presence(node.neg_fid, docs_u)
                return m, np.where(demote, s * node.negative_boost, s)
            raise TypeError(type(node))

        cand_ord: list[np.ndarray] = []
        cand_score: list[np.ndarray] = []
        theta = -np.inf
        n_kept = 0
        topbuf = None  # running pool of the k best scores seen so far

        for oi in order:
            if bound_arr[oi] < 0.0:
                break  # impossible blocks sort last
            if n_kept >= k and bound_arr[oi] < theta:
                break  # block-max prune: no remaining block can reach top-k
            bkv = uniq_bks[oi]
            env: dict[tuple[str, str], tuple] = {}
            for ri in by_bk[bkv]:
                ft = (flds[ri], terms_a[ri])
                r = left.iloc[ri]
                ords = delta_decode(r["docs"])
                tfs_i = varbyte_decode(r["tfs"]).astype(np.int64)
                tfs = tfs_i.astype(np.float64)
                dlq = decode_tbl[np.frombuffer(r["norms"], dtype=np.uint8)]
                ad = avgdl.get(flds[ri], 1.0)
                tfn = kp1 * tfs / (tfs + k1 * (1.0 - b + b * dlq / ad))
                occ_keys = None
                if ft in phrase_fts:
                    if r["poss"] is None:
                        # legacy segment without position streams (unionByName
                        # null-filled): a positional query cannot degrade to a
                        # correct answer — fail loudly, not with a TypeError
                        raise ValueError(
                            f"segment {bkv!r} has no position stream for "
                            f"field/term {ft!r}; rebuild the segment to run "
                            "phrase/intervals queries"
                        )
                    # absolute positions from the concatenated delta stream
                    d = varbyte_decode(r["poss"]).astype(np.int64)
                    cs = np.cumsum(d)
                    if len(tfs_i) > 1:
                        base = np.concatenate([[0], cs[np.cumsum(tfs_i)[:-1] - 1]])
                    else:
                        base = np.array([0])
                    pos_abs = cs - np.repeat(base, tfs_i)
                    occ_keys = (np.repeat(ords, tfs_i) << _POS_SHIFT) | pos_abs
                env[ft] = (ords, tfn, dlq, occ_keys)
            if not env:
                continue
            docs_u = np.unique(np.concatenate([e[0] for e in env.values()]))
            match, score = eval_node(spec_tree, env, docs_u)
            if deny is not None:
                pos = np.searchsorted(deny, docs_u)
                hit = (pos < len(deny)) & (deny[np.minimum(pos, len(deny) - 1)] == docs_u)
                match &= ~hit
            if not match.any():
                continue
            docs_m, score_m = docs_u[match], score[match]
            cand_ord.append(docs_m)
            cand_score.append(score_m)
            n_kept += len(docs_m)
            # running top-k threshold in O(k + new) per block (a re-partition
            # of ALL accumulated candidates each block would be quadratic on
            # high-df queries)
            topbuf = (
                np.concatenate([topbuf, score_m]) if topbuf is not None else score_m
            )
            if len(topbuf) > k:
                topbuf = np.partition(topbuf, -k)[-k:]
            if len(topbuf) >= k:
                theta = topbuf.min()

        if not cand_ord:
            return empty
        o = np.concatenate(cand_ord)
        s = np.concatenate(cand_score)
        # local top-k with deterministic tie-break (ordinal asc == key asc)
        idx = np.lexsort((o, -s))[:k]
        return pd.DataFrame({"segment": segment, "ordinal": o[idx], "score": s[idx]})

    return kernel


def run_kernel(postings: DataFrame, extras: DataFrame, kernel) -> DataFrame:
    """Cogroup postings + channel rows by (segment, bucket), run the kernel."""
    pb = postings.withColumn("bucket", (F.col("bk") / BUCKET_BLOCKS).cast("int"))
    eb = extras.withColumn(
        "bucket", (F.col("ordinal") / (BLOCK_RANGE * BUCKET_BLOCKS)).cast("int")
    )
    return (
        pb.groupBy("segment", "bucket")
        .cogroup(eb.groupBy("segment", "bucket"))
        .applyInPandas(kernel, schema="segment string, ordinal long, score double")
    )


# --------------------------------------------------------------- execution
MAX_CHANNEL_PRUNE_RANGES = 256  # fall back to a full scan past this


def _candidate_block_pred(blocks: list[tuple[str, int]]):
    """OR-of-ordinal-range predicate covering the candidate postings blocks.

    An anchored kernel plan can only match docs that appear in at least one
    query-term postings row, and a doc's postings live in block
    bk = ordinal >> BLOCK_BITS of its own segment — so channel rows (docs
    scans for function_score values, terms_set thresholds, filters, ...)
    are only needed for ordinals inside the candidate blocks. The ranges
    are plain ordinal comparisons, so Parquet row-group pruning applies
    (docs files are ordinal-sorted). Returns None when the block list is too
    fragmented for a useful predicate (query terms spread over the whole
    corpus — a full scan is the honest plan then)."""
    by_seg: dict[str, list[int]] = {}
    for seg, bk in blocks:
        by_seg.setdefault(seg, []).append(bk)
    n_ranges = 0
    pred = None
    for seg, bks in sorted(by_seg.items()):
        bks = sorted(set(bks))
        ranges = []
        lo = prev = bks[0]
        for bk in bks[1:]:
            if bk == prev + 1:
                prev = bk
                continue
            ranges.append((lo, prev))
            lo = prev = bk
        ranges.append((lo, prev))
        n_ranges += len(ranges)
        if n_ranges > MAX_CHANNEL_PRUNE_RANGES:
            return None
        rc = None
        for lo_, hi_ in ranges:
            c = (F.col("ordinal") >= lo_ * BLOCK_RANGE) & (
                F.col("ordinal") < (hi_ + 1) * BLOCK_RANGE
            )
            rc = c if rc is None else (rc | c)
        c = (F.col("segment") == seg) & rc
        pred = c if pred is None else (pred | c)
    return pred


def _dv_conjunctive_constraints(nq: dict) -> list[tuple[str, int, int]]:
    """Conjunctive integer bounds (col, lo, hi) on NUMERIC_DV_COLS implied by
    the normalized query: every matching doc MUST satisfy each returned
    constraint (they come only from required context — top-level range/term,
    bool must/filter, constant_score filter). Disjunctive context (should,
    dis_max) never contributes."""
    from .index_build import NUMERIC_DV_COLS

    out: list[tuple[str, int, int]] = []

    def _as_int(v):
        return v if isinstance(v, int) and not isinstance(v, bool) else None

    def walk(q: dict):
        (kind, body), = q.items()
        if kind == "range":
            (field, spec), = body.items()
            if field not in NUMERIC_DV_COLS:
                return
            lo, hi = -(1 << 62), 1 << 62
            for op, v in spec.items():
                iv = _as_int(v)
                if iv is None:
                    return  # non-integer bound: stay on the full-scan plan
                if op == "gte":
                    lo = max(lo, iv)
                elif op == "gt":
                    lo = max(lo, iv + 1)
                elif op == "lte":
                    hi = min(hi, iv)
                elif op == "lt":
                    hi = min(hi, iv - 1)
            out.append((field, lo, hi))
        elif kind == "term":
            (field, v), = body.items()
            v = v.get("value") if isinstance(v, dict) else v
            iv = _as_int(v)
            if field in NUMERIC_DV_COLS and iv is not None:
                out.append((field, iv, iv))
        elif kind == "bool":
            for part in ("must", "filter"):
                cs = body.get(part) or []
                for c in (cs if isinstance(cs, list) else [cs]):
                    walk(c)
        elif kind == "constant_score":
            walk(body["filter"])

    walk(nq)
    return out


def _dv_block_pred(spark, store, snap, nq: dict):
    """Candidate-block predicate for a docs-only plan from the numeric
    doc-value block index (ES's BKD points path for ranges,
    index/mapper/NumberFieldMapper.java). Returns None when the query has no
    conjunctive dv constraint, a segment predates the dv table, or the range
    covers too many blocks for a useful predicate (a full scan is the honest
    plan then)."""
    import os

    constraints = _dv_conjunctive_constraints(nq)
    if not constraints:
        return None
    paths = [store.dv_stats_path(s.segment_id) for s in snap.segments]
    if not all(os.path.exists(p) for p in paths):
        return None
    cap = MAX_CHANNEL_PRUNE_RANGES * 64
    blocks: set[tuple[str, int]] | None = None
    for col, lo, hi in constraints:
        parts = []
        for seg, p in zip(snap.segments, paths):
            parts.append(
                spark.read.parquet(p)
                .where((F.col("col") == col) & F.col("val").between(lo, hi))
                .select(F.lit(seg.segment_id).alias("segment"), "bk")
            )
        df = parts[0]
        for q in parts[1:]:
            df = df.unionByName(q)
        rows = df.distinct().limit(cap + 1).collect()
        if len(rows) > cap:
            continue  # unselective constraint: no pruning value
        got = {(r["segment"], int(r["bk"])) for r in rows}
        blocks = got if blocks is None else (blocks & got)
    if blocks is None:
        return None
    if not blocks:
        return F.lit(False)
    return _candidate_block_pred(sorted(blocks))


def _channels_df(
    spark: SparkSession, docs: DataFrame, channels: list[Channel],
    del_df: DataFrame | None,
) -> DataFrame:
    """One docs scan emitting (segment, ordinal, fid, val) rows for every
    channel (rows exist only where the expr is non-null — allow channels use
    CASE WHEN pred THEN 1.0 END). Deletes ride fid = DENY_FID."""
    parts = []
    if channels:
        arr = F.array(
            *[
                F.struct(
                    F.lit(ch.fid).alias("fid"),
                    F.expr(ch.expr).cast("double").alias("val"),
                )
                for ch in channels
            ]
        )
        ex = F.explode(F.filter(arr, lambda x: x["val"].isNotNull())).alias("c")
        parts.append(
            docs.select("segment", "ordinal", ex).select(
                "segment", "ordinal", F.col("c.fid").alias("fid"), F.col("c.val").alias("val")
            )
        )
    if del_df is not None:
        parts.append(
            del_df.select(
                "segment", "ordinal", F.lit(DENY_FID).alias("fid"), F.lit(1.0).alias("val")
            )
        )
    if not parts:
        return spark.createDataFrame([], "segment string, ordinal long, fid int, val double")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _empty_result(docs: DataFrame) -> DataFrame:
    return docs.select(
        "conv_id", "turn_idx", F.lit(0.0).alias("score")
    ).where(F.lit(False))


def _order_cols():
    return [
        F.round(F.col("score"), 6).desc(),
        F.col("conv_id").asc(),
        F.col("turn_idx").asc(),
    ]


def _docs_eval(node, channels: list[Channel]) -> tuple[Column, Column]:
    """(match predicate, score) Columns for a docs-only tree."""
    by_fid = {c.fid: c for c in channels}
    if isinstance(node, ChannelLeaf):
        ch = by_fid[node.fid]
        e = F.expr(ch.expr)
        if node.const is not None:
            return e.isNotNull(), F.lit(float(node.const))
        return e.isNotNull(), e.cast("double")
    if isinstance(node, ConstScoreNode):
        p, _ = _docs_eval(node.child, channels)
        return p, F.lit(node.boost)
    if isinstance(node, FuncScoreNode):
        p, s = _docs_eval(node.child, channels)
        v = F.expr(by_fid[node.fid].expr).cast("double")
        if node.boost_mode == "multiply":
            return p, s * v
        if node.boost_mode == "sum":
            return p, s + v
        return p, v
    if isinstance(node, BoostingNode):
        p, s = _docs_eval(node.positive, channels)
        neg = F.expr(by_fid[node.neg_fid].expr).isNotNull()
        return p, F.when(neg, s * F.lit(node.negative_boost)).otherwise(s)
    if isinstance(node, BoolNode):
        pred = F.lit(True)
        score = F.lit(0.0)
        for c in node.must:
            p, s = _docs_eval(c, channels)
            pred = pred & p
            score = score + s
        for fid in node.filter_fids:
            pred = pred & F.expr(by_fid[fid].expr).isNotNull()
        if node.should:
            cnt = F.lit(0)
            for c in node.should:
                p, s = _docs_eval(c, channels)
                cnt = cnt + F.when(p, 1).otherwise(0)
                score = score + F.when(p, s).otherwise(F.lit(0.0))
            if node.msm > 0:
                pred = pred & (cnt >= node.msm)
        for c in node.must_not:
            p, _ = _docs_eval(c, channels)
            pred = pred & ~F.coalesce(p, F.lit(False))
        return pred, score
    raise ValueError(f"docs-only plan cannot express {type(node).__name__}")


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
    docs = read_segment_docs(spark, store, snap)

    from ..plans.query_dsl import normalize_query

    nq = normalize_query(query)
    (kind, _), = nq.items()
    if kind in ("match_all", "match_none") or (
        kind == "bool" and not any(nq["bool"].get(x) for x in ("must", "filter", "should", "must_not"))
    ):
        base = docs if kind != "match_none" else docs.where(F.lit(False))
        base = _apply_deletes(spark, store, snap, base)
        # constant 1.0 per hit — the logical path (Compiled.as_scored 1.0)
        # and the oracle (_pred_sql) both score match_all 1.0
        return (
            base.select("conv_id", "turn_idx", F.lit(1.0).alias("score"))
            .orderBy("conv_id", "turn_idx")
            .limit(k)
        )

    def _logical_fallback(reason: str):
        # documented fallback: shapes the kernel/docs-only plan cannot
        # express (e.g. dis_max of filter-context leaves, non-anchored bool
        # with postings leaves) run the logical plan over the store's docs.
        # ALWAYS warns (VERDICT r3 "what's wrong" #3): at corpus scale this
        # plan is a full forward scan, and a silently degrading query shape
        # would be invisible until it costs O(100 TB).
        import warnings

        from ..plans import query_dsl as Q

        warnings.warn(
            "search_indexed: query does not lower to the segment kernel/"
            f"doc-values plan ({reason}); falling back to the logical "
            "full-scan plan over the store's docs",
            IndexedFallbackWarning,
            stacklevel=3,
        )
        base = _apply_deletes(spark, store, snap, docs)
        return Q.search(base, nq, ["conv_id", "turn_idx"], k=k)

    try:
        plan = lower_query(spark, store, snap, docs, nq)
    except TooManyClauses:
        # never demote to the full-scan plan: the whole point of the cap is
        # that a broad pattern fails loudly instead of running O(corpus)
        raise
    except ValueError as e:
        return _logical_fallback(str(e))
    del_df = _deletes_df(spark, store, snap)

    if isinstance(plan, DocsPlan):
        try:
            pred, score = _docs_eval(plan.tree, plan.channels)
        except ValueError as e:
            return _logical_fallback(str(e))
        base = docs
        # docs-only numeric ranges answer from the dv block index first (the
        # BKD-points analog) so a selective turn_idx range reads O(matching
        # blocks), not O(corpus); `pred` still applies in full, so this is
        # pruning only — never a semantics change.
        dv_pred = _dv_block_pred(spark, store, snap, nq)
        if dv_pred is not None:
            base = base.where(dv_pred)
        base = base.where(pred)
        if del_df is not None:
            base = base.join(del_df, ["segment", "ordinal"], "left_anti")
        return (
            base.select("conv_id", "turn_idx", score.alias("score"))
            .orderBy(*_order_cols())
            .limit(k)
            .select("conv_id", "turn_idx", F.round(F.col("score"), 4).alias("score"))
        )

    n_docs = snap.n_docs
    avgdl = {
        f: (snap.field_sum_dl(f) / n_docs if n_docs else 1.0) for f in INDEXED_FIELDS
    }
    dfs = term_stats_lookup(spark, store, snap, plan.ft_pairs)
    weights = {
        ft: math.log(1.0 + (n_docs - dfv + 0.5) / (dfv + 0.5))
        for ft, dfv in dfs.items()
    }
    # bind phrase idf weights now that stats are known
    def bind_weights(node):
        if isinstance(node, TermsLeaf) and node.idf_blend_fields:
            # cross_fields BlendedTermQuery: idf from the blended df (max df
            # across the group = min idf among fields where the term occurs,
            # same N); absent-everywhere terms match nothing anyway
            node.idf_override = {
                t: min(
                    (
                        weights[(f, t)]
                        for f in node.idf_blend_fields
                        if (f, t) in weights
                    ),
                    default=0.0,
                )
                for t in node.terms
            }
        if isinstance(node, TermsLeaf) and node.const_from_idf:
            # keyword term/terms leaf: score = idf of the single value, from
            # the same dictionary stats job as every other leaf. df counts
            # exact-equality docs (keyword subfields index the raw value).
            node.const_score = weights.get((node.field, node.terms[0]), 0.0)
        if isinstance(node, PhraseLeaf):
            if node.prefix_expansions is not None:
                # match_phrase_prefix: MultiPhrasePrefixQuery rewrites to a
                # MultiPhraseQuery whose weight blends idf over the complete
                # leading terms AND every dictionary expansion of the
                # trailing prefix (Lucene sums idf over the query's distinct
                # terms; expansions come from the same stats job via
                # ft_pairs). Expansion-less prefixes keep weight 1.0 — they
                # match nothing anyway.
                fts = sorted(set(node.terms) | set(node.prefix_expansions))
                node.weight = (
                    sum(weights.get((node.field, t), 0.0) for t in fts)
                    if fts else 1.0
                )
            else:
                node.weight = sum(
                    weights.get((node.field, t), 0.0) for t in sorted(set(node.terms))
                )
        if isinstance(node, IntervalsLeaf):
            # SpanWeight.buildSimWeight: idf over getTermStates' distinct
            # terms (same dictionary stats job); expansion-only chains fall
            # back to 1.0 like an empty-lead match_phrase_prefix
            fts = sorted(node.weight_fts())
            found = [weights[ft] for ft in fts if ft in weights]
            node.weight = sum(found) if found else 1.0
        for c in _tree_children(node):
            bind_weights(c)

    bind_weights(plan.tree)

    live_ft = [ft for ft in plan.ft_pairs if ft in dfs]
    if not live_ft:
        return _empty_result(docs)
    postings = read_segment_postings(spark, store, snap, live_ft)
    chan_docs = docs
    if plan.channels:
        # candidate-prune the channels scan: only docs in blocks that hold
        # query-term postings can match an anchored plan (every KernelPlan is
        # _anchored), so channel rows (function_score values, terms_set
        # thresholds, filters) are only needed inside candidate blocks —
        # anchored function_score/terms_set queries must not scan O(corpus).
        # The collect is capped: past the cap the query's terms cover a large
        # share of the corpus and a full scan is the honest plan anyway.
        cap = MAX_CHANNEL_PRUNE_RANGES * 64
        rows = (
            postings.select("segment", "bk").distinct().limit(cap + 1).collect()
        )
        if len(rows) <= cap:
            pred = _candidate_block_pred([(r["segment"], r["bk"]) for r in rows])
            if pred is not None:
                chan_docs = docs.where(pred)
    extras = _channels_df(spark, chan_docs, plan.channels, del_df)
    kernel = _make_kernel(plan.tree, weights, avgdl, k, plan.phrase_fts)
    local = run_kernel(postings, extras, kernel)

    # FETCH PHASE (SearchPhaseController analog): the kernels return at most
    # buckets*k winners — collect that tiny set to the coordinator and
    # re-read ONLY their rows from the docs tables with an ordinal IN-filter
    # per segment. Parquet pushes In(ordinal) into row-group pruning (docs
    # files are ordinal-sorted), so fetch cost is O(k) point reads, not a
    # full docs scan joined against k rows.
    winners = local.collect()
    if not winners:
        return _empty_result(docs)
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
        .orderBy(*_order_cols())
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
    return uni.orderBy(*_order_cols()).limit(k)


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
