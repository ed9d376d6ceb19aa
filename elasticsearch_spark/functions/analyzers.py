"""Configurable analyzer chains beyond `standard` (reference:
modules/analysis-common — tokenizers + token filters registered in
CommonAnalysisPlugin.java; the `standard` default chain itself lives in
server StandardAnalyzerProvider.java:32-40).

Spark-first design: an analyzer is TOKENIZER -> [FILTER...] where every stage
is a JVM-side Column expression (regexp_extract_all / split and higher-order
array functions — transform/filter/flatten/aggregate). Nothing leaves
whole-stage codegen; no Python UDFs. The same chain has a driver-side Python
twin (`analyze_text`) for query-string analysis and suggester input, mirroring
how the reference analyzes query text with the index-time analyzer
(MatchQuery.java uses the field's search_analyzer).

Supported components (ES name -> here):
  tokenizers: standard, whitespace, letter, keyword, ngram, edge_ngram
  filters: lowercase, uppercase, stop, asciifolding, length, unique, reverse,
           truncate, trim, shingle, synonym, keyword_marker, stemmer_override,
           stemmer(minimal_english | porter)
  char filters: html_strip (+ entity decode), mapping, pattern_replace
The minimal_english stemmer is a plural-stripping stemmer in the spirit of
Lucene's EnglishMinimalStemmer (-ies>-y, -es>-e drop, -s drop unless -ss;
words <3 chars untouched) — NOT Porter, and slightly broader than Lucene's
(which only strips a trailing -s); rule set documented here, tested in
tests/test_analyzers.py. `porter` is the full Porter-1980 algorithm
(functions/porter.py, Lucene PorterStemFilter analog) — the one filter that
runs as an Arrow-batched pandas UDF rather than a codegen expression
(40 measure-conditioned suffix rules don't express as Columns); the hot
default `standard` chain stays pure codegen.

`synonym` (SynonymTokenFilterFactory.java, Solr rule format): `a, b => c`
(replace) and `a, b, c` (equivalence set; expand defaults true), with
MULTI-WORD phrases on either side. Multi-word rules follow ES's own
index-time behavior — SynonymGraphFilter output flattened by
FlattenGraphFilter, so every alternative's tokens appear in the flat stream
("sausage" positions; phrase queries across flattened synonyms carry the
same documented limitation as ES index-time synonyms). Matching is greedy
longest-rule-first over the token stream; replaced output never re-matches
later rules (single-pass, like SynonymMap). Deterministic approximation
(documented): when two same-length rules overlap in the input, rule order is
longest-then-lexicographic rather than Lucene's strict leftmost priority;
the driver twin implements the identical algorithm so parity always holds.

Out of scope (catalogued, not built): language-specific analyzers beyond
porter/english_light, phonetic, ICU; the north rule's corpus is
English-default (`standard`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ES default English stopword set (EnglishAnalyzer.ENGLISH_STOP_WORDS_SET,
# used by the `stop` filter's `_english_` default)
ENGLISH_STOP = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with",
]

_ASCII_FROM = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ"
_ASCII_TO = "aaaaaaceeeeiiiinooooouuuuyy"


# ------------------------------------------------------------- tokenizers
def _tokenize(c: Column, spec: dict) -> Column:
    kind = spec.get("tokenizer", "standard")
    if kind == "standard":
        return F.regexp_extract_all(c, F.lit(r"[\p{L}\p{N}]+"), F.lit(0))
    if kind == "whitespace":
        return F.filter(F.split(c, r"\s+"), lambda t: t != "")
    if kind == "letter":
        return F.regexp_extract_all(c, F.lit(r"[\p{L}]+"), F.lit(0))
    if kind == "keyword":
        return F.when(c.isNull(), None).otherwise(F.array(c))
    if kind in ("ngram", "edge_ngram"):
        mn = int(spec.get("min_gram", 1 if kind == "ngram" else 1))
        mx = int(spec.get("max_gram", 2))
        # character n-grams over the whole string (NGramTokenizer.java):
        # starts x lengths, sliced with substring — a flat JVM expression
        starts = F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1)))
        if kind == "edge_ngram":
            starts = F.sequence(F.lit(1), F.lit(1))
        grams = F.flatten(
            F.transform(
                starts,
                lambda s: F.filter(
                    F.transform(
                        F.sequence(F.lit(mn), F.lit(mx)),
                        lambda n: F.when(
                            s + n - 1 <= F.length(c), F.substring(c, s, n)
                        ),
                    ),
                    lambda g: g.isNotNull(),
                ),
            )
        )
        return F.when(c.isNull(), None).otherwise(grams)
    raise ValueError(f"unknown tokenizer: {kind}")


# ---------------------------------------------------------------- filters
# `protected` carries the KeywordAttribute analog through the chain:
# keyword_marker keywords and stemmer_override outputs are exempt from later
# stemmer filters (KeywordMarkerTokenFilterFactory /
# StemmerOverrideTokenFilterFactory semantics; the approximation — protection
# keys on the token STRING at stemmer time, not a per-position attribute — is
# identical in both twins and only diverges if an unrelated token collides
# with a protected form).
def _apply_filter(toks: Column, f, protected: list[str] | None = None) -> Column:
    name, params = (f, {}) if isinstance(f, str) else (f["type"], f)
    protected = protected if protected is not None else []
    if name == "lowercase":
        return F.transform(toks, F.lower)
    if name == "uppercase":
        return F.transform(toks, F.upper)
    if name == "stop":
        words = params.get("stopwords", ENGLISH_STOP)
        arr = F.array(*[F.lit(w) for w in words])
        return F.filter(toks, lambda t: ~F.array_contains(arr, t))
    if name == "asciifolding":
        return F.transform(toks, lambda t: F.translate(t, _ASCII_FROM, _ASCII_TO))
    if name == "length":
        mn = int(params.get("min", 0))
        mx = int(params.get("max", 2**31 - 1))
        return F.filter(toks, lambda t: (F.length(t) >= mn) & (F.length(t) <= mx))
    if name == "unique":
        return F.array_distinct(toks)
    if name == "reverse":
        return F.transform(toks, F.reverse)
    if name == "truncate":
        ln = int(params.get("length", 10))
        return F.transform(toks, lambda t: F.substring(t, 1, ln))
    if name == "shingle":
        mn = int(params.get("min_shingle_size", 2))
        mx = int(params.get("max_shingle_size", 2))
        sep = params.get("token_separator", " ")
        out = toks if params.get("output_unigrams", True) else F.array()
        for n in range(mn, mx + 1):
            sh = F.filter(
                F.transform(
                    toks,
                    (
                        lambda n_: lambda t, i: F.when(
                            i + n_ <= F.size(toks),
                            F.array_join(F.slice(toks, i + 1, n_), sep),
                        )
                    )(n),
                ),
                lambda g: g.isNotNull(),
            )
            out = F.concat(out, sh)
        return out
    if name == "synonym":
        mapping = parse_synonym_rules(
            params.get("synonyms", []), params.get("expand", True)
        )
        if not mapping:
            return toks
        if any(" " in k for k in mapping):
            return _synonym_multiword_expr(toks, mapping)
        # all-single-token rules: per-token map lookup, pure codegen
        kv = []
        for k, vs in mapping.items():
            kv += [F.lit(k), F.array(*[F.lit(v) for v in vs])]
        m = F.create_map(*kv)
        return F.flatten(
            F.transform(
                toks, lambda t: F.coalesce(F.element_at(m, t), F.array(t))
            )
        )
    if name == "trim":
        return F.transform(toks, F.trim)
    if name == "keyword_marker":
        return toks  # marking handled at chain level (tokens())
    if name == "stemmer_override":
        mapping = _override_rules(params.get("rules", []))
        if not mapping:
            return toks
        kv = []
        for k, v in mapping.items():
            kv += [F.lit(k), F.lit(v)]
        m = F.create_map(*kv)
        if protected:
            # Lucene's StemmerOverrideFilter honors KeywordAttribute: tokens
            # keyword_marker'd (or rewritten by an earlier override, which
            # sets the attribute) pass through. Same value-set approximation
            # as the `stemmer` guard below, twin-identical.
            arr = F.array(*[F.lit(w) for w in protected])
            return F.transform(
                toks,
                lambda t: F.when(F.array_contains(arr, t), t).otherwise(
                    F.coalesce(F.element_at(m, t), t)
                ),
            )
        return F.transform(toks, lambda t: F.coalesce(F.element_at(m, t), t))
    if name == "stemmer":
        lang = params.get("language", "minimal_english")

        def guard(stem_col_fn):
            if not protected:
                return stem_col_fn
            arr = F.array(*[F.lit(w) for w in protected])
            return lambda t: F.when(
                F.array_contains(arr, t), t
            ).otherwise(stem_col_fn(t))

        if lang == "porter":
            return _porter_udf(protected)(toks)
        if lang != "minimal_english":
            raise ValueError(f"stemmer language {lang} unsupported")
        return F.transform(
            toks,
            guard(
                lambda t: F.when(F.length(t) < 3, t)
                .when(t.endswith("ies"), F.regexp_replace(t, "ies$", "y"))
                .when(t.endswith("es"), F.regexp_replace(t, "es$", "e"))
                .when(
                    t.endswith("s") & ~t.endswith("ss"),
                    F.regexp_replace(t, "s$", ""),
                )
                .otherwise(t)
            ),
        )
    raise ValueError(f"unknown token filter: {name}")


def _override_rules(rules: list[str]) -> dict[str, str]:
    """stemmer_override rules ('token => stem') -> {token: stem}."""
    out: dict[str, str] = {}
    for rule in rules:
        if "=>" not in rule:
            raise ValueError(f"bad stemmer_override rule: {rule!r}")
        k, v = (x.strip() for x in rule.split("=>", 1))
        if not k or not v or " " in k or " " in v:
            raise ValueError(f"bad stemmer_override rule: {rule!r}")
        out[k] = v
    return out


def _chain_protected(spec: dict, upto: int) -> list[str]:
    """Protected token forms visible to the filter at chain position
    `upto`: keyword_marker keywords and stemmer_override outputs declared
    EARLIER in the chain."""
    out: list[str] = []
    for f in spec.get("filters", [])[:upto]:
        name, params = (f, {}) if isinstance(f, str) else (f["type"], f)
        if name == "keyword_marker":
            out += list(params.get("keywords", []))
        elif name == "stemmer_override":
            out += list(_override_rules(params.get("rules", [])).values())
    return out


def parse_synonym_rules(rules: list[str], expand: bool = True) -> dict:
    """Solr-format synonym rules -> {phrase: [flattened output tokens]}.

    `a, b => c, d` replaces any LHS phrase with the concatenation of the RHS
    variants' tokens; `a, b, c` is an equivalence set — expand=True maps
    every member to all variants' tokens in rule order (ES default),
    expand=False to the first variant's tokens. Phrases may be MULTI-WORD
    (keys contain spaces); outputs are FLAT token lists, matching ES's
    index-time SynonymGraphFilter + FlattenGraphFilter stream where every
    stacked alternative's tokens land in the flat position stream."""
    mapping: dict[str, list[str]] = {}

    def norm(t: str) -> str:
        return " ".join(t.split())

    for rule in rules:
        if "=>" in rule:
            lhs, rhs = rule.split("=>", 1)
            lhs_t = [norm(t) for t in lhs.split(",") if t.strip()]
            rhs_t = [norm(t) for t in rhs.split(",") if t.strip()]
            if not lhs_t or not rhs_t:
                raise ValueError(f"bad synonym rule: {rule!r}")
            out = [w for v in rhs_t for w in v.split(" ")]
            for t in lhs_t:
                mapping[t] = out
        else:
            terms = [norm(t) for t in rule.split(",") if t.strip()]
            if len(terms) < 2:
                raise ValueError(f"bad synonym rule: {rule!r}")
            for t in terms:
                src = terms if expand else [terms[0]]
                mapping[t] = [w for v in src for w in v.split(" ")]
    return mapping


# Sentinel marking synonym-output tokens inside the space-joined stream so a
# later rule can never re-match replaced text (single-pass SynonymMap
# semantics). Stripped before re-splitting; cannot occur in real tokens (the
# standard/letter tokenizers emit alnum runs; whitespace-tokenized corpora
# with NUL bytes are out of scope).
_SYN_SENTINEL = "\x00"


def _synonym_rule_order(mapping: dict) -> list[str]:
    """Greedy longest-rule-first (SynonymMap prefers the longest match),
    ties broken lexicographically for determinism."""
    return sorted(mapping, key=lambda k: (-len(k.split(" ")), k))


def _synonym_multiword_expr(toks: Column, mapping: dict) -> Column:
    """Multi-word synonym application as pure JVM expressions: the token
    array is space-joined, each rule rewrites (?<= )\\Qlhs\\E(?= ) (the
    lookarounds keep boundary spaces so adjacent matches both fire), outputs
    are sentinel-prefixed so later rules can't re-match them, then the
    stream re-splits. Stays in whole-stage codegen — no Python."""
    joined = F.concat(F.lit(" "), F.array_join(toks, " "), F.lit(" "))
    for lhs in _synonym_rule_order(mapping):
        out = " ".join(_SYN_SENTINEL + t for t in mapping[lhs])
        # literal replacement: escape Java's \ and $ group references
        out = out.replace("\\", "\\\\").replace("$", "\\$")
        joined = F.regexp_replace(joined, f"(?<= )\\Q{lhs}\\E(?= )", out)
    joined = F.replace(joined, F.lit(_SYN_SENTINEL), F.lit(""))
    return F.filter(F.split(joined, " "), lambda t: t != "")


def _py_synonym_multiword(toks: list[str], mapping: dict) -> list[str]:
    """Driver twin of _synonym_multiword_expr — identical algorithm."""
    import re

    joined = " " + " ".join(toks) + " "
    for lhs in _synonym_rule_order(mapping):
        out = " ".join(_SYN_SENTINEL + t for t in mapping[lhs])
        joined = re.sub(
            "(?<= )" + re.escape(lhs) + "(?= )",
            out.replace("\\", "\\\\"), joined,
        )
    joined = joined.replace(_SYN_SENTINEL, "")
    return [t for t in joined.split(" ") if t]


def _porter_udf(protected: list[str] | None = None):
    """Arrow-batched array<string> -> array<string> Porter pass (the one
    non-codegen filter; see module docstring). `protected` tokens pass
    through unstemmed (KeywordAttribute analog)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    from .porter import porter_stem

    prot = frozenset(protected or [])

    def _stem(col):
        return col.map(
            lambda toks: None if toks is None else [
                t if t in prot else porter_stem(t) for t in toks
            ]
        )

    return pandas_udf(_stem, ArrayType(StringType()))


# ------------------------------------------------------------ char filters
# HTMLStripCharFilterFactory / MappingCharFilterFactory /
# PatternReplaceCharFilterFactory (modules/analysis-common) — applied to the
# raw string BEFORE tokenization. Entity decode order is fixed (amp last) and
# identical in both twins.
_HTML_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
    ("&nbsp;", " "), ("&amp;", "&"),
]


def _apply_char_filter(c: Column, f) -> Column:
    name, params = (f, {}) if isinstance(f, str) else (f["type"], f)
    if name == "html_strip":
        c = F.regexp_replace(c, r"<[^>]*>", " ")
        for ent, ch in _HTML_ENTITIES:
            c = F.replace(c, F.lit(ent), F.lit(ch))
        return c
    if name == "mapping":
        for rule in params.get("mappings", []):
            if "=>" not in rule:
                raise ValueError(f"bad mapping rule: {rule!r}")
            k, v = (s.strip() for s in rule.split("=>", 1))
            c = F.replace(c, F.lit(k), F.lit(v))
        return c
    if name == "pattern_replace":
        # pattern must be valid in BOTH Java and Python regex dialects (the
        # driver-side twin uses `re`); keep to the shared common subset
        return F.regexp_replace(
            c, params["pattern"], params.get("replacement", "")
        )
    raise ValueError(f"unknown char filter: {name}")


def _py_char_filter(text: str, f) -> str:
    import re

    name, params = (f, {}) if isinstance(f, str) else (f["type"], f)
    if name == "html_strip":
        text = re.sub(r"<[^>]*>", " ", text)
        for ent, ch in _HTML_ENTITIES:
            text = text.replace(ent, ch)
        return text
    if name == "mapping":
        for rule in params.get("mappings", []):
            if "=>" not in rule:
                raise ValueError(f"bad mapping rule: {rule!r}")
            k, v = (s.strip() for s in rule.split("=>", 1))
            text = text.replace(k, v)
        return text
    if name == "pattern_replace":
        return re.sub(params["pattern"], params.get("replacement", ""), text)
    raise ValueError(f"unknown char filter: {name}")


# --------------------------------------------------------------- analyzers
BUILTIN_ANALYZERS: dict[str, dict] = {
    "standard": {"tokenizer": "standard", "filters": ["lowercase"]},
    "simple": {"tokenizer": "letter", "filters": ["lowercase"]},
    "whitespace": {"tokenizer": "whitespace", "filters": []},
    "keyword": {"tokenizer": "keyword", "filters": []},
    "stop": {"tokenizer": "letter", "filters": ["lowercase", "stop"]},
    "english_light": {
        "tokenizer": "standard",
        "filters": ["lowercase", "stop", {"type": "stemmer", "language": "minimal_english"}],
    },
    # the classic `english`-style chain: stop + full Porter (EnglishAnalyzer
    # uses PorterStemFilter; we omit possessive-' stripping — the standard
    # tokenizer here already splits on apostrophes)
    "english_porter": {
        "tokenizer": "standard",
        "filters": ["lowercase", "stop", {"type": "stemmer", "language": "porter"}],
    },
}


def resolve(spec: str | dict) -> dict:
    if isinstance(spec, str):
        if spec not in BUILTIN_ANALYZERS:
            raise ValueError(f"unknown analyzer: {spec}")
        return BUILTIN_ANALYZERS[spec]
    return spec


def tokens(text: Column | str, analyzer: str | dict = "standard") -> Column:
    """array<string> of tokens for `text` under the named/custom analyzer."""
    spec = resolve(analyzer)
    c = F.col(text) if isinstance(text, str) else text
    for f in spec.get("char_filters", []):
        c = _apply_char_filter(c, f)
    toks = _tokenize(c, spec)
    for i, f in enumerate(spec.get("filters", [])):
        toks = _apply_filter(toks, f, _chain_protected(spec, i))
    return toks


# ------------------------------------------------- driver-side Python twin
def analyze_text(text: str, analyzer: str | dict = "standard") -> list[str]:
    """Python twin of tokens() for query-side analysis (must agree with the
    executor-side expressions on every chain; property-tested)."""
    import re

    spec = resolve(analyzer)
    for f in spec.get("char_filters", []):
        text = _py_char_filter(text, f)
    kind = spec.get("tokenizer", "standard")
    if kind == "standard":
        toks = _py_alnum(text)
    elif kind == "whitespace":
        toks = [t for t in re.split(r"\s+", text) if t]
    elif kind == "letter":
        toks = _py_runs(text, str.isalpha)
    elif kind == "keyword":
        toks = [text]
    elif kind in ("ngram", "edge_ngram"):
        mn = int(spec.get("min_gram", 1))
        mx = int(spec.get("max_gram", 2))
        starts = range(len(text)) if kind == "ngram" else range(1)
        toks = [
            text[s : s + n]
            for s in starts
            for n in range(mn, mx + 1)
            if s + n <= len(text)
        ]
        if not text:
            toks = []
    else:
        raise ValueError(kind)

    for fi, f in enumerate(spec.get("filters", [])):
        name, params = (f, {}) if isinstance(f, str) else (f["type"], f)
        protected = set(_chain_protected(spec, fi))
        if name == "lowercase":
            toks = [t.lower() for t in toks]
        elif name == "uppercase":
            toks = [t.upper() for t in toks]
        elif name == "stop":
            sw = set(params.get("stopwords", ENGLISH_STOP))
            toks = [t for t in toks if t not in sw]
        elif name == "asciifolding":
            # exactly the executor-side translate table (no NFKD fallback:
            # the twins must agree character-for-character)
            tbl = str.maketrans(_ASCII_FROM, _ASCII_TO)
            toks = [t.translate(tbl) for t in toks]
        elif name == "length":
            mn, mx = int(params.get("min", 0)), int(params.get("max", 2**31 - 1))
            toks = [t for t in toks if mn <= len(t) <= mx]
        elif name == "unique":
            toks = list(dict.fromkeys(toks))
        elif name == "reverse":
            toks = [t[::-1] for t in toks]
        elif name == "truncate":
            ln = int(params.get("length", 10))
            toks = [t[:ln] for t in toks]
        elif name == "trim":
            # space-only, matching the executor-side F.trim (Spark trims
            # ' ' specifically; Lucene TrimFilter trims all whitespace —
            # twin agreement wins, divergence only for exotic tokenizers)
            toks = [t.strip(" ") for t in toks]
        elif name == "shingle":
            mn = int(params.get("min_shingle_size", 2))
            mx = int(params.get("max_shingle_size", 2))
            sep = params.get("token_separator", " ")
            out = list(toks) if params.get("output_unigrams", True) else []
            for n in range(mn, mx + 1):
                out += [sep.join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            toks = out
        elif name == "synonym":
            mapping = parse_synonym_rules(
                params.get("synonyms", []), params.get("expand", True)
            )
            if any(" " in k for k in mapping):
                toks = _py_synonym_multiword(toks, mapping)
            else:
                toks = [s for t in toks for s in mapping.get(t, [t])]
        elif name == "keyword_marker":
            pass  # marking handled via _chain_protected
        elif name == "stemmer_override":
            m = _override_rules(params.get("rules", []))
            toks = [t if t in protected else m.get(t, t) for t in toks]
        elif name == "stemmer":
            if params.get("language", "minimal_english") == "porter":
                from .porter import porter_stem

                toks = [t if t in protected else porter_stem(t) for t in toks]
                continue

            def stem(t: str) -> str:
                if t in protected:
                    return t
                if len(t) < 3:
                    return t
                if t.endswith("ies"):
                    return t[:-3] + "y"
                if t.endswith("es"):
                    return t[:-1]
                if t.endswith("s") and not t.endswith("ss"):
                    return t[:-1]
                return t

            toks = [stem(t) for t in toks]
        else:
            raise ValueError(name)
    return toks


def _py_alnum(text: str) -> list[str]:
    out, cur = [], []
    for ch in text:
        if ch.isalnum():
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def _py_runs(text: str, pred) -> list[str]:
    out, cur = [], []
    for ch in text:
        if pred(ch):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out
