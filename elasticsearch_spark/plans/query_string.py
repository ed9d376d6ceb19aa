"""Lucene query-string mini-parser -> query-DSL dict rewrite.

Covers the common surface of `query_string` / `simple_query_string`
(QueryStringQueryBuilder.java, index/search/QueryStringQueryParser.java; reg
SearchModule.java:790):

  term              -> match on the default field
  "a b"             -> match_phrase         ("a b"~2 -> slop 2)
  field:term        -> match on that field
  ter*  / t?rm      -> wildcard
  term~ / term~1    -> fuzzy (default fuzziness 2)
  /pat(tern)?/      -> regexp
  field:[a TO b]    -> range gte/lte ({..} -> gt/lt, * -> open end)
  field:>=5 etc.    -> single-bound range
  expr^2            -> boost (terms, phrases, ranges, regexes, groups)
  +term / -term     -> must / must_not
  a AND b, a OR b, NOT a, parentheses; default operator OR

Because the output is a plain DSL dict, BOTH the Spark compiler and the
DuckDB oracle execute query strings through their normal paths — the parser
itself needs no engine-specific code. Boosts rewrite onto driver-proven
constructs: scoring leaves/groups get a function_score weight multiplier,
constant-score leaves (range/wildcard/regexp) a constant_score boost.
Remaining unsupported Lucene syntax raises ValueError.
"""

from __future__ import annotations

import re

_BOOST = r'(?:\^(?P<{0}>\d+(?:\.\d+)?))?'
_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)){gboost} |
        (?P<and>AND\b) |
        (?P<or>OR\b) |
        (?P<not>NOT\b) |
        (?P<plus>\+) |
        (?P<range>(?:(?P<rfield>[A-Za-z_][\w.]*):)?
            (?P<lb>[\[{{]) \s* (?P<lo>[^\s\]}}]+) \s+ TO \s+
            (?P<hi>[^\s\]}}]+) \s* (?P<rb>[\]}}])){rboost} |
        (?P<cmp>(?P<cfield>[A-Za-z_][\w.]*):
            (?P<cop>>=|<=|>|<)(?P<cval>[^\s()^~"]+)){cboost} |
        (?P<regexp>(?:(?P<xfield>[A-Za-z_][\w.]*):)?
            /(?P<xpat>[^/]*)/){xboost} |
        (?P<minus>-) |
        (?P<phrase>(?:(?P<pfield>[A-Za-z_][\w.]*):)?"(?P<ptext>[^"]*)"
            (?:~(?P<pslop>\d+))?){pboost} |
        (?P<term>(?:(?P<tfield>[A-Za-z_][\w.]*):)?(?P<ttext>[^\s()+\-"][^\s()^~"]*)
            (?:~(?P<tfuzz>\d*))?){tboost}
    )""".format(
        gboost=_BOOST.format("gboost"), rboost=_BOOST.format("rboost"),
        cboost=_BOOST.format("cboost"), xboost=_BOOST.format("xboost"),
        pboost=_BOOST.format("pboost"), tboost=_BOOST.format("tboost"),
    ),
    re.VERBOSE,
)

UNSUPPORTED = re.compile(r"[~^/\[\]{}]")


def _num(v: str):
    """A range bound as int, float, or (fallback) the raw string."""
    try:
        return int(v)
    except ValueError:
        try:
            return float(v)
        except ValueError:
            return v


def tokenize(s: str) -> list[tuple[str, dict]]:
    out = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise ValueError(f"query_string: cannot tokenize at {s[pos:]!r}")
            break
        pos = m.end()
        g = m.lastgroup
        if m.group("lparen"):
            out.append(("lparen", {}))
        elif m.group("rparen"):
            out.append(("rparen", {"boost": m.group("gboost")}))
        elif g in ("and", "or", "not", "plus", "minus") and m.group(g):
            out.append((g, {}))
        elif m.group("range") is not None:
            spec = {}
            lo, hi = m.group("lo"), m.group("hi")
            if lo != "*":
                spec["gte" if m.group("lb") == "[" else "gt"] = _num(lo)
            if hi != "*":
                spec["lte" if m.group("rb") == "]" else "lt"] = _num(hi)
            if not spec:
                raise ValueError("query_string: range [* TO *] is vacuous")
            out.append(("range", {"field": m.group("rfield"), "spec": spec,
                                  "boost": m.group("rboost")}))
        elif m.group("cmp") is not None:
            op = {">": "gt", ">=": "gte", "<": "lt", "<=": "lte"}[m.group("cop")]
            out.append(("range", {"field": m.group("cfield"),
                                  "spec": {op: _num(m.group("cval"))},
                                  "boost": m.group("cboost")}))
        elif m.group("regexp") is not None:
            out.append(("regexp", {"field": m.group("xfield"),
                                   "pat": m.group("xpat"),
                                   "boost": m.group("xboost")}))
        elif m.group("phrase") is not None:
            out.append(("phrase", {"field": m.group("pfield"),
                                   "text": m.group("ptext"),
                                   "slop": m.group("pslop"),
                                   "boost": m.group("pboost")}))
        else:
            t = m.group("ttext")
            if UNSUPPORTED.search(t):
                raise ValueError(f"query_string: unsupported syntax in {t!r}")
            out.append(("term", {"field": m.group("tfield"), "text": t,
                                 "fuzz": m.group("tfuzz"),
                                 "boost": m.group("tboost")}))
    return out


def _boosted(q: dict, boost: str | None, constant: bool = False) -> dict:
    """Attach a ^boost: constant-score leaves fold it into constant_score
    (their score IS the boost); scoring leaves/groups multiply via a
    function_score weight — both constructs already exercised by the driver
    gate on engine, indexed, and oracle paths."""
    if not boost:
        return q
    b = float(boost)
    if constant:
        return {"constant_score": {"filter": q, "boost": b}}
    return {
        "function_score": {
            "query": q,
            "functions": [{"weight": b}],
            "boost_mode": "multiply",
        }
    }


class _Parser:
    def __init__(self, tokens, default_field: str):
        self.toks = tokens
        self.i = 0
        self.default_field = default_field

    def peek(self):
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    # expr := seq (OR seq)*      — OR joins sequences into one should-bool
    def expr(self) -> dict:
        parts = [self.seq()]
        while self.peek() == "or":
            self.next()
            parts.append(self.seq())
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"should": parts, "minimum_should_match": 1}}

    # seq := andexpr+            — adjacent units, +x/-x pulled to must/not,
    #                              plain units are should (default OR)
    def seq(self) -> dict:
        should, must, must_not = [], [], []
        while self.peek() not in (None, "or", "rparen"):
            sign = None
            if self.peek() in ("plus", "minus", "not"):
                kind, _ = self.next()
                sign = "must" if kind == "plus" else "must_not"
            unit = self.and_chain()
            if sign == "must":
                must.append(unit)
            elif sign == "must_not":
                must_not.append(unit)
            else:
                should.append(unit)
        if not (should or must or must_not):
            raise ValueError("query_string: empty clause")
        if len(should) == 1 and not must and not must_not:
            return should[0]
        body: dict = {}
        if must:
            body["must"] = must
        if must_not:
            body["must_not"] = must_not
        if should:
            body["should"] = should
            body["minimum_should_match"] = 0 if must else 1
        return {"bool": body}

    # and_chain := atom (AND [NOT] atom)*
    def and_chain(self) -> dict:
        left = self.atom()
        while self.peek() == "and":
            self.next()
            negate = False
            if self.peek() == "not":
                self.next()
                negate = True
            right = self.atom()
            if negate:
                left = {"bool": {"must": [left], "must_not": [right]}}
            else:
                left = {"bool": {"must": [left, right]}}
        return left

    def atom(self) -> dict:
        kind, val = self.next()
        if kind == "lparen":
            e = self.expr()
            if self.peek() != "rparen":
                raise ValueError("query_string: unbalanced parens")
            _, rv = self.next()
            return _boosted(e, rv.get("boost"))
        if kind == "phrase":
            field = val["field"] or self.default_field
            if val.get("slop"):
                q = {"match_phrase": {field: {"query": val["text"],
                                              "slop": int(val["slop"])}}}
            else:
                q = {"match_phrase": {field: val["text"]}}
            return _boosted(q, val.get("boost"))
        if kind == "range":
            field = val["field"] or self.default_field
            return _boosted({"range": {field: val["spec"]}}, val.get("boost"),
                            constant=True)
        if kind == "regexp":
            field = val["field"] or self.default_field
            return _boosted({"regexp": {field: val["pat"]}}, val.get("boost"),
                            constant=True)
        if kind == "term":
            field = val["field"] or self.default_field
            t = val["text"]
            if val.get("fuzz") is not None:
                fz = int(val["fuzz"]) if val["fuzz"] else 2
                q = {"fuzzy": {field: {"value": t.lower(), "fuzziness": fz}}}
                return _boosted(q, val.get("boost"), constant=True)
            if "*" in t or "?" in t:
                return _boosted({"wildcard": {field: t.lower()}},
                                val.get("boost"), constant=True)
            return _boosted({"match": {field: t}}, val.get("boost"))
        raise ValueError(f"query_string: unexpected token {kind}")


def parse_query_string(query: str, default_field: str = "text") -> dict:
    toks = tokenize(query)
    if not toks:
        return {"match_none": {}}
    p = _Parser(toks, default_field)
    out = p.expr()
    if p.peek() is not None:
        raise ValueError("query_string: trailing tokens")
    return out


def parse_simple_query_string(query: str, default_field: str = "text") -> dict:
    """simple_query_string: same subset minus AND/OR/NOT keywords (which it
    treats as plain terms) — `+`, `-`, quotes and `|`/`&` not implemented;
    falls back to a plain multi-term match."""
    if re.search(r'["+\-|&*?()]', query):
        return parse_query_string(query, default_field)
    return {"match": {default_field: query}}
