"""Lucene query-string mini-parser -> query-DSL dict rewrite.

Covers the common surface of `query_string` / `simple_query_string`
(QueryStringQueryBuilder.java, index/search/QueryStringQueryParser.java; reg
SearchModule.java:790):

  term            -> match on the default field
  "a b"           -> match_phrase
  field:term      -> match on that field
  ter*  / t?rm    -> wildcard
  +term / -term   -> must / must_not
  a AND b, a OR b, NOT a, parentheses; default operator OR

Because the output is a plain DSL dict, BOTH the Spark compiler and the
DuckDB oracle execute query strings through their normal paths — the parser
itself needs no engine-specific code. Unsupported Lucene syntax (ranges,
boosts, fuzzy ~, regex /../) raises ValueError.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<and>AND\b) |
        (?P<or>OR\b) |
        (?P<not>NOT\b) |
        (?P<plus>\+) |
        (?P<minus>-) |
        (?P<phrase>(?:(?P<pfield>[A-Za-z_][\w.]*):)?"(?P<ptext>[^"]*)") |
        (?P<term>(?:(?P<tfield>[A-Za-z_][\w.]*):)?(?P<ttext>[^\s()+\-"][^\s()"]*))
    )""",
    re.VERBOSE,
)

UNSUPPORTED = re.compile(r"[~^/\[\]{}]")


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
        kind = m.lastgroup if m.lastgroup in ("lparen", "rparen", "and", "or", "not", "plus", "minus") else None
        if kind:
            out.append((kind, {}))
        elif m.group("phrase") is not None:
            out.append(("phrase", {"field": m.group("pfield"), "text": m.group("ptext")}))
        else:
            t = m.group("ttext")
            if UNSUPPORTED.search(t):
                raise ValueError(f"query_string: unsupported syntax in {t!r}")
            out.append(("term", {"field": m.group("tfield"), "text": t}))
    return out


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
            self.next()
            return e
        if kind == "phrase":
            field = val["field"] or self.default_field
            return {"match_phrase": {field: val["text"]}}
        if kind == "term":
            field = val["field"] or self.default_field
            t = val["text"]
            if "*" in t or "?" in t:
                return {"wildcard": {field: t.lower()}}
            return {"match": {field: t}}
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
