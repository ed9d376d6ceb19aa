"""Painless expression subset -> SQL, shared by the Spark engine and the
DuckDB oracle.

The reference embeds a full Painless interpreter (modules/lang-painless,
org.elasticsearch.painless.PainlessScriptEngine) for script_score / script
queries / scripted fields. A Spark-first engine evaluates scripts as Catalyst
column expressions instead — this module translates the expression SUBSET of
Painless that covers the overwhelmingly common script shapes (see
ScriptScoreFunction / ScriptQueryBuilder usage) into ONE SQL string valid in
both Spark SQL and DuckDB, so the same translation drives the engine and the
correctness oracle:

  doc['field'].value          -> field                 (doc-values access)
  params.x / params['x']      -> literal               (bound at compile time)
  Math.log/log10/sqrt/abs/exp/floor/ceil/pow/max/min   -> SQL equivalents
  + - * / %  (== != < <= > >=)  && || !                -> SQL operators
  cond ? a : b                -> CASE WHEN cond THEN a ELSE b END

Anything outside the subset raises ValueError (round-3 policy: fail loudly,
never silently drop semantics). Documented divergences: `/` follows SQL
float division (Painless int/int truncates); null doc values flow through
SQL null semantics rather than throwing like Painless does.
"""

from __future__ import annotations

import re

_MATH_FN = {
    "log": "ln",
    "log10": "log10",
    "sqrt": "sqrt",
    "abs": "abs",
    "exp": "exp",
    "floor": "floor",
    "ceil": "ceil",
    "pow": "power",
    "max": "greatest",
    "min": "least",
}

_OP_MAP = {"&&": "AND", "||": "OR", "==": "=", "!=": "<>"}

_TOKEN = re.compile(
    r"""\s*(?:
      doc\[\s*['"](?P<doc>[A-Za-z_][A-Za-z0-9_]*)['"]\s*\]\s*\.\s*value
    | params\.(?P<pdot>[A-Za-z_][A-Za-z0-9_]*)
    | params\[\s*['"](?P<pidx>[A-Za-z_][A-Za-z0-9_]*)['"]\s*\]
    | Math\.(?P<math>[A-Za-z0-9]+)
    | (?P<num>\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)
    | (?P<str>'[^']*')
    | (?P<op>&&|\|\||==|!=|<=|>=|[-+*/%<>(),?:!])
    )""",
    re.X,
)


def _lit(v) -> str:
    """A params value as a SQL literal (numbers, strings, booleans)."""
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise ValueError(f"unsupported params value type: {type(v).__name__}")


def _tokenize(source: str, params: dict) -> list[str]:
    out: list[str] = []
    pos = 0
    while pos < len(source):
        m = _TOKEN.match(source, pos)
        if m is None:
            if source[pos:].strip() == "":
                break
            raise ValueError(
                f"painless subset cannot translate at offset {pos}: {source[pos:pos+25]!r}"
            )
        pos = m.end()
        if m.group("doc"):
            out.append(m.group("doc"))
        elif m.group("pdot") or m.group("pidx"):
            name = m.group("pdot") or m.group("pidx")
            if name not in params:
                raise ValueError(f"script references missing param {name!r}")
            out.append(_lit(params[name]))
        elif m.group("math"):
            fn = m.group("math")
            if fn not in _MATH_FN:
                raise ValueError(f"Math.{fn} unsupported")
            out.append(_MATH_FN[fn])
        elif m.group("num") is not None:
            out.append(m.group("num"))
        elif m.group("str") is not None:
            out.append(m.group("str"))
        else:
            op = m.group("op")
            if op == "!":
                # bare logical not (!= already captured as one token)
                out.append("NOT")
            else:
                out.append(_OP_MAP.get(op, op))
    if not out:
        raise ValueError("empty script source")
    return out


def _render(tokens: list[str]) -> str:
    """Join tokens, rewriting top-level ternaries (right-associative) to
    CASE WHEN. Recurses into parenthesized groups."""
    # find a '?' at paren depth 0; its matching ':' accounts for nested ?:
    depth = 0
    for i, t in enumerate(tokens):
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif t == "?" and depth == 0:
            need, j = 1, i + 1
            while j < len(tokens):
                if tokens[j] == "(":
                    depth += 1
                elif tokens[j] == ")":
                    depth -= 1
                elif depth == 0 and tokens[j] == "?":
                    need += 1
                elif depth == 0 and tokens[j] == ":":
                    need -= 1
                    if need == 0:
                        break
                j += 1
            if need != 0:
                raise ValueError("unbalanced ternary ?:")
            cond = _render(tokens[:i])
            then = _render(tokens[i + 1 : j])
            other = _render(tokens[j + 1 :])
            return f"CASE WHEN {cond} THEN {then} ELSE {other} END"
    if "?" in tokens or ":" in tokens:
        # no depth-0 ternary, so any ?/: lives inside a paren group —
        # recurse into each top-level group to rewrite it there
        out: list[str] = []
        i = 0
        while i < len(tokens):
            if tokens[i] == "(":
                d, j = 1, i + 1
                while j < len(tokens) and d:
                    if tokens[j] == "(":
                        d += 1
                    elif tokens[j] == ")":
                        d -= 1
                    j += 1
                if d:
                    raise ValueError("unbalanced parens")
                out.append("( " + _render(tokens[i + 1 : j - 1]) + " )")
                i = j
            else:
                out.append(tokens[i])
                i += 1
        if "?" in out or ":" in out:
            raise ValueError("unbalanced ternary ?:")
        return " ".join(out)
    return " ".join(tokens)


def translate(source: str, params: dict | None = None) -> str:
    """Painless expression -> one SQL string (valid Spark SQL AND DuckDB)."""
    return _render(_tokenize(source, params or {}))


def script_sql(script) -> str:
    """An ES script value -> SQL. Dict form ({"source", "params", "lang"})
    is translated as Painless; a plain string is passed through as SQL (the
    engine's documented script dialect, ScriptQueryBuilder analog)."""
    if isinstance(script, str):
        return script
    if isinstance(script, dict):
        lang = script.get("lang", "painless")
        if lang == "sql":
            return script["source"]
        if lang != "painless":
            raise ValueError(f"script lang {lang!r} unsupported")
        return translate(script["source"], script.get("params"))
    raise ValueError(f"unsupported script value: {script!r}")
