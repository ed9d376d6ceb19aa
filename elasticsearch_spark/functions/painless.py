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


def _tokenize(source: str, params: dict, field_sql=None) -> list[str]:
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
            name = m.group("doc")
            # update-context resolver: a field read sees the value as of the
            # PRIOR statement (Painless executes sequentially), so the caller
            # substitutes the accumulated SQL for already-assigned fields
            out.append(f"( {field_sql(name)} )" if field_sql else name)
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


def _fix_concat(tokens: list[str]) -> list[str]:
    """Painless `+` concatenates when an operand is a String; SQL needs `||`.
    Without a type system we rewrite exactly the statically-visible case — a
    `+` adjacent to a string literal (covers field + 'lit', params-bound
    strings, and chained concats). A string-typed `+` between two non-literal
    operands stays `+` and fails loudly at analysis time."""
    return [
        "||"
        if t == "+"
        and (
            (i > 0 and tokens[i - 1].startswith("'"))
            or (i + 1 < len(tokens) and tokens[i + 1].startswith("'"))
        )
        else t
        for i, t in enumerate(tokens)
    ]


def _render(tokens: list[str]) -> str:
    """Join tokens, rewriting top-level ternaries (right-associative) to
    CASE WHEN. Recurses into parenthesized groups."""
    tokens = _fix_concat(tokens)
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


# ---------------------------------------------------------------- update ctx
# The reference runs update scripts against a mutable ctx map
# (UpdateHelper.java:126-145 executeScript; ctx._source field writes, ctx.op =
# 'noop' to skip the update). The Spark analog compiles the STATEMENT subset
#
#   ctx._source.f = <expr>;        (also += -= *= /=)
#   if (<expr>) { <stmts> } [else { <stmts> }]
#   ctx.op = 'noop';               (conditionally skip the update)
#
# into per-column SQL SET expressions over the old row plus a noop predicate,
# evaluated once per matched doc by update_by_query's MERGE — the expression
# translator above does every <expr>, with ctx._source.f reads resolved to the
# value as of the prior statement (Painless sequential semantics).
_ASSIGN = re.compile(
    r"\s*ctx\._source\.(?P<f>[A-Za-z_]\w*)\s*(?P<op>[-+*/]?=)(?!=)"
)
_NOOP = re.compile(r"\s*ctx\.op\s*=\s*(?P<q>['\"])noop(?P=q)\s*")
_IF = re.compile(r"\s*if\s*\(")
_ELSE = re.compile(r"\s*else\s*\{")


def _find_close(s: str, i: int, open_c: str, close_c: str) -> int:
    """Index of the close char matching s[i] == open_c (skips '...' strings)."""
    depth = 0
    in_str = False
    for j in range(i, len(s)):
        c = s[j]
        if in_str:
            in_str = c != "'"
        elif c == "'":
            in_str = True
        elif c == open_c:
            depth += 1
        elif c == close_c:
            depth -= 1
            if depth == 0:
                return j
    raise ValueError(f"unbalanced {open_c}{close_c} in update script")


def compile_update(source: str, params: dict | None = None):
    """Update-context Painless subset -> (set_exprs, noop_cond).

    set_exprs: {column: SQL over the OLD row} for every assigned field;
    noop_cond: SQL predicate (over the old row) selecting docs the script
    no-ops, or None. Raises ValueError outside the subset (round-3 policy:
    fail loudly, never silently drop semantics)."""
    params = params or {}
    env: dict[str, str] = {}
    noops: list[str] = []  # guard SQL per ctx.op='noop' site ('TRUE' = always)

    def field_sql(name: str) -> str:
        return env.get(name, name)

    def expr_sql(e: str) -> str:
        # ctx._source.f inside expressions reads like doc['f'].value
        e = re.sub(r"ctx\._source\.([A-Za-z_]\w*)", r"doc['\1'].value", e)
        return _render(_tokenize(e, params, field_sql=field_sql))

    def stmt_end(s: str, i: int) -> int:
        """Index just past the statement starting at i (terminated by ';' at
        paren depth 0, or end of block)."""
        depth = 0
        in_str = False
        for j in range(i, len(s)):
            c = s[j]
            if in_str:
                in_str = c != "'"
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif depth == 0 and c == ";":
                return j
        return len(s)

    def parse(s: str, i: int, guard: str | None) -> int:
        while i < len(s):
            while i < len(s) and s[i] in " \t\r\n;":
                i += 1
            if i >= len(s) or s[i] == "}":
                return i
            m = _IF.match(s, i)
            if m:
                op = m.end() - 1  # the '('
                cp = _find_close(s, op, "(", ")")
                cond = expr_sql(s[op + 1 : cp])
                g2 = f"({guard}) AND ({cond})" if guard else f"({cond})"
                j = cp + 1
                while j < len(s) and s[j] in " \t\r\n":
                    j += 1
                if j >= len(s) or s[j] != "{":
                    raise ValueError("if body must be a { } block")
                bp = _find_close(s, j, "{", "}")
                parse(s[:bp], j + 1, g2)
                i = bp + 1
                me = _ELSE.match(s, i)
                if me:
                    neg = f"({guard}) AND NOT ({cond})" if guard else f"NOT ({cond})"
                    ep = _find_close(s, me.end() - 1, "{", "}")
                    parse(s[:ep], me.end(), neg)
                    i = ep + 1
                continue
            m = _NOOP.match(s, i)
            if m:
                noops.append(guard or "TRUE")
                i = stmt_end(s, m.end()) + 1
                continue
            m = _ASSIGN.match(s, i)
            if m:
                f, op = m.group("f"), m.group("op")
                end = stmt_end(s, m.end())
                rhs = expr_sql(s[m.end() : end])
                if op != "=":
                    rhs = f"( {field_sql(f)} ) {op[0]} ( {rhs} )"
                if guard:
                    env[f] = f"CASE WHEN {guard} THEN {rhs} ELSE {field_sql(f)} END"
                else:
                    env[f] = rhs
                i = end + 1
                continue
            raise ValueError(
                f"update script subset cannot parse at offset {i}: {s[i:i+30]!r}"
            )
        return i

    parse(source, 0, None)
    if not env and not noops:
        raise ValueError("update script assigns nothing")
    noop_cond = None
    if noops:
        noop_cond = "TRUE" if "TRUE" in noops else "(" + ") OR (".join(noops) + ")"
    return env, noop_cond


def update_script_sql(script) -> tuple[dict[str, str], str | None]:
    """An ES update script value (dict or str) -> (set_exprs, noop_cond)."""
    if isinstance(script, dict):
        lang = script.get("lang", "painless")
        if lang not in ("painless",):
            raise ValueError(f"update script lang {lang!r} unsupported")
        return compile_update(script["source"], script.get("params"))
    if isinstance(script, str):
        return compile_update(script)
    raise ValueError(f"unsupported update script value: {script!r}")


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
