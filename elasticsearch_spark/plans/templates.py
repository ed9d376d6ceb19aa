"""Search templates: parameterized query bodies (reference:
modules/lang-mustache/ — _search/template renders a Mustache source with
params into a query body, MustacheScriptEngine.java).

The engine's query "IR" is a Python dict, so the template surface maps to the
same substitution semantics over dicts: `{{param}}` interpolates into strings,
a value that is EXACTLY "{{param}}" substitutes the param's native type
(numbers/lists stay numbers/lists — Mustache-in-JSON behaves the same way
when the placeholder is the whole scalar), and `{{#param}}...{{/param}}`
conditional sections keep or drop a dict key (the toJson/section subset the
reference's search templates actually use). No Mustache lambdas/partials —
catalogued, out of scope.
"""

from __future__ import annotations

import re

_PLACEHOLDER = re.compile(r"\{\{(\w+)\}\}")


def render_template(source, params: dict):
    """Render a template (dict/list/str) with params into a query body."""
    if isinstance(source, dict):
        out = {}
        for k, v in source.items():
            sec = re.fullmatch(r"\{\{#(\w+)\}\}(\w+)\{\{/\1\}\}", k)
            if sec:  # conditional key: kept (under the inner name) iff truthy
                if params.get(sec.group(1)):
                    out[sec.group(2)] = render_template(v, params)
                continue
            out[_render_str(k, params)] = render_template(v, params)
        return out
    if isinstance(source, list):
        return [render_template(v, params) for v in source]
    if isinstance(source, str):
        whole = _PLACEHOLDER.fullmatch(source)
        if whole:  # whole-scalar placeholder keeps the param's native type
            if whole.group(1) not in params:
                raise KeyError(f"missing template param: {whole.group(1)}")
            return params[whole.group(1)]
        return _render_str(source, params)
    return source


def _render_str(s: str, params: dict) -> str:
    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise KeyError(f"missing template param: {name}")
        return str(params[name])

    return _PLACEHOLDER.sub(sub, s)
