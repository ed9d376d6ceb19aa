"""Highlighting (search/fetch/subphase/highlight/, 17 files in reference —
unified/plain/fvh highlighters; default tags <em>/</em>).

Spark mapping: pure JVM column expressions — tag-wrap query terms with a
word-boundary regex (the plain-highlighter analog over the original text;
no positions index needed), then cut the first fragment window around the
earliest hit. Both steps have exact DuckDB twins for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PRE, POST = "<em>", "</em>"


def _pat(terms: list[str]) -> str:
    return r"\b(" + "|".join(sorted(terms)) + r")\b"


def highlight_expr(text: Column | str, terms: list[str], pre: str = PRE, post: str = POST) -> Column:
    """Wrap every occurrence of any query term (case-insensitive, whole word)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, "(?i)" + _pat(terms), pre + "$1" + post)


def fragment_expr(
    text: Column | str,
    terms: list[str],
    fragment_size: int = 100,
    lead: int = 20,
    pre: str = PRE,
    post: str = POST,
) -> Column:
    """First highlight fragment: window of `fragment_size` chars starting
    `lead` chars before the first tagged hit (1 if no hit)."""
    hl = highlight_expr(text, terms, pre, post)
    pos = F.instr(hl, pre)
    start = F.greatest(pos - lead, F.lit(1))
    return F.substring(hl, start.cast("int"), fragment_size)


def highlight_sql(text_expr: str, terms: list[str], fragment_size: int = 100, lead: int = 20) -> str:
    """DuckDB twin of fragment_expr (oracle)."""
    # DuckDB '…' literals keep backslashes verbatim — no escaping needed
    hl = f"regexp_replace({text_expr}, '{_pat(terms)}', '{PRE}\\1{POST}', 'gi')"
    pos = f"strpos({hl}, '{PRE}')"
    start = f"greatest({pos} - {lead}, 1)"
    return f"substr({hl}, cast({start} as bigint), {fragment_size})"
