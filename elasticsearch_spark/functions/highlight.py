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


# token class of the standard analyzer (analysis.TOKEN_REGEX_*), anchored:
# the word-run in progress at a nominal fragment boundary
_WORD_RUN_JAVA = r"^[\p{L}\p{N}]+"
_WORD_RUN_RE2 = r"^[\pL\pN]+"


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


def highlight_fragments_expr(
    text: Column | str,
    terms: list[str],
    pre: str = PRE,
    post: str = POST,
    fragment_size: int = 100,
    number_of_fragments: int = 5,
    order: str | None = None,
    no_match_size: int = 0,
    sep: str = " … ",
) -> Column:
    """Multi-fragment highlighter (HighlightBuilder options: pre_tags /
    post_tags / fragment_size / number_of_fragments / order:"score" /
    no_match_size — search/fetch/subphase/highlight/HighlightBuilder.java).

    Fragmenter model (SimpleFragmenter semantics — Lucene breaks fragments
    BETWEEN tokens, never inside one): nominal `fragment_size`-char window
    boundaries are extended forward past any word in progress, so every
    window starts and ends at a token boundary and a tag can never split a
    term. fragment_size is thus a minimum, like SimpleFragmenter's, with
    the final token carried whole into the earlier fragment. Windows are
    tagged independently, windows with >= 1 hit are kept, ordered by
    position or by hit count (order="score", ties by position), capped at
    `number_of_fragments`, and joined with `sep` into one string column (ES
    returns a fragment array; the driver compare needs a scalar). With no
    hits, no_match_size > 0 yields the leading `no_match_size` chars.

    Hit counting is tag-expansion arithmetic — (len(tagged) - len(raw)) /
    len(pre + post) — identical in Spark and the DuckDB twin."""
    c = F.col(text) if isinstance(text, str) else text
    fs = int(fragment_size)
    taglen = len(pre) + len(post)
    nw = F.greatest(F.ceil(F.length(c) / F.lit(fs)).cast("int"), F.lit(1))
    idxs = F.sequence(F.lit(0), nw - 1)

    def bound(i):
        # boundary i = i*fs extended past the word (letter/number run, the
        # analyzer's token class) in progress at that offset; boundary 0 is
        # the text start. A word is IN PROGRESS only when the char before
        # the boundary is also a word char — a word that merely STARTS at
        # the boundary belongs to the next window (SimpleFragmenter breaks
        # BETWEEN tokens, it never pulls a following token back). Monotone:
        # a run crossing a whole window collapses that window to empty,
        # which the hit filter then drops.
        run = F.when(
            c.substr(i * fs, F.lit(1)).rlike(r"[\p{L}\p{N}]"),
            F.length(
                F.regexp_extract(
                    c.substr(i * fs + 1, F.length(c)), _WORD_RUN_JAVA, 0
                )
            ),
        ).otherwise(F.lit(0))
        return F.when(i == F.lit(0), F.lit(0)).otherwise(i * fs + run)

    def frag(i):
        b0, b1 = bound(i), bound(i + 1)
        raw = c.substr(b0 + 1, b1 - b0)
        tagged = F.regexp_replace(raw, "(?i)" + _pat(terms), pre + "$1" + post)
        hits = (F.length(tagged) - F.length(raw)) / F.lit(taglen)
        return F.struct(
            (-hits).cast("long").alias("h"), i.alias("i"), tagged.alias("f")
        )

    kept = F.filter(F.transform(idxs, frag), lambda s: s["h"] < 0)
    if order == "score":
        kept = F.array_sort(kept)  # struct order: (-hits, position)
    best = F.slice(kept, 1, int(number_of_fragments))
    joined = F.array_join(F.transform(best, lambda s: s["f"]), sep)
    if no_match_size > 0:
        return F.when(F.size(kept) > 0, joined).otherwise(
            F.substring(c, 1, int(no_match_size))
        )
    return F.when(F.size(kept) > 0, joined).otherwise(F.lit(""))


def highlight_fragments_sql(
    text_expr: str,
    terms: list[str],
    pre: str = PRE,
    post: str = POST,
    fragment_size: int = 100,
    number_of_fragments: int = 5,
    order: str | None = None,
    no_match_size: int = 0,
    sep: str = " … ",
) -> str:
    """DuckDB twin of highlight_fragments_expr (oracle)."""
    fs = int(fragment_size)
    taglen = len(pre) + len(post)

    def bound(iexpr: str) -> str:
        # twin of the expr bound(): extend only past a word IN PROGRESS
        # (word char on both sides of the nominal boundary)
        run = (
            f"(CASE WHEN regexp_matches(substr({text_expr}, ({iexpr}) * {fs}, 1), "
            f"'[\\pL\\pN]') THEN "
            f"len(regexp_extract(substr({text_expr}, ({iexpr}) * {fs} + 1), "
            f"'{_WORD_RUN_RE2}', 0)) ELSE 0 END)"
        )
        return f"(CASE WHEN ({iexpr}) = 0 THEN 0 ELSE ({iexpr}) * {fs} + {run} END)"

    b0, b1 = bound("i"), bound("i + 1")
    raw = f"substr({text_expr}, {b0} + 1, {b1} - {b0})"
    tagged = f"regexp_replace({raw}, '{_pat(terms)}', '{pre}\\1{post}', 'gi')"
    structs = (
        f"list_transform(range(0, greatest(cast(ceil(len({text_expr}) / {fs}.0) "
        f"AS int), 1)), i -> {{'h': -cast((len({tagged}) - len({raw})) / {taglen} "
        f"AS bigint), 'i': i, 'f': {tagged}}})"
    )
    kept = f"list_filter({structs}, s -> struct_extract(s, 'h') < 0)"
    if order == "score":
        kept = f"list_sort({kept})"
    best = f"list_slice({kept}, 1, {int(number_of_fragments)})"
    joined = (
        f"array_to_string(list_transform({best}, "
        f"s -> struct_extract(s, 'f')), '{sep}')"
    )
    fallback = (
        f"substr({text_expr}, 1, {int(no_match_size)})" if no_match_size > 0
        else "''"
    )
    return f"CASE WHEN len({kept}) > 0 THEN {joined} ELSE {fallback} END"
