"""Suggesters + the _analyze debug API (SURVEY.md §2.9).

Reference: search/suggest/ — term suggester (edit-distance candidates from
the term dictionary), phrase suggester (candidate substitution + corpus
frequency ranking), completion suggester (prefix match over weighted
entries); _analyze at action/admin/indices/analyze/TransportAnalyzeAction.java:73.

Spark mapping: the "term dictionary" is a DataFrame of (term, df) derived
from the corpus (or read from the postings tables); suggestion ranking is a
join + window, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import analysis


def analyze_api(spark, text: str, analyzer: str | dict = "standard") -> DataFrame:
    """_analyze: tokens with positions for a given text under any registered
    or custom analyzer chain (TransportAnalyzeAction.java:73; named analyzers
    from functions/analyzers.py, e.g. 'whitespace', 'english_light', or a
    {"tokenizer": ..., "filters": [...]} spec)."""
    from ..functions import analyzers

    df = spark.createDataFrame([(text,)], "text string")
    toks = df.select(
        F.posexplode(analyzers.tokens("text", analyzer)).alias("position", "token")
    )
    return toks.select("token", "position")


def term_dictionary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, df) over the corpus — the suggester's candidate source."""
    return (
        docs.select(F.explode(F.array_distinct(analysis.tokens(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def term_suggest(
    docs: DataFrame,
    text: str,
    text_col: str = "text",
    max_edits: int = 2,
    size: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Term suggester: per input token, top corrections from the dictionary
    by (edit distance asc, df desc, term asc); exact dictionary hits
    suggest themselves with distance 0 (suggest_mode=missing would skip)."""
    terms = list(dict.fromkeys(analysis.analyze(text)))
    if not terms:
        return docs.sparkSession.createDataFrame([], "input string, suggestion string, distance int, df long")
    td = term_dictionary(docs, text_col).where(F.col("df") >= min_df)
    inputs = docs.sparkSession.createDataFrame([(t,) for t in terms], "input string")
    # Candidate generation WITHOUT a dictionary-wide crossJoin: by the q-gram
    # lemma (q=2), edit distance <= e implies the two strings share >= 1
    # bigram whenever max(len) >= 2e+2 — so LONG dictionary terms reach the
    # levenshtein check through an equi-join on shared bigrams (web-scale
    # vocabularies are long-tail-long), and only the bounded set of SHORT
    # terms (len < 2e+2, no lemma guarantee) is scanned via the length band.
    short_len = 2 * max_edits + 2

    def bigrams(col: str):
        c = F.col(col)
        return F.array_distinct(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length(c) - 1, F.lit(1))),
                    lambda i: F.when(i + 1 <= F.length(c), F.substring(c, i, 2)),
                ),
                lambda g: g.isNotNull(),
            )
        )

    t_grams = td.select("term", "df", F.explode(bigrams("term")).alias("_g"))
    i_grams = inputs.select("input", F.explode(bigrams("input")).alias("_g"))
    joined = (
        t_grams.join(F.broadcast(i_grams), "_g")
        .select("term", "df", "input")
        .dropDuplicates(["term", "input"])
    )
    shorts = td.where(F.length("term") < short_len).crossJoin(F.broadcast(inputs))
    cand = (
        joined.unionByName(shorts)
        .dropDuplicates(["term", "input"])
        .where(F.abs(F.length("term") - F.length("input")) <= max_edits)
    )
    cand = cand.withColumn("distance", F.levenshtein("term", "input")).where(
        F.col("distance") <= max_edits
    )
    w = Window.partitionBy("input").orderBy(
        F.col("distance").asc(), F.col("df").desc(), F.col("term").asc()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= size)
        .select("input", F.col("term").alias("suggestion"), "distance", "df")
    )


def phrase_suggest(
    docs: DataFrame,
    text: str,
    text_col: str = "text",
    max_edits: int = 1,
    size: int = 3,
) -> DataFrame:
    """Phrase suggester (simplified real-word correction): replace each token
    with its best term_suggest correction and rank whole-phrase candidates by
    the sum of corrected-term log-df (the corpus-frequency ranking idea of
    search/suggest/phrase/PhraseSuggester.java, without the n-gram LM)."""
    terms = analysis.analyze(text)
    sg = term_suggest(docs, text, text_col, max_edits=max_edits, size=size)
    best = sg.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("input").orderBy(
                F.col("distance").asc(), F.col("df").desc(), F.col("suggestion").asc()
            )
        ),
    ).where(F.col("_rn") == 1)
    rows = {r.input: (r.suggestion, r.df) for r in best.collect()}
    corrected = [rows.get(t, (t, 0))[0] for t in terms]
    import math

    score = sum(math.log(1 + rows.get(t, (t, 0))[1]) for t in terms)
    return docs.sparkSession.createDataFrame(
        [(" ".join(corrected), float(round(score, 4)))], "suggestion string, score double"
    )


def completion_suggest(
    entries: DataFrame,
    prefix: str,
    size: int = 5,
    input_col: str = "input",
    weight_col: str = "weight",
) -> DataFrame:
    """Completion suggester: prefix match over (input, weight) entries, top
    by weight desc then input asc (search/suggest/completion/)."""
    return (
        entries.where(F.col(input_col).startswith(prefix.lower()))
        .orderBy(F.col(weight_col).desc(), F.col(input_col).asc())
        .limit(size)
        .select(F.col(input_col).alias("suggestion"), F.col(weight_col).alias("weight"))
    )
