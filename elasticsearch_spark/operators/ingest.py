"""Ingest pipelines: ES processor list -> DataFrame transformation.

Reference: modules/ingest-common/src/main/java/org/elasticsearch/ingest/common/
(30 processors; geoip/user_agent live in plugins and are out of scope). Each
processor maps to a built-in Spark column expression — whole-stage codegen,
no UDFs. `run_pipeline(df, [{"set": {...}}, ...])` mirrors the REST pipeline
definition shape; processors execute in order, like the reference's
CompoundProcessor.

| processor | reference file | Spark mapping |
|---|---|---|
| set, remove, rename, copy   | SetProcessor.java, RemoveProcessor.java, RenameProcessor.java | withColumn / drop / rename |
| append                      | AppendProcessor.java | array_union/concat |
| convert                     | ConvertProcessor.java | cast |
| lowercase/uppercase/trim    | LowercaseProcessor.java ... | lower/upper/trim |
| split / join                | SplitProcessor.java, JoinProcessor.java | split / array_join |
| gsub                        | GsubProcessor.java | regexp_replace |
| grok / dissect              | GrokProcessor.java, DissectProcessor.java | regexp_extract (named patterns pre-compiled to regex) |
| csv                         | CsvProcessor.java | split + element_at |
| json                        | JsonProcessor.java | from_json |
| kv                          | KeyValueProcessor.java | str_to_map |
| date                        | DateProcessor.java | to_timestamp |
| date_index_name             | DateIndexNameProcessor.java | date_format partition column |
| bytes                       | BytesProcessor.java | unit-suffix parse to long |
| urldecode                   | URLDecodeProcessor.java | url_decode |
| html_strip                  | HtmlStripProcessor.java | regexp_replace(<[^>]*>) |
| fail                        | FailProcessor.java | raise on matching rows (assert_true) |
| drop                        | DropProcessor.java | filter out matching rows |
| script                      | ScriptProcessor.java | F.expr(SQL) |
| sort (array field)          | SortProcessor.java | sort_array |
| foreach                     | ForEachProcessor.java | transform() |
| dot_expander                | DotExpanderProcessor.java | N/A (no dotted flat fields in a typed schema) |
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(field: str) -> Column:
    return F.col(field)


def run_pipeline(df: DataFrame, processors: list[dict]) -> DataFrame:
    for proc in processors:
        (kind, body), = proc.items()
        df = _apply(df, kind, body)
    return df


def _apply(df: DataFrame, kind: str, b: dict) -> DataFrame:
    f = b.get("field")
    tgt = b.get("target_field", f)
    if kind == "set":
        v = b["value"]
        return df.withColumn(b["field"], F.expr(v) if b.get("expr") else F.lit(v))
    if kind == "copy":
        return df.withColumn(b["target_field"], _col(b["field"]))
    if kind == "remove":
        fields = f if isinstance(f, list) else [f]
        return df.drop(*fields)
    if kind == "rename":
        return df.withColumnRenamed(f, b["target_field"])
    if kind == "dot_expander":
        # DotExpanderProcessor: a literally-dotted field name ("a.b") becomes
        # a nested object ({"a": {"b": ...}}) — here a struct column. If the
        # parent struct already exists, the new leaf is added to it.
        parent, child = f.split(".", 1)
        if "." in child:
            raise ValueError("dot_expander supports one level of nesting")
        src = df["`" + f + "`"]
        if parent in df.columns:
            new = F.col(parent).withField(child, src)
        else:
            new = F.struct(src.alias(child))
        return df.withColumn(parent, new).drop(f)
    if kind == "append":
        val = b["value"]
        vals = val if isinstance(val, list) else [val]
        existing = (
            F.coalesce(_col(f), F.array()) if f in df.columns else F.array()
        )  # ES append creates the field when absent
        appended = F.concat(existing, F.array(*[F.lit(v) for v in vals]))
        if b.get("allow_duplicates", True) is False:
            appended = F.array_distinct(appended)
        return df.withColumn(f, appended)
    if kind == "convert":
        types = {
            "integer": "int",
            "long": "long",
            "float": "float",
            "double": "double",
            "string": "string",
            "boolean": "boolean",
        }
        return df.withColumn(tgt, _col(f).cast(types[b["type"]]))
    if kind == "lowercase":
        return df.withColumn(tgt, F.lower(_col(f)))
    if kind == "uppercase":
        return df.withColumn(tgt, F.upper(_col(f)))
    if kind == "trim":
        return df.withColumn(tgt, F.trim(_col(f)))
    if kind == "split":
        return df.withColumn(tgt, F.split(_col(f), b["separator"]))
    if kind == "join":
        return df.withColumn(tgt, F.array_join(_col(f), b["separator"]))
    if kind == "gsub":
        return df.withColumn(tgt, F.regexp_replace(_col(f), b["pattern"], b["replacement"]))
    if kind == "grok":
        # one named capture per target: %{WORD:name} etc. pre-compiled by
        # caller to a java regex with named groups; extract each group
        pattern = b["pattern"]
        out = df
        for i, name in enumerate(b["captures"], start=1):
            out = out.withColumn(name, F.regexp_extract(_col(f), pattern, i))
        return out
    if kind == "dissect":
        # "%{a} %{b}" over a separator-structured string
        parts = b["pattern"].split(b.get("separator", " "))
        names = [p[2:-1] for p in parts]
        split_col = F.split(_col(f), b.get("separator", " "))
        out = df
        for i, name in enumerate(names):
            if name:
                out = out.withColumn(name, F.element_at(split_col, i + 1))
        return out
    if kind == "csv":
        split_col = F.split(_col(f), b.get("separator", ","))
        out = df
        for i, name in enumerate(b["target_fields"]):
            out = out.withColumn(name, F.element_at(split_col, i + 1))
        return out
    if kind == "json":
        return df.withColumn(tgt, F.from_json(_col(f), b["schema"]))
    if kind == "kv":
        return df.withColumn(
            tgt,
            F.str_to_map(_col(f), F.lit(b.get("field_split", " ")), F.lit(b.get("value_split", "="))),
        )
    if kind == "date":
        fmt = (b.get("formats") or ["yyyy-MM-dd HH:mm:ss"])[0]
        expr = (
            (F.col(f).cast("double") / 1000).cast("timestamp")
            if fmt in ("epoch_millis", "UNIX_MS")
            else F.to_timestamp(_col(f), fmt)
        )
        return df.withColumn(b.get("target_field", "@timestamp"), expr)
    if kind == "date_index_name":
        rounding = {"d": "yyyy-MM-dd", "M": "yyyy-MM", "y": "yyyy", "H": "yyyy-MM-dd-HH"}
        fmt = rounding[b.get("date_rounding", "d")]
        return df.withColumn(
            "_index",
            F.concat(F.lit(b.get("index_name_prefix", "")), F.date_format(_col(f), fmt)),
        )
    if kind == "bytes":
        c = F.lower(F.trim(_col(f)))
        num = F.regexp_extract(c, r"^([0-9.]+)", 1).cast("double")
        unit = F.regexp_extract(c, r"([kmgt]?b)$", 1)
        mult = (
            F.when(unit == "b", 1.0)
            .when(unit == "kb", 1024.0)
            .when(unit == "mb", 1024.0**2)
            .when(unit == "gb", 1024.0**3)
            .when(unit == "tb", 1024.0**4)
        )
        return df.withColumn(tgt, (num * mult).cast("long"))
    if kind == "urldecode":
        return df.withColumn(tgt, F.url_decode(_col(f)))
    if kind == "html_strip":
        return df.withColumn(tgt, F.regexp_replace(_col(f), r"<[^>]*>", ""))
    if kind == "drop":
        return df.where(~F.expr(b["if"]))
    if kind == "fail":
        # fold the check into a surviving column — a standalone check column
        # would be pruned by Catalyst and never evaluated
        msg = b.get("message", "ingest fail processor")
        c0 = df.columns[0]
        checked = F.when(
            F.expr(b["if"]),
            F.raise_error(F.lit(msg)).cast(df.schema[c0].dataType),
        ).otherwise(F.col(c0))
        return df.withColumn(c0, checked)
    if kind == "script":
        return df.withColumn(b["target_field"], F.expr(b["source"]))
    if kind == "sort":
        return df.withColumn(tgt, F.sort_array(_col(f), asc=b.get("order", "asc") == "asc"))
    if kind == "foreach":
        (ik, ib), = b["processor"].items()
        if ik == "lowercase":
            inner = lambda x: F.lower(x)  # noqa: E731
        elif ik == "uppercase":
            inner = lambda x: F.upper(x)  # noqa: E731
        elif ik == "trim":
            inner = lambda x: F.trim(x)  # noqa: E731
        elif ik == "gsub":
            inner = lambda x: F.regexp_replace(x, ib["pattern"], ib["replacement"])  # noqa: E731
        else:
            raise ValueError(f"foreach: unsupported inner processor {ik}")
        return df.withColumn(tgt, F.transform(_col(f), inner))
    raise ValueError(f"unsupported processor: {kind}")
