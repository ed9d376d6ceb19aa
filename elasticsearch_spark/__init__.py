"""elasticsearch_spark — a PySpark-native full-text indexing + BM25 query engine.

A from-scratch reimplementation of the query/data-processing capabilities of the
Elasticsearch 7.7.1 fork at vikashkumar-19/elasticsearch (see SURVEY.md), re-expressed
Spark-first: DataFrame/SQL plans compiled by Catalyst, vectorized Arrow/pandas UDF
kernels only where built-ins can't express the semantics (WAND top-k, postings codec).

Layout:
  functions/   tokenization, BM25 scoring, text statistics (pure column expressions)
  sources/     transcripts schema + generators, snapshot/manifest segment store
  operators/   index build, match/bool query, top-k (WAND), aggregations, dedup,
               similarity search, updates with pre/post images
  plans/       ES query-DSL dict -> DataFrame plan compiler
  streaming/   incremental micro-batch ingest (refresh analog)
"""

__version__ = "0.1.0"
