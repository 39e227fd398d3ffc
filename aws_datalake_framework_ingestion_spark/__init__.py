"""PySpark-native analytics engine with the capability surface of the
reference AWS data-lake ingestion framework (see SURVEY.md), rebuilt
Spark-first for 100 TB scale.

Layout:
  session     — tuned SparkSession factory / runtime conf prep
  tables      — testdata table registry + schema-normalizing loaders
  catalog     — parquet-backed metadata catalog (sources/assets/run ledger)
  dal         — relational DAL: the reference Connector's query semantics
                over DataFrames (select/where/order/limit/offset/...)
  planner     — full-vs-incremental watermark extraction planner
  pipeline    — run(asset): ingest → dq → mask → publish
  sources/    — jdbc dialect factory, file-landing ops
  operators/  — relational, window, dedup, similarity, text, multimodal
  streaming/  — micro-batch merge + windows/watermark ops
  plans/      — named query registry wired to __spark_entry__
"""

__version__ = "0.1.0"
