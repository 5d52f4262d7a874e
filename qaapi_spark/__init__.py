"""qaapi_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference repo 4ndertron/QAAPI.

The reference is a batch ELT pipeline (REST ingest -> JSON landing ->
Snowflake staging -> curated SQL transforms).  This package re-expresses
every operator it uses (SURVEY.md §2) as idiomatic PySpark DataFrame
plans, plus the large-scale training-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal plumbing).

Layout:
    sources/    parquet + JSON-landing readers (reference S1-S15)
    functions/  Snowflake-dialect scalar layer (reference F1-F16)
    operators/  windows, joins, maintenance, dedup, similarity, text
    plans/      the query catalog (driver contract) + Calabrio DAG
    streaming/  incremental/streaming variants of the batch reconcile
"""

__version__ = "0.1.0"
