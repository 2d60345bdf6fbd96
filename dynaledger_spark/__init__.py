"""dynaledger_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
Damg7245-BigDataIntelligence/DynaLedger (SEC Financial Statement Data Sets
ETL + interactive query system), expressed Spark-first: DataFrame/SQL plans
optimized by Catalyst, Parquet columnar storage with partition columns
instead of per-quarter table-name suffixes, and native joins/windows in
place of the reference's row-at-a-time pandas loops.

Capability map (see SURVEY.md §2 for the operator inventory):
  sources/    — TSV/ZIP ingestion, Parquet/JSON IO, lookup dims
  operators/  — fact builders, statement queries, document assembly,
                dedup (exact / MinHash-LSH / SimHash), similarity search
  functions/  — validation predicates, text analysis, vector math
  plans/      — the query registry driving __spark_entry__ and bench.py
  streaming/  — Structured Streaming ingest (Trigger.AvailableNow)
  multimodal/ — binary-column (image/audio) plumbing via mapInPandas
"""

from dynaledger_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
