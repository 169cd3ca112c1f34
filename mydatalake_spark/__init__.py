"""mydatalake_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference data-lake
project (henriqueetges/MyDatalake, surveyed in /root/repo/SURVEY.md):
metadata-driven medallion ingestion (full + CDC merge), declarative
schema compilation, SQL transformation with dialect shims, a
declarative data-quality engine, and job orchestration — re-expressed
as idiomatic OSS PySpark (DataFrame / Spark SQL / Catalyst), extended
with large-scale training-data-pipeline operators (deduplication,
similarity search, text analysis, multimodal columns, streaming
windows).

Everything here is plain declarative DataFrame/SQL work: no custom
Catalyst rules, no RDDs, no row-at-a-time Python UDFs in hot paths.
"""

__version__ = "0.1.0"
