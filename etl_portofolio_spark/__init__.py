"""etl_portofolio_spark — a Spark-first analytics engine.

A brand-new PySpark-native engine with the query and data-processing
capabilities of the reference ETL portfolio (see SURVEY.md):

- partitioned-parquet relational data model with string ``ds`` day keys,
- incremental micro-batch ingestion (JDBC / HTTP-API sources),
- join + regex-feature-extraction + direction-pivot processing,
- plus large-scale training-data-pipeline extensions (dedup, similarity
  search, text analysis, multimodal column plumbing).

Design: operators are thin functions that build DataFrame plans; Catalyst
is the optimizer and Tungsten the execution engine. There is no custom IR.
"""

from etl_portofolio_spark.session import build_session
from etl_portofolio_spark.catalog import TABLES, register_tables
from etl_portofolio_spark.caching import release_cached

__all__ = ["build_session", "register_tables", "TABLES", "release_cached"]
__version__ = "0.1.0"
