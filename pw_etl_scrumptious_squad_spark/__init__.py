"""pw_etl_scrumptious_squad_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query / data-processing
capabilities of the reference ETL pipeline (gheenie/pw-etl-scrumptious-squad):
a three-stage Extract-Transform-Load pipeline over an 11-table retail OLTP
schema into a Kimball star schema (8 dims + 3 facts), with incremental
change-data-capture extraction, plus large-scale training-data-pipeline
extensions (deduplication, similarity search, text analysis, multimodal
columns) that the reference does not have.

Everything is expressed with the public DataFrame / Spark SQL API so Catalyst
handles predicate pushdown, column pruning, join strategy selection (broadcast
for the small dimensions), and AQE handles runtime re-planning — no RDD code,
no custom Catalyst rules.

Layout:
  session.py    SparkSession factory with scale-tuned defaults
  schemas.py    explicit StructTypes for OLTP sources and star outputs
  sources/      parquet + JDBC readers/writers, watermark state store
  operators/    relational builders (dims/facts), CDC, dedup, similarity, text
  functions/    reusable column-expression helpers (pure, JVM-side)
  plans/        batch ETL orchestration (extract -> transform -> load)
  streaming/    Structured Streaming variant (micro-batch ~ EventBridge rates)
"""

from pw_etl_scrumptious_squad_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
