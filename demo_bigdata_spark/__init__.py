"""demo_bigdata_spark — a PySpark-native analytics engine.

A clean-room, Spark-first rebuild of the operator surface of the reference
pipeline ``Ezio1909/demo_bigdata`` (GitHub events -> Kafka -> Spark Structured
Streaming -> Iceberg -> batch analytics), extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
designed for 100 TB scale.

Layout:
  session     SparkSession factory (AQE, UTC, Arrow, Kryo)
  schemas     explicit StructTypes: GitHub events, flattened fact, synthetic tables
  sources     table catalog (parquet star schema + events), partitioned writers
  functions   scalar/vector expression helpers (UDF-free, Catalyst-native)
  operators   ingest / analytics / relational / dedup / similarity / text / multimodal
  streaming   Structured Streaming pipelines (file source, watermark, windows)
  plans       plan-inspection helpers (pushdown / broadcast / codegen assertions)
"""

__version__ = "0.1.0"
