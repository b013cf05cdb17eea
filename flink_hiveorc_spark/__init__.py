"""flink_hiveorc_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of the reference
``icandeal/flink-hiveorc`` (a Flink → Hive-partitioned-ORC streaming
sink, see ``/root/reference``) as an idiomatic Spark engine:

- batch relational surface: DataFrame/SQL over parquet/ORC
  (``operators/``),
- ingestion surface: CDC-envelope decode + partitioned ORC sink,
  batch and Structured Streaming (``sources/``, ``sinks/``,
  ``streaming/``),
- LLM-data-pipeline operators: dedup, similarity search, text
  analysis, multimodal column plumbing (``functions/``),
- plan hygiene helpers (``plans/``).

Everything here is built on public Apache Spark APIs only.
"""

from flink_hiveorc_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
