"""kafka_hadoop_consumer_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``soid/kafka-hadoop-consumer`` (a Kafka→HDFS ingestion pipeline;
see SURVEY.md §0–§2A — the reference mount is empty, so all reference claims
are reconstructed from public knowledge of the tool family), extended with
the full analytics inventory of SURVEY.md §2B: relational operators,
window functions, scalar function families, dedup / similarity / text /
multimodal operators for LLM-data pipelines, and a Structured-Streaming
ingestion layer providing the reference's Kafka→storage semantics.

Design stance (SURVEY.md §4): DataFrame/SQL-first so Catalyst + AQE do the
physical planning; zero custom Catalyst rules; Python stays out of hot
paths (Arrow-batched pandas UDFs only where built-ins can't express the
semantics).
"""

from kafka_hadoop_consumer_spark.session import get_spark
from kafka_hadoop_consumer_spark.catalog import TABLES, load_table, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_table", "load_tables", "register_views"]

__version__ = "0.1.0"
