"""kafka_connect_spark — a PySpark-native streaming-ETL / analytics engine.

Re-expresses the capability surface of the reference stack
(IgorShcherbakov/Kafka-Connect: Kafka Connect worker + JDBC/Debezium/File
connectors + SMT chains + Prometheus/Grafana query workload — see SURVEY.md)
as idiomatic Spark: DataFrame/SQL for the relational surface, Structured
Streaming for the pipeline semantics, plus LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) designed for
100 TB scale.

Layout:
- ``session``    SparkSession factory tuned for the local[32] harness
- ``catalog``    fixture-table loaders (/root/testdata/sf*/ parquet)
- ``queries``    the declared query surface: every [Q-*] from SURVEY.md §2,
                 registered as (spark, sf_dir) -> DataFrame plus a DuckDB
                 oracle SQL string
- ``transforms`` per-record transforms (SMT analogs: MaskField, Debezium
                 unwrap, topic routing, JSON envelope, predicates)
- ``sources``    incremental (JDBC-style) source with offset bookkeeping,
                 fixture replay helpers
- ``sinks``      file/parquet sink, keyed upsert sink, Kafka passthrough
- ``plans``      pipeline-spec (connector-config JSON analog) -> running plan
- ``streaming``  windows/watermarks helpers, metrics listener + Prometheus
                 exposition format
- ``functions``  reusable column/DataFrame functions: text analysis, dedup
                 (exact/MinHash/SimHash/n-gram), similarity search, multimodal
"""

__version__ = "0.1.0"
