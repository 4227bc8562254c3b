"""kinesis3_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference streaming ETL collector (bcambel/kinesis3, see SURVEY.md), rebuilt
Spark-first: DataFrame/SQL for the relational surface, Structured Streaming
for the ingest pipeline, Catalyst/Tungsten for optimization and execution.

Layout:
    session      SparkSession factory (UTC, AQE, Arrow)
    sources      batch/streaming readers for the test corpus + event streams
    functions    scalar function library (reference utils.clj / db.clj parity)
    operators    relational + LLM-data operators (dedup, similarity, as-of, ...)
    pipeline     the reference's event ingest pipeline (parse/project/upsert)
    sinks        partitioned Parquet archive + keyed upsert writers
    streaming    Structured Streaming wiring (triggers, sinks, metrics)
    queries      the oracle-checked query registry (SURVEY.md §2b inventory)
"""

__version__ = "0.1.0"
