"""Streaming sources.

The reference consumes an AWS Kinesis shard iterator in a worker loop
(src/kinesis3/core.clj:150-200). The Spark-native equivalent is a
Structured Streaming file source over the landing directory (or a real
Kinesis/Kafka connector in production — same DataFrame downstream). File
sources give exactly-once tracking per file, the unit the reference's
sequence-checkpointing approximates.
"""

from __future__ import annotations

import os

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STREAM_DIRS: dict[str, str] = {}


def _as_stream_dir(file_path: str) -> str:
    """File streaming sources monitor a DIRECTORY; the corpus tables are
    single parquet files. Expose the file through a symlink in a temp dir
    (read-only view — the corpus itself is never touched)."""
    if file_path not in _STREAM_DIRS:
        d = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(file_path, os.path.join(d, os.path.basename(file_path)))
        _STREAM_DIRS[file_path] = d
    return _STREAM_DIRS[file_path]


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus `events` table as a stream (schema inferred from a batch
    peek — streaming file sources need an explicit schema). Applies the same
    nanos→µs ts normalization as sources/batch.load_table."""
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    df = spark.readStream.schema(schema).parquet(_as_stream_dir(path))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def stream_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON-lines landing directory → stream (the raw collector records
    shape; feed through pipeline.ingest for the events projection)."""
    return spark.readStream.schema(schema).json(path)
