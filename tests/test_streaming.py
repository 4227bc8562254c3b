"""Streaming integration tests: landing-dir ingest through the pipeline,
partitioned streaming archive, and per-batch upsert — the reference's
collector loop (core.clj) end-to-end in Structured Streaming form."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # excluded by the -m 'not slow' quick path

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis3_spark.pipeline import ingest
from kinesis3_spark.streaming import archive_stream, stream_jsonl, upsert_stream

RAW_ONLY = T.StructType([T.StructField("raw", T.StringType())])


def _write_landing(tmp_path, name, records):
    d = tmp_path / name
    d.mkdir()
    with open(d / "batch0.jsonl", "w") as f:
        for r in records:
            f.write(json.dumps({"raw": r}) + "\n")
    return str(d)


def _raw(i, t_ms, val="x"):
    body = json.dumps(
        {"id": f"e{i}", "t": t_ms, "path": f"/p/{val}", "args": {"utm_source": val}}
    )
    return json.dumps({"m": "evt", "epoch": t_ms + 5, "body": body})


def test_stream_ingest_archive_roundtrip(spark, tmp_path):
    day1 = 1704103200000  # 2024-01-01T10:00:00Z
    day2 = day1 + 86400_000
    landing = _write_landing(
        tmp_path, "landing", [_raw(1, day1), _raw(2, day1 + 1000), _raw(3, day2)]
    )
    out = str(tmp_path / "archive")
    sdf = ingest(stream_jsonl(spark, landing, RAW_ONLY))
    sdf = sdf.withColumn("dt", F.substring("ts", 1, 10))
    q = archive_stream(sdf, out, checkpoint=str(tmp_path / "ck"))
    q.awaitTermination(120)
    assert sorted(d for d in os.listdir(out) if d.startswith("dt=")) == [
        "dt=2024-01-01",
        "dt=2024-01-02",
    ]
    back = spark.read.parquet(out)
    assert back.count() == 3
    assert {r.utm_source for r in back.select("utm_source").collect()} == {"x"}


def test_stream_upsert_foreachbatch(spark, tmp_path):
    t0 = 1704103200000
    # same id delivered twice: the newer event time must win (LWW)
    landing = _write_landing(
        tmp_path, "landing2",
        [_raw(1, t0, "old"), _raw(1, t0 + 60_000, "new"), _raw(2, t0, "b")],
    )
    target = str(tmp_path / "tbl")
    sdf = ingest(stream_jsonl(spark, landing, RAW_ONLY)).select(
        "id", "ts", "path", "utm_source"
    )
    q = upsert_stream(
        sdf, target, checkpoint=str(tmp_path / "ck2"), key="id", order_col="ts"
    )
    q.awaitTermination(120)
    got = {r.id: r.utm_source for r in spark.read.parquet(target).collect()}
    assert got == {"e1": "new", "e2": "b"}


def test_continuous_rollup_matches_batch(spark, tmp_path):
    """Continuous aggregate: 3 micro-batches of out-of-order events upserted
    into a rollup table must equal re-aggregating all rows from scratch
    (the TimescaleDB continuous-aggregate invariant)."""
    from kinesis3_spark.streaming import continuous_rollup, rollup_events

    land = tmp_path / "roll_landing"
    land.mkdir()
    t0 = 1704103200  # 2024-01-01 10:00:00 UTC, on a 5-min boundary
    rows = [
        # (file, event_type, offset_s, value) — same windows touched by
        # multiple batches, so update-mode re-emission is exercised
        (0, "click", 10, 1.5), (0, "click", 70, 2.0), (0, "buy", 20, 5.0),
        (1, "click", 30, 0.5), (1, "buy", 310, 7.25), (1, "click", 320, 1.0),
        (2, "click", 15, 4.0), (2, "buy", 330, 2.5), (2, "click", 620, 9.0),
    ]
    for fi in range(3):
        with open(land / f"f{fi}.jsonl", "w") as f:
            for (file_i, et, off, val) in rows:
                if file_i == fi:
                    f.write(json.dumps({
                        "event_id": fi * 100 + off, "ts_s": t0 + off,
                        "user_id": 1, "event_type": et, "value": val,
                    }) + "\n")

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_s", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force 3 distinct micro-batches
        .json(str(land))
        .withColumn("ts", F.timestamp_seconds("ts_s"))
    )
    target = str(tmp_path / "rollup_tbl")
    q = continuous_rollup(
        rollup_events(sdf), target, checkpoint=str(tmp_path / "ck_roll")
    )
    q.awaitTermination(180)

    got = {
        (r.win_start, r.event_type): (r.n, r.total_value)
        for r in spark.read.parquet(target).collect()
    }
    batch = (
        spark.read.schema(schema).json(str(land))
        .withColumn("ts", F.timestamp_seconds("ts_s"))
        .groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("tv"))
        .select(F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("w"),
                "event_type", "n", "tv")
    )
    want = {(r.w, r.event_type): (r.n, r.tv) for r in batch.collect()}
    assert got == want
    assert len(want) >= 4  # multiple windows and types actually exercised
