"""End-to-end collector tests: the full reference-daemon loop (landing
JSONL → two-level parse/projection → keyed upsert store + dt-partitioned
raw archive → /stats) driven through kinesis3_spark.app.Collector with the
availableNow trigger.

Covers the semantics the reference guarantees (core.clj / db.clj):
exactly-once per landed file, duplicate-id tolerance across replays, raw
archive fidelity, and the stats families of the /stats endpoint."""

from __future__ import annotations

import json
import os
import urllib.request

from pyspark.sql import functions as F

from kinesis3_spark.app import Collector
from kinesis3_spark.queries.ingestion import _raw_records


def _land_records(spark, sf_dir, out_dir: str, n: int = 200) -> int:
    """Write n Kinesis-shaped records {sequence_number, data, partition}
    as JSONL into the landing directory; returns the distinct id count."""
    raw = (
        _raw_records(spark, sf_dir)
        .limit(n)
        .select(
            F.format_string("%012d", F.monotonically_increasing_id()).alias(
                "sequence_number"
            ),
            F.col("raw").alias("data"),
            F.lit("shard-0").alias("partition"),
        )
    )
    raw.coalesce(1).write.mode("overwrite").json(out_dir)
    return raw.select("data").distinct().count()


def test_collector_end_to_end(spark, sf_dir, tmp_path):
    landing = str(tmp_path / "landing")
    n_ids = _land_records(spark, sf_dir, landing, n=200)

    c = Collector(
        spark,
        landing,
        store_path=str(tmp_path / "store"),
        archive_path=str(tmp_path / "archive"),
        checkpoint=str(tmp_path / "ck"),
    )
    port = c.serve_stats(0)
    stats = c.run(timeout_s=300)
    try:
        # store: one row per distinct event id, the full events projection
        store = spark.read.parquet(str(tmp_path / "store"))
        assert store.count() == n_ids
        assert store.select("id").distinct().count() == n_ids
        for col in ("id", "ts", "received_at", "url", "utm_source", "cookies", "orig_data"):
            assert col in store.columns
        # archive: raw fidelity + hive dt-partitioning
        arch = spark.read.parquet(str(tmp_path / "archive"))
        assert arch.count() == 200
        assert "dt" in arch.columns and arch.where(F.col("dt").isNull()).count() == 0
        assert any(d.startswith("dt=") for d in os.listdir(tmp_path / "archive"))
        assert arch.select("data").distinct().count() == n_ids
        # stats: reference /stats families
        assert stats["message-ingested"]["count"] == 200
        assert stats["archive-uploads"]["count"] == stats["batches"] >= 1
        assert stats["batch-timing-s"]["p50"] > 0
        # HTTP endpoint serves the same snapshot
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats", timeout=10) as r:
            http_stats = json.load(r)
        assert http_stats["message-ingested"]["count"] == 200
    finally:
        c.stop()


def test_collector_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Replaying the same landed records through a FRESH checkpoint (so the
    stream reprocesses them) must not change the store — the reference's
    duplicate-id tolerance (db.clj:123-130)."""
    landing = str(tmp_path / "landing")
    n_ids = _land_records(spark, sf_dir, landing, n=100)
    store = str(tmp_path / "store")

    for attempt in range(2):
        c = Collector(
            spark,
            landing,
            store_path=store,
            archive_path=str(tmp_path / f"archive{attempt}"),
            checkpoint=str(tmp_path / f"ck{attempt}"),
            mode="ignore",  # reference first-writer-wins
        )
        c.run(timeout_s=300)
        c.stop()

    final = spark.read.parquet(store)
    assert final.count() == n_ids
    assert final.select("id").distinct().count() == n_ids
