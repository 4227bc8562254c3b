"""Watermark semantics (SURVEY.md §2b "watermark + late data"): an event
arriving after the watermark has passed its window must be dropped from an
append-mode windowed aggregation. The file source processes files in
modification-time order, pinned with os.utime for determinism."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F


def _write(path: str, rows: list[tuple[str, float]], mtime: int) -> None:
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows, columns=["ts_s", "value"])), path
    )
    os.utime(path, (mtime, mtime))


def test_late_row_dropped(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: two events in the 10:00 window + a frontier event at 11:00.
    # The watermark advances at batch COMMIT, so it reaches
    # 11:00 - 5 min = 10:55 one batch later — hence the 3-file layout.
    _write(
        str(src / "f0.parquet"),
        [("2024-01-01 10:00:30", 1.0), ("2024-01-01 10:03:00", 2.0),
         ("2024-01-01 11:00:00", 9.0)],
        mtime=1_000_000,
    )
    # batch 2: frontier only; runs under watermark 10:55 → finalizes the
    # 10:00 window (append emission) and pushes the watermark to 10:57
    _write(
        str(src / "f1.parquet"),
        [("2024-01-01 11:02:00", 1.0)],
        mtime=2_000_000,
    )
    # batch 3: a LATE event for the finalized 10:00 window → must be dropped
    _write(
        str(src / "f2.parquet"),
        [("2024-01-01 10:01:00", 100.0)],
        mtime=3_000_000,
    )

    sdf = (
        spark.readStream.schema("ts_s string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.to_timestamp("ts_s"))
    )
    agg = (
        sdf.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.sum("value").alias("total"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win"), "total")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_result")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_wm_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.win: r.total for r in spark.table("wm_result").collect()}
    # the late 100.0 must NOT appear: the 10:00 window finalized at 3.0
    assert rows.get("2024-01-01 10:00:00") == 3.0
    # and the engine reports exactly one watermark-dropped row
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped == 1
