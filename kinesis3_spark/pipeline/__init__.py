"""The event ingest pipeline: raw two-level JSON records → typed `events`
projection (reference src/kinesis3/db.clj:146-173 `insert-data`)."""

from .events import (  # noqa: F401
    RAW_SCHEMA,
    REQUEST_SCHEMA,
    ingest,
    parse_raw_records,
    project_events,
)
