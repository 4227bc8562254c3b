"""Structured Streaming surface: sources, windowed aggregations, dedup,
archive/upsert sinks, and ingest metrics (reference src/kinesis3/core.clj —
the Kinesis consumer loop, S3 archive sink, and /stats metrics)."""

from .sources import stream_documents, stream_events, stream_jsonl  # noqa: F401
from .windows import (  # noqa: F401
    session_counts,
    sliding_value_stats,
    stream_stream_attribution,
    tumbling_counts,
)
from .dedup import dedup_stream  # noqa: F401
from .run import await_or_raise, run_to_memory, archive_stream, upsert_stream  # noqa: F401
from .stateful import running_user_totals  # noqa: F401
from .rollup import continuous_rollup, rollup_events  # noqa: F401
