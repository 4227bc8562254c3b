"""Small-file compaction: rewrite a Parquet directory into ~target-size
files.

The operational problem this solves is the streaming archive's long tail:
a `processingTime` trigger writing every few seconds (core.clj:113-120
cadence) leaves thousands of KB-scale files per partition, and at 100 TB
scan-planning over millions of tiny files dominates query time. Compaction
is the standard maintenance pass: size the output file count from the
actual input bytes (`ceil(bytes / target)`), rewrite via a shuffle-free
`coalesce` when shrinking, and atomically swap directories so readers never
see a half-written state.

`coalesce` (not `repartition`) on the shrink path: it merges input splits
without a shuffle — the rewrite cost is one read + one write, no exchange.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite `path` (a Parquet directory) into ceil(bytes/target) files.

    Returns the number of output files. Local-filesystem directory swap; on
    an object store the same flow is write-to-staging + prefix rename.
    """
    n_files = max(1, math.ceil(_dir_bytes(path) / target_file_bytes))
    staging = f"{path}.__compact_{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).coalesce(n_files).write.mode("overwrite").parquet(staging)
    backup = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    try:
        os.rename(staging, path)
    except OSError:
        # the gap between the two renames is the swap's exposed window
        # (review note r6): if the second rename fails, ROLL BACK so
        # readers find the original directory, not a missing path.
        os.rename(backup, path)
        shutil.rmtree(staging, ignore_errors=True)
        raise
    shutil.rmtree(backup, ignore_errors=True)  # best-effort; orphan is inert
    return n_files
