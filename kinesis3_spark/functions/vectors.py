"""Vector math over array<float|double> embedding columns.

Two tiers (SURVEY.md §2b "similarity search"):
  * Column-expression HOFs (`zip_with` + `aggregate`) — JVM-side, correct
    at any scale, used as the oracle-parity path.
  * An Arrow-batched pandas UDF (`cosine_topk` in operators/similarity.py)
    — the throughput path when the expression tier profiles slow.

All arithmetic is forced to DOUBLE before accumulation so the fold matches
DuckDB's double-precision aggregation of unnested FLOAT lists.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col) -> Column:
    c = col if isinstance(col, Column) else F.col(col)
    return c.cast("array<double>")


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a) -> Column:
    return F.sqrt(F.aggregate(_d(a), F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
