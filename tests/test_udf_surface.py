"""UDF-surface parity (SURVEY.md §2b "UDF surface"): the row-at-a-time
Python UDF tier exists and matches a pure-Python reference implementation —
and matches the Column-expression tier used in the hot path (parse_cookies).
F.udf never appears in registered queries; this test is its contract."""

from __future__ import annotations

import urllib.parse

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis3_spark.functions.scalar import parse_cookies


def _py_parse_cookies(s):
    """Pure-Python reference of db.clj parse-cookies: split ';', trim,
    split first '=', URL-decode value, last key wins."""
    if s is None:
        return None
    out = {}
    for part in s.split(";"):
        part = part.strip()
        if not part:
            continue
        kv = part.split("=", 1)
        k = kv[0].strip()
        out[k] = urllib.parse.unquote(kv[1]) if len(kv) > 1 else None
    return out


COOKIES = [
    ("sid=s%2Fx; theme=dark; theme=light",),
    ("a=1;b=2 ; c=%20pad",),
    ("flagonly",),
    (None,),
]


def test_python_udf_matches_expression_tier(spark):
    udf = F.udf(_py_parse_cookies, T.MapType(T.StringType(), T.StringType()))
    df = spark.createDataFrame(COOKIES, "cookie string")
    rows = df.select(
        udf("cookie").alias("py"), parse_cookies("cookie").alias("expr")
    ).collect()
    for r in rows:
        assert r.py == r.expr


def test_arrow_grouped_agg_planted_with_null_key(spark):
    """Planted fixture for udf_arrow_grouped_agg pinning the pyarrow-native
    claims: a group whose batch contains a NULL o_orderkey stays int64 in
    pyarrow (pandas would coerce the column to float — the conversion the
    applyInArrow tier exists to skip), nulls are skipped by pc.min/pc.max,
    and per-group cents are exact."""
    import os
    import tempfile

    import pandas as pd

    from kinesis3_spark.queries.udfs import arrow_grouped_agg

    d = tempfile.mkdtemp(prefix="k3s_arrowgrp_")
    pdf = pd.DataFrame(
        {
            "o_orderkey": pd.array([1, 2, None, 7], dtype="Int64"),
            "o_custkey": pd.array([10, 20, 30, 70], dtype="Int64"),
            "o_orderstatus": ["O", "O", "O", "F"],
            "o_totalprice": [10.25, 20.50, 0.75, 99.99],
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 4),
            "o_orderpriority": ["1-URGENT", "1-URGENT", "1-URGENT", "2-HIGH"],
        }
    )
    pdf.to_parquet(os.path.join(d, "orders.parquet"))
    got = {r.o_orderpriority: r.asDict() for r in arrow_grouped_agg(spark, d).collect()}
    assert got["1-URGENT"] == {
        "o_orderpriority": "1-URGENT",
        "n": 3,
        "cents": 1025 + 2050 + 75,
        "min_key": 1,   # NULL skipped, stays integer (no float coercion)
        "max_key": 2,
    }
    assert got["2-HIGH"] == {
        "o_orderpriority": "2-HIGH",
        "n": 1,
        "cents": 9999,
        "min_key": 7,
        "max_key": 7,
    }
