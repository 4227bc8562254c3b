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
