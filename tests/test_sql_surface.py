"""spark.sql(...) over the registered corpus views — the engine's SQL-string
entry point (register_temp_views) must agree with DuckDB running the very
same ANSI SQL text."""

from __future__ import annotations

from kinesis3_spark.sources import register_temp_views

from .conftest import assert_parity

# Runs verbatim on BOTH engines.
PORTABLE_SQL = [
    """
    SELECT o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderstatus
    """,
    """
    SELECT r.r_name, count(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    """
    SELECT c_mktsegment, count(*) AS n
    FROM customer
    WHERE c_acctbal BETWEEN 0 AND 5000 AND c_name LIKE '%0%'
    GROUP BY c_mktsegment
    """,
]


def test_sql_string_surface(spark, duck, sf_dir):
    register_temp_views(spark, sf_dir)
    for sql in PORTABLE_SQL:
        assert_parity(spark.sql(sql), duck, sql)
