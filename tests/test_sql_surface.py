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


def test_txntable_sql_view_pushdown_prunes_through_pure_sql(spark, tmp_path):
    """The lakehouse table addressed from pure SQL text, with file-level
    pruning proven BEHAVIORALLY: two single-file commits land disjoint
    value ranges, the high-range parquet is then corrupted on disk, and a
    SQL query whose predicate excludes that file still answers (the
    pruning scan never opens it) while the same SQL over a no-pushdown
    view fails on the corrupt bytes. Also pins that the CREATE ... USING
    txntable OPTIONS path accepts SQL-text-only access end to end."""
    import glob
    import os

    import pytest

    from kinesis3_spark.sources.txn_datasource import TxnTableDataSource

    spark.dataSource.register(TxnTableDataSource)
    path = str(tmp_path / "t")
    lo = spark.createDataFrame(
        [(f"a{i}", i) for i in range(20)], "id string, val int"
    )
    hi = spark.createDataFrame(
        [(f"b{i}", 1000 + i) for i in range(20)], "id string, val int"
    )
    (lo.coalesce(1).write.format("txntable").option("key", "id")
       .option("stats_cols", "val").mode("append").save(path))
    (hi.coalesce(1).write.format("txntable").mode("append").save(path))

    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW t_push "
        f"USING txntable OPTIONS (path '{path}', pushdown 'true')"
    )
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW t_plain "
        f"USING txntable OPTIONS (path '{path}')"
    )
    sql = "SELECT count(*) AS n, sum(val) AS s FROM {v} WHERE val < 100"
    # sanity before corruption: both views agree
    assert spark.sql(sql.format(v="t_push")).collect() == \
        spark.sql(sql.format(v="t_plain")).collect()

    # corrupt every hi-range file (the ones the predicate's zone map
    # excludes; the bucketed writer splits each commit into ~8 files)
    hi_files = [
        p for p in glob.glob(f"{path}/**/*.parquet", recursive=True)
        if os.path.getsize(p) > 0 and _file_min_val(p) >= 1000
    ]
    assert hi_files
    for hf in hi_files:
        with open(hf, "wb") as fh:
            fh.write(b"corrupt")

    [row] = spark.sql(sql.format(v="t_push")).collect()
    assert (row.n, row.s) == (20, sum(range(20)))
    with pytest.raises(Exception):
        spark.sql(sql.format(v="t_plain")).collect()


def _file_min_val(p):
    import pyarrow.parquet as pq

    try:
        t = pq.read_table(p, columns=["val"])
        return min(t.column("val").to_pylist() or [1 << 30])
    except Exception:
        return 1 << 30
