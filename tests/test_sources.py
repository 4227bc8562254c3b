"""Source-format tests (SURVEY.md §2b rows 2-3): JSON-lines and CSV scans
round-trip against DuckDB's readers on the same files."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from kinesis3_spark.sources import read_csv, read_jsonl


ROWS = [
    {"id": 1, "name": "alpha", "score": 1.5},
    {"id": 2, "name": "beta", "score": -2.0},
    {"id": 3, "name": "gamma, delta", "score": 0.0},  # embedded comma
]


def test_jsonl_scan_matches_duckdb(spark, tmp_path):
    import json

    p = tmp_path / "d.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in ROWS))
    got = {
        r.id: (r.name, r.score)
        for r in read_jsonl(spark, str(p), schema="id long, name string, score double").collect()
    }
    exp = {
        r[0]: (r[1], r[2])
        for r in duckdb.sql(f"SELECT id, name, score FROM read_json_auto('{p}')").fetchall()
    }
    assert got == exp


def test_csv_scan_matches_duckdb(spark, tmp_path):
    import csv

    p = tmp_path / "d.csv"
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["id", "name", "score"])
        w.writeheader()
        w.writerows(ROWS)
    got = {
        r.id: (r.name, r.score)
        for r in read_csv(spark, str(p), schema="id long, name string, score double").collect()
    }
    exp = {
        r[0]: (r[1], r[2])
        for r in duckdb.sql(f"SELECT id, name, score FROM read_csv_auto('{p}')").fetchall()
    }
    assert got == exp


def test_kinesis_adapter_degrades_gracefully(spark):
    # The connector jar is absent here; the adapter must fail with the
    # actionable message, not a raw py4j stack.
    import pytest

    from kinesis3_spark.streaming.sources import kinesis_stream

    with pytest.raises(NotImplementedError, match="spark-sql-kinesis-connector"):
        kinesis_stream(spark, "events-stream")


def test_avro_roundtrip_or_declared_gate(spark, sf_dir):
    """Avro is env-gated (spark-avro is an external module since Spark
    2.4): when the jar is present the round-trip must match the parquet
    original; when absent the helper must fail with the actionable
    deployment message (the Kinesis-adapter contract) and the query must
    NOT be registered — the driver never sees an err row."""
    import pytest

    from kinesis3_spark.queries import QUERIES
    from kinesis3_spark.queries import roundtrip as rt
    from kinesis3_spark.sources import load_table

    if rt._avro_available():
        assert "source_avro_roundtrip" in QUERIES
        got = {
            r["p_brand"]: (r["n_parts"], r["sum_price"])
            for r in rt.source_avro_roundtrip(spark, sf_dir).collect()
        }
        exp = {
            r["p_brand"]: (r["n"], float(r["s"]))
            for r in load_table(spark, sf_dir, "part")
            .groupBy("p_brand")
            .agg(
                F.count("*").alias("n"),
                (
                    F.sum(F.round(F.col("p_retailprice") * 100).cast("bigint"))
                    .cast("double")
                    / 100
                ).alias("s"),
            )
            .collect()
        }
        assert got == exp
    else:
        assert "source_avro_roundtrip" not in QUERIES
        with pytest.raises(NotImplementedError, match="spark-avro"):
            rt.source_avro_roundtrip(spark, sf_dir)


def test_orc_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    """ORC source/sink: the corpus orders table written as ORC and read
    back must agree with the Parquet original — same scan surface
    (pushdown/pruning) through a second columnar format."""
    orig = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dest = str(tmp_path / "orders_orc")
    orig.write.orc(dest)
    back = (
        spark.read.orc(dest)
        .where(F.col("o_orderstatus") == "O")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("t"))
    )
    want = (
        orig.where(F.col("o_orderstatus") == "O")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("t"))
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, want.collect()))


def test_rewrite_cache_isolates_table_and_sfdir(spark, sf_dir):
    """The round-trip rewrite cache must key on (fmt, sf_dir, TABLE): the
    round-6 review found a (fmt, sf_dir) key that would hand a second
    table the first table's rewrite path. Pin distinct paths per table
    and per sf_dir, and that each path round-trips its own row count."""
    from kinesis3_spark.queries import roundtrip as rt
    from kinesis3_spark.sources import load_table

    p_orders = rt._rewrite(spark, sf_dir, "orders", "jsonl")
    p_cust = rt._rewrite(spark, sf_dir, "customer", "jsonl")
    assert p_orders != p_cust
    n_orders = load_table(spark, sf_dir, "orders").count()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert spark.read.json(p_orders).count() == n_orders
    assert spark.read.json(p_cust).count() == n_cust
    # cache hit: same path back
    assert rt._rewrite(spark, sf_dir, "orders", "jsonl") == p_orders


def test_corrupt_tolerance_planted_classes(spark):
    """Pins PERMISSIVE/DROPMALFORMED semantics per planted failure class
    on a 3-row orders table: corrupt bucket counts EXACTLY the four
    malformed lines with a zero key signature (the type-mismatch line's
    partially-parsed fields must not leak a key), the empty object "{}"
    survives as a good all-NULL row, and DROPMALFORMED keeps it too."""
    import os
    import tempfile

    import pandas as pd

    from kinesis3_spark.queries.roundtrip import (
        _CORRUPT_LINES,
        source_jsonl_corrupt_tolerance,
    )

    d = tempfile.mkdtemp(prefix="k3s_corrupt_planted_")
    pd.DataFrame(
        [
            (1, 10, "O", 100.0, pd.Timestamp("2024-01-01"), "1-URGENT"),
            (2, 20, "F", 200.0, pd.Timestamp("2024-01-02"), "2-HIGH"),
            (3, 30, "O", 300.0, pd.Timestamp("2024-01-03"), "3-MEDIUM"),
        ],
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    ).to_parquet(os.path.join(d, "orders.parquet"))

    rows = {
        r.bucket: (r.n, r.key_sig)
        for r in source_jsonl_corrupt_tolerance(spark, d).collect()
    }
    from kinesis3_spark.operators.dedup import portable_hash60
    from pyspark.sql import functions as F

    sig = (
        spark.range(1, 4)
        .select(
            F.sum(portable_hash60(F.col("id").cast("string")) % 1_000_000_000)
        )
        .collect()[0][0]
    )
    assert rows == {
        "corrupt": (len(_CORRUPT_LINES), 0),
        "dropmalformed": (4, sig),  # 3 real rows + the {} all-NULL row
        "good": (4, sig),
    }


def test_schema_evolution_null_backfill(spark, sf_dir):
    """mergeSchema must NULL-backfill the pre-evolution epoch: every
    epoch-1 (even event_id) row reads user_id IS NULL, every epoch-2 row
    reads it non-NULL, and the merged schema contains the union of
    columns plus the epoch partition column."""
    from kinesis3_spark.queries.roundtrip import _schema_evolution_dir

    merged = spark.read.option("mergeSchema", "true").parquet(
        _schema_evolution_dir(spark, sf_dir)
    )
    assert {"event_id", "ts", "event_type", "value", "user_id", "epoch"} <= set(
        merged.columns
    )
    bad = merged.where(
        ((F.col("event_id") % 2 == 0) & F.col("user_id").isNotNull())
        | ((F.col("event_id") % 2 == 1) & F.col("user_id").isNull())
    ).count()
    assert bad == 0


def test_xml_roundtrip_escapes_entities(spark, tmp_path):
    """Spark 4's built-in XML source must round-trip text needing entity
    escaping — '&', '<', '>', quotes — byte-exactly (the failure mode that
    silently corrupts names in feed exports)."""
    rows = [
        (1, "A&B Suppliers", 10.5),
        (2, "x < y > z", -3.25),
        (3, 'quote " and \' here', 0.0),
    ]
    df = spark.createDataFrame(rows, "id long, name string, bal double")
    p = str(tmp_path / "x")
    df.write.format("xml").option("rootTag", "rows").option("rowTag", "row").save(p)
    back = (
        spark.read.schema(df.schema)
        .format("xml")
        .option("rowTag", "row")
        .load(p)
    )
    assert {tuple(r) for r in back.collect()} == set(rows)
