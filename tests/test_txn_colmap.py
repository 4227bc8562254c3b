"""Column mapping on the manifest txn table (sinks/txn.py): RENAME /
DROP COLUMN as metadata-only commits — files never rewritten, readers
translate physical -> logical, writers logical -> physical, history
presents each epoch under its own names."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kinesis3_spark.sinks import txn as T


def _files_on_disk(path):
    out = []
    for root, _d, fs in os.walk(path):
        for f in fs:
            if f.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(root, f), path))
    return sorted(out)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    batch = spark.range(0, 30).coalesce(1).select(
        F.col("id"),
        (F.col("id") * 2).alias("val"),
        (F.col("id") % 3).alias("grp"),
    )
    T.append_snapshot(batch, path, key="id", n_buckets=2, stats_cols=["val"])
    return path


def test_rename_is_metadata_only_and_presents_new_name(spark, table):
    before = _files_on_disk(table)
    ep = T.rename_column(table, "val", "amount")
    assert _files_on_disk(table) == before  # zero files rewritten
    got = T.read_snapshot(spark, table)
    assert set(got.columns) == {"id", "amount", "grp"}
    assert got.agg(F.sum("amount")).first()[0] == sum(2 * i for i in range(30))
    # time travel to the pre-rename epoch shows the old name
    old = T.read_snapshot(spark, table, epoch=ep - 1)
    assert "val" in old.columns and "amount" not in old.columns


def test_rename_then_write_lands_under_physical_name(spark, table):
    T.rename_column(table, "val", "amount")
    batch = spark.range(100, 110).coalesce(1).select(
        F.col("id"),
        (F.col("id") * 2).alias("amount"),
        (F.col("id") % 3).alias("grp"),
    )
    T.append_snapshot(batch, table, key="id")
    man = T.read_manifest(table)
    # physical schema unchanged: still 'val', no phantom 'amount' column
    phys = {f["name"] for f in man["schema"]["fields"]}
    assert phys == {"id", "val", "grp"}
    got = T.read_snapshot(spark, table)
    assert got.count() == 40
    assert got.where(F.col("id") == 105).select("amount").first()[0] == 210
    # stats skipping still keyed by the PHYSICAL name via logical probes
    pruned = T.read_snapshot(spark, table, where=[("amount", ">=", 200)])
    assert pruned.where(F.col("amount") >= 200).count() == 10


def test_upsert_after_rename_merges_on_logical_key(spark, table):
    T.rename_column(table, "val", "amount")
    batch = spark.createDataFrame([(5, 999, 0)], "id long, amount long, grp long")
    T.upsert_manifest_txn(spark, batch, table, key="id")
    got = T.read_snapshot(spark, table)
    assert got.where(F.col("id") == 5).select("amount").first()[0] == 999
    assert got.count() == 30  # merged, not appended


def test_drop_column_hides_data_and_blocks_name_reuse(spark, table):
    before = _files_on_disk(table)
    T.drop_column(table, "grp")
    assert _files_on_disk(table) == before
    got = T.read_snapshot(spark, table)
    assert set(got.columns) == {"id", "val"}
    # a batch re-introducing the dropped physical name must be refused
    bad = spark.createDataFrame([(99, 1, 7)], "id long, val long, grp long")
    with pytest.raises(ValueError, match="DROPPED"):
        T.append_snapshot(bad, table, key="id")
    # pre-drop epoch still shows it (time travel unaffected)
    old = T.read_snapshot(spark, table, epoch=1)
    assert "grp" in old.columns


def test_rename_of_dropped_or_missing_column_refused(spark, table):
    T.drop_column(table, "grp")
    with pytest.raises(ValueError):
        T.rename_column(table, "grp", "g2")
    with pytest.raises(ValueError):
        T.rename_column(table, "nope", "x")
    with pytest.raises(ValueError):
        T.rename_column(table, "val", "id")  # collision


def test_rename_refused_while_constraint_references_column(spark, table):
    T.add_constraint(table, "val_nonneg", "val >= 0")
    with pytest.raises(ValueError, match="constraint"):
        T.rename_column(table, "val", "amount")
    with pytest.raises(ValueError, match="constraint"):
        T.drop_column(table, "val")


def test_rename_chain_and_back_to_physical_name(spark, table):
    T.rename_column(table, "val", "amount")
    T.rename_column(table, "amount", "price")
    got = T.read_snapshot(spark, table)
    assert "price" in got.columns
    # renaming back to the original physical name collapses the mapping
    T.rename_column(table, "price", "val")
    assert T._mapping(T.read_manifest(table)) == {}


def test_restore_carries_mapping(spark, table):
    ep = T.rename_column(table, "val", "amount")
    T.rename_column(table, "amount", "price")
    T.restore_table(spark, table, ep)
    got = T.read_snapshot(spark, table)
    assert "amount" in got.columns and "price" not in got.columns


def test_datasource_refuses_mapped_tables(spark, table):
    T.rename_column(table, "val", "amount")
    from kinesis3_spark.sources.txn_datasource import _TxnBatchReader

    with pytest.raises(ValueError, match="column-mapped"):
        _TxnBatchReader({"path": table}, "{}")


def test_delete_where_uses_logical_names(spark, table):
    T.rename_column(table, "val", "amount")
    epoch, n = T.delete_where(spark, table, "amount >= 40")
    assert n == 10  # ids 20..29
    got = T.read_snapshot(spark, table)
    assert got.count() == 20
    assert got.agg(F.max("amount")).first()[0] == 38
