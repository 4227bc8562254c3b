"""Multi-writer optimistic concurrency on the manifest txn table: the
versioned-manifest exclusive create is the commit arbiter, losers re-merge
from the winner's snapshot and retry. Two threads race real interleaved
commits here; the converged table must equal the order-independent LWW
merge of every batch, with one epoch per successful commit and no file
referenced twice."""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from kinesis3_spark.sinks.txn import (
    CommitConflict,
    read_manifest,
    read_snapshot,
    upsert_manifest_txn,
    vacuum_table,
)


def _batch(spark, writer, rnd, n=20):
    # keys deliberately OVERLAP across writers; (ts, writer) is a total
    # order so the LWW outcome is independent of commit interleaving
    rows = [
        (f"k{i:03d}", f"2024-01-0{rnd + 1} 0{writer}:00:00", float(rnd * 100 + writer * 10 + i))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id string, ts string, val double")
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_two_writers_interleaved_upserts_converge(spark, tmp_path):
    path = str(tmp_path / "t")
    rounds = 3
    errors: list[Exception] = []

    def writer(w: int):
        try:
            for rnd in range(rounds):
                upsert_manifest_txn(
                    spark,
                    _batch(spark, w, rnd),
                    path,
                    key="id",
                    order_col="ts",
                    max_retries=10,
                )
        except Exception as exc:  # surface into the main thread
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    man = read_manifest(path)
    assert man["epoch"] == 2 * rounds  # every commit landed exactly once
    # no file double-referenced, every referenced file exists
    paths = [e["path"] for e in man["files"]]
    assert len(paths) == len(set(paths))
    # converged state = LWW by ts across ALL batches (order-independent):
    # writer 2's final-round rows win every contested key
    snap = {r["id"]: r["val"] for r in read_snapshot(spark, path).collect()}
    expect = {
        f"k{i:03d}": float((rounds - 1) * 100 + 2 * 10 + i) for i in range(20)
    }
    assert snap == expect
    # losing attempts' directories are unreferenced garbage vacuum reaps;
    # afterwards the table still reads identically
    vacuum_table(path, keep_epochs=1)
    snap2 = {r["id"]: r["val"] for r in read_snapshot(spark, path).collect()}
    assert snap2 == expect


def test_conflict_raises_after_max_retries(spark, tmp_path, monkeypatch):
    """If every attempt loses the race, the writer surfaces
    CommitConflict instead of spinning forever."""
    from kinesis3_spark.sinks import txn

    path = str(tmp_path / "t")
    upsert_manifest_txn(
        spark, _batch(spark, 1, 0), path, key="id", order_col="ts"
    )

    real_open = txn.os.open

    def always_taken(p, flags, *a):
        if txn.os.O_EXCL & flags and "_MANIFEST.v" in str(p):
            raise FileExistsError(p)
        return real_open(p, flags, *a)

    monkeypatch.setattr(txn.os, "open", always_taken)
    try:
        import pytest

        with pytest.raises(CommitConflict):
            upsert_manifest_txn(
                spark, _batch(spark, 2, 1), path, key="id",
                order_col="ts", max_retries=2,
            )
    finally:
        monkeypatch.undo()


def test_two_writers_interleaved_merges_converge(spark, tmp_path):
    """Racing merge_into commits: each loser re-runs its WHOLE merge from
    the winner's snapshot, so increments compose additively no matter the
    interleaving — lost-update is exactly the bug OCC must prevent."""
    from kinesis3_spark.sinks.txn import append_snapshot, merge_into

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, 0) for i in range(10)], "id bigint, total bigint"
    )
    append_snapshot(base, path, key="id", n_buckets=2)
    rounds, errors = 3, []

    def writer(amount: int):
        try:
            src = spark.createDataFrame(
                [(i, amount) for i in range(10)], "id bigint, amt bigint"
            )
            for _ in range(rounds):
                merge_into(
                    spark, path, src, key="id",
                    matched=[{"update": {"total": "total + src_amt"}}],
                    max_retries=12,
                )
        except Exception as exc:
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(a,)) for a in (1, 100)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    man = read_manifest(path)
    assert man["epoch"] == 1 + 2 * rounds  # every merge exactly one epoch
    snap = {r["id"]: r["total"] for r in read_snapshot(spark, path).collect()}
    # additive composition: 3 rounds of +1 and 3 of +100 per key, no
    # increment lost to a stale-snapshot overwrite
    assert snap == {i: 303 for i in range(10)}
