"""State-store introspection (Spark 4 `statestore` data source): the
ops/debugging surface for stateful streams — read a checkpoint's live
aggregation state offline and reconcile it against the batch answer.
At 100 TB this is how you audit a misbehaving streaming job's state
without replaying the stream."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # excluded by the -m 'not slow' quick path

import os
import tempfile

from pyspark.sql import functions as F


def test_statestore_reader_matches_batch_aggregate(spark):
    src = tempfile.mkdtemp(prefix="k3s_ss_src_")
    ck = tempfile.mkdtemp(prefix="k3s_ss_ck_")
    df = spark.range(100).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    df.toPandas().to_parquet(os.path.join(src, "f1.parquet"))

    schema = spark.read.parquet(os.path.join(src, "f1.parquet")).schema
    sdf = (
        spark.readStream.schema(schema)
        .parquet(src)
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("ss_reader_probe")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    st = spark.read.format("statestore").load(ck)
    # key/value are structs; the value field carries the agg expression
    val_field = st.select("value.*").columns[0]
    got = {
        r["k"]: r["state_sum"]
        for r in st.select(
            F.col("key.k").alias("k"), F.col(f"value.{val_field}").alias("state_sum")
        ).collect()
    }
    want = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert got == want
    # partition_id metadata present — state is per shuffle partition
    assert "partition_id" in st.columns


def test_rocksdb_provider_parity_and_format(spark):
    """RocksDB state-store tier (VERDICT r6 #2): the same planted totals as
    the default-provider statestore test must come back from a RocksDB
    checkpoint, and the checkpoint must REALLY be RocksDB-format — SST/zip
    snapshot layout, not the HDFS provider's .delta files (a silently
    ignored providerClass conf would otherwise pass the value check)."""
    import glob

    import pandas as pd

    from kinesis3_spark.queries.roundtrip import (
        _rocksdb_checkpoint,
        stream_rocksdb_state_parity,
    )

    d = tempfile.mkdtemp(prefix="k3s_rocks_src_")
    base = "2024-03-01 "
    pd.DataFrame(
        [
            (0, pd.Timestamp(base + "09:00:00"), 1, "view", 1.5, "{}"),
            (1, pd.Timestamp(base + "09:01:00"), 1, "view", 2.25, "{}"),
            (2, pd.Timestamp(base + "09:02:00"), 2, "click", -0.5, "{}"),
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(os.path.join(d, "events.parquet"))

    got = {
        r.event_type: (r.n, r.value_micro_sum)
        for r in stream_rocksdb_state_parity(spark, d).collect()
    }
    assert got == {"view": (2, 3_750_000), "click": (1, -500_000)}

    ck = _rocksdb_checkpoint(spark, d)
    zips = glob.glob(os.path.join(ck, "state", "0", "*", "*.zip"))
    deltas = glob.glob(os.path.join(ck, "state", "0", "*", "*.delta"))
    assert zips and not deltas, (zips, deltas)
    # the provider conf was restored after the drain
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        != "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )


def _under_rocksdb(spark, fn, changelog=False):
    """Run fn() with the RocksDB provider (optionally changelog
    checkpointing — incremental per-batch changelogs instead of full SST
    snapshot uploads, the production setting for frequent triggers) and
    restore every conf afterwards."""
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    changelog_key = (
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    )
    old_p = spark.conf.get(provider_key, None)
    old_c = spark.conf.get(changelog_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set(changelog_key, str(changelog).lower())
    try:
        return fn()
    finally:
        for key, old in ((provider_key, old_p), (changelog_key, old_c)):
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)


def test_rocksdb_drains_match_default_provider(spark, sf_dir):
    """The other stateful drain shapes (watermarked replay dedup and the
    chained interval-join -> window pipeline) must produce IDENTICAL
    output under the RocksDB provider — including with changelog
    checkpointing enabled — as under the default HDFS-backed provider.
    This is the provider-swap guarantee a production migration rides on:
    state semantics live above the provider interface."""
    from kinesis3_spark.queries.streamq import (
        stream_chained_join_window_agg,
        stream_dedup_within,
    )

    for q in (stream_dedup_within, stream_chained_join_window_agg):
        want = sorted(map(tuple, q(spark, sf_dir).collect()))
        got_rocks = _under_rocksdb(
            spark, lambda: sorted(map(tuple, q(spark, sf_dir).collect()))
        )
        got_changelog = _under_rocksdb(
            spark,
            lambda: sorted(map(tuple, q(spark, sf_dir).collect())),
            changelog=True,
        )
        assert got_rocks == want, q.__name__
        assert got_changelog == want, q.__name__
