"""State-store introspection (Spark 4 `statestore` data source): the
ops/debugging surface for stateful streams — read a checkpoint's live
aggregation state offline and reconcile it against the batch answer.
At 100 TB this is how you audit a misbehaving streaming job's state
without replaying the stream."""

from __future__ import annotations

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
