"""Empirical probe: which DataSourceStreamReader methods run, in what
order, across a checkpoint restart? Logs to /tmp/probe_calls.txt."""
import os

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource, DataSourceStreamReader, InputPartition,
)
from pyspark.sql.types import StructType, StructField, LongType

LOG = "/tmp/probe_calls.txt"


def log(msg):
    with open(LOG, "a") as f:
        f.write(msg + "\n")


class _P(InputPartition):
    def __init__(self, a, b):
        self.a, self.b = a, b


class ProbeReader(DataSourceStreamReader):
    def __init__(self, options):
        log(f"init pid={os.getpid()}")
        self.n = int(open("/tmp/probe_n.txt").read())

    def initialOffset(self):
        log("initialOffset")
        return {"v": 0}

    def latestOffset(self):
        log(f"latestOffset -> {self.n}")
        return {"v": self.n}

    def partitions(self, start, end):
        log(f"partitions {start} {end}")
        return [_P(start["v"], end["v"])]

    def read(self, p):
        for i in range(p.a, p.b):
            yield (i,)

    def commit(self, end):
        log(f"commit {end}")


class ProbeSource(DataSource):
    @classmethod
    def name(cls):
        return "probe"

    def schema(self):
        return StructType([StructField("v", LongType())])

    def streamReader(self, schema):
        return ProbeReader(self.options)


def run(n, tag):
    with open("/tmp/probe_n.txt", "w") as f:
        f.write(str(n))
    log(f"=== run {tag} n={n}")
    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.dataSource.register(ProbeSource)
    q = (
        spark.readStream.format("probe").load()
        .writeStream.format("parquet")
        .option("path", "/tmp/probe_out")
        .option("checkpointLocation", "/tmp/probe_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    spark.stop()


if __name__ == "__main__":
    import shutil
    for p in ("/tmp/probe_out", "/tmp/probe_ckpt"):
        shutil.rmtree(p, ignore_errors=True)
    try:
        os.remove(LOG)
    except OSError:
        pass
    run(3, "first")
    run(6, "restart")
    print(open(LOG).read())


# Measured output on pyspark 4.1.2 (2026-08-15, this sandbox) — the
# call-order evidence the txntable stream reader's rate-limit cursor
# recovery rests on (sources/txn_datasource.py):
#
#   === run first n=3          (FRESH stream)
#   init pid=...
#   latestOffset -> 3          <- BEFORE initialOffset: a fresh stream's
#   initialOffset                 first call is latestOffset, so the
#   partitions {v:0} {v:3}        rate limit must cap from the
#                                 configured start, not wait for
#                                 initialOffset to pin a cursor
#   === run restart n=6        (CHECKPOINT RESTART)
#   init pid=...
#   partitions {v:3} {v:3}     <- the checkpointed range replays through
#   latestOffset -> 6             partitions() BEFORE the first
#   commit {v:3}                  latestOffset; commit() follows — both
#   partitions {v:3} {v:6}        recover the admission cursor, so the
#                                 first post-restart batch is bounded
