"""Executed-plan audit: per-query shuffle/broadcast/scan volumes.

Walks the AQE-final physical plan AFTER execution and sums the SQL metrics
that matter for the 100 TB story: rows leaving each scan, bytes/rows
through every shuffle exchange, and broadcast relation sizes. These are
the numbers the shuffle-budget table in SCALE.md cites.

Usage:
    python tools/plan_audit.py [query ...]        # default: bench headline
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/plan_audit.py
"""

from __future__ import annotations

import os
import sys


def _walk(node, out):
    name = node.getClass().getSimpleName()
    it = node.metrics().iterator()
    mets = {}
    while it.hasNext():
        kv = it.next()
        mets[kv._1()] = kv._2().value()
    out.append((name, mets))
    if name == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), out)
    else:
        cit = node.children().iterator()
        while cit.hasNext():
            _walk(cit.next(), out)
        if name.endswith("QueryStageExec"):
            _walk(node.plan(), out)
    return out


def audit_query(spark, fn, sf_dir: str) -> dict:
    """Execute fn(spark, sf_dir) via collect() (same QueryExecution the
    metrics hang off — count() would plan a separate execution) and
    aggregate its plan metrics."""
    df = fn(spark, sf_dir)
    rows_out = len(df.collect())
    nodes = _walk(df._jdf.queryExecution().executedPlan(), [])
    return {
        "rows_out": rows_out,
        "scan_rows": sum(
            m.get("numOutputRows", 0) for n, m in nodes if n == "FileSourceScanExec"
        ),
        "shuffles": sum(1 for n, _ in nodes if n == "ShuffleExchangeExec"),
        "shuffle_mb": sum(
            m.get("shuffleBytesWritten", 0) for n, m in nodes if n == "ShuffleExchangeExec"
        )
        / 1e6,
        "shuffle_rows": sum(
            m.get("shuffleRecordsWritten", 0)
            for n, m in nodes
            if n == "ShuffleExchangeExec"
        ),
        "broadcasts": sum(1 for n, _ in nodes if n == "BroadcastExchangeExec"),
        "broadcast_mb": sum(
            m.get("dataSize", 0) for n, m in nodes if n == "BroadcastExchangeExec"
        )
        / 1e6,
    }


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from kinesis3_spark.queries import QUERIES
    from kinesis3_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n in QUERIES]
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        "| query | rows out | scan rows | shuffles | shuffle MB | shuffle rows | broadcasts | bcast MB |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for n in names:
        a = audit_query(spark, QUERIES[n], sf_dir)
        print(
            f"| {n} | {a['rows_out']} | {a['scan_rows']} | {a['shuffles']} "
            f"| {a['shuffle_mb']:.2f} | {a['shuffle_rows']} | {a['broadcasts']} "
            f"| {a['broadcast_mb']:.2f} |"
        )


if __name__ == "__main__":
    main()
