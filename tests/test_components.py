"""Connected components: known graph shapes resolve to the right clusters
and the propagation converges (chain forces multiple rounds)."""

from __future__ import annotations

from kinesis3_spark.operators.components import connected_components


def _clusters(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df).collect()
    return {r["doc_id"]: r["cluster_id"] for r in rows}


def test_chain_triangle_pair(spark):
    # chain 1-2-3-4-5 (diameter 4 — needs >1 round), triangle 10-11-12,
    # isolated pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    got = _clusters(spark, edges)
    assert {k: v for k, v in got.items() if k <= 5} == {i: 1 for i in range(1, 6)}
    assert {k: v for k, v in got.items() if 10 <= k <= 12} == {i: 10 for i in (10, 11, 12)}
    assert got[20] == got[21] == 20
    assert len(got) == 10


def test_transitivity_not_just_pairs(spark):
    # A~B and B~C but never A~C: all three must share one cluster
    got = _clusters(spark, [(100, 200), (200, 300)])
    assert got == {100: 100, 200: 100, 300: 100}
