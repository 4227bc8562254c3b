"""Property test for market-basket pair counting: on random small basket
sets — item vocabulary tiny so duplicate items within a basket and
repeated pairs across baskets are COMMON — the basket-keyed self-join
must match a brute-force itertools.combinations evaluation of the
declared semantics (distinct items per basket, unordered pairs counted
once per basket). Duplicate line items are the adversarial case: a join
that skips the DISTINCT normalization overcounts them quadratically."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # excluded by the -m 'not slow' quick path

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

line = st.tuples(
    st.integers(min_value=1, max_value=6),      # basket id (collisions likely)
    st.sampled_from(list("ABCD")),              # item (dups within basket)
)


def _brute(rows):
    baskets: dict[int, set] = {}
    for okey, item in rows:
        baskets.setdefault(okey, set()).add(item)
    counts: dict[tuple, int] = {}
    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    return counts


def _spark_pairs(spark, rows):
    df = spark.createDataFrame(rows, "okey int, item string")
    items = df.distinct()
    a, b = items.alias("a"), items.alias("b")
    got = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("ia"), F.col("b.item").alias("ib")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return {(r["ia"], r["ib"]): r["n"] for r in got}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(line, min_size=1, max_size=40))
def test_pair_counts_match_bruteforce(spark, rows):
    assert _spark_pairs(spark, rows) == _brute(rows)
