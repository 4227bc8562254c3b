"""Parity pins for the r10 profiling/planning queries on inputs the
corpus doesn't exercise: negative values must bin identically in Spark
(floor) and the DuckDB oracle (explicit floor, not the truncating //),
and the mixture arithmetic must stay integer-exact at large budgets."""

from __future__ import annotations

import duckdb
import pytest

pytestmark = pytest.mark.slow


def test_histogram_bins_negative_values_identically(spark):
    """floor-division binning on negatives: Spark F.floor(cents/500) and
    the oracle's floor(cents/500.0) must agree bin-for-bin (DuckDB's
    `//` truncates toward zero and would put -200 in bin 0, silently
    double-widening it — review r10-2nd #2)."""
    from pyspark.sql import functions as F

    from kinesis3_spark.queries.dataquality import _HIST_BIN_CENTS

    vals = [-12.34, -5.00, -0.01, 0.0, 0.01, 2.50, 4.99, 5.00, 7.77]
    sdf = spark.createDataFrame(
        [(v,) for v in vals], "value double"
    ).select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents")
    ).select(
        "cents",
        F.floor(F.col("cents") / _HIST_BIN_CENTS).cast("bigint").alias("bin"),
    )
    got = {(r.cents, r.bin) for r in sdf.collect()}
    want = {
        (int(c), int(b))
        for c, b in duckdb.sql(
            f"""
            SELECT CAST(floor(v * 100 + 0.5) AS BIGINT) AS cents,
                   CAST(floor(floor(v * 100 + 0.5) / {_HIST_BIN_CENTS}.0)
                        AS BIGINT) AS bin
            FROM (SELECT unnest({vals!r}) AS v)
            """
        ).fetchall()
    }
    assert got == want
    assert (-1234, -3) in got and (-500, -1) in got  # true floor, not trunc


def test_mixture_budget_integer_exact_at_scale():
    """The ppm-share x budget arithmetic stays exact where double
    division would round (products past 2^53 — review r10-2nd #3):
    Spark's `div`, DuckDB's `//`, and Python int division must agree at
    a 15-trillion-token (LLaMA-scale) budget."""
    big_budget = 15_000_000_000_000
    share = 100_000
    n_tokens = 1_434_567_891
    py_drawn = share * big_budget // 1_000_000
    py_epochs = py_drawn * 1_000_000 // n_tokens
    duck = duckdb.sql(
        f"SELECT CAST({share} AS BIGINT) * {big_budget} // 1000000 AS d,"
        f" (CAST({share} AS BIGINT) * {big_budget} // 1000000)"
        f" * 1000000 // {n_tokens} AS e"
    ).fetchone()
    assert (py_drawn, py_epochs) == (int(duck[0]), int(duck[1]))
    # the product the double-division formulation would push through an
    # IEEE double exceeds 2^53 — the reason the Spark side uses `div`
    assert py_drawn * 1_000_000 > 2**53


def test_mixture_budget_spark_div_matches_python(spark):
    from pyspark.sql import functions as F

    big_budget = 15_000_000_000_000
    rows = [("s", 100_000, 1_434_567_891)]
    df = spark.createDataFrame(
        rows, "source string, share_ppm bigint, n_tokens bigint"
    ).withColumn(
        "tokens_drawn",
        F.expr(f"share_ppm * CAST({big_budget} AS BIGINT) div 1000000"),
    ).withColumn(
        "epochs_ppm",
        F.expr("tokens_drawn * CAST(1000000 AS BIGINT) div n_tokens"),
    )
    r = df.collect()[0]
    assert r.tokens_drawn == 100_000 * big_budget // 1_000_000
    assert r.epochs_ppm == r.tokens_drawn * 1_000_000 // 1_434_567_891
