"""Capture .explain("formatted") for headline queries into plans/r15/ (round via $SPARK_GRAFT_PLANS_ROUND).

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: "before" or "after" (file name becomes <query>_<suffix>.txt)
  query:  names; default = every headline query in bench.py.

Plans are built at $SPARK_GRAFT_SF_DIR (default sf0.1) without executing
the job (explain only), so this is cheap and does not disturb timings.

Exceptions (ADVICE r14): a few queries run bounded jobs at CONSTRUCTION
time because the algorithm itself consumes O(1) driver-side decisions —
search_bm25_prf collects (n_docs, avgdl) and the ≤8 expansion terms, the
ANN queries collect the bounded query set to build probe LUTs, and the
streaming drains execute their availableNow drain eagerly. For those,
"capture" does execute corpus jobs; the captured plan is still the final
served query's plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import HEADLINE
    from kinesis3_spark.queries import QUERIES
    from kinesis3_spark.session import get_spark

    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [n for n in HEADLINE if n in QUERIES]

    spark = get_spark("kinesis3-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as ex:
            plan = f"ERROR building plan: {ex}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "->", f"{name}_{suffix}.txt")


if __name__ == "__main__":
    main()
