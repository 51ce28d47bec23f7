"""Dump .explain('formatted') for a set of queries into plans/r15/.

Usage: python scripts/r15_dump_plans.py before|after [name ...]
Default name set: the bench HEADLINE list.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from etl_ml_pipeline_spark.session import get_spark  # noqa: E402
from etl_ml_pipeline_spark.queries import all_queries  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after"), "first arg must be before|after"
    names = sys.argv[2:]
    if not names:
        import bench

        names = bench.HEADLINE
    out_dir = REPO / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(
        app_name="r15_plans", master="local[8]", shuffle_partitions=32
    )
    queries = all_queries()
    for name in names:
        try:
            df = queries[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR: {type(e).__name__}: {e}"
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(name, "->", f"plans/r15/{name}_{suffix}.txt", len(plan), "chars")


if __name__ == "__main__":
    main()
