"""Full-catalog empirical scale sweep: time every query once at sf0.1
and once at synthetic sf1 (10x) in one warm session, and flag any name
whose ratio exceeds the data growth (>10x ~= super-linear = a hidden
data-scaled stage). One pass per (query, sf) after a warm pass at
sf0.001 — noisy per name, but order-of-magnitude flags are what we
want (the q11/q15 class of mistake shows up as 30-100x, not 12x).

Usage: python scripts/r16_scale_sweep.py [--out scripts/r16_scale_sweep.json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_ml_pipeline_spark.session import get_spark  # noqa: E402
from etl_ml_pipeline_spark.queries import all_queries  # noqa: E402

OUT = Path(sys.argv[sys.argv.index("--out") + 1]) if "--out" in sys.argv else (
    Path(__file__).resolve().parent / "r16_scale_sweep.json"
)


def main() -> None:
    spark = get_spark(
        app_name="r16_scale_sweep", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    res: dict[str, dict] = {}
    for i, name in enumerate(sorted(qs)):
        row: dict = {}
        try:
            spark.sparkContext.setJobDescription(f"sweep:{name}:warm")
            qs[name](spark, "/root/testdata/sf0.001").toPandas()
            for label, sf_dir in (
                ("sf0.1", "/root/testdata/sf0.1"),
                ("sf1", "/root/repo/.sf1"),
            ):
                spark.sparkContext.setJobDescription(f"sweep:{name}:{label}")
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).toPandas()
                row[label] = round(time.perf_counter() - t0, 3)
            row["ratio"] = round(row["sf1"] / row["sf0.1"], 2) if row["sf0.1"] else None
        except Exception as e:  # noqa: BLE001
            row["err"] = str(e)[:200]
        res[name] = row
        print(f"[{i + 1}/{len(qs)}] {name}: {row}", flush=True)
    flagged = {
        n: r for n, r in res.items()
        if r.get("ratio") and r["ratio"] > 10 and r["sf1"] > 1.0
    }
    OUT.write_text(json.dumps(
        {"results": res, "flagged_superlinear": flagged}, indent=1))
    print("FLAGGED (>10x and sf1 > 1s):", json.dumps(flagged, indent=1))


if __name__ == "__main__":
    main()
