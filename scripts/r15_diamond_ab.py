"""Interleaved A/B for the r15 diamond->window rewrites.

Loads the OLD queries/sampling_q.py (pre-rewrite, from git) and the NEW
working-tree version side by side, then times each query old/new
alternately in one session (this host drifts day-scale, so only
interleaved same-session comparisons are attributable to code).

Usage: python scripts/r15_diamond_ab.py [git_rev] [out.json]
"""

from __future__ import annotations

import importlib.util
import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_ml_pipeline_spark.session import get_spark  # noqa: E402

REV = sys.argv[1] if len(sys.argv) > 1 else "74bcdae"
OUT = sys.argv[2] if len(sys.argv) > 2 else "scripts/r15_diamond_ab.json"
SF_DIR = "/root/testdata/sf0.1"
NAMES = [
    "sample_exact_allocation",
    "sample_epoch_allocation",
    "mixture_doremi_weights",
    "sample_token_budget_mixture",
    "sample_temperature_lang",
]
PASSES = 5


def load_old(rev: str):
    src = subprocess.run(
        ["git", "show", f"{rev}:etl_ml_pipeline_spark/queries/sampling_q.py"],
        capture_output=True,
        text=True,
        check=True,
        cwd=str(Path(__file__).resolve().parents[1]),
    ).stdout
    p = Path("/tmp/r15_old_sampling_q.py")
    p.write_text(src)
    spec = importlib.util.spec_from_file_location("r15_old_sampling_q", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    import etl_ml_pipeline_spark.queries.sampling_q as new_mod

    old_mod = load_old(REV)
    spark = get_spark(
        app_name="r15_diamond_ab",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()

    results: dict[str, dict] = {}
    for name in NAMES:
        fns = {"old": getattr(old_mod, name), "new": getattr(new_mod, name)}
        # warm both shapes once (codegen/JIT absorption)
        for label, fn in fns.items():
            spark.sparkContext.setJobDescription(f"ab:{name}:{label}:warm")
            fn(spark, SF_DIR).toPandas()
        times: dict[str, list[float]] = {"old": [], "new": []}
        for i in range(PASSES):
            for label in ("old", "new") if i % 2 == 0 else ("new", "old"):
                spark.sparkContext.setJobDescription(f"ab:{name}:{label}:{i}")
                t0 = time.perf_counter()
                fns[label](spark, SF_DIR).toPandas()
                times[label].append(time.perf_counter() - t0)
        med = {k: round(statistics.median(v), 3) for k, v in times.items()}
        results[name] = {
            "old_median": med["old"],
            "new_median": med["new"],
            "ratio": round(med["new"] / med["old"], 3),
            "old_all": [round(x, 3) for x in times["old"]],
            "new_all": [round(x, 3) for x in times["new"]],
        }
        print(f"{name}: old={med['old']} new={med['new']} "
              f"ratio={results[name]['ratio']}", flush=True)
    Path(OUT).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
