"""Generic interleaved A/B for r16 query rewrites.

Loads the OLD version of one queries/ module from git and the NEW
working-tree version side by side, then times each named query old/new
alternately in one session (this host drifts day-scale, so only
interleaved same-session comparisons are attributable to code).
Asserts old and new results are row-for-row identical on the first
(warm) pass before timing.

Usage:
  python scripts/r16_ab_generic.py MODULE REV OUT.json NAME [NAME...]
e.g.
  python scripts/r16_ab_generic.py queries/sampling_q.py c4dd8f8 \
      scripts/r15_ab5.json sample_perplexity_buckets
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

SF_DIR = __import__("os").environ.get("R16_AB_SF_DIR", "/root/testdata/sf0.1")
PASSES = 5


def load_old(module_rel: str, rev: str):
    src = subprocess.run(
        ["git", "show", f"{rev}:etl_ml_pipeline_spark/{module_rel}"],
        capture_output=True,
        text=True,
        check=True,
        cwd=str(Path(__file__).resolve().parents[1]),
    ).stdout
    p = Path(f"/tmp/r16_old_{Path(module_rel).stem}.py")
    p.write_text(src)
    spec = importlib.util.spec_from_file_location(
        f"r16_old_{Path(module_rel).stem}", p
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    module_rel, rev, out = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]

    mod_name = "etl_ml_pipeline_spark." + module_rel.replace("/", ".").removesuffix(
        ".py"
    )
    new_mod = importlib.import_module(mod_name)
    old_mod = load_old(module_rel, rev)

    spark = get_spark(
        app_name="r16_ab_generic",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()

    results: dict[str, dict] = {}
    for name in names:
        fns = {"old": getattr(old_mod, name), "new": getattr(new_mod, name)}
        pdfs = {}
        for label, fn in fns.items():
            spark.sparkContext.setJobDescription(f"ab:{name}:{label}:warm")
            pdfs[label] = fn(spark, SF_DIR).toPandas()
        if not pdfs["old"].equals(pdfs["new"]):
            print(f"{name}: RESULT MISMATCH old vs new", file=sys.stderr)
            sys.exit(1)
        times: dict[str, list[float]] = {"old": [], "new": []}
        for i in range(PASSES):
            for label in ("old", "new") if i % 2 == 0 else ("new", "old"):
                spark.sparkContext.setJobDescription(f"ab:{name}:{label}:{i}")
                t0 = time.perf_counter()
                fns[label](spark, SF_DIR).toPandas()
                times[label].append(time.perf_counter() - t0)
        med = {k: round(statistics.median(v), 3) for k, v in times.items()}
        results[name] = {
            "old": times["old"],
            "new": times["new"],
            "median_old": med["old"],
            "median_new": med["new"],
            "ratio": round(med["new"] / med["old"], 3) if med["old"] else None,
            "rows_equal": True,
        }
        print(name, results[name]["median_old"], "->", results[name]["median_new"])

    Path(out).write_text(
        json.dumps(
            {"rev": rev, "module": module_rel, "sf_dir": SF_DIR, "results": results},
            indent=2,
            sort_keys=True,
        )
    )


if __name__ == "__main__":
    main()
