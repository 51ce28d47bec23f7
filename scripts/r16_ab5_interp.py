"""Operator-level interleaved A/B: interpolated_percentiles serialized
cum window (old, from git) vs grouped two-phase prefix sum (new,
working tree). The query-level A/B harness can't see this change —
the old QUERY module imports the CURRENT operators package — so this
loads the old operators/relational.py module directly.

Writes scripts/r16_ab5_interp.json.
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

from pyspark.sql import functions as F  # noqa: E402

from etl_ml_pipeline_spark.operators import relational as new_rel  # noqa: E402
from etl_ml_pipeline_spark.queries.tables import t  # noqa: E402
from etl_ml_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
PASSES = 5
REV = "0b752f3"


def load_old():
    src = subprocess.run(
        ["git", "show", f"{REV}:etl_ml_pipeline_spark/operators/relational.py"],
        capture_output=True, text=True, check=True,
        cwd=str(Path(__file__).resolve().parents[1]),
    ).stdout
    p = Path("/tmp/r16_old_op_relational.py")
    p.write_text(src)
    spec = importlib.util.spec_from_file_location("r16_old_op_relational", p)
    mod = importlib.util.module_from_spec(spec)
    # the old module re-runs @register_transform decorators — stub the
    # registry out for the duration of the load (identity decorator)
    from etl_ml_pipeline_spark import registry

    real = registry.register_transform
    registry.register_transform = lambda key: (lambda cls: cls)
    try:
        spec.loader.exec_module(mod)
    finally:
        registry.register_transform = real
    return mod


def main() -> None:
    old_rel = load_old()
    spark = get_spark(
        app_name="r16_ab5_interp", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "48g"},
    )
    li = t(spark, SF_DIR, "lineitem").select("l_returnflag", "l_extendedprice")
    eps = 2.0 / 1000
    pcts = {"e50lo": 0.5 - eps, "e50hi": 0.5 + eps,
            "e95lo": 0.95 - eps, "e95hi": 0.95 + eps}

    def run(mod):
        return (
            mod.interpolated_percentiles(li, ["l_returnflag"], "l_extendedprice", pcts)
            .orderBy("l_returnflag")
            .toPandas()
        )

    fns = {"old": lambda: run(old_rel), "new": lambda: run(new_rel)}
    pdfs = {k: f() for k, f in fns.items()}
    assert pdfs["old"].equals(pdfs["new"]), "RESULT MISMATCH"
    times: dict[str, list[float]] = {"old": [], "new": []}
    for i in range(PASSES):
        for label in ("old", "new") if i % 2 == 0 else ("new", "old"):
            spark.sparkContext.setJobDescription(f"ab:interp:{label}:{i}")
            t0 = time.perf_counter()
            fns[label]()
            times[label].append(time.perf_counter() - t0)
    med = {k: round(statistics.median(v), 3) for k, v in times.items()}
    out = {"rev": REV, "sf_dir": SF_DIR, "times": times, "median": med,
           "ratio": round(med["new"] / med["old"], 3), "rows_equal": True}
    Path("scripts/r16_ab5_interp.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(med), "ratio", out["ratio"])


if __name__ == "__main__":
    main()
