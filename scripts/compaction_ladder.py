"""MinHash-index compaction maintenance cost on the scale ladder.

VERDICT r09 ask #7: compaction is correctness-proven (the driver's
replay oracle runs WITH compact_every=2 and verdicts hash-match the
compaction-free chain), but its COST curve was not a recorded number.
This script runs the 3-batch ingest loop (the same harness as the
catalog's stream_dedup_index_replay) at each ladder rung with
compact_every=2 vs compaction off, asserts the verdict sets agree
(row count + dup count), and records wall times + overhead ratio to
scripts/compaction_ladder.json.

Usage: python scripts/compaction_ladder.py [--rungs sf0.1,sf1]
(.sf1/.sf10 must exist — scripts/make_sf1.py builds them.)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from etl_ml_pipeline_spark.session import get_spark  # noqa: E402

RUNGS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": str(REPO / ".sf1"),
    "sf10": str(REPO / ".sf10"),
}


def main() -> None:
    rungs = list(RUNGS)
    if "--rungs" in sys.argv:
        i = sys.argv.index("--rungs")
        rungs = [r.strip() for r in sys.argv[i + 1].split(",")]
    from pyspark.sql import functions as F

    from etl_ml_pipeline_spark.queries.timeseries import _dedup_index_run

    spark = get_spark(
        app_name="compaction_ladder", master="local[32]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")

    report: dict[str, dict] = {}
    for rung in rungs:
        sf_dir = RUNGS[rung]
        if not Path(sf_dir).exists():
            print(f"skip {rung}: {sf_dir} missing", flush=True)
            continue
        row: dict = {}
        stats: dict[str, tuple[int, int]] = {}
        for label, every in (("compact_off", None), ("compact_on", 2)):
            # warm pass unmeasured (scan caches, JIT), then best-of-2
            _dedup_index_run(spark, sf_dir, every).count()
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                out = _dedup_index_run(spark, sf_dir, every)
                agg = out.agg(
                    F.count("*").alias("n"),
                    F.count("dup_of").alias("dups"),
                ).collect()[0]
                times.append(time.perf_counter() - t0)
            row[label] = round(min(times), 3)
            stats[label] = (agg["n"], agg["dups"])
        assert stats["compact_on"] == stats["compact_off"], (
            f"{rung}: verdicts diverged under compaction: {stats}"
        )
        # the verdicts view emits only FLAGGED duplicates (dup_of is
        # always non-null), so rows == non-null dup_of by construction;
        # both counts participate in the identity assertion above
        row["verdicts"] = stats["compact_on"][0]
        row["overhead_x"] = round(row["compact_on"] / row["compact_off"], 3)
        report[rung] = row
        print(rung, row, flush=True)

    out_path = REPO / "scripts" / "compaction_ladder.json"
    prior = (
        json.loads(out_path.read_text()).get("rungs", {})
        if out_path.exists()
        else {}
    )
    prior.update(report)
    out_path.write_text(
        json.dumps(
            {
                "rungs": prior,
                "note": "3-batch MinHash-index ingest loop, compact_every=2 "
                "vs off, best-of-2 after a warm pass on local[32]; "
                "verdict sets asserted identical (the view emits only "
                "flagged duplicates, so dups==verdicts by construction)",
            },
            indent=1,
        )
    )
    print("wrote", out_path)


if __name__ == "__main__":
    main()
