"""Record the synthetic-sf1 bench at a given core count, keeping BOTH
compact tail lines (per-query medians + summary) so the c8/c32 pair
separates parallel from driver-bound queries per query (VERDICT r15 #5).

Usage: SPARK_GRAFT_CPUS=32 python scripts/r16_bench_sf1.py OUT.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SF1 = REPO / ".sf1"


def main() -> None:
    out_path = Path(sys.argv[1])
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=str(SF1), SPARK_GRAFT_CPUS=cpus)
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True,
    )
    lines = proc.stdout.strip().splitlines()
    parsed = {}
    for ln in lines[-2:]:
        try:
            d = json.loads(ln)
            d["sf"] = 1.0  # .sf1 basename parses as "1"; make it explicit
            parsed[d.get("metric", "?")] = d
        except (json.JSONDecodeError, ValueError):
            pass
    record = {
        "n": 4,  # bench.py: 1 untimed warm pass + 3 timed (median reported)
        "rc": proc.returncode,
        "cpus": int(cpus),
        "sf": 1.0,
        "per_query": parsed.get("headline_per_query", {}).get("queries", {}),
        "summary": parsed.get("headline_summary"),
    }
    out_path.write_text(json.dumps(record, indent=1))
    print(json.dumps({"rc": proc.returncode, "cpus": cpus,
                      "value": (parsed.get("headline_summary") or {}).get("value")}))


if __name__ == "__main__":
    main()
