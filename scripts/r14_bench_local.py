"""End-of-round local bench: N fresh bench.py sessions (each its own
JVM), collecting per-session value / value_22q / cold / cpu_probe_sec
into BENCH_LOCAL_r14.json with the probe-normalized series the r12
verdict asked for (VERDICT r12 #6; value_22q_per_probe now also emitted by bench.py itself per VERDICT r13 #8).

Usage: python scripts/r14_bench_local.py [n_sessions]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # MERGE with any earlier batch this round instead of clobbering it —
    # the session list is the round's evidence base. `value` totals are
    # only comparable within a batch when the headline set changed
    # mid-round (batch 2 added 2 queries); value_22q is always
    # comparable, which is why it exists.
    sessions = []
    prior = REPO / "BENCH_LOCAL_r14.json"
    if prior.exists():
        sessions = json.loads(prior.read_text()).get("sessions", [])
    best = None
    for i in range(n):
        import os

        env = dict(os.environ)
        env.update(
            SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1", SPARK_GRAFT_CPUS="32"
        )
        proc = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            capture_output=True,
            text=True,
            env=env,
        )
        if proc.returncode != 0:
            sys.exit(f"bench.py failed:\n{proc.stderr[-2000:]}")
        out = proc.stdout
        rec = json.loads(out.strip().splitlines()[-1])
        sess = {
            "value": rec["value"],
            "value_22q": rec["value_22q"],
            "cold_value": rec["cold_value"],
            "cpu_probe_sec": rec["cpu_probe_sec"],
            "value_22q_per_probe": round(
                rec["value_22q"] / rec["cpu_probe_sec"], 3
            ),
        }
        sessions.append(sess)
        print(f"session {i}: {sess}", file=sys.stderr)
        if best is None or rec["value"] < best["value"]:
            best = rec
    doc = {
        "metric": "headline_query_wall_time",
        "unit": "sec",
        "sf": 0.1,
        "sessions": sessions,
        "value": best["value"],
        "value_22q": best["value_22q"],
        "cpu_probe_sec": best["cpu_probe_sec"],
        "queries": best["queries"],
        "spread": best["spread"],
        "normalization_note": (
            "value_22q_per_probe divides the comparable-22 total by the "
            "session's single-thread CPU probe (bench.py cpu_probe_sec, "
            "standardized 2e7-loop measured before Spark init) so "
            "round-over-round comparisons cancel this host's day-scale "
            "drift. The standardized probe ships from round 13; r10-r12 "
            "probes were ad-hoc prose records (r10 noisy-window study "
            "band 2.00-3.02s, r12 2.11-2.69s on a DIFFERENT loop body) "
            "and are not unit-comparable with this series."
        ),
    }
    (REPO / "BENCH_LOCAL_r14.json").write_text(json.dumps(doc, indent=1))
    print("wrote BENCH_LOCAL_r14.json")


if __name__ == "__main__":
    main()
