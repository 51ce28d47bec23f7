"""Closing interleaved full-headline bench pairs: r15 closing tree
(0b752f3, git worktree) vs the current tree, alternating order within
one window so the comparison is attributable despite host drift.

Usage: python scripts/r16_close_bench.py [n_pairs]
Writes scripts/r16_close_bench.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REV = "0b752f3"
OLD = Path("/tmp/r16_old_tree")
SF = "/root/testdata/sf0.1"


def ensure_worktree() -> None:
    if not OLD.exists():
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(OLD), REV],
            cwd=REPO, check=True,
        )


def run_bench(tree: Path) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF, SPARK_GRAFT_CPUS="32")
    proc = subprocess.run(
        [sys.executable, str(tree / "bench.py")],
        env=env, capture_output=True, text=True, cwd=str(tree),
    )
    out: dict = {"rc": proc.returncode}
    for ln in proc.stdout.strip().splitlines():
        if not ln.startswith("{"):
            continue
        try:
            d = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if d.get("metric") == "headline_query_wall_time":
            out["queries"] = d.get("queries", {})
        if d.get("metric") in ("headline_query_wall_time", "headline_summary"):
            out["value"] = d.get("value")
            out["value_22q"] = d.get("value_22q")
            out["cpu_probe_sec"] = d.get("cpu_probe_sec")
    return out


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    ensure_worktree()
    pairs = []
    for i in range(n_pairs):
        order = ["old", "new"] if i % 2 == 0 else ["new", "old"]
        pair = {"order": order}
        for side in order:
            tree = OLD if side == "old" else REPO
            pair[side] = run_bench(tree)
            print(
                f"pair {i + 1} {side}: value={pair[side].get('value')} "
                f"v22={pair[side].get('value_22q')} "
                f"probe={pair[side].get('cpu_probe_sec')}",
                flush=True,
            )
        pairs.append(pair)
    (REPO / "scripts" / "r16_close_bench.json").write_text(
        json.dumps({"rev_old": REV, "sf": SF, "pairs": pairs}, indent=1)
    )


if __name__ == "__main__":
    main()
