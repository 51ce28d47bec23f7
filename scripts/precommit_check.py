"""Fast catalog-consistency gate (installed as .git/hooks/pre-commit).

Rounds 6 and 7 both shipped a red pytest for the same reason: a final
commit registered a new catalog query without bumping the count pin in
tests/test_cli.py (VERDICT r07 ask #1). This check makes that drift a
failed commit instead of a failed round. It is import-only (no Spark
JVM, no JDBC) so it runs in a couple of seconds:

1. live catalog size == the ``len(qs) == N`` pin in tests/test_cli.py;
2. CATALOG.md data-row count == live catalog size (and its names match);
3. every query has an oracle entry or is a documented rows-only check;
4. the emission-triage invariant (tiers non-decreasing) holds.

Escape hatch for genuinely unrelated emergency commits:
``PRECOMMIT_SKIP=1 git commit ...``.
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def fail(msg: str) -> None:
    print(f"precommit_check: FAIL — {msg}", file=sys.stderr)
    print(
        "precommit_check: fix the catalog/pin/CATALOG.md together "
        "(scripts/gen_catalog.py regenerates the doc), or bypass with "
        "PRECOMMIT_SKIP=1 for an unrelated emergency commit.",
        file=sys.stderr,
    )
    sys.exit(1)


def main() -> None:
    if os.environ.get("PRECOMMIT_SKIP") == "1":
        print("precommit_check: skipped via PRECOMMIT_SKIP=1")
        return

    from etl_ml_pipeline_spark.queries import (
        _LAST_RECORDED,
        all_oracles,
        all_queries,
    )

    qs, oracles = all_queries(), all_oracles()

    # 1. pins in tests/test_cli.py (queries and oracles separately —
    # they differ by the documented rows-only set)
    test_src = (REPO / "tests" / "test_cli.py").read_text()
    for var, want in (("qs", len(qs)), ("oracles", len(oracles))):
        pins = re.findall(rf"len\({var}\) == (\d+)", test_src)
        if not pins:
            fail(f"no len({var}) pin found in tests/test_cli.py")
        for p in pins:
            if int(p) != want:
                fail(
                    f"live {var} count is {want} but tests/test_cli.py "
                    f"pins {p} — bump the pin in the same commit"
                )

    # 2. CATALOG.md rows
    cat_names = re.findall(
        r"^\|\s*\d+\s*\|\s*`([^`]+)`", (REPO / "CATALOG.md").read_text(), re.M
    )
    if len(cat_names) != len(qs) or set(cat_names) != set(qs):
        missing = sorted(set(qs) - set(cat_names))
        extra = sorted(set(cat_names) - set(qs))
        fail(
            f"CATALOG.md documents {len(cat_names)} queries, catalog has "
            f"{len(qs)} (missing={missing}, stale={extra}) — rerun "
            "scripts/gen_catalog.py"
        )

    # 3. oracle coverage: rows-only queries are allowed ONLY when
    # documented in queries.ROWS_ONLY (non-SQL-expressible outputs with
    # an oracle-checked contract twin)
    from etl_ml_pipeline_spark.queries import ROWS_ONLY

    rows_only = set(qs) - set(oracles)
    if rows_only != set(ROWS_ONLY):
        fail(
            f"rows-only queries {sorted(rows_only)} != documented "
            f"ROWS_ONLY {sorted(ROWS_ONLY)}"
        )

    # 4. triage order sanity
    tiers = [_LAST_RECORDED.get(k, 0) for k in qs]
    if tiers != sorted(tiers):
        fail("emission triage order violated (tiers not non-decreasing)")

    # 5. sf1-differential coverage (VERDICT r08 ask #2): every catalog
    # query must have a row in scripts/sf1_diff.json. A new query
    # closes its gap incrementally with
    #   python scripts/sf1_diff.py --only NAME
    # in the same commit that registers it.
    import json

    sf1 = json.loads((REPO / "scripts" / "sf1_diff.json").read_text())
    sf1_names = set(sf1["results"])
    uncovered = sorted(set(qs) - sf1_names)
    if uncovered:
        fail(
            f"sf1_diff.json is missing {uncovered} — run "
            f"'python scripts/sf1_diff.py --only {','.join(uncovered)}' "
            "and commit the updated json alongside the catalog change"
        )
    # A present-but-red row is as bad as a missing one (an sf1 run
    # against a stale/absent .sf1 dir records ok=False in ~0.1s per
    # name — regenerate with scripts/make_sf1.py and re-run --only).
    sf1_red = sorted(n for n in qs if not sf1["results"][n].get("ok"))
    if sf1_red:
        fail(
            f"sf1_diff.json has ok=false for {sf1_red} — regenerate .sf1 "
            "(scripts/make_sf1.py) if absent, then "
            f"'python scripts/sf1_diff.py --only {','.join(sf1_red)}'"
        )

    # 6. staleness contract (VERDICT r09 ask #4): simulate the next
    # driver record — the first PREFIX names in emission order get a
    # fresh row — then fail if any already-recorded name would end up
    # >MAX_STALE rounds stale. The current round is inferred from the
    # newest CORRECTNESS_r*.json on disk (the next record is round+1).
    PREFIX, MAX_STALE = 50, 5
    recorded_rounds = [
        int(m.group(1))
        for p in REPO.glob("CORRECTNESS_r*.json")
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json", p.name))
    ]
    if recorded_rounds:
        next_round = max(recorded_rounds) + 1
        simulated = dict(_LAST_RECORDED)
        for name in list(qs)[:PREFIX]:
            simulated[name] = next_round
        overdue = sorted(
            (name, simulated[name])
            for name in qs
            if simulated.get(name, 0) >= 1
            and next_round - simulated[name] > MAX_STALE
        )
        if overdue:
            fail(
                f"staleness contract broken: after the simulated round-"
                f"{next_round} record ({PREFIX}-name prefix), these names "
                f"exceed {MAX_STALE} rounds stale: {overdue} — refresh "
                "_LAST_RECORDED from the latest CORRECTNESS json and/or "
                "reorder the prefix"
            )

    # 7. README catalog-count pin (VERDICT r13 ask #3): README.md's
    # "N named queries" line must match the live catalog so the first
    # doc a reader opens can never drift again (it said 237 at 239).
    readme = (REPO / "README.md").read_text()
    readme_pins = re.findall(r"(\d+) named queries", readme)
    if not readme_pins:
        fail("README.md no longer contains the 'N named queries' line")
    for p in readme_pins:
        if int(p) != len(qs):
            fail(
                f"README.md says {p} named queries but the live catalog "
                f"has {len(qs)} — true up README.md in the same commit"
            )

    print(
        f"precommit_check: OK — catalog {len(qs)} queries, pin + "
        "CATALOG.md + oracles + staleness + README consistent"
    )


if __name__ == "__main__":
    main()
