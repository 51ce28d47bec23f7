"""Dump formatted before/after plans for queries the r16 round touches.

"Before" = the query module as of the r15 closing HEAD (0b752f3), loaded
from git; "after" = the working tree. Writes plans/r16/<name>_before.txt
and _after.txt.

Usage: python scripts/r16_dump_plans.py NAME=module_relpath [...]
e.g. python scripts/r16_dump_plans.py q11_important_value=queries/tpch_extra.py
"""

from __future__ import annotations

import importlib.util
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_ml_pipeline_spark.session import get_spark  # noqa: E402

REV = "0b752f3"
SF = "/root/testdata/sf0.1"
OUT = Path(__file__).resolve().parents[1] / "plans" / "r16"


def load_old(module_rel: str):
    src = subprocess.run(
        ["git", "show", f"{REV}:etl_ml_pipeline_spark/{module_rel}"],
        capture_output=True, text=True, check=True,
        cwd=str(Path(__file__).resolve().parents[1]),
    ).stdout
    p = Path(f"/tmp/r16_plan_old_{Path(module_rel).stem}.py")
    p.write_text(src)
    spec = importlib.util.spec_from_file_location(
        f"r16_plan_old_{Path(module_rel).stem}", p
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_spark(
        app_name="r16_dump_plans", master="local[8]", shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "16g"},
    )
    old_mods: dict[str, object] = {}
    for arg in sys.argv[1:]:
        name, module_rel = arg.split("=")
        import importlib

        new_mod = importlib.import_module(
            "etl_ml_pipeline_spark."
            + module_rel.replace("/", ".").removesuffix(".py")
        )
        if module_rel not in old_mods:
            old_mods[module_rel] = load_old(module_rel)
        for label, mod in (("before", old_mods[module_rel]), ("after", new_mod)):
            path = OUT / f"{name}_{label}.txt"
            df = getattr(mod, name)(spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path.write_text(plan)
            print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
