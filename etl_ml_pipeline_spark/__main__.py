"""CLI entry point: ``python -m etl_ml_pipeline_spark -c pipeline.yaml``.

Capability parity with /root/reference/src/data_extractor/__main__.py:29-64:

- ``-c/--config PATH`` — run the pipeline described by the YAML file.
- ``-f/--full-refresh`` — ignore the stored incremental cursor, start
  from ``initial_value``, and still save the new cursor afterwards
  (reference engine.py:67-75).
- ``-l/--list-modules`` — print registered sources/transforms/sinks and
  exit without creating a Spark session (reference __main__.py:16-27).

The reference loads ``.env`` via python-dotenv before imports
(__main__.py:8-10); dotenv is not installed here, so a minimal
KEY=VALUE parser provides the same capability.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path


def load_dotenv(path: str = ".env") -> None:
    """Minimal .env loader (reference uses python-dotenv, __main__.py:8-10)."""
    p = Path(path)
    if not p.is_file():
        return
    for line in p.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, value = line.partition("=")
        os.environ.setdefault(key.strip(), value.strip().strip("'\""))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="etl_ml_pipeline_spark",
        description="Config-driven PySpark ETL pipeline engine",
    )
    parser.add_argument("-c", "--config", help="pipeline YAML config file")
    parser.add_argument(
        "-f", "--full-refresh", action="store_true",
        help="ignore stored incremental cursor; start from initial_value",
    )
    parser.add_argument(
        "-l", "--list-modules", action="store_true",
        help="list registered sources/transforms/sinks and exit",
    )
    parser.add_argument(
        "--state-path", default=".pipeline_state.json",
        help="incremental cursor state file",
    )
    args = parser.parse_args(argv)

    if args.list_modules:
        from etl_ml_pipeline_spark.registry import list_registered

        for kind, keys in list_registered().items():
            print(f"{kind}:")
            for key in keys:
                print(f"  - {key}")
        return 0

    if not args.config:
        parser.error("one of -c/--config or -l/--list-modules is required")

    load_dotenv()
    from etl_ml_pipeline_spark.engine import PipelineEngine

    engine = PipelineEngine(args.config, state_path=args.state_path)
    engine.run(full_refresh=args.full_refresh)
    return 0


if __name__ == "__main__":
    sys.exit(main())
