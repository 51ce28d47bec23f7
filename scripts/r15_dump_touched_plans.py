"""Dump formatted before/after plans for the queries the r15
optimization round touched.

"Before" = the query module as of the pre-optimization build HEAD
(7635b47), loaded from git; "after" = the working tree. Non-headline
queries get both files; headline queries already have a _before from
scripts/r15_dump_plans.py, so only _after is written (unless missing).

Usage: python scripts/r15_dump_touched_plans.py
"""

from __future__ import annotations

import importlib.util
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_ml_pipeline_spark.session import get_spark  # noqa: E402

REV = "7635b47"
SF = "/root/testdata/sf0.1"
OUT = Path(__file__).resolve().parents[1] / "plans" / "r15"

# name -> module relpath
TOUCHED = {
    "sample_exact_allocation": "etl_ml_pipeline_spark/queries/sampling_q.py",
    "sample_epoch_allocation": "etl_ml_pipeline_spark/queries/sampling_q.py",
    "mixture_doremi_weights": "etl_ml_pipeline_spark/queries/sampling_q.py",
    "sample_temperature_lang": "etl_ml_pipeline_spark/queries/sampling_q.py",
    "sample_token_budget_mixture": "etl_ml_pipeline_spark/queries/sampling_q.py",
    "sample_perplexity_buckets": "etl_ml_pipeline_spark/queries/sampling_q.py",
    "shuffle_epoch_documents": "etl_ml_pipeline_spark/queries/sampling_q.py",
    "hist_equidepth_prices": "etl_ml_pipeline_spark/queries/relational.py",
    "feature_winsorize_events": "etl_ml_pipeline_spark/queries/analytics_q.py",
    "anomaly_mad_events": "etl_ml_pipeline_spark/queries/analytics_q.py",
    "sketch_cms_frequency": "etl_ml_pipeline_spark/queries/text_q.py",
    "split_leakage_safe_documents": "etl_ml_pipeline_spark/queries/sampling_q.py",
    "concurrency_peak_events": "etl_ml_pipeline_spark/queries/timeseries.py",
    "text_novelty_trigram": "etl_ml_pipeline_spark/queries/text_q.py",
    "hybrid_search_rrf": "etl_ml_pipeline_spark/queries/text_q.py",
    "corpus_stats_battery": "etl_ml_pipeline_spark/queries/text_q.py",
    "corpus_clean_funnel": "etl_ml_pipeline_spark/queries/text_q.py",
    "seasonality_weekday_events": "etl_ml_pipeline_spark/queries/analytics_q.py",
    "q11_important_value": "etl_ml_pipeline_spark/queries/tpch_extra.py",
    "q15_top_supplier": "etl_ml_pipeline_spark/queries/tpch_extra.py",
    "agg_approx_percentile_prices": "etl_ml_pipeline_spark/queries/relational.py",
    "training_data_prep_e2e": "etl_ml_pipeline_spark/queries/pipeline_q.py",
    "kmeans_lloyd_embeddings": "etl_ml_pipeline_spark/queries/ml_q.py",
}


def _load_rev_module(relpath: str):
    src = subprocess.run(
        ["git", "show", f"{REV}:{relpath}"],
        capture_output=True, text=True, check=True,
        cwd=str(Path(__file__).resolve().parents[1]),
    ).stdout
    key = relpath.replace("/", "_")
    p = Path(f"/tmp/r15_plandump_{key}")
    p.write_text(src)
    spec = importlib.util.spec_from_file_location(f"r15_old_{key[:-3]}", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    spark = get_spark(
        app_name="r15_dump_touched",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import importlib

    old_mods: dict[str, object] = {}
    for name, rel in TOUCHED.items():
        modname = rel.rsplit("/", 1)[-1][:-3]
        new_mod = importlib.import_module(
            f"etl_ml_pipeline_spark.queries.{modname}"
        )
        after = OUT / f"{name}_after.txt"
        after.write_text(_formatted(getattr(new_mod, name)(spark, SF)))
        before = OUT / f"{name}_before.txt"
        if not before.exists():
            if rel not in old_mods:
                old_mods[rel] = _load_rev_module(rel)
            before.write_text(
                _formatted(getattr(old_mods[rel], name)(spark, SF))
            )
        print(name, "done", flush=True)


if __name__ == "__main__":
    main()
