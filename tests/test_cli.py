"""CLI tests (E8 parity; reference tests/test_cli.py coverage model)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from etl_ml_pipeline_spark.__main__ import load_dotenv, main


def test_list_modules(capsys):
    assert main(["-l"]) == 0
    out = capsys.readouterr().out
    assert "sources:" in out and "transforms:" in out and "sinks:" in out
    for key in ("rest_api", "parquet", "data_cleaning", "sql_database"):
        assert f"  - {key}" in out


def test_missing_config_errors():
    with pytest.raises(SystemExit):
        main([])


def test_dotenv_loader(tmp_path, monkeypatch):
    env = tmp_path / ".env"
    env.write_text("# comment\nMY_KEY=abc\nQUOTED='q v'\nNOEQUALS\n")
    monkeypatch.delenv("MY_KEY", raising=False)
    monkeypatch.chdir(tmp_path)
    load_dotenv()
    import os

    assert os.environ["MY_KEY"] == "abc"
    assert os.environ["QUOTED"] == "q v"


def test_cli_runs_pipeline(tmp_path, monkeypatch, spark, sf_dir):
    """-c end-to-end: parquet -> cleaning -> json sink; then -f full refresh."""
    out_dir = tmp_path / "out"
    cfg = {
        "version": 1,
        "pipeline": {
            "name": "cli_e2e",
            "extract": {"type": "parquet", "config": {"path": f"{sf_dir}/region.parquet"}},
            "transform": [
                {"type": "data_cleaning", "config": {"lowercase_columns": True}}
            ],
            "load": {"type": "json_local", "config": {"path": str(out_dir), "mode": "overwrite"}},
            "incremental": {"cursor_field": "r_regionkey", "initial_value": -1},
        },
    }
    cfg_path = tmp_path / "pipeline.yaml"
    import yaml

    cfg_path.write_text(yaml.safe_dump(cfg))
    state = tmp_path / "state.json"
    monkeypatch.chdir(tmp_path)

    assert main(["-c", str(cfg_path), "--state-path", str(state)]) == 0
    rows = [
        json.loads(line)
        for f in Path(out_dir).glob("*.json")
        for line in f.read_text().splitlines()
    ]
    assert len(rows) == 5
    # cursor committed after load (engine.py:126-128 parity)
    assert json.loads(state.read_text())["cli_e2e"] == 4

    # second incremental run: cursor=4 filters everything out
    assert main(["-c", str(cfg_path), "--state-path", str(state)]) == 0
    rows2 = [
        json.loads(line)
        for f in Path(out_dir).glob("*.json")
        for line in f.read_text().splitlines()
    ]
    assert rows2 == []

    # full refresh ignores the stored cursor
    assert main(["-c", str(cfg_path), "--state-path", str(state), "-f"]) == 0
    rows3 = [
        json.loads(line)
        for f in Path(out_dir).glob("*.json")
        for line in f.read_text().splitlines()
    ]
    assert len(rows3) == 5


def test_example_configs_parse_and_run(tmp_path, monkeypatch, spark):
    """Shipped example configs are valid and the runnable ones execute."""
    from pathlib import Path

    import yaml

    from etl_ml_pipeline_spark.config import PipelineConfig
    from etl_ml_pipeline_spark.engine import PipelineEngine

    repo = Path(__file__).resolve().parent.parent
    configs = sorted((repo / "configs").glob("*.yaml"))
    assert len(configs) >= 4
    for cfg_path in configs:
        PipelineConfig.model_validate(yaml.safe_load(cfg_path.read_text()))

    # Spark resolves relative sink paths against the JVM cwd, so point
    # the outputs at tmp_path explicitly via inline_config overrides.
    for name, out in (
        ("clean_customers", tmp_path / "out1"),
        ("dedup_documents", tmp_path / "out2"),
        ("training_data_prep_v2", tmp_path / "out3"),
        ("cluster_embeddings", tmp_path / "out4"),
        ("training_data_prep_v3", tmp_path / "out5"),
        ("boilerplate_then_dedup", tmp_path / "out6"),
        ("semantic_dedup", tmp_path / "out7"),
        ("token_budget_mixture", tmp_path / "out8"),
        ("perplexity_gated_corpus", tmp_path / "out9"),
        ("url_dedup_corpus", tmp_path / "out10"),
        ("decontaminated_corpus", tmp_path / "out11"),
        ("ffd_packed_corpus", tmp_path / "out12"),
        ("preference_pairs", tmp_path / "out13"),
        ("mixture_reweighted_corpus", tmp_path / "out14"),
    ):
        engine = PipelineEngine(
            str(repo / "configs" / f"{name}.yaml"),
            spark=spark,
            inline_config={"pipeline": {"load": {"config": {"path": str(out)}}}},
            state_path=str(tmp_path / "state.json"),
        )
        engine.run()
        assert out.exists()


def test_query_catalog_counts():
    """Guard against silently-shrunken catalogs: a broken query-module
    import now raises (no blanket ImportError guard), and this pins the
    expected size so an accidental drop is a loud diff, not a quietly
    greener correctness run."""
    from etl_ml_pipeline_spark.queries import all_oracles, all_queries

    qs, oracles = all_queries(), all_oracles()
    assert len(qs) == 253, sorted(qs)
    assert len(oracles) == 253, sorted(oracles)
    # every catalog entry is oracle-checkable except the documented
    # rows-only set (non-SQL-expressible outputs — e.g. raw theta-sketch
    # estimates — each paired with an oracle-checked contract twin)
    from etl_ml_pipeline_spark.queries import ROWS_ONLY

    assert set(qs) - set(oracles) == set(ROWS_ONLY)
    # CATALOG.md must document exactly the live catalog (VERDICT r07 #1:
    # two rounds shipped a doc/catalog drift from a late addition)
    import re
    from pathlib import Path

    doc = (Path(__file__).resolve().parents[1] / "CATALOG.md").read_text()
    doc_names = re.findall(r"^\|\s*\d+\s*\|\s*`([^`]+)`", doc, re.M)
    assert sorted(doc_names) == sorted(qs)


def test_query_emission_triage_order():
    """The driver records only a ~50-entry wall-clock prefix of queries()
    in emission order, so emission is triaged oldest-driver-record
    first. Round 15 is the saturated case: the oldest tier is the FULL
    50-name r10 cohort (the r14 prefix had no room for the refreshes
    ROADMAP budgeted), so the prefix must be exactly those 50 names and
    round-15 additions are pinned at tier 10.5 — behind the whole r10
    cohort, ahead of the 50 r11 names that come due at r16."""
    from etl_ml_pipeline_spark.queries import (
        _ADDED_R15,
        _LAST_RECORDED,
        all_queries,
    )

    keys = list(all_queries())
    tier = lambda k: _LAST_RECORDED.get(k, 0)
    tiers = [tier(k) for k in keys]
    assert tiers == sorted(tiers)
    # nothing may sort ahead of the r10 cohort: every catalog name has
    # an explicit tier >= 10 (a forgotten pin would default to 0 and
    # steal a prefix slot from a name at the staleness bound)
    assert min(tiers) == 10
    # the 50 r10-era names fill the 50-slot prefix exactly
    r10 = [k for k in keys if tier(k) == 10]
    assert len(r10) == 50
    assert keys[:50] == r10
    # round-15 additions ride at 10.5, directly behind the cohort, so
    # they lead the first free slot (r17, when the 49-name r12 tier
    # comes due) without displacing anything at the bound
    added = [k for k in keys if tier(k) == 10.5]
    assert sorted(added) == sorted(_ADDED_R15)
    assert keys[50 : 50 + len(added)] == added
    assert _LAST_RECORDED.get(keys[-1]) == 14
    # every triage name must still exist in the catalog (no stale entries)
    assert set(_LAST_RECORDED) <= set(keys)


def test_list_modules_surfaces_unavailable(monkeypatch):
    """Optional-module import failures must be visible in the registry
    dump, not silently absent. (In this container every optional module
    import-gates its dependency internally, so the real list is empty —
    simulate a failure to exercise the surfacing path.)"""
    from etl_ml_pipeline_spark import plugins
    from etl_ml_pipeline_spark.registry import list_registered

    assert list_registered()["unavailable"] == []
    monkeypatch.setattr(
        plugins,
        "_OPTIONAL_IMPORT_ERRORS",
        {"etl_ml_pipeline_spark.sources.playwright_scraper": "No module named 'playwright'"},
    )
    reg = list_registered()
    assert any("playwright" in entry for entry in reg["unavailable"])


def test_bench_tail_fits_2000_chars():
    """VERDICT r15 ask #2: the driver's bench record keeps only the
    LAST 2000 chars of stdout — the per-query medians line plus the
    summary line must BOTH fit inside that tail or PERF.per_query comes
    back empty. Simulate worst-case widths (999.999s medians for every
    live headline name) and assert the two compact lines json-parse
    from a 2000-char truncation."""
    import bench as bench_mod

    timings = {n: 999.999 for n in bench_mod.HEADLINE}
    perq = json.dumps(
        {"metric": "headline_per_query", "queries": timings, "sf": 0.1},
        separators=(",", ":"),
    )
    summary = json.dumps(
        {
            "metric": "headline_summary",
            "value": 99999.999,
            "unit": "sec",
            "headline_n": len(timings),
            "value_22q": 99999.999,
            "value_22q_members": "HEADLINE[:22] frozen pre-round-5",
            "cold_value": 99999.999,
            "cpu_probe_sec": 9.999,
            "value_22q_per_probe": 99999.999,
            "sf": 0.1,
        },
        separators=(",", ":"),
    )
    stdout_tail = ("x" * 5000 + "\n" + perq + "\n" + summary + "\n")[-2000:]
    lines = [ln for ln in stdout_tail.splitlines() if ln.startswith("{")]
    assert len(lines) >= 2, (
        f"per-query + summary lines exceed the 2000-char tail "
        f"(perq={len(perq)} summary={len(summary)}); shrink the "
        f"per-query line (bench.py falls back to the 22q subset)"
    )
    parsed = [json.loads(ln) for ln in lines[-2:]]
    assert parsed[0]["metric"] == "headline_per_query"
    assert set(parsed[0]["queries"]) == set(bench_mod.HEADLINE)
    assert parsed[1]["metric"] == "headline_summary"
