"""End-to-end pipeline engine tests (config -> extract -> transform -> load)."""

from __future__ import annotations

import json

import pytest
import yaml

from etl_ml_pipeline_spark.config import PipelineConfig, load_config
from etl_ml_pipeline_spark.engine import PipelineEngine
from etl_ml_pipeline_spark.registry import list_registered


def _write_config(tmp_path, cfg: dict) -> str:
    p = tmp_path / "pipeline.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_parquet_to_parquet_pipeline(tmp_path, spark, sf_dir):
    out = tmp_path / "out"
    cfg = {
        "version": 1,
        "pipeline": {
            "name": "copy_region",
            "extract": {"type": "parquet", "config": {"path": f"{sf_dir}/region.parquet"}},
            "transform": [{"type": "pass_through"}],
            "load": {"type": "parquet", "config": {"path": str(out)}},
        },
    }
    engine = PipelineEngine(
        _write_config(tmp_path, cfg), spark=spark, state_path=str(tmp_path / "state.json")
    )
    engine.run()
    result = spark.read.parquet(str(out))
    assert result.count() == 5
    assert set(result.columns) == {"r_regionkey", "r_name"}


def test_single_file_json_sink(tmp_path, spark, sf_dir):
    out = tmp_path / "regions.json"
    cfg = {
        "version": 1,
        "pipeline": {
            "name": "region_json",
            "extract": {"type": "parquet", "config": {"path": f"{sf_dir}/region.parquet"}},
            "load": {
                "type": "json_local",
                "config": {"path": str(out), "single_file": True},
            },
        },
    }
    PipelineEngine(
        _write_config(tmp_path, cfg), spark=spark, state_path=str(tmp_path / "state.json")
    ).run()
    data = json.loads(out.read_text())
    assert len(data) == 5
    assert {"r_regionkey", "r_name"} <= set(data[0])


def test_incremental_cursor_commit_after_load(tmp_path, spark, sf_dir):
    """Cursor = post-extract max, saved only after successful load
    (reference engine.py:94-128 semantics)."""
    state_path = tmp_path / "state.json"
    cfg = {
        "version": 1,
        "pipeline": {
            "name": "inc_orders",
            "extract": {"type": "parquet", "config": {"path": f"{sf_dir}/orders.parquet"}},
            "load": {"type": "parquet", "config": {"path": str(tmp_path / "out")}},
            "incremental": {"cursor_field": "o_orderkey", "initial_value": -1},
        },
    }
    engine = PipelineEngine(
        _write_config(tmp_path, cfg), spark=spark, state_path=str(state_path)
    )
    df = engine.run()
    n_total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert df.count() == n_total
    saved = json.loads(state_path.read_text())
    assert saved["inc_orders"] == n_total - 1  # orderkeys are 0..n-1

    # Second run: cursor filter excludes everything
    df2 = engine.run()
    assert df2.count() == 0


def test_incremental_cursor_not_saved_on_load_failure(tmp_path, spark, sf_dir):
    state_path = tmp_path / "state.json"
    blocker = tmp_path / "blocked"
    blocker.write_text("i am a file, not a directory")
    cfg = {
        "version": 1,
        "pipeline": {
            "name": "inc_fail",
            "extract": {"type": "parquet", "config": {"path": f"{sf_dir}/region.parquet"}},
            "load": {
                "type": "json_local",
                "config": {"path": str(blocker / "sub" / "out.json"), "single_file": True},
            },
            "incremental": {"cursor_field": "r_regionkey", "initial_value": -1},
        },
        "settings": {"retry": {"max_attempts": 1, "backoff_seconds": 0}},
    }
    engine = PipelineEngine(
        _write_config(tmp_path, cfg), spark=spark, state_path=str(state_path)
    )
    with pytest.raises(Exception):
        engine.run()
    assert not state_path.exists() or "inc_fail" not in json.loads(state_path.read_text())


def test_full_refresh_ignores_stored_cursor(tmp_path, spark, sf_dir):
    state_path = tmp_path / "state.json"
    cfg = {
        "version": 1,
        "pipeline": {
            "name": "fr",
            "extract": {"type": "parquet", "config": {"path": f"{sf_dir}/region.parquet"}},
            "load": {"type": "parquet", "config": {"path": str(tmp_path / "out")}},
            "incremental": {"cursor_field": "r_regionkey", "initial_value": -1},
        },
    }
    engine = PipelineEngine(
        _write_config(tmp_path, cfg), spark=spark, state_path=str(state_path)
    )
    engine.run()
    assert engine.run().count() == 0  # incremental: nothing new
    assert engine.run(full_refresh=True).count() == 5  # full refresh: all rows


def test_on_failure_warn_swallows(tmp_path, spark):
    cfg = {
        "version": 1,
        "pipeline": {
            "name": "warned",
            "extract": {"type": "parquet", "config": {"path": "/nonexistent/nope.parquet"}},
        },
        "settings": {"on_failure": "warn", "retry": {"max_attempts": 1, "backoff_seconds": 0}},
    }
    engine = PipelineEngine(
        _write_config(tmp_path, cfg), spark=spark, state_path=str(tmp_path / "s.json")
    )
    assert engine.run() is None  # swallowed failure -> explicit None


def test_config_validation_fail_fast(tmp_path):
    with pytest.raises(Exception):
        PipelineConfig.model_validate({"pipeline": {"name": ""}})
    p = tmp_path / "bad.yaml"
    p.write_text("pipeline:\n  name: x\n  extract: {type: parquet}\n  bogus_key: 1\n")
    with pytest.raises(Exception):
        load_config(str(p))


def test_registry_lists_builtins():
    reg = list_registered()
    assert "parquet" in reg["sources"]
    assert "pass_through" in reg["transforms"]
    assert "json_local" in reg["sinks"]


def test_registry_unknown_key_lists_available():
    from etl_ml_pipeline_spark.registry import SOURCES

    with pytest.raises(KeyError, match="Available:"):
        SOURCES.get("definitely_not_registered")


def test_training_data_prep_pipeline(tmp_path, spark):
    """The full LLM training-data prep chain (score -> gate -> dedup ->
    deterministic sample -> partitioned parquet) runs as ONE config-driven
    pipeline; output is lang-partitioned, gated, and reproducible."""
    from pathlib import Path

    from etl_ml_pipeline_spark.engine import PipelineEngine

    repo = Path(__file__).resolve().parent.parent
    out = tmp_path / "training_docs"

    def run(path):
        PipelineEngine(
            str(repo / "configs" / "training_data_prep.yaml"),
            spark=spark,
            inline_config={"pipeline": {"load": {"config": {"path": str(path)}}}},
            state_path=str(tmp_path / "state.json"),
        ).run()

    run(out)
    # hive-style lang partitioning on disk
    assert sorted(p.name for p in out.glob("lang=*")) and (out / "_SUCCESS").exists()
    df = spark.read.parquet(str(out))
    rows = df.collect()
    assert rows
    # quality/length gates held
    assert all(r["quality"] >= 0.4 and r["n_tokens"] >= 10 for r in rows)
    # deterministic sampling + dedup: a second run produces the same ids
    out2 = tmp_path / "training_docs_2"
    run(out2)
    ids1 = {r["doc_id"] for r in rows}
    ids2 = {r["doc_id"] for r in spark.read.parquet(str(out2)).collect()}
    assert ids1 == ids2
    # both strata present in the sampled output
    n_en_out = sum(1 for r in rows if r["lang"] == "en")
    n_other_out = len(rows) - n_en_out
    assert n_en_out > 0 and n_other_out > 0


def test_relational_transform_validation(spark):
    """filter/select/hash_sample fail fast on bad config (plan-time, before I/O)."""
    from etl_ml_pipeline_spark.operators.relational import (
        FilterTransform,
        HashSampleTransform,
        SelectTransform,
    )

    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="where"):
        FilterTransform({})(df)
    with pytest.raises(ValueError, match="columns"):
        SelectTransform({})(df)
    with pytest.raises(ValueError, match="key_col"):
        HashSampleTransform({})(df)
    with pytest.raises(ValueError, match="rate_pct"):
        HashSampleTransform({"key_col": "k", "rate_pct": 150})(df)
    # happy paths
    assert FilterTransform({"where": "k >= 5"})(df).count() == 5
    assert SelectTransform({"exprs": {"k2": "k * 2"}})(df).columns == ["k2"]
    sampled = HashSampleTransform({"key_col": "k", "rate_pct": 100})(df)
    assert sampled.count() == 10


def test_sql_and_join_transforms(tmp_path, spark, sf_dir):
    """A YAML pipeline can enrich via a broadcast join against a second
    source and then aggregate with raw SQL — full relational surface
    through config alone."""
    out = tmp_path / "out_sqljoin"
    cfg = {
        "version": 1,
        "pipeline": {
            "name": "nation_customers",
            "extract": {
                "type": "parquet",
                "config": {"path": f"{sf_dir}/customer.parquet"},
            },
            "transform": [
                {
                    "type": "join",
                    "config": {
                        "right": {
                            "type": "parquet",
                            "config": {"path": f"{sf_dir}/nation.parquet"},
                        },
                        "on": {"left": "c_nationkey", "right": "n_nationkey"},
                        "how": "inner",
                        "broadcast": True,
                    },
                },
                {
                    "type": "sql",
                    "config": {
                        "query": "SELECT n_name, count(*) AS n_customers, "
                        "round(sum(c_acctbal), 2) AS total_bal "
                        "FROM input GROUP BY n_name"
                    },
                },
            ],
            "load": {"type": "parquet", "config": {"path": str(out)}},
        },
    }
    PipelineEngine(
        _write_config(tmp_path, cfg), spark=spark, state_path=str(tmp_path / "s.json")
    ).run()
    got = {r["n_name"]: r["n_customers"] for r in spark.read.parquet(str(out)).collect()}
    import duckdb

    want = dict(
        duckdb.sql(
            f"SELECT n_name, count(*) FROM '{sf_dir}/customer.parquet' c "
            f"JOIN '{sf_dir}/nation.parquet' n ON c_nationkey = n_nationkey "
            "GROUP BY n_name"
        ).fetchall()
    )
    assert got == want


def test_sql_join_transform_validation(spark):
    from etl_ml_pipeline_spark.operators.relational import JoinTransform, SqlTransform

    df = spark.range(3)
    with pytest.raises(ValueError, match="query"):
        SqlTransform({})(df)
    with pytest.raises(ValueError, match="right.type"):
        JoinTransform({"on": ["id"]})(df)
    with pytest.raises(ValueError, match="'on'"):
        JoinTransform({"right": {"type": "parquet"}})(df)


def test_parquet_sink_sort_by_layout(tmp_path, spark, sf_dir):
    """sort_by clusters rows within files (local sort, no shuffle) so
    parquet min/max stats are selective on the sorted column."""
    out = tmp_path / "sorted_out"
    cfg = {
        "version": 1,
        "pipeline": {
            "name": "sorted_orders",
            "extract": {"type": "parquet", "config": {"path": f"{sf_dir}/orders.parquet"}},
            "load": {
                "type": "parquet",
                "config": {"path": str(out), "sort_by": ["o_totalprice"]},
            },
        },
    }
    PipelineEngine(
        _write_config(tmp_path, cfg), spark=spark, state_path=str(tmp_path / "s.json")
    ).run()
    import pyarrow.parquet as pq

    files = sorted(out.glob("*.parquet"))
    assert files
    for f in files:
        prices = pq.read_table(f, columns=["o_totalprice"])["o_totalprice"].to_pylist()
        assert prices == sorted(prices)


def test_parquet_sink_zorder_layout(tmp_path, spark):
    """zorder_by clusters BOTH columns: every output file covers a small
    rectangle of the (x, y) space, so min/max stats prune on either
    column — where a plain sort_by x leaves y spanning the full range in
    every file."""
    import pyarrow.parquet as pq
    from pyspark.sql import Row

    n = 64
    grid = spark.createDataFrame(
        [Row(x=i, y=j, payload=i * n + j) for i in range(n) for j in range(n)]
    ).repartition(8)
    src = tmp_path / "grid_src"
    grid.write.parquet(str(src))
    out = tmp_path / "z_out"
    cfg = {
        "version": 1,
        "pipeline": {
            "name": "zorder_grid",
            "extract": {"type": "parquet", "config": {"path": str(src)}},
            "load": {
                "type": "parquet",
                "config": {"path": str(out), "zorder_by": ["x", "y"], "zorder_files": 16},
            },
        },
    }
    PipelineEngine(
        _write_config(tmp_path, cfg), spark=spark, state_path=str(tmp_path / "s.json")
    ).run()

    files = sorted(out.glob("*.parquet"))
    assert len(files) >= 4  # range repartition produced real clustering units
    areas = []
    for f in files:
        tbl = pq.read_table(f, columns=["x", "y"])
        xs, ys = tbl["x"].to_pylist(), tbl["y"].to_pylist()
        if not xs:
            continue
        areas.append(
            ((max(xs) - min(xs) + 1) / n) * ((max(ys) - min(ys) + 1) / n)
        )
    # each file's bounding rectangle must cover a small fraction of the
    # full space; a single-column sort would leave the other dimension at
    # ~1.0 width (area ~ 1/n_files only in x, ~1 overall per file pair)
    assert sum(areas) / len(areas) < 0.35, areas


def test_zorder_key_matches_morton_reference(spark):
    """The interleaved key equals a reference Morton encoding of each
    column's normalized rank (values chosen so ranks == values)."""
    from pyspark.sql import Row

    from etl_ml_pipeline_spark.operators.layout import with_zorder_key

    bits = 4
    n = (1 << bits) - 1  # ranks span 0..15 exactly when values do
    rows = [Row(x=i, y=j) for i in range(0, n + 1, 5) for j in range(0, n + 1, 3)]
    df = spark.createDataFrame(rows)
    got = {
        (r.x, r.y): r.z
        for r in with_zorder_key(df, ["x", "y"], "z", bits=bits).collect()
    }

    def morton(x: int, y: int) -> int:
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return z

    assert got == {(x, y): morton(x, y) for (x, y) in got}


def test_orc_roundtrip_with_pushdown(tmp_path, spark, sf_dir):
    """parquet -> ORC sink -> ORC source roundtrip; the ORC scan gets
    the same pushdown treatment as parquet."""
    from etl_ml_pipeline_spark import plugins  # noqa: F401
    from etl_ml_pipeline_spark.registry import SINKS, SOURCES

    out = tmp_path / "orders_orc"
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    with SINKS.get("orc")(spark, {"path": str(out), "sort_by": ["o_orderkey"]}) as s:
        s.load(orders)
    with SOURCES.get("orc")(spark, {"path": str(out)}) as src:
        back = src.extract()
        assert back.count() == orders.count()
        filtered = back.filter("o_orderkey > 1000")
        plan = filtered._sc._jvm.PythonSQLUtils.explainString(
            filtered._jdf.queryExecution(), "formatted"
        )
        assert "PushedFilters" in plan and "o_orderkey" in plan


def test_parquet_schema_evolution_merge(tmp_path, spark):
    """Schema evolution: files written with an evolved schema (extra
    column) read back unified via options.mergeSchema — older rows get
    nulls; no rewrite of existing data needed."""
    from pyspark.sql import Row

    from etl_ml_pipeline_spark import plugins  # noqa: F401
    from etl_ml_pipeline_spark.registry import SOURCES

    path = tmp_path / "evolving"
    spark.createDataFrame([Row(id=1, a="x")]).write.parquet(str(path))
    spark.createDataFrame([Row(id=2, a="y", b=3.5)]).write.mode("append").parquet(
        str(path)
    )
    with SOURCES.get("parquet")(
        spark, {"path": str(path), "options": {"mergeSchema": True}}
    ) as src:
        df = src.extract()
        assert set(df.columns) == {"id", "a", "b"}
        rows = {r.id: r.b for r in df.collect()}
        assert rows[1] is None and rows[2] == 3.5


def test_compact_files_hits_target_count(tmp_path, spark):
    """A 64-fragment table compacts to ceil(bytes/target) files with all
    rows intact and roughly uniform file sizes."""
    from etl_ml_pipeline_spark.operators.layout import compact_files, input_bytes

    src = str(tmp_path / "fragmented")
    spark.range(0, 20_000).selectExpr(
        "id", "id % 97 AS k", "repeat('x', 64) AS pad"
    ).repartition(64).write.parquet(src)
    assert len(spark.read.parquet(src).inputFiles()) == 64

    nbytes = input_bytes(spark.read.parquet(src))
    dst = str(tmp_path / "compacted")
    # pick a target that lands on 4 output files
    stats = compact_files(spark, src, dst, target_file_bytes=(nbytes + 3) // 4)
    assert stats["files_before"] == 64
    assert stats["files_after"] == stats["target_files"] == 4
    assert spark.read.parquet(dst).count() == 20_000


def test_compact_files_sorted_clusters_disjoint(tmp_path, spark):
    """With sort_col, compaction range-partitions: per-file key ranges
    are disjoint, so parquet min/max stats prune file-level reads."""
    from etl_ml_pipeline_spark.operators.layout import compact_files, input_bytes

    src = str(tmp_path / "frag2")
    spark.range(0, 10_000).selectExpr("id", "repeat('y', 32) AS pad") \
        .repartition(32).write.parquet(src)
    nbytes = input_bytes(spark.read.parquet(src))
    dst = str(tmp_path / "sorted")
    stats = compact_files(
        spark, src, dst, target_file_bytes=(nbytes + 3) // 4, sort_col="id"
    )
    assert stats["files_after"] >= 2
    ranges = []
    for f in spark.read.parquet(dst).inputFiles():
        r = spark.read.parquet(f.replace("file:", "")).agg(
            {"id": "min"}
        ).collect()[0][0], spark.read.parquet(f.replace("file:", "")).agg(
            {"id": "max"}
        ).collect()[0][0]
        ranges.append(r)
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint, ordered key ranges across files


def test_quality_gated_load_pipeline(tmp_path, spark):
    """The dq_expectations transform wired into a YAML pipeline: clean
    orders pass the gate and load; a poisoned inline check fails the
    run BEFORE the sink writes anything."""
    from pathlib import Path

    import pytest as _pytest

    from etl_ml_pipeline_spark.engine import PipelineEngine
    from etl_ml_pipeline_spark.operators.validation import DataQualityError

    repo = Path(__file__).resolve().parent.parent
    out = tmp_path / "gated"
    PipelineEngine(
        str(repo / "configs" / "quality_gated_load.yaml"),
        spark=spark,
        inline_config={"pipeline": {"load": {"config": {"path": str(out)}}}},
        state_path=str(tmp_path / "state.json"),
    ).run()
    assert spark.read.parquet(str(out)).count() > 0

    # poison one check: min price impossible -> gate fails, sink untouched
    out_bad = tmp_path / "gated_bad"
    with _pytest.raises(DataQualityError):
        PipelineEngine(
            str(repo / "configs" / "quality_gated_load.yaml"),
            spark=spark,
            inline_config={
                "pipeline": {
                    "load": {"config": {"path": str(out_bad)}},
                    "transform": [
                        {
                            "type": "dq_expectations",
                            "config": {
                                "checks": [
                                    {
                                        "type": "min",
                                        "column": "o_totalprice",
                                        "at_least": 10**12,
                                    }
                                ]
                            },
                        }
                    ],
                }
            },
            state_path=str(tmp_path / "state2.json"),
        ).run()
    assert not out_bad.exists()
