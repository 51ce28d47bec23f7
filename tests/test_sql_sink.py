"""SQL sink tests: append/replace/fail + upsert against sqlite3.

Ports the reference's loader coverage
(/root/reference/tests/test_sqlalchemy_loader.py:26-99 and
/root/reference/tests/test_upsert.py:25-131, SURVEY.md §5).
"""

from __future__ import annotations

import sqlite3

import pytest

from etl_ml_pipeline_spark.sinks.sql_database import (
    SqlDatabaseSink,
    unique_index_sql,
    upsert_sql,
)


def _fetch(db, sql):
    with sqlite3.connect(db) as conn:
        return conn.execute(sql).fetchall()


@pytest.fixture()
def db(tmp_path):
    return str(tmp_path / "test.db")


def _df(spark, rows, schema="id long, name string"):
    return spark.createDataFrame(rows, schema)


def test_append_creates_and_appends(spark, db):
    sink = SqlDatabaseSink(spark, {"database": db, "table": "t", "if_exists": "append"})
    with sink:
        sink.load(_df(spark, [(1, "a"), (2, "b")]))
    with SqlDatabaseSink(spark, {"database": db, "table": "t", "if_exists": "append"}) as sink2:
        sink2.load(_df(spark, [(3, "c")]))
    assert _fetch(db, "SELECT count(*) FROM t") == [(3,)]


def test_replace_drops_existing(spark, db):
    cfg = {"database": db, "table": "t", "if_exists": "replace"}
    with SqlDatabaseSink(spark, cfg) as sink:
        sink.load(_df(spark, [(1, "a"), (2, "b")]))
    with SqlDatabaseSink(spark, cfg) as sink:
        sink.load(_df(spark, [(9, "z")]))
    assert _fetch(db, "SELECT id, name FROM t") == [(9, "z")]


def test_fail_mode_raises_if_exists(spark, db):
    cfg = {"database": db, "table": "t", "if_exists": "fail"}
    with SqlDatabaseSink(spark, cfg) as sink:
        sink.load(_df(spark, [(1, "a")]))
    with SqlDatabaseSink(spark, cfg) as sink:
        with pytest.raises(ValueError, match="already exists"):
            sink.load(_df(spark, [(2, "b")]))


def test_upsert_insert_then_update(spark, db):
    cfg = {"database": db, "table": "t", "if_exists": "upsert", "primary_keys": ["id"]}
    with SqlDatabaseSink(spark, cfg) as sink:
        sink.load(_df(spark, [(1, "a"), (2, "b")]))
    with SqlDatabaseSink(spark, cfg) as sink:
        sink.load(_df(spark, [(2, "B2"), (3, "c")]))
    assert sorted(_fetch(db, "SELECT id, name FROM t")) == [(1, "a"), (2, "B2"), (3, "c")]


def test_upsert_composite_key(spark, db):
    cfg = {
        "database": db,
        "table": "t",
        "if_exists": "upsert",
        "primary_keys": ["a", "b"],
    }
    schema = "a long, b long, v string"
    with SqlDatabaseSink(spark, cfg) as sink:
        sink.load(_df(spark, [(1, 1, "x"), (1, 2, "y")], schema))
        sink.load(_df(spark, [(1, 2, "Y2"), (2, 1, "z")], schema))
    assert sorted(_fetch(db, "SELECT a, b, v FROM t")) == [
        (1, 1, "x"), (1, 2, "Y2"), (2, 1, "z"),
    ]


def test_upsert_requires_primary_keys(spark, db):
    sink = SqlDatabaseSink(spark, {"database": db, "table": "t", "if_exists": "upsert"})
    with sink:
        with pytest.raises(ValueError, match="primary_keys"):
            sink.load(_df(spark, [(1, "a")]))


def test_upsert_missing_pk_column_raises(spark, db):
    cfg = {"database": db, "table": "t", "if_exists": "upsert", "primary_keys": ["nope"]}
    with SqlDatabaseSink(spark, cfg) as sink:
        with pytest.raises(ValueError, match="nope"):
            sink.load(_df(spark, [(1, "a")]))


def test_upsert_creates_unique_index(spark, db):
    cfg = {"database": db, "table": "t", "if_exists": "upsert", "primary_keys": ["id"]}
    with SqlDatabaseSink(spark, cfg) as sink:
        sink.load(_df(spark, [(1, "a")]))
    idx = _fetch(db, "SELECT name FROM sqlite_master WHERE type='index' AND name='uq_t_id'")
    assert idx == [("uq_t_id",)]


def test_empty_df_is_noop(spark, db):
    cfg = {"database": db, "table": "t", "if_exists": "upsert", "primary_keys": ["id"]}
    with SqlDatabaseSink(spark, cfg) as sink:
        sink.load(spark.createDataFrame([], "id long, name string"))
    # no table should even be created (reference :82-84 returns before DDL)
    assert _fetch(db, "SELECT name FROM sqlite_master WHERE type='table'") == []


def test_pk_only_table_do_nothing(spark, db):
    cfg = {"database": db, "table": "t", "if_exists": "upsert", "primary_keys": ["id"]}
    with SqlDatabaseSink(spark, cfg) as sink:
        sink.load(_df(spark, [(1,), (2,)], "id long"))
        sink.load(_df(spark, [(2,), (3,)], "id long"))
    assert sorted(_fetch(db, "SELECT id FROM t")) == [(1,), (2,), (3,)]


def test_unknown_mode_raises(spark, db):
    with SqlDatabaseSink(spark, {"database": db, "table": "t", "if_exists": "bogus"}) as sink:
        with pytest.raises(ValueError, match="bogus"):
            sink.load(_df(spark, [(1, "a")]))


def test_sql_generation():
    assert upsert_sql("t", ["id", "v"], ["id"]) == (
        'INSERT INTO "t" ("id", "v") VALUES (?, ?) '
        'ON CONFLICT ("id") DO UPDATE SET "v" = excluded."v"'
    )
    assert 'DO NOTHING' in upsert_sql("t", ["id"], ["id"])
    assert unique_index_sql("t", ["a", "b"]).startswith('CREATE UNIQUE INDEX IF NOT EXISTS "uq_t_a_b"')


def test_timestamps_and_doubles_roundtrip(spark, db):
    import datetime

    df = spark.createDataFrame(
        [(1, 1.5, datetime.datetime(2024, 1, 1, 12, 0))],
        "id long, x double, ts timestamp",
    )
    cfg = {"database": db, "table": "t", "if_exists": "append"}
    with SqlDatabaseSink(spark, cfg) as sink:
        sink.load(df)
    rows = _fetch(db, "SELECT id, x, ts FROM t")
    assert rows[0][0] == 1 and rows[0][1] == 1.5
    assert "2024-01-01" in str(rows[0][2])


def test_engine_pipeline_to_sql_sink(spark, db, sf_dir, tmp_path):
    """e2e: parquet source -> cleaning transform -> sql_database upsert sink."""
    from etl_ml_pipeline_spark.config import PipelineConfig
    from etl_ml_pipeline_spark.engine import PipelineEngine

    cfg = PipelineConfig.model_validate(
        {
            "version": 1,
            "pipeline": {
                "name": "to_sql",
                "extract": {"type": "parquet", "config": {"path": f"{sf_dir}/region.parquet"}},
                "transform": [],
                "load": {
                    "type": "sql_database",
                    "config": {
                        "database": db,
                        "table": "region",
                        "if_exists": "upsert",
                        "primary_keys": ["r_regionkey"],
                    },
                },
            },
        }
    )
    engine = PipelineEngine(cfg, spark=spark, state_path=str(tmp_path / "state.json"))
    engine.run()
    engine.run()  # idempotent under upsert
    assert _fetch(db, "SELECT count(*) FROM region") == [(5,)]


def test_upsert_rows_strategy_matches_staged(spark, db):
    """The legacy row-level ON CONFLICT path stays available behind
    upsert_strategy='rows' and produces the same table state."""
    cfg = {
        "database": db, "table": "t", "if_exists": "upsert",
        "primary_keys": ["id"], "upsert_strategy": "rows",
    }
    sink = SqlDatabaseSink(spark, cfg)
    sink.load(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))
    sink.load(spark.createDataFrame([(2, "B"), (3, "c")], ["id", "v"]))
    sink.disconnect()
    got = dict(sqlite3.connect(db).execute("SELECT id, v FROM t").fetchall())
    assert got == {1: "a", 2: "B", 3: "c"}


def test_staged_upsert_dedupes_intra_batch_pks(spark, db):
    """Duplicate PKs inside one load must collapse to a single row —
    Postgres rejects a multi-hit ON CONFLICT DO UPDATE, so the merge
    dedupes in its SELECT; exactly one of the candidate values lands."""
    cfg = {"database": db, "table": "t", "if_exists": "upsert", "primary_keys": ["id"]}
    sink = SqlDatabaseSink(spark, cfg)
    sink.load(spark.createDataFrame([(1, "x"), (1, "y"), (2, "b")], ["id", "v"]))
    sink.disconnect()
    rows = sqlite3.connect(db).execute("SELECT id, v FROM t ORDER BY id").fetchall()
    assert [r[0] for r in rows] == [1, 2]
    assert rows[0][1] in ("x", "y")


def test_staged_upsert_drops_stage_table(spark, db):
    cfg = {"database": db, "table": "t", "if_exists": "upsert", "primary_keys": ["id"]}
    sink = SqlDatabaseSink(spark, cfg)
    sink.load(spark.createDataFrame([(1, "a")], ["id", "v"]))
    sink.disconnect()
    names = [
        r[0]
        for r in sqlite3.connect(db).execute(
            "SELECT name FROM sqlite_master WHERE type='table'"
        ).fetchall()
    ]
    assert names == ["t"], names


def test_delta_merge_branch_with_stubbed_api(spark, db, monkeypatch, tmp_path):
    """Prove the gated Delta MERGE branch forms the right calls without
    delta-spark installed (VERDICT r04 #6: no silent dead code): a
    minimal stub of delta.tables.DeltaTable records the fluent chain.
    Covers both the first-load create (isDeltaTable False -> plain delta
    write) and the MERGE path (composite-key condition, update-all /
    insert-all clauses, execute)."""
    import sys
    import types

    calls: dict = {}

    class FakeMergeBuilder:
        def whenMatchedUpdateAll(self):
            calls.setdefault("chain", []).append("whenMatchedUpdateAll")
            return self

        def whenNotMatchedInsertAll(self):
            calls.setdefault("chain", []).append("whenNotMatchedInsertAll")
            return self

        def withSchemaEvolution(self):
            calls.setdefault("chain", []).append("withSchemaEvolution")
            return self

        def execute(self):
            calls.setdefault("chain", []).append("execute")

    class FakeDeltaTable:
        @staticmethod
        def isDeltaTable(spark_, path):
            calls["isDeltaTable_path"] = path
            return calls.get("exists", False)

        @staticmethod
        def forPath(spark_, path):
            calls["forPath_path"] = path
            return FakeDeltaTable()

        def alias(self, a):
            calls["target_alias"] = a
            return self

        def merge(self, src_df, cond):
            calls["merge_cond"] = cond
            calls["source_is_df"] = hasattr(src_df, "sparkSession")
            return FakeMergeBuilder()

    fake_tables = types.ModuleType("delta.tables")
    fake_tables.DeltaTable = FakeDeltaTable
    fake_delta = types.ModuleType("delta")
    fake_delta.tables = fake_tables
    monkeypatch.setitem(sys.modules, "delta", fake_delta)
    monkeypatch.setitem(sys.modules, "delta.tables", fake_tables)

    # first-load create: df.write.format("delta") — intercept the writer
    # because the real delta datasource jar is absent.
    writes: list = []
    df = _df(spark, [(1, "x", "a")], "id long, region string, name string")

    class FakeWriter:
        def format(self, fmt):
            writes.append(("format", fmt))
            return self

        def save(self, path):
            writes.append(("save", path))

    monkeypatch.setattr(type(df), "write", property(lambda self: FakeWriter()))

    cfg = {
        "database": db, "table": "t", "if_exists": "upsert",
        "primary_keys": ["id", "region"], "delta_path": str(tmp_path / "dt"),
    }
    sink = SqlDatabaseSink(spark, cfg)
    sink.load(df)  # isDeltaTable False -> create
    assert writes == [("format", "delta"), ("save", str(tmp_path / "dt"))]
    assert "merge_cond" not in calls

    calls["exists"] = True
    sink.load(df)  # now the MERGE path
    sink.disconnect()
    assert calls["forPath_path"] == str(tmp_path / "dt")
    assert calls["merge_cond"] == 't."id" = s."id" AND t."region" = s."region"'
    assert calls["source_is_df"]
    assert calls["chain"] == [
        "whenMatchedUpdateAll", "whenNotMatchedInsertAll", "execute",
    ]

    # second append against the existing table with a WIDER source
    # schema: delta_schema_evolution=true must thread the fluent
    # withSchemaEvolution() call between the clause builders and
    # execute (Delta's per-statement autoMerge opt-in); without the
    # flag the chain stays evolution-free (asserted above).
    calls["chain"] = []
    wide = _df(
        spark,
        [(1, "x", "a", 7)],
        "id long, region string, name string, extra long",
    )
    monkeypatch.setattr(type(wide), "write", property(lambda self: FakeWriter()))
    cfg_evo = dict(cfg, delta_schema_evolution=True)
    sink_evo = SqlDatabaseSink(spark, cfg_evo)
    sink_evo.load(wide)
    sink_evo.disconnect()
    assert calls["chain"] == [
        "whenMatchedUpdateAll",
        "whenNotMatchedInsertAll",
        "withSchemaEvolution",
        "execute",
    ]


def test_delta_path_without_delta_spark_raises(spark, db):
    """delta_path is the import-gated lakehouse MERGE route; without
    delta-spark installed it must fail loudly, not fall back silently."""
    cfg = {
        "database": db, "table": "t", "if_exists": "upsert",
        "primary_keys": ["id"], "delta_path": "/tmp/nope-delta",
    }
    sink = SqlDatabaseSink(spark, cfg)
    try:
        import delta  # noqa: F401

        pytest.skip("delta-spark installed; gate not exercisable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="delta-spark"):
        sink.load(spark.createDataFrame([(1, "a")], ["id", "v"]))
    sink.disconnect()
