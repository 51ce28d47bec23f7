"""Cross-engine semantics under DUPLICATED data — regression tests for
two bugs the synthetic-sf1 sweep caught that unique-valued small SFs
can never expose:

* ``agg_stats_battery``: bare ``min_by``/``max_by`` is engine-defined
  when the measure ties; the catalog query takes lexicographic
  (measure, key) struct extremes so ties resolve deterministically.
* ``q21_waiting_supplier``: the group key is the supplier NAME (TPC-H
  Q21 semantics), which need not be unique per suppkey — grouping by
  suppkey diverges the row count as soon as names repeat.

Both tests run the real catalog callable against its real oracle SQL on
a crafted parquet directory where ties/duplicates are GUARANTEED, via
the same compare_one harness the driver mirrors.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_ml_pipeline_spark.oracle import compare_one
from etl_ml_pipeline_spark.queries.tables import TABLE_NAMES

TS = datetime.datetime(1995, 1, 1)


def _write(path, names: list[str], cols: dict[str, list]) -> None:
    pq.write_table(pa.table(cols), str(path))


@pytest.fixture(scope="module")
def tied_sf_dir(tmp_path_factory) -> str:
    """A full 10-table directory (DuckDB view registration binds every
    file eagerly) where orders/lineitem/supplier carry engineered
    duplicates and the rest are 1-row stand-ins."""
    d = tmp_path_factory.mktemp("tied_sf")
    day = datetime.timedelta(days=1)

    # orders: per status group, the min AND max o_totalprice each tie
    # across two orderkeys; ALSO provides q21's multi-supplier orders.
    _write(
        d / "orders.parquet",
        ["orders"],
        {
            "o_orderkey": pa.array([1, 2, 3, 4, 5, 6, 7, 8], type=pa.int64()),
            # varied custkeys AND >=2 distinct prices per group:
            # corr(price, custkey) needs nonzero variance on BOTH sides
            # (Spark ANSI raises DIVIDE_BY_ZERO on a zero-variance operand)
            "o_custkey": pa.array([1, 2, 3, 4, 1, 2, 3, 4], type=pa.int64()),
            "o_orderstatus": ["F", "F", "F", "F", "O", "O", "O", "O"],
            # prices chosen so per-group stddev is NOT an exact grid
            # value: floor(sd * 1e4) at an exact boundary (e.g. sd = 1.0)
            # splits on the engines' last-ulp accumulation difference
            "o_totalprice": [10.1, 10.1, 99.7, 99.7, 5.2, 5.2, 7.3, 7.3],
            "o_orderdate": pa.array([TS] * 8, type=pa.timestamp("us")),
            "o_orderpriority": ["1-URGENT"] * 8,
        },
    )
    # lineitem: order 1 has suppliers 101 (late) + 102 (on time) ->
    # 101 is a sole late supplier; order 2 mirrors it for supplier 201
    # whose s_name DUPLICATES supplier 101's.
    _write(
        d / "lineitem.parquet",
        ["lineitem"],
        {
            "l_orderkey": pa.array([1, 1, 2, 2], type=pa.int64()),
            "l_partkey": pa.array([1] * 4, type=pa.int64()),
            "l_suppkey": pa.array([101, 102, 201, 102], type=pa.int64()),
            "l_linenumber": pa.array([1, 2, 1, 2], type=pa.int32()),
            "l_quantity": [1.0] * 4,
            "l_extendedprice": [100.0] * 4,
            "l_discount": [0.0] * 4,
            "l_tax": [0.0] * 4,
            "l_returnflag": ["N"] * 4,
            "l_linestatus": ["O"] * 4,
            "l_shipdate": pa.array(
                [TS + 200 * day, TS + day, TS + 200 * day, TS + day],
                type=pa.timestamp("us"),
            ),
        },
    )
    # supplier: 101 and 201 share a name (the sf1-replication shape).
    _write(
        d / "supplier.parquet",
        ["supplier"],
        {
            "s_suppkey": pa.array([101, 102, 201], type=pa.int64()),
            "s_name": ["Supplier#dup", "Supplier#ok", "Supplier#dup"],
            "s_nationkey": pa.array([0, 0, 0], type=pa.int32()),
            "s_acctbal": [0.0, 0.0, 0.0],
        },
    )
    # Remaining tables: minimal valid parquet so view registration binds.
    stubs = {
        "region": {"r_regionkey": pa.array([0], type=pa.int64()), "r_name": ["R"]},
        "nation": {"n_nationkey": pa.array([0], type=pa.int64()), "n_name": ["N"]},
        "customer": {"c_custkey": pa.array([1], type=pa.int64()), "c_name": ["C"]},
        "part": {"p_partkey": pa.array([1], type=pa.int64()), "p_name": ["P"]},
        "events": {"event_id": pa.array([1], type=pa.int64())},
        "documents": {"doc_id": pa.array([1], type=pa.int64())},
        "embeddings": {"emb_id": pa.array([1], type=pa.int64())},
    }
    for name in TABLE_NAMES:
        if name in ("orders", "lineitem", "supplier"):
            continue
        _write(d / f"{name}.parquet", [name], stubs[name])
    return str(d)


def test_argmin_argmax_deterministic_under_ties(spark, tied_sf_dir):
    from etl_ml_pipeline_spark.queries.relational import _STATS_SQL, agg_stats_battery

    r = compare_one("agg_stats_battery", spark, tied_sf_dir, agg_stats_battery, _STATS_SQL)
    assert r.ok, r.detail
    rows = {
        row["o_orderstatus"]: row
        for row in agg_stats_battery(spark, tied_sf_dir).collect()
    }
    # ties resolve to the SMALLEST key for argmin, LARGEST for argmax
    assert rows["F"]["cheapest_order"] == 1 and rows["F"]["priciest_order"] == 4
    assert rows["O"]["cheapest_order"] == 5 and rows["O"]["priciest_order"] == 8


def test_q21_groups_by_supplier_name(spark, tied_sf_dir):
    from etl_ml_pipeline_spark.queries.tpch_extra import _Q21_SQL, q21_waiting_supplier

    r = compare_one("q21_waiting_supplier", spark, tied_sf_dir, q21_waiting_supplier, _Q21_SQL)
    assert r.ok, r.detail
    rows = q21_waiting_supplier(spark, tied_sf_dir).collect()
    # suppliers 101 and 201 are each sole-late on one order and share a
    # name: ONE output row with their counts summed.
    assert [(row["s_name"], row["numwait"]) for row in rows] == [("Supplier#dup", 2)]
