"""DuckDB differential-test harness.

Runs a named query both ways — the Spark callable and its DuckDB oracle
SQL over the same parquet tables — and compares row count, column names,
and an order-insensitive canonical value hash. This mirrors the driver's
CORRECTNESS check so failures surface locally first.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass
from typing import Any

import pandas as pd

from etl_ml_pipeline_spark.queries.tables import TABLE_NAMES


def duckdb_connect(sf_dir: str):
    """A DuckDB connection with the test tables registered as views."""
    import duckdb

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_value(v: Any) -> str:
    if v is None or v is pd.NA:
        return "<null>"  # pd.NA is missingness, not a float nan
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # 3.0 and 3 canonicalize identically
        return repr(v)
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return _canon_value(v.item())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def _canon_series(s: pd.Series) -> pd.Series:
    """Vectorized _canon_value with dtype fast paths.

    Both compared frames go through THIS function, so equality
    semantics are preserved as long as each fast path canonicalizes a
    value the same way _canon_value would (ints as digits, int-valued
    floats as digits, other floats as shortest round-trip repr — which
    numpy's float64 str conversion also produces)."""
    import numpy as np

    kind = s.dtype.kind
    if kind in "iu":
        # Fast path is only safe for plain numpy int dtypes within
        # int64 range: pandas nullable Int64 carrying pd.NA raises on
        # astype('int64'), and uint64 values above 2^63 would silently
        # wrap. Route those to the exact scalar path (ADVICE r05).
        if not isinstance(s.dtype, np.dtype):
            # astype(object) preserves pd.NA (Series.map would coerce
            # it to float nan before the callable sees it)
            return s.astype(object).map(_canon_value)
        if kind == "u" and s.dtype.itemsize == 8 and len(s) and bool(
            (s.to_numpy() > np.iinfo("int64").max).any()
        ):
            return s.map(_canon_value)
        return s.astype("int64").astype(str)
    if kind == "b":
        if not isinstance(s.dtype, np.dtype):
            # pandas nullable BooleanDtype also reports kind 'b', but
            # astype(str) renders pd.NA as '<NA>' instead of the scalar
            # path's '<null>' — same extension-dtype hazard as the int
            # path above, guarded the same way.
            return s.astype(object).map(_canon_value)
        return s.astype(str)
    if kind == "f":
        # float32 widens to float64 first, matching the scalar path's
        # .item() -> Python float -> repr canonicalization exactly.
        v = s.to_numpy(dtype="float64")
        out = np.empty(len(v), dtype=object)
        nan = np.isnan(v)
        intlike = ~nan & (v == np.floor(v)) & (np.abs(v) < 1e15)
        out[intlike] = v[intlike].astype("int64").astype("U")
        rest = ~nan & ~intlike
        out[rest] = v[rest].astype("U")  # dragon4 shortest repr == repr()
        out[nan] = "<nan>"
        return pd.Series(out, index=s.index)
    return s.map(_canon_value)


def value_hash(pdf: pd.DataFrame) -> str:
    """Order-insensitive canonical hash.

    \x1f unit / \x1e record separators (escaped, not raw bytes)
    prevent ('ab','c') vs ('a','bc') and row-regrouping collisions.
    Rows are canonicalized column-vectorized, joined, and sorted as
    whole strings — a deterministic order applied identically to both
    compared frames, so multiset equality is exactly preserved.
    """
    import numpy as np

    cols = sorted(pdf.columns)
    h = hashlib.sha256()
    if len(pdf) == 0 or not cols:
        return h.hexdigest()
    joined = _canon_series(pdf[cols[0]]).to_numpy(dtype=object)
    for c in cols[1:]:
        joined = joined + "\x1f" + _canon_series(pdf[c]).to_numpy(dtype=object)
    joined = np.sort(joined)
    h.update("\x1e".join(joined).encode("utf-8"))
    h.update(b"\x1e")
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    schema_ok: bool
    hash_ok: bool
    detail: str = ""


def compare_one(name: str, spark, sf_dir: str, query_fn, sql: str) -> CompareResult:
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    with duckdb_connect(sf_dir) as con:
        oracle_pdf = con.sql(sql).df()

    schema_ok = sorted(spark_pdf.columns) == sorted(oracle_pdf.columns)
    rows_ok = len(spark_pdf) == len(oracle_pdf)
    hash_ok = schema_ok and rows_ok and value_hash(spark_pdf) == value_hash(oracle_pdf)

    detail = ""
    if not schema_ok:
        detail = f"schema: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    elif not rows_ok:
        detail = f"rows: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    elif not hash_ok:
        s_rows, o_rows = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
        diffs = [
            f"  spark={s} | oracle={o}"
            for s, o in zip(s_rows, o_rows)
            if s != o
        ][:5]
        only_s = [r for r in s_rows if r not in set(o_rows)][:3]
        only_o = [r for r in o_rows if r not in set(s_rows)][:3]
        detail = (
            "hash mismatch; first row diffs:\n"
            + "\n".join(diffs)
            + f"\n  only-in-spark={only_s}\n  only-in-oracle={only_o}"
        )
    return CompareResult(
        name=name,
        ok=schema_ok and rows_ok and hash_ok,
        spark_rows=len(spark_pdf),
        oracle_rows=len(oracle_pdf),
        schema_ok=schema_ok,
        hash_ok=hash_ok,
        detail=detail,
    )
