"""Skew mitigation: salted aggregation and salted broadcast-replicate join.

No reference counterpart (single-process Pandas has no shuffles,
SURVEY.md §3.1); this is part of the 100 TB posture: when one key holds
a disproportionate share of rows (the classic hot-user / hot-null key),
a plain groupBy/join sends that key's entire volume to ONE reduce task.
AQE's skew-join handles the sort-merge-join case at runtime; these
helpers cover the two shapes AQE does not rewrite: skewed *aggregations*
and skewed *shuffle joins against a medium dimension*.

- ``salted_agg``: two-stage aggregation. Stage 1 groups by
  (keys, salt) — the hot key fans out over ``n_salt`` reducers; stage 2
  combines the per-salt partials. Only algebraic aggregates (sum, count,
  min, max) re-combine losslessly; avg is derived as sum/count.
- ``salted_join``: the big side gets a deterministic per-row salt; the
  small side is replicated ``n_salt`` times (explode over the salt
  range) and the join key becomes (key, salt) — the hot key's rows now
  land on ``n_salt`` different reducers. Replication multiplies the
  small side by n_salt, so it is for medium dimensions that are too big
  to broadcast but far smaller than the fact side.

Both salts are deterministic (hash of a caller-named unique column),
never ``rand()`` — deterministic plans re-execute identically under
task retries, which nondeterministic salting does not guarantee.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {"sum", "count", "min", "max"}

_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partial counts
    "min": F.min,
    "max": F.max,
}


def _salt(unique_col: str, n_salt: int) -> Column:
    return F.pmod(F.hash(F.col(unique_col)), F.lit(n_salt))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str | list[str]],
    unique_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps column -> fn or list of fns ("sum" | "count" | "min" |
    "max" | "avg"); output columns are ``{fn}_{col}``. ``unique_col``
    seeds the deterministic salt (any roughly-uniform column works; a
    row id is ideal).
    """
    pairs: list[tuple[str, str]] = []
    for c, fn in aggs.items():
        for f in [fn] if isinstance(fn, str) else fn:
            if f != "avg" and f not in _ALGEBRAIC:
                raise ValueError(f"non-algebraic aggregate {f!r} cannot be salted")
            pairs.append((c, f))

    # Partial states needed per (col, algebraic fn); avg decomposes into
    # sum + count partials combined as sum/count at the end.
    need: dict[tuple[str, str], None] = {}
    for c, fn in pairs:
        if fn == "avg":
            need[(c, "sum")] = None
            need[(c, "count")] = None
        else:
            need[(c, fn)] = None

    stage1 = (
        df.withColumn("__salt", _salt(unique_col, n_salt))
        .groupBy(*keys, "__salt")
        .agg(*[getattr(F, fn)(c).alias(f"__p_{fn}_{c}") for (c, fn) in need])
    )
    combined = stage1.groupBy(*keys).agg(
        *[_COMBINE[fn](f"__p_{fn}_{c}").alias(f"__c_{fn}_{c}") for (c, fn) in need]
    )
    out_cols = [F.col(k) for k in keys]
    for c, fn in pairs:
        if fn == "avg":
            out_cols.append(
                (F.col(f"__c_sum_{c}") / F.col(f"__c_count_{c}")).alias(f"avg_{c}")
            )
        else:
            out_cols.append(F.col(f"__c_{fn}_{c}").alias(f"{fn}_{c}"))
    return combined.select(*out_cols)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    unique_col: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    Result is identical to ``big.join(small, key, how)`` for inner/left
    joins; the hot key's rows distribute over ``n_salt`` reducers.
    """
    salted_big = big.withColumn("__salt", _salt(unique_col, n_salt))
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return salted_big.join(replicated, [key, "__salt"], how).drop("__salt")
