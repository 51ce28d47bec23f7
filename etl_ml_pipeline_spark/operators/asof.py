"""As-of join: each left row matched to the latest right row at-or-before it.

The reference has no joins at all (SURVEY.md §2.6); this is part of the
planned time-series extension (SURVEY.md §7.1). An as-of join is THE
canonical point-in-time lookup (trade→latest-quote, event→latest-state)
and Spark has no built-in operator for it.

Spark-first formulation — union + ordered window, NOT a range join:

1. Tag both inputs and union them on aligned schemas.
2. One window per key ordered by (ts, side-tag): ``last(right-payload,
   ignorenulls=True)`` carries the most recent right-side values forward
   onto every subsequent left row.
3. Keep only left rows.

Scale: exactly ONE shuffle (the window's partitionBy(key)); no
range-predicate join, which Catalyst would execute as a broadcast
nested-loop (quadratic) — the union+window plan is linear and spills
cleanly. Skewed keys behave like any other window partition.

The ``tolerance`` option drops matches older than the given number of
seconds (same semantics as pandas ``merge_asof(tolerance=...)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    value_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance: float | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Left as-of join, pandas ``merge_asof`` semantics.

    ``direction="backward"`` (default): latest right row with
    ``right.on <= left.on`` per key; ``"forward"``: earliest right row
    with ``right.on >= left.on`` (same union+window plan over the
    reversed ordering — still ONE shuffle on the by-key).
    ``allow_exact_matches=False`` makes both comparisons strict by
    flipping the equal-timestamp tiebreak so simultaneous right rows
    sort after the left row and are invisible to it.

    ``on``: ordering column (timestamp or numeric), same name both sides.
    ``by``: equality key(s). ``value_cols``: right-side payload columns to
    carry (defaults to all non-key, non-ordering columns).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*by_cols, on)]

    left_tagged = left.select(
        *by_cols,
        F.col(on),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[on].dataType).alias("__r_on"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    right_tagged = right.select(
        *by_cols,
        F.col(on),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(on).alias("__r_on"),
        # typed all-null struct (casting an empty struct literal is not
        # allowed in Spark 4)
        F.struct(
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left.columns
            ]
        ).alias("__l"),
    )

    # Tiebreak at equal ts: right rows sort BEFORE left rows
    # (__is_left asc) when exact matches count — the standard <=
    # convention — and AFTER them (desc) when they must not.
    on_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    tie = F.col("__is_left").asc() if allow_exact_matches else F.col("__is_left").desc()
    w = (
        W.partitionBy(*by_cols)
        .orderBy(on_order, tie)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = left_tagged.unionByName(right_tagged).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in value_cols
        ],
        F.last("__r_on", ignorenulls=True).over(w).alias("__m_on"),
    )

    out = carried.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        gap = (
            F.col(on).cast("double") - F.col("__m_on").cast("double")
            if direction == "backward"
            else F.col("__m_on").cast("double") - F.col(on).cast("double")
        )
        in_window = F.col("__m_on").isNotNull() & (gap <= F.lit(float(tolerance)))
        matched = [
            F.when(in_window, F.col(f"__m_{c}")).alias(f"{c}{suffix}")
            for c in value_cols
        ]
        matched_on = F.when(in_window, F.col("__m_on")).alias(f"{on}{suffix}")
    else:
        matched = [F.col(f"__m_{c}").alias(f"{c}{suffix}") for c in value_cols]
        matched_on = F.col("__m_on").alias(f"{on}{suffix}")

    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        matched_on,
        *matched,
    )


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str = "ts",
    tolerance_seconds: int = 600,
) -> DataFrame:
    """Tolerance-window join: every (left, right) pair with the same key
    whose timestamps lie within ±tolerance — WITHOUT a range join.

    A naive `l.ts BETWEEN r.ts - tol AND r.ts + tol` predicate forces a
    cross product per key (Spark plans non-equi conditions as
    BroadcastNestedLoop/CartesianProduct) — quadratic per key and fatal
    at 100 TB. The banding trick makes it an EQUI join: bucket time into
    tolerance-sized bins, explode the left side into its bin and the two
    neighbors (any right row within ±tol falls in one of those three),
    join on (key, bin), then apply the exact tolerance as a residual
    filter. One shuffle, linear in matches; each true pair matches
    exactly once because the right row has exactly one bin.

    Columns from `right` come back suffixed `_right` (same contract as
    asof_join).
    """
    bin_col = (F.unix_timestamp(F.col(ts)) / tolerance_seconds).cast("long")
    l = left.withColumn(
        "__bin", F.explode(F.array(bin_col - 1, bin_col, bin_col + 1))
    )
    r = right.withColumn("__bin", bin_col)
    renamed = r.select(
        F.col(by).alias(f"{by}_right"),
        F.col("__bin"),
        *[
            F.col(c).alias(f"{c}_right")
            for c in right.columns
            if c != by
        ],
    )
    joined = l.join(
        renamed,
        (F.col(by) == F.col(f"{by}_right")) & (l["__bin"] == renamed["__bin"]),
    )
    dt = F.abs(
        F.unix_timestamp(F.col(ts)) - F.unix_timestamp(F.col(f"{ts}_right"))
    )
    return joined.filter(dt <= tolerance_seconds).drop("__bin", f"{by}_right")
