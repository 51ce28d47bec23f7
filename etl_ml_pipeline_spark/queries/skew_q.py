"""Skew-mitigation catalog queries: salted aggregation and salted join
over the events hot-user distribution.

No reference counterpart (the reference is single-process pandas with no
shuffles — SURVEY.md §3.1); these are the 100 TB posture made
oracle-checkable. A salted plan must be RESULT-IDENTICAL to the plain
plan — the salt only changes the shuffle layout — so the DuckDB oracle
is simply the unsalted SQL, and a green row proves the rewrite is
semantics-preserving end to end. Plan shape (bounded fan-out, no
cartesian, two-stage aggregate) is guarded in tests/test_plans.py.

Scale: a plain groupBy/join sends each key's entire volume to one reduce
task; at 100 TB a hot user (or hot-null key) stalls the stage. salted_agg
spreads stage 1 over (key, salt) so the hot key uses n_salt reducers and
recombines algebraic partials; salted_join salts the fact side and
replicates the dimension n_salt times (explode over the salt range) —
bounded, deterministic fan-out, safe under task retry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.skew import salted_agg, salted_join
from etl_ml_pipeline_spark.queries.tables import t


def skew_salted_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (user, event_type) value stats via the two-stage salted
    aggregation — hot users fan out over 16 salt buckets in stage 1.

    Parity note: avg is re-derived as round(sum, 2) / count rather than
    truncating the engine's avg — values are 2-decimal money-like, so
    true averages often sit EXACTLY on a 4-decimal boundary where any
    truncation of two independently-summed doubles flips; dividing the
    identical rounded-sum doubles by the identical counts is bit-exact
    on both engines."""
    ev = t(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        keys=["user_id", "event_type"],
        aggs={"value": ["count", "sum"]},
        unique_col="event_id",
        n_salt=16,
    )
    return out.select(
        "user_id",
        "event_type",
        F.col("count_value").alias("n_values"),
        F.round("sum_value", 2).alias("sum_value"),
        (F.round("sum_value", 2) / F.col("count_value")).alias("avg_value"),
    ).orderBy("user_id", "event_type")


_SALTED_AGG_SQL = """
SELECT user_id, event_type,
       CAST(count(value) AS BIGINT) AS n_values,
       round(sum(value), 2) AS sum_value,
       round(sum(value), 2) / count(value) AS avg_value
FROM events
GROUP BY user_id, event_type
ORDER BY user_id, event_type
"""


def skew_salted_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events (fact, hot-user skewed) joined to the customer dimension
    via salt-and-replicate, then rolled up per market segment. The join
    result is identical to the plain equi-join; only the shuffle layout
    changes."""
    ev = t(spark, sf_dir, "events")
    dim = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    joined = salted_join(ev, dim, key="user_id", unique_col="event_id", n_salt=8)
    return (
        joined.groupBy("segment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("segment", "event_type")
    )


_SALTED_JOIN_SQL = """
SELECT c.c_mktsegment AS segment, e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(e.value), 2) AS sum_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment, e.event_type
ORDER BY segment, event_type
"""


# ---------------------------------------------------------------------------
# skew_key_diagnosis_events — the diagnosis that tells you to reach for
# the salted plans above: per-join-key heavy-hitter report on the
# events user_id distribution. Emits the top-10 hottest keys with each
# key's row share and its skew factor (key rows x distinct keys /
# total rows — 1.0 means perfectly uniform), plus the recommended salt
# fan-out ceil(skew) a salted rewrite would need to spread that key
# over average-sized reduce tasks. At 100 TB this query IS the
# pre-flight a join planner runs: one map-side-combined groupBy +
# a 10-row TakeOrdered — the corpus never moves twice.
# Arithmetic: row_share stays an integer floor (n_rows x 10^4 is
# overflow-safe at any real scale); skew_factor and salt_fanout divide
# BEFORE multiplying (n_rows/total is <= 1.0, so the double product
# with keys x 10^4 never overflows — the old n_rows*keys*10000 long
# product wrapped silently past ~9.2e18, i.e. exactly at the 100 TB
# scales where the diagnosis matters; ADVICE r12 #3). Identical IEEE
# op order on both engines keeps the floors bit-stable.
# ---------------------------------------------------------------------------


def skew_key_diagnosis_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("n_rows"))
    totals = per_key.agg(
        F.sum("n_rows").alias("__total"), F.count("*").alias("__keys")
    )
    top = (
        per_key.crossJoin(F.broadcast(totals))
        .select(
            "user_id",
            "n_rows",
            (F.floor(F.col("n_rows") * 10000 / F.col("__total")) / 10000).alias(
                "row_share"
            ),
            (
                F.floor(
                    F.col("n_rows") / F.col("__total") * F.col("__keys") * 10000
                )
                / 10000
            ).alias("skew_factor"),
            F.ceil(
                F.col("n_rows") / F.col("__total") * F.col("__keys")
            ).cast("long").alias("salt_fanout"),
        )
        .orderBy(F.desc("n_rows"), F.asc("user_id"))
        .limit(10)
    )
    return top


_SKEW_DIAG_SQL = """
WITH per_key AS (
  SELECT user_id, count(*) AS n_rows FROM events GROUP BY 1
),
tot AS (SELECT sum(n_rows) AS total, count(*) AS keys FROM per_key)
SELECT user_id, n_rows,
       floor(n_rows * 10000 / total) / 10000 AS row_share,
       floor(n_rows / total * keys * 10000) / 10000 AS skew_factor,
       CAST(ceil(n_rows / total * keys) AS BIGINT) AS salt_fanout
FROM per_key CROSS JOIN tot
ORDER BY n_rows DESC, user_id ASC
LIMIT 10
"""


QUERIES = {
    "skew_salted_agg_events": skew_salted_agg_events,
    "skew_salted_join_events": skew_salted_join_events,
    "skew_key_diagnosis_events": skew_key_diagnosis_events,
}

ORACLES = {
    "skew_salted_agg_events": _SALTED_AGG_SQL,
    "skew_salted_join_events": _SALTED_JOIN_SQL,
    "skew_key_diagnosis_events": _SKEW_DIAG_SQL,
}
