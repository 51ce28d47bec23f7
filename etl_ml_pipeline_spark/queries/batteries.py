"""Function-surface batteries: array/HOF, regexp, and datetime.

Each battery is one cheap pass over a deterministically-sampled table
exercising a whole family of built-in functions, every expression
aliased identically in Spark and the DuckDB oracle — the
scalar_function_battery pattern (queries/relational.py) extended to
the three families a user migrating real pipelines hits next. The
point is breadth-with-teeth: any cross-engine semantic drift in ANY
of these functions (HOF lambda semantics, regex dialect, ISO week
rules, interval arithmetic) turns into a value-hash mismatch on the
driver's differential instead of a silent production surprise.

Scale posture: all three are map-only projections over a pushed-down
sampled scan — no shuffle beyond the final presentation sort, which
the driver's collect imposes anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.queries.tables import t

_TOKS_DUCK = "regexp_split_to_array(trim(text), '\\s+')"


# ---------------------------------------------------------------------------
# array_function_battery — the higher-order-function surface over the
# documents token array: transform / filter / aggregate / slice / sort
# / distinct / contains / element_at, each mirrored by the DuckDB list
# functions. Lengths are cast to common widths (Spark length -> INT,
# DuckDB length -> BIGINT) so the hash compares values, not dialect
# defaults.
# ---------------------------------------------------------------------------


def array_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    arr = F.split(F.trim(F.col("text")), r"\s+")
    toks = docs.select("doc_id", arr.alias("toks"))
    a = F.col("toks")
    return toks.select(
        "doc_id",
        F.size(a).cast("bigint").alias("n_tok"),
        F.concat_ws(" ", F.slice(a, 1, 3)).alias("first3"),
        F.element_at(a, -1).alias("last_tok"),
        F.size(F.array_distinct(a)).cast("bigint").alias("n_distinct"),
        F.array_contains(a, "the").alias("has_the"),
        F.aggregate(
            a, F.lit(0), lambda acc, x: F.greatest(acc, F.length(x))
        ).cast("bigint").alias("max_len"),
        F.aggregate(
            a, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
        F.size(F.filter(a, lambda x: F.length(x) > 4)).cast("bigint").alias(
            "n_long"
        ),
        (F.size(F.filter(a, lambda x: F.length(x) == 1)) > 0).alias("any_len1"),
        F.concat_ws(" ", F.slice(F.array_sort(a), 1, 3)).alias("sorted3"),
    ).orderBy("doc_id")


_ARRAY_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_DUCK} AS a
  FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id,
       CAST(length(a) AS BIGINT) AS n_tok,
       array_to_string(a[1:3], ' ') AS first3,
       a[-1] AS last_tok,
       CAST(length(list_distinct(a)) AS BIGINT) AS n_distinct,
       list_contains(a, 'the') AS has_the,
       CAST(list_max(list_transform(a, x -> length(x))) AS BIGINT) AS max_len,
       CAST(list_sum(list_transform(a, x -> length(x))) AS BIGINT) AS total_chars,
       CAST(length(list_filter(a, x -> length(x) > 4)) AS BIGINT) AS n_long,
       length(list_filter(a, x -> length(x) = 1)) > 0 AS any_len1,
       array_to_string((list_sort(a))[1:3], ' ') AS sorted3
FROM toks
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# regexp_function_battery — extract / replace / count / match over the
# part strings (both engines speak RE2-compatible syntax for this
# subset; counting goes through length-difference and extract_all so
# the oracle needs no regexp_count dialect mapping).
# ---------------------------------------------------------------------------


def regexp_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") % 5 == 0)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias(
            "brand_num"
        ),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        (F.length("p_name") - F.length(F.regexp_replace("p_name", "a", "")))
        .cast("bigint")
        .alias("n_a"),
        F.regexp_count("p_name", F.lit("e")).cast("bigint").alias("n_e"),
        F.col("p_type").rlike("^S").alias("is_s_type"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_words"),
    ).orderBy("p_partkey")


_REGEXP_SQL = """
SELECT p_partkey,
       CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT) AS brand_num,
       regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
       CAST(length(p_name) - length(regexp_replace(p_name, 'a', '', 'g'))
            AS BIGINT) AS n_a,
       CAST(length(regexp_extract_all(p_name, 'e')) AS BIGINT) AS n_e,
       regexp_matches(p_type, '^S') AS is_s_type,
       CAST(length(string_split(p_name, ' ')) AS BIGINT) AS n_words
FROM part
WHERE p_partkey % 5 = 0
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# datetime_function_battery — truncation grains, ISO week rules,
# formatting, interval arithmetic, and epoch conversion over the
# events timestamps (session TZ pinned UTC; ts normalized by the
# tables loader). ISO day-of-week and ISO week number are the classic
# cross-engine divergence points — both engines implement ISO-8601
# here and the hash proves it stays that way.
# ---------------------------------------------------------------------------


def datetime_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") % 59 == 0)
    ts = F.col("ts")
    d = ts.cast("date")
    return ev.select(
        "event_id",
        F.date_trunc("day", ts).alias("day_ts"),
        F.date_trunc("week", ts).alias("week_ts"),
        F.date_format(ts, "yyyy-MM").alias("month_str"),
        F.expr("extract(DAYOFWEEK_ISO FROM ts)").cast("int").alias("iso_dow"),
        F.weekofyear(ts).cast("int").alias("iso_week"),
        F.hour(ts).cast("int").alias("h"),
        F.minute(ts).cast("int").alias("mi"),
        F.unix_timestamp(ts).alias("epoch_s"),
        F.expr("ts + INTERVAL 90 MINUTES").alias("plus90m"),
        F.datediff(d, F.lit("2020-01-01").cast("date")).cast("int").alias(
            "days_since_2020"
        ),
        # DATE results travel as strings: Spark hands pandas date
        # objects where DuckDB hands datetime64 — same value, different
        # canonical form, so both sides cast to the ISO string.
        F.last_day(d).cast("string").alias("month_end"),
        F.date_add(d, 30).cast("string").alias("plus30d"),
    ).orderBy("event_id")


_DATETIME_SQL = """
SELECT event_id,
       date_trunc('day', ts) AS day_ts,
       date_trunc('week', ts) AS week_ts,
       strftime(ts, '%Y-%m') AS month_str,
       CAST(isodow(ts) AS INT) AS iso_dow,
       CAST(weekofyear(ts) AS INT) AS iso_week,
       CAST(hour(ts) AS INT) AS h,
       CAST(minute(ts) AS INT) AS mi,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
       ts + INTERVAL 90 MINUTE AS plus90m,
       CAST(date_diff('day', DATE '2020-01-01', CAST(ts AS DATE)) AS INT)
         AS days_since_2020,
       CAST(last_day(CAST(ts AS DATE)) AS VARCHAR) AS month_end,
       CAST(CAST(ts AS DATE) + 30 AS VARCHAR) AS plus30d
FROM events
WHERE event_id % 59 = 0
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# null_semantics_battery — the null-handling contract, pinned: nulls
# are injected deterministically (every 7th customer's balance, every
# 5th segment), then the battery asserts aggregate null-skipping
# (count(col) vs count(*), sum/avg/min over nulls, count(DISTINCT)),
# null-safe equality (Spark <=> == DuckDB IS NOT DISTINCT FROM),
# conditional fallbacks (coalesce/nullif/nvl2 shape), and group-by
# treating NULL as a real key. Engine DEFAULTS for null sort order
# differ (Spark ASC = NULLS FIRST, DuckDB = NULLS LAST) — the battery
# therefore spells ordering out explicitly, which is also the
# portability lesson it encodes.
# ---------------------------------------------------------------------------


def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 != 0, F.col("c_acctbal")).alias("bal"),
        F.when(F.col("c_custkey") % 5 != 0, F.col("c_mktsegment")).alias("seg"),
    )
    return (
        c.groupBy("seg")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("bal").alias("n_bal"),  # null-skipping count
            F.round(F.sum("bal"), 2).alias("sum_bal"),  # sum skips nulls
            F.round(F.avg("bal"), 4).alias("avg_bal"),  # avg divides by n_bal
            F.min("bal").alias("min_bal"),  # min ignores nulls
            F.countDistinct("seg").alias("n_distinct_seg"),  # 0 for null group
            F.sum(
                F.col("seg").eqNullSafe(F.col("c_mktsegment")).cast("long")
            ).alias("n_nullsafe_eq"),
            F.round(F.sum(F.coalesce(F.col("bal"), F.lit(0.0))), 2).alias(
                "sum_coalesced"
            ),
            F.sum(F.nullif(F.col("seg"), F.lit("BUILDING")).isNull().cast("long")).alias(
                "n_nullified"
            ),
        )
        .orderBy(F.col("seg").asc_nulls_last())
    )


_NULL_SQL = """
WITH c AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 7 <> 0 THEN c_acctbal END AS bal,
         CASE WHEN c_custkey % 5 <> 0 THEN c_mktsegment END AS seg
  FROM customer
)
SELECT seg,
       count(*) AS n_rows,
       CAST(count(bal) AS BIGINT) AS n_bal,
       round(sum(bal), 2) AS sum_bal,
       round(avg(bal), 4) AS avg_bal,
       min(bal) AS min_bal,
       CAST(count(DISTINCT seg) AS BIGINT) AS n_distinct_seg,
       CAST(sum(CASE WHEN seg IS NOT DISTINCT FROM c_mktsegment
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
       round(sum(coalesce(bal, 0.0)), 2) AS sum_coalesced,
       CAST(sum(CASE WHEN nullif(seg, 'BUILDING') IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_nullified
FROM c
GROUP BY seg
ORDER BY seg ASC NULLS LAST
"""


QUERIES = {
    "array_function_battery": array_function_battery,
    "regexp_function_battery": regexp_function_battery,
    "datetime_function_battery": datetime_function_battery,
    "null_semantics_battery": null_semantics_battery,
}

ORACLES = {
    "array_function_battery": _ARRAY_SQL,
    "regexp_function_battery": _REGEXP_SQL,
    "datetime_function_battery": _DATETIME_SQL,
    "null_semantics_battery": _NULL_SQL,
}
