"""Sessionization + event-time windowing transforms.

Not present in the reference (it has no streaming/event concepts —
SURVEY.md §2.6); built Spark-first for the events table and as the batch
twin of the Structured Streaming path (``session_window`` /
``window()`` in streaming mode share these semantics).

Scale: gap-based sessionization is one shuffle on the user key + a
per-partition sort — the classic lag/cumsum formulation; no state store
needed in batch. Tumbling windows are a plain groupBy on a derived
window-start column (map-side computable, fully pushed down).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.base import BaseTransform
from etl_ml_pipeline_spark.registry import register_transform


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the previous event of the same user exceeds ``gap_minutes``."""
    order_cols = order_cols or [ts_col]
    w = W.partitionBy(user_col).orderBy(*order_cols)
    gap_sec = F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(w).cast("double")
    new_session = (
        F.when(gap_sec.isNull() | (gap_sec > gap_minutes * 60.0), 1).otherwise(0)
    )
    return df.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )


@register_transform("sessionize")
class Sessionize(BaseTransform):
    def transform(self, df: DataFrame) -> DataFrame:
        return sessionize(
            df,
            user_col=self.config.get("user_col", "user_id"),
            ts_col=self.config.get("ts_col", "ts"),
            gap_minutes=float(self.config.get("gap_minutes", 30)),
        )


@register_transform("tumbling_window")
class TumblingWindow(BaseTransform):
    """Event-time tumbling window aggregation (batch twin of streaming
    ``groupBy(window(ts, ...))``)."""

    def transform(self, df: DataFrame) -> DataFrame:
        ts_col = self.config.get("ts_col", "ts")
        duration = self.config.get("duration", "1 hour")
        keys = self.config.get("keys", [])
        aggs = self.config.get("aggs") or {"*": "count"}
        win = F.window(F.col(ts_col), duration)
        agg_exprs = []
        for col, fn in aggs.items():
            if fn == "count":
                agg_exprs.append(F.count("*").alias("n"))
            else:
                agg_exprs.append(getattr(F, fn)(col).alias(f"{fn}_{col}"))
        return (
            df.groupBy(win, *keys)
            .agg(*agg_exprs)
            .withColumn("window_start", F.col("window.start"))
            .withColumn("window_end", F.col("window.end"))
            .drop("window")
        )
