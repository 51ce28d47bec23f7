"""Structured Streaming operators (SURVEY.md §7.3 step 7, watermark-ready)."""

from etl_ml_pipeline_spark.streaming.joins import (  # noqa: F401
    stateful_sessionizer,
    stream_stream_interval_join,
)
from etl_ml_pipeline_spark.streaming.tws import (  # noqa: F401
    tws_available,
    tws_running_totals,
)
from etl_ml_pipeline_spark.streaming.windows import (  # noqa: F401
    read_json_stream,
    run_available_now,
    session_window_agg,
    sliding_window_agg,
    stateful_running_totals,
    stateful_running_totals_ttl,
    stateful_topk,
    tumbling_window_agg,
)
