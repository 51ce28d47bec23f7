"""transformWithStateInPandas ports of the custom stateful operators —
the modern (Spark 4.x) arbitrary-state API.

``applyInPandasWithState`` (streaming/windows.py) is the exercised
default everywhere in this repo; this module ports the running-totals
kernel to ``transformWithStateInPandas`` — typed state variables
(ValueState here; ListState/MapState/timers are the API's headroom),
RocksDB-backed state, and per-key Arrow batches — so a deployment on
the supported modern API has a drop-in.

ENVIRONMENT-GATED (the repo's 5th gated dependency, with Delta MERGE,
SparkXGBRegressor, live network sources, and Kafka): the
TransformWithStateInPySpark driver worker speaks a protobuf protocol
to the JVM state server, and ``google.protobuf`` is absent in this
container (verified round 11: the worker crashes with
``ImportError: cannot import name 'descriptor' from 'google.protobuf'``
— see ROADMAP). :func:`tws_available` probes the dependency;
tests/test_streaming.py runs the full replay when it is present and
pins the import/gate contract when it is not. Semantics are pinned
either way: the processor's per-key fold is the same arithmetic as
``stateful_running_totals``, whose applyInPandasWithState original is
oracle-checked by ``stream_running_totals_replay``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def tws_available() -> bool:
    """True iff the transformWithStateInPandas python protocol can run
    (the driver worker imports google.protobuf.descriptor)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def tws_running_totals(
    df: DataFrame, key_col: str = "user_id", cents_col: str = "cents"
) -> DataFrame:
    """Per-key cumulative (count, cents) totals via
    ``transformWithStateInPandas`` — the modern-API twin of
    ``stateful_running_totals`` (same fold, same update-mode output:
    one row per key per batch carrying the latest totals).

    Requires the RocksDB state store provider on the session (the API
    rejects the default HDFS-backed provider):

        spark.sql.streaming.stateStore.providerClass =
          org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider

    Scale: state is one (long, long) per live key in RocksDB —
    spillable far past executor memory, the reason this API is the
    production choice for large keyspaces.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import LongType, StructField, StructType

    if not tws_available():
        raise ImportError(
            "tws_running_totals needs google.protobuf (the "
            "transformWithStateInPandas driver-worker protocol); it is "
            "not installed in this environment. Use "
            "streaming.windows.stateful_running_totals "
            "(applyInPandasWithState) instead."
        )

    out_schema = StructType(
        [
            StructField(key_col, LongType()),
            StructField("n", LongType()),
            StructField("total_cents", LongType()),
        ]
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals",
                StructType(
                    [
                        StructField("n", LongType()),
                        StructField("cents", LongType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timer_values):
            n, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf[cents_col].sum())
            self._state.update((n, cents))
            yield pd.DataFrame(
                {key_col: [key[0]], "n": [n], "total_cents": [cents]}
            )

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        _Totals(), outputStructType=out_schema, outputMode="Update", timeMode="None"
    )
