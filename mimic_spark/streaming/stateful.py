"""Custom stateful streaming operator: per-conversation progress tracking.

Demonstrates the third streaming primitive the engine offers beyond
foreachBatch-MERGE and windowed rollups: arbitrary keyed state via
``applyInPandasWithState`` (Arrow-batched — the state function sees pandas
DataFrames, never per-row Python).

State per conv_id: number of change events seen, distinct-turn estimate,
max LSN, last event time.  Each micro-batch emits the updated row per
conversation touched (output mode "update").  This is the streaming
generalization of the reference's per-unit row-count metrics
(test/qa/metric_total_row_count.sql) — continuously maintained instead of
recomputed per run.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("max_lsn", T.LongType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
        T.StructField("n_deletes", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("max_lsn", T.LongType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
        T.StructField("n_deletes", T.LongType(), False),
    ]
)


def _update_conv(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n_events, max_lsn, last_ts, n_deletes = state.get
    else:
        n_events, max_lsn, last_ts, n_deletes = 0, None, None, 0
    for pdf in pdfs:
        n_events += len(pdf)
        n_deletes += int((pdf["op"] == "delete").sum())
        batch_max = int(pdf["lsn"].max())
        max_lsn = batch_max if max_lsn is None else max(max_lsn, batch_max)
        ts_max = pdf["ts"].max()
        last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    state.update((n_events, max_lsn, last_ts, n_deletes))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_events": [n_events],
            "max_lsn": [max_lsn],
            "last_ts": [last_ts],
            "n_deletes": [n_deletes],
        }
    )


def conversation_progress(changelog_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-conversation progress (update mode)."""
    return changelog_stream.groupBy("conv_id").applyInPandasWithState(
        _update_conv,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
