"""Custom stateful streaming operator via applyInPandasWithState.

Running per-key totals across micro-batches — the canonical custom
stateful kernel (north star: 'applyInPandasWithState for custom
stateful operators'). State = (count, sum) per event_type; each
micro-batch folds its rows into the state and emits the running
totals, exactly-once per batch.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("running_count", T.LongType()),
        T.StructField("running_sum", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("cnt", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    cnt, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        cnt += len(pdf)
        total += float(pdf["value"].sum())
    state.update((cnt, total))
    yield pd.DataFrame(
        {"event_type": [key[0]], "running_count": [cnt], "running_sum": [round(total, 6)]}
    )


def running_totals_stream(events_stream: DataFrame):
    """events readStream → stateful running totals per event_type.
    Returns the (unstarted) streaming DataFrame; attach a sink to run."""
    return events_stream.groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_batch(events: DataFrame) -> DataFrame:
    """Batch oracle for the final state after all rows are processed."""
    from pyspark.sql import functions as F

    return events.groupBy("event_type").agg(
        F.count("*").alias("running_count"), F.round(F.sum("value"), 6).alias("running_sum")
    )
