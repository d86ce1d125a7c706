"""Arbitrary stateful streaming operators (applyInPandasWithState).

The lineup-reconstruction kernel (W11) is the reference's one stateful
computation; batch runs it as applyInPandas.  A live feed needs the same
pattern with state that SURVIVES across micro-batches — Spark's
``applyInPandasWithState``: state keyed by the group, watermark-driven
timeouts, exactly-once with checkpointing.

``stateful_running_totals`` is that pattern distilled: per-key cumulative
count/sum maintained across micro-batches (the reference's running score
accumulator, W8, in streaming form).  The lineup engine drops into the
same skeleton with the 5-man set as state.

Scale notes: state lives in the state store partitioned by key — the
same (game_id, team_id)/user_id keying as batch; watermarks bound state
for keys that go quiet.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTAL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _update_totals(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # Round per ROW before summing (the queries.py fixed-point
        # convention): rounding a float batch-sum once per micro-batch
        # would make the running total depend on trigger boundaries.
        # HALF_UP away from zero to match Spark's F.round — pandas'
        # .round() is half-even and would drift from the batch totals
        # on exact half-cent values.
        v = (pdf["value"] * 100).to_numpy()
        cents += int(np.copysign(np.floor(np.abs(v) + 0.5), v).sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value_cents": [cents]}
    )


def stateful_running_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, value) across micro-batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=RUNNING_TOTAL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_totals_available_now(
    spark, source_dir: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """Drain a parquet directory one file per micro-batch so state is
    exercised ACROSS batches; return the final per-user totals."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    totals = stateful_running_totals(stream)
    q = (
        totals.writeStream.format("memory")
        .queryName("stateful_totals_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # 'update' emits one row per key per batch — the final state per key
    # is the last emission; collapse via max(n_events) (monotone).
    sink = spark.table("stateful_totals_sink")
    return sink.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value_cents", "n_events").alias("total_value_cents"),
    )
