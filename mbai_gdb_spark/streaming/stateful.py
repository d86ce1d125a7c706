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


# ---------------------------------------------------------------------------
# Streaming heavy hitters: Misra-Gries summaries as bounded group state
# ---------------------------------------------------------------------------

MG_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("value", T.LongType()),
        T.StructField("mg_count", T.LongType()),
    ]
)

_MG_STATE_SCHEMA = T.StructType(
    [
        T.StructField("vals", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ]
)


def _mg_fold(counters: dict[int, int], values, capacity: int) -> None:
    """Classic Misra-Gries fold: at most ``capacity`` counters; when a
    new value arrives with the table full, ALL counters decrement (and
    zeroed ones drop) instead of admitting it."""
    for v in values:
        v = int(v)
        if v in counters:
            counters[v] += 1
        elif len(counters) < capacity:
            counters[v] = 1
        else:
            dead = []
            for k in counters:
                counters[k] -= 1
                if counters[k] == 0:
                    dead.append(k)
            for k in dead:
                del counters[k]


def make_mg_update(capacity: int):
    """Build the applyInPandasWithState update function for a given
    counter capacity (state per shard: two parallel long arrays)."""

    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            vals, counts = state.get
            counters = dict(zip(vals, counts))
        else:
            counters = {}
        for pdf in pdfs:
            _mg_fold(counters, pdf["value"].to_numpy(), capacity)
        items = sorted(counters.items())
        state.update((list(k for k, _ in items), list(c for _, c in items)))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(items),
                "value": [k for k, _ in items],
                "mg_count": [c for _, c in items],
            }
        )

    return _update


def streaming_heavy_hitters(
    events: DataFrame, shard_col: str, value_col: str, capacity: int = 8
) -> DataFrame:
    """Misra-Gries frequent-items summaries maintained across
    micro-batches: per shard, at most ``capacity`` counters of state
    however long the stream runs, with the MG guarantee that any value
    whose true frequency exceeds n/(capacity+1) is in the table and its
    count is under-estimated by at most n/(capacity+1).

    The streaming twin of ops.sketch.heavy_hitters' candidate phase:
    run the exact recount over the emitted candidates (batch, or a
    second keyed aggregation) when exact figures are needed.  Output
    mode is "update" — each micro-batch re-emits the shard's current
    table.
    """
    src = events.select(
        F.col(shard_col).cast("long").alias("shard"),
        F.col(value_col).cast("long").alias("value"),
    )
    return src.groupBy("shard").applyInPandasWithState(
        make_mg_update(capacity),
        outputStructType=MG_SCHEMA,
        stateStructType=_MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_heavy_hitters_available_now(
    spark,
    source_dir: str,
    schema,
    shard_col: str,
    value_col: str,
    capacity: int = 8,
    max_files_per_trigger: int = 1,
) -> dict[int, dict[int, int]]:
    """Test/driver harness: drain a parquet directory one file per
    micro-batch through :func:`streaming_heavy_hitters` and return the
    FINAL MG table per shard ({shard: {value: mg_count}}).  'update'
    mode re-emits a shard's whole table each batch it appears in, so
    the final table is the shard's last emission."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    hh = streaming_heavy_hitters(stream, shard_col, value_col, capacity)
    final: dict[int, dict[int, int]] = {}

    def _sink(df, _epoch_id):
        batch: dict[int, dict[int, int]] = {}
        for r in df.collect():
            batch.setdefault(r.shard, {})[r.value] = r.mg_count
        final.update(batch)  # shards emitted this batch replace wholesale

    q = (
        hh.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return final
