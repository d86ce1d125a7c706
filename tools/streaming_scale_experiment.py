"""Structured-Streaming throughput probe: sustained rows/s for the
stateful streaming operators against the built-in ``rate`` source.

Probes (each run separately for ``duration_s`` seconds, noop sink,
steady-state = progress entries after the first two micro-batches):

- **exactly-once dedup** (`streaming.dedup.dedup_stream`): keys collide
  2:1 so half the input is re-delivery; state is bounded by the
  watermark horizon, which is the property that matters at scale — a
  constant-rate stream must reach a constant-size state plateau.
- **tumbling windowed aggregation** (`streaming.windows.
  streaming_windowed_counts`): low-cardinality keys × 10 s windows —
  the partial-agg shuffle path.

Rate-source rows become events: user-scale key domain, 6 event types,
cents-exact values — the same shape as the batch `events` table.

Run: python tools/streaming_scale_experiment.py [rows_per_sec] [duration_s]
(one JSON line).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mbai_gdb_spark.session import get_spark
from mbai_gdb_spark.streaming.dedup import dedup_stream
from mbai_gdb_spark.streaming.windows import streaming_windowed_counts


def _rate_events(spark, rows_per_sec: int):
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_sec))
        .option("numPartitions", "8")
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 2_000_000).alias("event_id"),  # 2:1 re-delivery
            (F.col("value") % 50_000).alias("user_id"),
            F.concat(F.lit("type_"), (F.col("value") % 6).cast("string")).alias(
                "event_type"
            ),
            ((F.col("value") % 1000) / 10.0).alias("value"),
        )
    )


def _drain(stream_df, name: str, duration_s: int) -> dict:
    q = (
        stream_df.writeStream.format("noop")
        .queryName(name)
        .option("checkpointLocation", f"/tmp/stream_probe_ckpt_{name}")
        .outputMode("update")
        .start()
    )
    time.sleep(duration_s)
    progress = [p for p in q.recentProgress]
    q.stop()
    q.awaitTermination(30)
    steady = progress[2:] or progress  # skip warm-up batches
    rates = [p["processedRowsPerSecond"] for p in steady if p["numInputRows"] > 0]
    durs = [p["batchDuration"] for p in steady if p["numInputRows"] > 0]
    rows = sum(p["numInputRows"] for p in progress)
    state = [
        op.get("numRowsTotal", 0)
        for p in steady
        for op in p.get("stateOperators", [])
    ]
    return {
        "rows_processed": rows,
        "mean_rows_per_sec": round(sum(rates) / len(rates)) if rates else None,
        "max_rows_per_sec": round(max(rates)) if rates else None,
        "max_batch_ms": max(durs) if durs else None,
        "final_state_rows": state[-1] if state else None,
        "max_state_rows": max(state) if state else None,
    }


def main() -> None:
    rows_per_sec = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    duration_s = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    import shutil

    for name in ("dedup", "winagg"):
        shutil.rmtree(f"/tmp/stream_probe_ckpt_{name}", ignore_errors=True)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    dedup = dedup_stream(
        _rate_events(spark, rows_per_sec), ["event_id"], ts="ts", watermark="10 seconds"
    )
    winagg = streaming_windowed_counts(
        _rate_events(spark, rows_per_sec),
        key="event_type",
        ts="ts",
        window="10 seconds",
        watermark="10 seconds",
    )

    out = {
        "experiment": "streaming_throughput",
        "rows_per_sec_offered": rows_per_sec,
        "duration_s": duration_s,
        "dedup": _drain(dedup, "dedup", duration_s),
        "windowed_agg": _drain(winagg, "winagg", duration_s),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
