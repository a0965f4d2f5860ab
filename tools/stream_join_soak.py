#!/usr/bin/env python
"""Stream-stream join state soak (VERDICT r13 item 8): measure the
view→purchase attribution join's STATE SIZE and wall as a function of the
watermark delay, for both the inner and the left-outer (abandonment)
variant, on the sf0.1 events feed drained as file-source micro-batches.

What the numbers must show (the design claim in streaming/joins.py):

- join state is bounded by the watermark horizon — a larger watermark
  delay buffers proportionally more rows, and the operator never holds
  stream-lifetime state;
- the left-outer variant carries the SAME state bound as inner (the
  buffered view rows ARE the state; outer only changes when they are
  emitted, not how long they are held);
- left-outer emits exactly one null row per never-converting view, so
  out_rows(leftOuter) - out_rows(inner) == number of abandoned views,
  independent of the watermark.

Method: split sf0.1 events into N_SPLITS parquet files (maxFilesPerTrigger=1
→ N_SPLITS micro-batches so the watermark actually advances mid-stream),
drain availableNow into a memory sink, and read the peak
``stateOperators[].numRowsTotal`` from the query's recentProgress — the
executor-reported state-row census, not an estimate.

Prints one JSON document; evidence lands in SCALE.md §20.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_SPLITS = int(os.environ.get("STREAM_BENCH_SPLITS", "20"))
# Override for focused sweeps, e.g. STREAM_JOIN_WATERMARKS="4 hours" with
# varying STREAM_BENCH_SPLITS isolates the micro-batch-granularity state
# floor from the watermark-proportional component.
WATERMARKS = tuple(
    w.strip()
    for w in os.environ.get(
        "STREAM_JOIN_WATERMARKS", "40 minutes,4 hours,24 hours"
    ).split(",")
)


def main() -> None:
    from pyspark.sql import functions as F

    from walmart_e_commerce_sales_data_pipeline_spark.session import get_spark
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        read_events_stream,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.joins import (
        attribution_join,
    )

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    staging = tempfile.mkdtemp(prefix="stream_join_soak_")
    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # Order-preserving split: sort by ts so micro-batches arrive roughly in
    # event-time order and the watermark advances monotonically — the
    # production arrival shape; a random split would hold everything in
    # state until the final batch and measure nothing but the corpus size.
    # The file source admits files OLDEST-MTIME-FIRST, and a single parallel
    # write job finishes its part files in task-completion order — which is
    # NOT ts order, so the watermark would leap ahead on an early late-data
    # file and silently drop most rows as late (measured: 2.9k of 19.9k
    # views emitted).  Write the ts-ranges SEQUENTIALLY so mtime order ==
    # event-time order — the production arrival shape this soak models.
    from pyspark.sql import Window

    parts = src.withColumn(
        "part", F.ntile(N_SPLITS).over(Window.orderBy("ts"))
    ).persist()
    for i in range(1, N_SPLITS + 1):
        (
            parts.filter(F.col("part") == i)
            .drop("part")
            .coalesce(1)
            .write.mode("append")
            .parquet(staging)
        )
    parts.unpersist()
    n_events = src.count()

    def drain(how: str, watermark: str) -> dict:
        stream = read_events_stream(spark, staging)
        views = stream.filter(F.col("event_type") == "view")
        buys = stream.filter(F.col("event_type") == "purchase")
        sink = f"sjs_{how}_{watermark.replace(' ', '_')}"
        t0 = time.perf_counter()
        q = (
            attribution_join(views, buys, watermark=watermark, how=how)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        peak_state = 0
        for p in q.recentProgress:
            for so in p.get("stateOperators", []):
                peak_state = max(peak_state, so.get("numRowsTotal", 0))
        out_rows = spark.table(sink).count()
        nulls = (
            spark.table(sink).filter("purchase_id IS NULL").count()
            if how == "leftOuter"
            else 0
        )
        batches = q.lastProgress["batchId"] + 1 if q.lastProgress else None
        q.stop()
        return {
            "sec": round(wall, 3),
            "peak_state_rows": peak_state,
            "out_rows": out_rows,
            "null_rows": nulls,
            "micro_batches": batches,
        }

    report: dict = {"n_events": n_events, "n_splits": N_SPLITS}
    for wm in WATERMARKS:
        report[wm] = {
            "inner": drain("inner", wm),
            "leftOuter": drain("leftOuter", wm),
        }
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
