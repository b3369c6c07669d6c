#!/usr/bin/env python
"""Decompose the streaming queries' availableNow fixed cost (r10
VERDICT item 8): how much of q53/q120/q148-family time is epoch
machinery vs state-store work vs the query's own computation.

Ladder (each timed min-of-2 in one warm session):
  A. batch read of events.parquet (scan cost floor)
  B. stateless stream: readStream -> select -> memory sink,
     availableNow (epoch + source-listing + sink cost, NO state)
  C. stateful minimal: 1h tumbling window count (adds state-store
     init + per-partition commits)
  D. q53_stream_interval_join (the heaviest stream query)

Also re-times C with the state checkpoint on /dev/shm to separate
checkpoint-file fsync cost from compute.

Usage: python scripts/stream_fixed_cost.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import pyspark.sql.functions as F

    from spark_etl_cli_spark.plans.registry import QUERIES
    from spark_etl_cli_spark.plans import all_queries  # noqa: F401
    from spark_etl_cli_spark.plans.streamops import (
        run_to_table,
        stream_events,
    )
    from spark_etl_cli_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="stream_fixed_cost")
    spark.read.parquet(f"{sf_dir}/events.parquet").count()  # warm scan

    def timed(label, fn, n=2):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"{label:<52}{best:7.3f} s")
        return best

    timed(
        "A. batch scan+count events.parquet",
        lambda: spark.read.parquet(f"{sf_dir}/events.parquet").count(),
    )

    seq = [0]

    def stateless():
        seq[0] += 1
        df = stream_events(spark, sf_dir).select("event_id", "value")
        run_to_table(df, f"__fc_stateless_{seq[0]}", "append")

    timed("B. stateless stream (epoch+source+memory sink)", stateless)

    def stateful():
        seq[0] += 1
        df = (
            stream_events(spark, sf_dir)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"))
            .count()
        )
        run_to_table(df, f"__fc_stateful_{seq[0]}", "append")

    timed("C. stateful stream (window count, 8 partitions)", stateful)

    ckpt = "/dev/shm/fc_ckpt"

    def stateful_shm():
        seq[0] += 1
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
        df = (
            stream_events(spark, sf_dir)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"))
            .count()
        )
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                df.writeStream.format("memory")
                .queryName(f"__fc_shm_{seq[0]}")
                .outputMode("append")
                .option("checkpointLocation", f"{ckpt}/{seq[0]}")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    timed("C'. same with checkpoint on /dev/shm", stateful_shm)

    for name in (
        "q53_stream_interval_join",
        "q120_stream_dedup_within_watermark",
        "q148_stream_outer_join",
    ):
        fn = QUERIES[name]
        timed(
            f"D. {name} (full)",
            lambda fn=fn: fn(spark, sf_dir).write.format("noop")
            .mode("overwrite")
            .save(),
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
