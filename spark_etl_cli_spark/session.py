"""SparkSession construction with scale-aware defaults.

The reference builds its session by folding in every registered
connector's extra Spark confs before ``getOrCreate`` (reference
``etl/src/main/scala/dev/mauch/spark/dfio/ETL.scala:110-117``). We do
the same: :func:`get_spark` merges base confs, connector-contributed
confs from the registry, and caller overrides.

Defaults are tuned for correctness-at-scale first:

- AQE on (runtime coalescing, skew-join splitting) so plans adapt when
  the same code runs at 100 TB instead of sf0.01.
- ``spark.sql.shuffle.partitions`` defaults to ~2x local cores; on a
  real cluster AQE's coalescing makes the initial number forgiving.
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle (and are deterministic across clusters).
- Arrow enabled for any Pandas-UDF path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


BASE_CONFS: dict[str, str] = {
    # In local mode the driver JVM hosts every executor thread; the 1g
    # default thrashes GC with 32 cores of Tungsten pages (observed:
    # GCLocker retries + TaskMemoryManager allocation failures turning
    # a 2 s scan into 30 s+). Sized for the test box; on a real cluster
    # this is a no-op for executors, which get their own sizing.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast threshold: 64 MB. Dimension tables (region/nation and
    # most computed aggregates) stay broadcastable even at large SF.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    # TIMESTAMP(NANOS) parquet columns (the synthetic events table's
    # older generations) are rejected by the vectorized reader unless
    # surfaced as LONG nanoseconds. Session-build conf, not a per-read
    # mutation: runtime-settable, but setting it inside a source's
    # read() mutated shared session state as a side effect.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Let Python DataSources (the Arrow IPC connector) receive pushed
    # filters via DataSourceReader.pushFilters (Spark 4.1).
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": str(max(default_parallelism(), 8)),
    # A long-lived session serving many DISTINCT plan shapes (an app
    # running hundreds of registered queries, a multi-tenant driver, a
    # Thrift server) cycles far more generated classes than the
    # 100-entry Janino class cache holds: every eviction re-compiles
    # the class AND discards its C2-compiled machine code, so heavy
    # plan shapes (stream-stream joins, wide HOF pipelines) never stay
    # warm. Measured on the 208-query suite: stream-stream joins pinned
    # at 3-4x their isolated time (q53 11.7 s vs 3.0 s) until the cache
    # was sized to the working set. Entries are compiled classes
    # (metaspace, unbounded by default) — thousands are cheap.
    "spark.sql.codegen.cache.maxEntries": "10000",
    # The JVM code cache (240 MB default) is the same story one level
    # down: once full, the JIT flushes cold compiled methods, and the
    # flushed ones are exactly the big per-plan generated methods.
    # 1 GB keeps every plan's machine code resident. Driver-side only
    # matters in local mode; on a cluster pass the same flag via
    # spark.executor.extraJavaOptions.
    "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g",
}

# Streaming state-store posture for 100 TB: the default HDFS-backed
# provider keeps every key in executor heap — large stateful shapes
# (stream-stream outer joins, dropDuplicates over wide watermarks,
# flatMapGroupsWithState sessionization; the q53/q55/q148 families)
# eventually OOM or GC-thrash. RocksDB spills state to local disk with
# incremental checkpointing, which is the documented production choice
# for state past a few GB per executor. Opt-in (not default) because
# tiny local state is faster on-heap and test boxes value startup time:
#   get_spark(extra_confs=rocksdb_state_confs())   or
#   SPARK_GRAFT_ROCKSDB_STATE=1 in the environment.
ROCKSDB_STATE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def rocksdb_state_confs() -> dict[str, str]:
    return {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_STATE_PROVIDER,
        # changelog checkpointing uploads deltas, not full snapshots —
        # the at-scale default pairing for RocksDB state
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing"
        ".enabled": "true",
    }


def get_spark(
    app_name: str = "spark_etl_cli_spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``extra_confs`` (e.g. connector-contributed confs such as Delta's
    SQL extension) override the base confs; an already-active session is
    reused as-is, matching ``getOrCreate`` semantics.
    """
    master = master or f"local[{default_parallelism()}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(BASE_CONFS)
    if os.environ.get("SPARK_GRAFT_ROCKSDB_STATE", "").lower() in (
        "1", "true", "yes",
    ):
        confs.update(rocksdb_state_confs())
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
