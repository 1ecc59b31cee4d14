"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "nativeextractor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", None)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif SparkSession.getActiveSession() is None:
        builder = builder.master(f"local[{cpus}]")
    # local mode: the driver JVM IS the executor — Spark's 1g default heap
    # OOMs wide-row operators at local[32], and r7 measured 8g (250 MB/core
    # at 32 threads) tipping over from cumulative staged-block pressure in
    # long suites. Budget 1 GB/core (what a real executor would get) but
    # never more than half of physical RAM (ADVICE r7 #3: a flat 32g on a
    # <32 GB host would swap/OOM-kill instead of GC'ing earlier). On the
    # 32-core/128 GB bench box this resolves to the same 32g as before.
    # Honored only by the process's FIRST session (JVM flag); override via
    # SPARK_GRAFT_MEM.
    try:
        ram_gb = (
            os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        ) // (1024**3)
    except (ValueError, OSError):  # platform without sysconf
        ram_gb = 0
    heap_gb = max(min(cpus, ram_gb // 2 if ram_gb else cpus), 2)
    conf = {
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_MEM", f"{heap_gb}g"),
        # AQE: runtime coalescing + skew-join splitting
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions or max(cpus, 8)),
        # Arrow batches are the unit of kernel work (reference `next(batch)`)
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
        "spark.sql.session.timeZone": "UTC",
    }
    conf.update(extra_conf or {})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
