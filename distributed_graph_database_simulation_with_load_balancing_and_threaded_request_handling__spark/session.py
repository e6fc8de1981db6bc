"""SparkSession construction with scale-appropriate defaults.

Local testing runs on ``local[N]``; the same config block is what we
would ship to a 1000-executor cluster (AQE, skew-join handling,
partition coalescing are cluster-critical, harmless locally).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

def get_spark(app_name: str = "graphdb-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the engine.

    Settings rationale (100 TB posture):
    - AQE on: runtime coalescing of shuffle partitions + skew-join
      splitting; essential for iterative BFS where frontier sizes vary
      by orders of magnitude between levels.
    - shuffle.partitions: a fixed starting point; AQE coalesces down.
      On a real cluster this would be ~2-3x total cores.
    - Arrow enabled: every Pandas-UDF extension operator (minhash,
      multimodal decode) rides Arrow batches, never per-row pickling.
    - maxPartitionBytes 128m: keeps scan partitions executor-memory
      sized at any input scale.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
