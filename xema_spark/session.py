"""SparkSession builder tuned for the validation engine.

Local-mode testing uses local[N]; the same configs are what we would ship to
a real cluster via spark-submit (see runner.py). Scale-relevant choices:

- AQE on (runtime coalesce + skew-join splitting backstops our explicit
  salting of hot keys).
- shuffle.partitions sized to cores locally; on a 1000-executor cluster this
  is overridden to ~2-3x total cores by the submitter.
- ANSI off for engine-owned sessions: a validation engine must map malformed
  casts to verdicts, not exceptions. All query-surface code additionally uses
  try_cast/try_to_date/try_to_timestamp so it stays correct under a
  driver-owned ANSI-on session too.
- Arrow enabled: every JVM<->Python crossing is batch-columnar.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "xema_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 4)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("XEMA_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dio.netty.tryReflectionSetAccessible=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
