"""Source/sink adapters.

The production shape (BASELINE.json north_rule) is an Iceberg table; this
sandbox has no Iceberg runtime jar, so `load_table` resolves in order:
explicit scheme -> Iceberg catalog table (if the runtime is on the
classpath) -> parquet path. Everything downstream is format-agnostic
(plain DataFrames), and Iceberg-only features degrade explicitly:

- snapshot/time-travel reads -> `snapshot_id`/`as_of` kwargs (Iceberg only)
- partition pruning: the runner's bucket column mirrors an Iceberg
  `bucket(N, doc_id)` partition transform, so on a real Iceberg table the
  resume anti-join prunes files instead of filtering rows.

Cf. the reference's only I/O surface, the remote schema loader behaviour
(/root/reference/lib/xema/loader.ex:9-15) — data I/O has no reference
analogue and is Spark-native by design.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def load_table(spark: SparkSession, uri: str,
               snapshot_id: int | None = None,
               as_of: str | None = None) -> DataFrame:
    """Load `iceberg:<catalog.table>`, `parquet:<path>`, a bare Iceberg table
    name (when the runtime is present), or a bare parquet path."""
    if uri.startswith("iceberg:"):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of is not None:
            reader = reader.option("as-of-timestamp", as_of)
        return reader.load(uri[len("iceberg:"):])
    if uri.startswith("parquet:"):
        return spark.read.parquet(uri[len("parquet:"):])
    if uri.startswith("jsonl:") or uri.startswith("json:"):
        # newline-delimited JSON — schema inference scans once; pass an
        # explicit schema at scale via spark.read.schema(...).json yourself
        return spark.read.json(uri.partition(":")[2])
    if uri.startswith("csv:"):
        return spark.read.options(header=True, inferSchema=True) \
            .csv(uri[len("csv:"):])
    if snapshot_id is not None or as_of is not None:
        raise ValueError("snapshot reads require an iceberg: uri")
    # a slash-free name that exists on the local filesystem is a relative
    # parquet directory (e.g. `--input docs` run next to docs/), not a
    # catalog table — only genuinely path-less names route to Iceberg.
    # Absolutize against the PYTHON cwd: the driver JVM may have been
    # launched from a different directory, and bare relative paths would
    # otherwise resolve against the JVM's cwd
    if "/" not in uri and os.path.exists(uri):
        return spark.read.parquet(os.path.abspath(uri))
    if iceberg_available(spark) and "/" not in uri:
        return spark.read.format("iceberg").load(uri)
    return spark.read.parquet(uri)


def write_table(df: DataFrame, uri: str, mode: str = "append",
                partition_by: list[str] | None = None) -> None:
    """Write to `iceberg:<table>` (writeTo API) or a parquet path."""
    if uri.startswith("iceberg:"):
        w = df.writeTo(uri[len("iceberg:"):])
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    path = uri[len("parquet:"):] if uri.startswith("parquet:") else uri
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
