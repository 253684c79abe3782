"""Single-pass validation job: the engine's production entrypoint.

North-rule architecture (BASELINE.json): ONE scan of the (up to 10^12-doc)
documents table computes, in a single projection:

    bucket      = pmod(xxhash64(doc_id), n_buckets)   -- explicit partitioning
    valid       = compiled rule verdict (Column tree)
    violations  = compiled violations array
    media_refs  = spans.media_ref (for the referential check)
    n_bytes     = approximate payload bytes (for the metrics sidecar)

and writes a compact per-row verdict table partitioned by bucket. Everything
downstream (per-bucket summaries, exploded violation rows, uniqueness,
referential anti-join, the lineage sidecar) reads the verdict table — which
is orders of magnitude smaller than the input (no span text) — so the 100TB
side is scanned exactly once.

Checkpoint/resume is at bucket granularity: the lineage sidecar records one
row per completed bucket; a resumed run anti-joins the completed bucket set
and scans only the remainder (the reference has no analogue — its only I/O
is a schema fetch, /root/reference/lib/xema/loader.ex:9-15 — this operator
exists for the 10^12-doc shape).

Skew: hot doc_ids don't exist (ids are unique-ish) but hot media_refs do;
the referential check broadcasts the asset dimension (no shuffle of the big
side) or salts the dim when it's too big to broadcast (stats.py).

Run via spark-submit:
    spark-submit --py-files xema_spark.zip -m xema_spark.runner \
        --input s3://.../documents --assets s3://.../assets --output .../out
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

if __package__ in (None, ""):  # executed as a script (spark-submit runner.py)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xema_spark.compiler import compile_rule
from xema_spark.rules import meta_validate, normalize_rule


def _completed_buckets(spark: SparkSession, lineage_dir: str) -> set[int]:
    try:
        rows = spark.read.parquet(lineage_dir).select("bucket").distinct().collect()
        return {r["bucket"] for r in rows}
    except Exception:
        return set()


def run_validation(
    spark: SparkSession,
    docs: DataFrame,
    rule: dict,
    output_dir: str,
    assets: DataFrame | None = None,
    n_buckets: int = 64,
    resume: bool = True,
    run_id: str | None = None,
) -> dict:
    """Execute the single-pass job; returns the metrics dict that is also
    persisted to the lineage sidecar. Idempotent under resume."""
    rule = normalize_rule(rule)
    meta_validate(rule)
    verdict_dir = os.path.join(output_dir, "verdicts")
    violation_dir = os.path.join(output_dir, "violations")
    lineage_dir = os.path.join(output_dir, "lineage")  # doubles as per-bucket summary
    run_id = run_id or time.strftime("%Y%m%dT%H%M%S")

    done = _completed_buckets(spark, lineage_dir) if resume else set()

    from pyspark.sql import types as T
    dtype = T.StructType([T.StructField(f.name, f.dataType) for f in docs.schema.fields])
    col = F.struct(*[F.col(c) for c in docs.columns])
    compiled = compile_rule(rule, col, dtype)

    bucket = F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    has_spans = "spans" in docs.columns
    media_refs = (
        F.filter(F.col("spans.media_ref"), lambda x: x.isNotNull())
        if has_spans else F.array().cast("array<string>")
    )
    n_bytes = (
        F.coalesce(F.aggregate(F.col("spans"),
                               F.lit(0).cast("long"),
                               lambda acc, s: acc + F.coalesce(F.length(s["text"]).cast("long"), F.lit(0))
                               + F.coalesce(F.length(s["media_ref"]).cast("long"), F.lit(0)) + F.lit(16)),
                   F.lit(0))
        if has_spans else F.lit(0).cast("long")
    )

    enriched = docs.select(
        F.col("doc_id"),
        bucket.alias("bucket"),
        compiled.valid.alias("valid"),
        compiled.violations.alias("violations"),
        media_refs.alias("media_refs"),
        n_bytes.alias("n_bytes"),
    )
    if done:
        enriched = enriched.filter(~F.col("bucket").isin(*[int(b) for b in done]))

    t0 = time.time()
    # THE single pass over the input: everything else reads this compact
    # table. The explicit repartition on the doc_id-hash bucket (north_star)
    # happens AFTER the projection dropped the heavy spans column, so the
    # shuffle moves only (doc_id, verdict, violations, refs) — and the write
    # emits one file per bucket instead of n_input_partitions x n_buckets.
    # df.observe collects this run's global counters DURING the write action
    # (zero extra scans — the Spark-native single-pass metric channel).
    from pyspark.sql import Observation

    obs = Observation(f"xema_scan_{run_id}")
    (enriched.observe(obs,
                      F.count(F.lit(1)).alias("rows"),
                      F.sum(F.col("valid").cast("long")).alias("valid"),
                      F.sum(F.size("violations").cast("long")).alias("violations"))
     .repartition(n_buckets, "bucket")
     .write.mode("append").partitionBy("bucket").parquet(verdict_dir))
    scan_elapsed = time.time() - t0
    scan_obs = obs.get

    verdicts = spark.read.parquet(verdict_dir)

    # Exploded violation rows (overwritten from the compact table — cheap).
    viols = (verdicts.filter(F.size("violations") > 0)
             .select("doc_id", "bucket", F.explode("violations").alias("v"))
             .select("doc_id", "bucket", "v.path", "v.keyword", "v.message"))
    viols.write.mode("overwrite").parquet(violation_dir)

    # Per-bucket summary == per-partition pass/fail table == the lineage
    # sidecar rows for THIS run (one write serves both consumers; the
    # summary of completed buckets never changes, so the union of lineage
    # appends IS the full summary).
    new_summary = (verdicts.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("valid").cast("long")).alias("n_valid"),
        F.sum(F.size("violations").cast("long")).alias("n_violations"),
        F.sum("n_bytes").alias("n_bytes"),
    ))
    if done:
        new_summary = new_summary.filter(~F.col("bucket").isin(*[int(b) for b in done]))
    # materialize the (<= n_buckets)-row summary ONCE: it feeds the lineage
    # write AND the global totals, so no read-back aggregation job is needed
    summary_rows = new_summary.collect()
    lineage = spark.createDataFrame(summary_rows, new_summary.schema).select(
        "bucket", "n_rows", "n_valid", "n_violations", "n_bytes",
        F.lit(run_id).alias("run_id"),
        F.lit(float(scan_elapsed)).alias("scan_elapsed_sec"),
    ).coalesce(1)
    lineage.write.mode("append").parquet(lineage_dir)

    metrics: dict = {
        "run_id": run_id,
        "n_buckets": n_buckets,
        "resumed_buckets": len(done),
        "scan_elapsed_sec": scan_elapsed,
        "scan_rows": scan_obs.get("rows", 0),
        "scan_valid": scan_obs.get("valid", 0),
        "scan_violations": scan_obs.get("violations", 0),
    }

    n_rows = sum(r["n_rows"] for r in summary_rows)
    n_valid = sum(r["n_valid"] for r in summary_rows)
    n_viol = sum(r["n_violations"] for r in summary_rows)
    if done:  # totals include previously-completed buckets from the sidecar
        prior = (spark.read.parquet(lineage_dir)
                 .filter(F.col("run_id") != run_id)
                 .agg(F.sum("n_rows"), F.sum("n_valid"), F.sum("n_violations")).head())
        n_rows += prior[0] or 0
        n_valid += prior[1] or 0
        n_viol += prior[2] or 0
    metrics.update(n_rows=n_rows, n_valid=n_valid, n_violations=n_viol)

    dup = (verdicts.groupBy("doc_id").count().filter("count > 1")
           .agg(F.count(F.lit(1)).alias("k"), F.sum("count").alias("r")).head())
    metrics.update(duplicate_doc_ids=dup["k"] or 0,
                   duplicate_rows=int(dup["r"] or 0))

    if assets is not None:
        refs = verdicts.select("doc_id", F.explode("media_refs").alias("media_ref"))
        dangling = refs.join(F.broadcast(assets.select("media_ref")), "media_ref", "left_anti")
        metrics["dangling_refs"] = dangling.count()

    with open(os.path.join(output_dir, f"metrics_{run_id}.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    return metrics


def main() -> None:
    """spark-submit entrypoint (north_rule: spark-submit --py-files)."""
    import argparse

    from xema_spark.datagen import FLAGSHIP_RULE
    from xema_spark.session import get_spark

    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents table path (parquet/iceberg)")
    p.add_argument("--assets", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--rule-json", default=None, help="path to JSON-Schema rule file")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args()

    spark = get_spark(app_name="xema_spark_runner")
    rule = FLAGSHIP_RULE
    if args.rule_json:
        with open(args.rule_json) as f:
            rule = json.load(f)
    docs = spark.read.parquet(args.input)
    assets = spark.read.parquet(args.assets) if args.assets else None
    metrics = run_validation(spark, docs, rule, args.output, assets=assets,
                             n_buckets=args.buckets, resume=not args.no_resume)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
