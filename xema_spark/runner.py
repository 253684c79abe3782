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

Checkpoint/resume is at bucket granularity and the lineage sidecar is the
COMMIT LOG: verdicts are written under verdicts/run_id=<id>/bucket=<b>/ and
a (run_id, bucket) pair becomes visible only once its lineage row lands.
If a run dies between the verdict write and the lineage append, the orphan
files are invisible to every consumer (read_verdicts semi-joins the lineage)
and the resumed run re-scans those buckets under a fresh run_id — resume is
idempotent without any rename/manifest machinery. A resumed run anti-joins
the committed bucket set and scans only the remainder (the reference has no
analogue — its only I/O is a schema fetch,
/root/reference/lib/xema/loader.ex:9-15 — this operator exists for the
10^12-doc shape).

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
from pyspark.errors import AnalysisException

if __package__ in (None, ""):  # executed as a script (spark-submit runner.py)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xema_spark.compiler import compile_rule
from xema_spark.rules import meta_validate, normalize_rule


class DriftGateError(RuntimeError):
    """run_validation(fail_on_drift=True) found drifted (column, metric)
    rows vs the baseline run. Raised after all outputs are persisted — the
    orchestrator halts, the forensic record stays."""


#: AnalysisException markers for "this parquet path was never written".
#: Shared by every sidecar read that must distinguish FIRST-RUN-EMPTY (fine)
#: from a transient read failure (must raise): treating an IO timeout as
#: "nothing committed yet" would re-commit work and double-count rows in
#: read_verdicts, the exact failure commit protocols exist to prevent.
MISSING_PATH_MARKERS = ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA",
                        "Path does not exist")


def is_missing_path(e: AnalysisException) -> bool:
    msg = str(e)
    return any(m in msg for m in MISSING_PATH_MARKERS)


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Scheme-agnostic existence probe (one NameNode/FS RPC, no Spark job)."""
    p = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def _completed_buckets(spark: SparkSession, lineage_dir: str) -> set[int]:
    try:
        rows = spark.read.parquet(lineage_dir).select("bucket").distinct().collect()
        return {r["bucket"] for r in rows}
    except AnalysisException as e:
        # no lineage yet = first run, nothing resumed. Any OTHER failure
        # must raise: an empty `done` on a transient error would re-scan and
        # re-commit every already-committed bucket under a new run_id, and
        # read_verdicts would then see every doc twice
        if is_missing_path(e):
            return set()
        raise


def read_verdicts(spark: SparkSession, output_dir: str) -> DataFrame:
    """Committed view of the verdict table: only (run_id, bucket) pairs
    recorded in the lineage sidecar are visible. Verdict files from a run
    that died between its verdict write and its lineage append (the crash
    window) are excluded, so re-scanned buckets never appear twice."""
    v = spark.read.parquet(os.path.join(output_dir, "verdicts"))
    lin = (spark.read.parquet(os.path.join(output_dir, "lineage"))
           .select("run_id", "bucket").distinct())
    return v.join(F.broadcast(lin), ["run_id", "bucket"], "left_semi")


def enrich_verdicts(docs: DataFrame, compiled, n_buckets: int) -> DataFrame:
    """The single-pass projection: compact verdict rows (doc_id, bucket,
    valid, violations, media_refs, n_bytes) from the raw documents frame.
    Shared by the batch runner and the streaming foreachBatch sink so both
    write the SAME verdict-table schema."""
    bucket = F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    has_spans = "spans" in docs.columns
    # array_compact / concat_ws instead of the lambda HOFs: ArrayFilter and
    # ArrayAggregate are CodegenFallback (interpreted per row); these run in
    # whole-stage codegen. concat_ws skips NULL elements, so its length is
    # exactly sum(length(non-null)) — measured ~0.9s/scan at the 2.4M-doc
    # bench shape, value-identical (guide §4.1: prefer built-ins).
    media_refs = (
        F.array_compact(F.col("spans.media_ref"))
        if has_spans else F.array().cast("array<string>")
    )
    n_bytes = (
        # explicit NULL-spans guard: size(NULL) is -1 in non-ANSI sessions,
        # which would leak -16 into the sum (the old aggregate() returned
        # NULL -> coalesce 0 there)
        F.when(F.col("spans").isNull(), F.lit(0).cast("long")).otherwise(
            F.coalesce(F.length(F.concat_ws("", F.col("spans.text")))
                       .cast("long"), F.lit(0))
            + F.coalesce(F.length(F.concat_ws("", F.col("spans.media_ref")))
                         .cast("long"), F.lit(0))
            + F.lit(16).cast("long") * F.size("spans"))
        if has_spans else F.lit(0).cast("long")
    )
    return docs.select(
        F.col("doc_id"),
        bucket.alias("bucket"),
        compiled.valid.alias("valid"),
        compiled.violations.alias("violations"),
        media_refs.alias("media_refs"),
        n_bytes.alias("n_bytes"),
    )


def _bucket_summary(this_run: DataFrame) -> DataFrame:
    """Per-bucket summary aggregate of one run's verdict rows — shared by
    commit_lineage and run_validation's fused summary+probe action."""
    return this_run.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("valid").cast("long")).alias("n_valid"),
        F.sum(F.size("violations").cast("long")).alias("n_violations"),
        F.sum("n_bytes").alias("n_bytes"),
    )


def _append_lineage_rows(spark: SparkSession, output_dir: str, run_id: str,
                         scan_elapsed: float, summary_rows: list) -> None:
    """Append the (<= n_buckets) summary rows to the lineage sidecar — the
    COMMIT that makes this run's (run_id, bucket) pairs visible. The rows
    are already on the driver, so this writes ONE parquet file driver-side
    (pyarrow) instead of scheduling a Spark job for a kilobyte of metadata
    — a commit log is driver-side work by nature (guide §5: the driver
    should do almost no DATA work; this is not data work). Falls back to a
    Spark write for non-local output dirs (s3://... paths)."""
    lineage_dir = os.path.join(output_dir, "lineage")
    rows = [{"bucket": int(r["bucket"]), "n_rows": int(r["n_rows"]),
             "n_valid": int(r["n_valid"]),
             "n_violations": int(r["n_violations"]),
             "n_bytes": int(r["n_bytes"]), "run_id": run_id,
             "scan_elapsed_sec": float(scan_elapsed)} for r in summary_rows]
    if "://" not in output_dir:
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(lineage_dir, exist_ok=True)
        table = pa.Table.from_pylist(rows, schema=pa.schema([
            ("bucket", pa.int32()), ("n_rows", pa.int64()),
            ("n_valid", pa.int64()), ("n_violations", pa.int64()),
            ("n_bytes", pa.int64()), ("run_id", pa.string()),
            ("scan_elapsed_sec", pa.float64())]))
        tmp = os.path.join(lineage_dir, f".part-{_uuid.uuid4().hex}.tmp")
        final = os.path.join(lineage_dir,
                             f"part-{_uuid.uuid4().hex}.snappy.parquet")
        pq.write_table(table, tmp, compression="snappy")
        os.rename(tmp, final)  # atomic on a local filesystem
        return
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("bucket", T.IntegerType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_valid", T.LongType()),
        T.StructField("n_violations", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("run_id", T.StringType()),
        T.StructField("scan_elapsed_sec", T.DoubleType())])
    (spark.createDataFrame([tuple(r.values()) for r in rows], schema)
     .coalesce(1).write.mode("append").parquet(lineage_dir))


def commit_lineage(spark: SparkSession, output_dir: str, run_id: str,
                   scan_elapsed: float, this_run: DataFrame | None = None) -> list:
    """Aggregate THIS run's verdict rows into per-bucket summary rows and
    append them to the lineage sidecar — the COMMIT that makes the run's
    (run_id, bucket) pairs visible to read_verdicts. Returns the summary
    rows (<= n_buckets of them) so callers can derive totals without a
    read-back job. Pass `this_run` (a frame already scoped to this run's
    rows, e.g. persisted) to aggregate from it instead of re-reading the
    verdict table — run_validation shares one cached read between the
    commit summary and the downstream consumers."""
    verdict_dir = os.path.join(output_dir, "verdicts")
    try:
        if this_run is None:
            this_run = spark.read.parquet(verdict_dir) \
                .filter(F.col("run_id") == run_id)
        summary_rows = _bucket_summary(this_run).collect()
    except AnalysisException as e:
        # zero-row run (empty corpus / empty micro-batch): the write left
        # only _SUCCESS (or nothing), there is nothing to commit and nothing
        # a consumer could see — an empty lineage is the correct record.
        # ONLY the missing-path / unreadable-empty-dir cases are swallowed;
        # any other read failure after a non-empty write must fail loudly,
        # or the written verdicts would be permanently orphaned (ADVICE r3)
        if is_missing_path(e):
            return []
        raise
    _append_lineage_rows(spark, output_dir, run_id, scan_elapsed,
                         summary_rows)
    return summary_rows


def run_validation(
    spark: SparkSession,
    docs: DataFrame,
    rule: dict,
    output_dir: str,
    assets: DataFrame | None = None,
    n_buckets: int = 64,
    resume: bool = True,
    run_id: str | None = None,
    profile_cols: list[str] | None = None,
    drift_baseline_run: str | None = None,
    fail_on_drift: bool = False,
    drift_exclude_metrics: tuple[str, ...] = (),
) -> dict:
    """Execute the single-pass job; returns the metrics dict that is also
    persisted to the lineage sidecar. Idempotent under resume.

    profile_cols: opt-in numeric-column profiling — ONE extra agg pass over
    the input writes a run_id-stamped stats_profile sidecar next to the
    lineage table. With drift_baseline_run set, the profile is additionally
    gated against that earlier run's sidecar via stats.drift_report; the
    per-(column, metric) verdict rows land in <output_dir>/drift/ and the
    drifted count in the metrics dict — the production loop is "each run
    profiles itself and gates against run N-1". fail_on_drift raises
    DriftGateError AFTER the verdicts, profile, and drift verdict rows are
    all persisted (an orchestrator halts the pipeline but keeps the full
    forensic record; the streaming sink's gate, by contrast, blocks the
    batch's commit itself — see streaming.commit_micro_batch)."""
    if fail_on_drift and not (profile_cols and drift_baseline_run):
        # fail CLOSED at call time: without these the gate could never fire
        # and fail_on_drift would be a silent no-op — the operator believes
        # the pipeline is protected when nothing is checked
        raise ValueError(
            "fail_on_drift=True requires both profile_cols and "
            "drift_baseline_run — without them the drift gate never "
            "evaluates and the flag would silently protect nothing")
    rule = normalize_rule(rule)
    meta_validate(rule)
    import uuid

    verdict_dir = os.path.join(output_dir, "verdicts")
    violation_dir = os.path.join(output_dir, "violations")
    lineage_dir = os.path.join(output_dir, "lineage")  # doubles as per-bucket summary
    # unique per attempt: two attempts in the same second must not share a
    # run_id, or an orphaned attempt would become visible via the other's
    # lineage row
    run_id = run_id or f"{time.strftime('%Y%m%dT%H%M%S')}-{uuid.uuid4().hex[:6]}"

    done = _completed_buckets(spark, lineage_dir) if resume else set()

    from pyspark.sql import types as T
    dtype = T.StructType([T.StructField(f.name, f.dataType) for f in docs.schema.fields])
    col = F.struct(*[F.col(c) for c in docs.columns])
    compiled = compile_rule(rule, col, dtype)

    enriched = enrich_verdicts(docs, compiled, n_buckets)
    # COVERAGE of this run's bucket range, not a count: the lineage sidecar
    # is run- and config-agnostic, so a directory holding buckets {4..9}
    # from a 16-bucket writer must NOT convince an n_buckets=4 run that its
    # own buckets 0-3 are done (len(done) >= n_buckets would)
    done = {int(b) for b in done}
    fully_resumed = set(range(n_buckets)) <= done
    if done and not fully_resumed:
        enriched = enriched.filter(~F.col("bucket").isin(*sorted(done)))

    t0 = time.time()
    # THE single pass over the input: everything else reads this compact
    # table. The explicit repartition on the doc_id-hash bucket (north_star)
    # happens AFTER the projection dropped the heavy spans column, so the
    # shuffle moves only (doc_id, verdict, violations, refs) — and the write
    # emits one file per bucket instead of n_input_partitions x n_buckets.
    # df.observe collects this run's global counters DURING the write action
    # (zero extra scans — the Spark-native single-pass metric channel).
    from pyspark.sql import Observation

    if fully_resumed:
        # every bucket already has a lineage row (this run's or another
        # writer's — streaming and batch share the sidecar): there is no
        # input left to scan, so skip the pass entirely instead of running
        # a zero-task write whose Observation would never fire (obs.get
        # asserts on an unmaterialized observation)
        scan_elapsed, scan_obs, summary_rows = 0.0, {}, []
        commit_elapsed = 0.0
        this_run = None
        has_prior = True
    else:
        obs = Observation(f"xema_scan_{run_id}")
        (enriched.observe(obs,
                          F.count(F.lit(1)).alias("rows"),
                          F.sum(F.col("valid").cast("long")).alias("valid"),
                          F.sum(F.size("violations").cast("long")).alias("violations"))
         .withColumn("run_id", F.lit(run_id))
         # 4x partitions for n_buckets distinct keys: hashing k keys into
         # exactly k partitions leaves ~e^-1 of them empty and the hottest
         # task carrying 3-4 buckets (measured maxload 4 at 64->64 vs 2 at
         # 64->256) — the write stage tail is the straggler (guide §2.5,
         # too few distinct values per partition). Each bucket still hashes
         # to exactly ONE task, so the one-file-per-bucket layout and the
         # resume contract are unchanged; empty tasks are free.
         .repartition(4 * n_buckets, "bucket")
         .write.mode("append").partitionBy("run_id", "bucket").parquet(verdict_dir))
        scan_elapsed = time.time() - t0
        scan_obs = obs.get
        # does any OTHER run's commit exist? One FS RPC — when it doesn't
        # (the common fresh-output case), the committed-view re-read, its
        # lineage broadcast and the union are skipped outright below
        has_prior = bool(done) or _path_exists(spark, lineage_dir)

    # Everything below reads the COMMITTED view (prior runs + this run's
    # just-written partition — consuming own rows pre-commit is safe: if
    # the lineage append fails, run_validation raises and nothing was
    # published). Cache the compact table once — it is ~1% of input size
    # by construction, exactly the table a production job keeps hot.
    t1 = time.time()
    if fully_resumed:
        cached = [verdicts := read_verdicts(spark, output_dir).persist()]
    elif has_prior:
        this_run = (spark.read.parquet(verdict_dir)
                    .filter(F.col("run_id") == run_id).persist())
        # persist the UNION too: both consumers (violations write + fused
        # probe) scan it, and without this the prior runs' half re-reads
        # parquet and re-runs the lineage semi-join per consumer
        verdicts = this_run.unionByName(
            read_verdicts(spark, output_dir)
            .filter(F.col("run_id") != run_id)).persist()
        cached = [this_run, verdicts]
    else:
        this_run = verdicts = (spark.read.parquet(verdict_dir)
                               .filter(F.col("run_id") == run_id).persist())
        cached = [this_run]

    # ONE action computes the per-bucket commit summary AND the uniqueness
    # + referential probes: all three reduce to at most n_buckets + 2 rows,
    # so a schema-harmonized unionByName + collect replaces three jobs.
    # Every extra action carries fixed scheduler/plan-build latency that is
    # identical at every parallelism level; at bench scale that constant
    # pollutes the N->4N end-to-end scaling figure (BENCH/BASELINE.md e2e
    # gate) — fewer actions = less level-independent constant (guide §1.2).
    # The commit (lineage append) happens right after, driver-side; the
    # crash window is unchanged (uncommitted verdict files stay invisible).
    parts = []
    if this_run is not None and not fully_resumed:
        parts.append(_bucket_summary(this_run).select(
            F.lit("bucket").alias("metric"),
            F.col("bucket").cast("long").alias("a"),
            F.col("n_rows").cast("long").alias("b"),
            F.col("n_valid").cast("long").alias("c"),
            F.col("n_violations").cast("long").alias("d"),
            F.col("n_bytes").cast("long").alias("e")))
    parts.append(
        verdicts.groupBy("doc_id").count().filter("count > 1")
        .agg(F.lit("uniqueness").alias("metric"),
             F.lit(None).cast("long").alias("a"),
             F.count(F.lit(1)).cast("long").alias("b"),
             F.sum("count").cast("long").alias("c"),
             F.lit(None).cast("long").alias("d"),
             F.lit(None).cast("long").alias("e")))
    if assets is not None:
        refs = verdicts.select(F.explode("media_refs").alias("media_ref"))
        parts.append(
            refs.join(F.broadcast(assets.select("media_ref")),
                      "media_ref", "left_anti")
            .agg(F.lit("referential").alias("metric"),
                 F.lit(None).cast("long").alias("a"),
                 F.count(F.lit(1)).cast("long").alias("b"),
                 F.lit(None).cast("long").alias("c"),
                 F.lit(None).cast("long").alias("d"),
                 F.lit(None).cast("long").alias("e")))
    fused = parts[0]
    for p in parts[1:]:
        fused = fused.unionByName(p)
    fused_rows = fused.collect()
    summary_rows = [{"bucket": r["a"], "n_rows": r["b"], "n_valid": r["c"],
                     "n_violations": r["d"], "n_bytes": r["e"]}
                    for r in fused_rows if r["metric"] == "bucket"]
    probe_rows = {r["metric"]: r for r in fused_rows
                  if r["metric"] != "bucket"}
    if not fully_resumed:
        _append_lineage_rows(spark, output_dir, run_id, scan_elapsed,
                             summary_rows)
        commit_elapsed = time.time() - t1

    # Exploded violation rows (overwritten from the compact table — cheap).
    t1 = time.time()
    viols = (verdicts.filter(F.size("violations") > 0)
             .select("doc_id", "bucket", F.explode("violations").alias("v"))
             .select("doc_id", "bucket", "v.path", "v.keyword", "v.message"))
    viols.write.mode("overwrite").parquet(violation_dir)
    violations_elapsed = time.time() - t1

    metrics: dict = {
        "run_id": run_id,
        "n_buckets": n_buckets,
        # only buckets THIS run would have scanned count as resumed work —
        # foreign buckets outside range(n_buckets) (a wider writer sharing
        # the sidecar) never gated this run's scan and must not inflate it
        "resumed_buckets": len(done & set(range(n_buckets))),
        "scan_elapsed_sec": scan_elapsed,
        "scan_rows": scan_obs.get("rows", 0),
        "scan_valid": scan_obs.get("valid", 0),
        "scan_violations": scan_obs.get("violations", 0),
    }

    n_rows = sum(r["n_rows"] for r in summary_rows)
    n_valid = sum(r["n_valid"] for r in summary_rows)
    n_viol = sum(r["n_violations"] for r in summary_rows)
    if done:  # totals include previously-completed buckets from the sidecar
        prior_lineage = spark.read.parquet(lineage_dir)
        if not fully_resumed:
            # rows this attempt just committed are already in summary_rows
            prior_lineage = prior_lineage.filter(F.col("run_id") != run_id)
        prior = (prior_lineage
                 .agg(F.sum("n_rows"), F.sum("n_valid"), F.sum("n_violations")).head())
        n_rows += prior[0] or 0
        n_valid += prior[1] or 0
        n_viol += prior[2] or 0
    metrics.update(n_rows=n_rows, n_valid=n_valid, n_violations=n_viol)

    dup = probe_rows["uniqueness"]
    metrics.update(duplicate_doc_ids=dup["b"] or 0,
                   duplicate_rows=int(dup["c"] or 0))
    if assets is not None:
        metrics["dangling_refs"] = probe_rows["referential"]["b"]
    # the probes ride the fused commit action since r6 — their cost is
    # inside commit_elapsed_sec (phase attribution note: BENCH/BASELINE.md)
    metrics["probe_elapsed_sec"] = 0.0
    metrics["commit_elapsed_sec"] = round(commit_elapsed, 3)
    metrics["violations_elapsed_sec"] = round(violations_elapsed, 3)

    if profile_cols:
        from xema_spark import stats as _stats

        prof = _stats.stats_profile(docs, profile_cols).localCheckpoint()
        _stats.write_stats_sidecar(prof, output_dir, run_id)
        if drift_baseline_run is not None:
            base = _stats.read_baseline_profile(spark, output_dir,
                                                drift_baseline_run,
                                                profile_cols)
            report = _stats.score_against_baseline(
                prof, base, drift_baseline_run, output_dir, run_id,
                exclude_metrics=drift_exclude_metrics)
            metrics["drifted_metrics"] = report.filter("drifted").count()
            metrics["drift_baseline_run"] = drift_baseline_run

    for c in cached:
        c.unpersist()
    with open(os.path.join(output_dir, f"metrics_{run_id}.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    if fail_on_drift and metrics.get("drifted_metrics", 0) > 0:
        drifted = [(r["column"], r["metric"])
                   for r in report.filter("drifted").collect()]
        raise DriftGateError(
            f"run {run_id} drifted vs baseline {drift_baseline_run!r} on "
            f"{drifted}; verdicts, profile, and drift report are persisted "
            f"under {output_dir}")
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
    p.add_argument("--profile-cols", default=None,
                   help="comma-separated numeric columns to stats-profile "
                        "into the run's sidecar")
    p.add_argument("--drift-baseline", default=None,
                   help="run_id whose sidecar profile this run gates against")
    p.add_argument("--fail-on-drift", action="store_true",
                   help="exit nonzero (DriftGateError) when the drift gate "
                        "fires; all outputs are persisted first")
    args = p.parse_args()

    spark = get_spark(app_name="xema_spark_runner")
    rule = FLAGSHIP_RULE
    if args.rule_json:
        with open(args.rule_json) as f:
            rule = json.load(f)
    # load_table resolves the uri scheme (iceberg:/parquet:/jsonl:/csv: or a
    # bare path) — the CLI's help promises iceberg input, so honor it
    from xema_spark.io import load_table
    docs = load_table(spark, args.input)
    assets = load_table(spark, args.assets) if args.assets else None
    metrics = run_validation(
        spark, docs, rule, args.output, assets=assets,
        n_buckets=args.buckets, resume=not args.no_resume,
        profile_cols=(args.profile_cols.split(",") if args.profile_cols
                      else None),
        drift_baseline_run=args.drift_baseline,
        fail_on_drift=args.fail_on_drift)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
