"""Round-4 measurements (VERDICT r3 directives #5 and #6), recorded in
SCALING.md:

#5  winnow + minhash gram-stream sharing: when a composed pass needs BOTH
    winnow fingerprints and minhash signatures, does computing them from one
    shared exploded (doc, pos, gram-hash) frame beat running the two
    operators independently (each re-extracting its own gram stream)?
#6  grapheme-exact string length (per-batch pandas UDF) vs the codepoint
    default (F.length) on a validate_df min/max_length rule.

Corpus: sf0.1 documents replicated 64x (~320k docs, ~100 MB of text) so the
stage costs dominate JVM fixed costs.  Usage: python tools/measure_r4.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window, functions as F  # noqa: E402

from xema_spark import dedup, text  # noqa: E402
from xema_spark.compiler import validate_df  # noqa: E402
from xema_spark.session import get_spark  # noqa: E402


def timed(label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: best-of-{reps} {best:.2f}s", flush=True)
    return best


def main():
    spark = get_spark(master="local[16]", shuffle_partitions=32,
                      extra_conf={"spark.sql.ansi.enabled": "true"})
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    big = (docs.crossJoin(spark.range(64).select(F.col("id").alias("rep")))
           .select((F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
                   F.concat("text", F.lit(" r"),
                            F.col("rep").cast("string")).alias("text"))
           .repartition(32).localCheckpoint())
    n = big.count()
    print(f"corpus: {n} docs", flush=True)

    # ---- #5 independent operators ----
    t_win = timed("winnow alone (count)",
                  lambda: text.winnow_fingerprints(big, "doc_id").count())
    t_mh = timed("minhash alone (count)",
                 lambda: dedup.minhash_signatures(big, "doc_id").count())

    # ---- #5 shared-gram prototype: ONE posexplode of the 5-gram stream
    # feeds both the winnow window-min AND the minhash min-aggregates
    # (minhash uses the first max_shingles positions, winnow the full
    # 32768-char stream — the shared frame carries the union) ----
    def shared_both():
        k, w, max_sh = 5, 4, 512
        norm = F.substring(text.normalize_text(F.col("text")), 1, 32768)
        grams = F.regexp_extract_all(norm, F.lit(f"(?=(.{{{k}}}))"), 1)
        g = (big.select(F.col("doc_id").alias("doc"), grams.alias("g"))
             .filter(F.size("g") >= w)
             .select("doc", F.posexplode("g").alias("pos", "gram"))
             .select("doc", "pos", F.xxhash64("gram").alias("h"))
             .localCheckpoint())  # materialized ONCE, read by both branches
        win = Window.partitionBy("doc").orderBy("pos") \
            .rowsBetween(Window.currentRow, w - 1)
        n_win = Window.partitionBy("doc")
        winnow = (g.select("doc", "pos",
                           F.min("h").over(win).alias("fp"),
                           F.count(F.lit(1)).over(n_win).alias("__n"))
                  .filter(F.col("pos") <= F.col("__n") - w)
                  .select("doc", "fp").distinct())
        mh = (g.filter(F.col("pos") < max_sh)
              .groupBy("doc")
              .agg(*[F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"mh_{i}")
                     for i in range(32)]))
        return winnow.count() + mh.count()

    t_shared = timed("shared-gram frame (winnow+minhash counts)", shared_both)
    print(f"#5 verdict: independent {t_win + t_mh:.2f}s vs shared "
          f"{t_shared:.2f}s ({(t_win + t_mh) / t_shared:.2f}x)", flush=True)

    # ---- #6 grapheme-exact length vs codepoint default ----
    rule = {"type": "object",
            "properties": {"text": {"type": "string", "minLength": 60,
                                    "maxLength": 520}}}
    t_cp = timed("min/max_length codepoint (F.length)",
                 lambda: validate_df(big, rule)
                 .filter(~F.col("valid")).count())
    t_gr = timed("min/max_length exact_graphemes (pandas UDF)",
                 lambda: validate_df(big, rule, exact_graphemes=True)
                 .filter(~F.col("valid")).count())
    print(f"#6 verdict: grapheme {t_gr:.2f}s vs codepoint {t_cp:.2f}s "
          f"({t_gr / t_cp:.1f}x slower)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
