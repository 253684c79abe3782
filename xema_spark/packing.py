"""Token-budget sequence packing: assign curated documents to fixed-size
training context windows.

Two strategies, both bucket-parallel (ONE shuffle on a hash bucket, then
per-bucket work — no global sort, no driver loop):

- `pack_sequences` (default, the 100 TB path): concatenate-then-chunk.
  Docs are ordered deterministically inside each bucket and laid out on a
  contiguous token stream; window position = running token count. A doc may
  straddle a bin boundary (it contributes its tail to the next bin), which
  is the standard pre-training tokenizer layout — every bin except each
  bucket's last is EXACTLY `budget` tokens. Pure window cumsum: whole-stage
  codegen, one shuffle, SQL-oracle-able.

- `pack_greedy`: whole-doc bins (a doc never splits). Sequential first-fit
  inside each bucket via applyInPandas — exact `sum(tokens) <= budget` per
  bin, at the price of an Arrow round-trip per bucket. Use when downstream
  loss masking can't handle split docs. Buckets are hash-balanced, so each
  pandas batch is ~corpus/n_buckets rows; size n_buckets so that fits in
  executor memory.

No reference analogue (the reference is a schema validator); this is part
of the training-data operator family layered on the same engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F, types as T

from xema_spark.dedup import bucket_hash31
from xema_spark.text import token_count_or_zero


def _tokens_or_zero(token_col: str | None, text_col: str):
    """Token count as a non-null long — a null text is an empty doc (0
    tokens occupying no window space), not a -1 that poisons the cumsum
    (see text.token_count_or_zero for the legacy-sizeOfNull trap)."""
    if token_col:
        return F.coalesce(F.col(token_col).cast("long"),
                          F.lit(0).cast("long"))
    return token_count_or_zero(F.col(text_col))


def _with_bucket(df: DataFrame, id_col: str, n_buckets: int,
                 hash_fn: str) -> DataFrame:
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    h = bucket_hash31(F.col(id_col), hash_fn)
    return df.withColumn("bucket", F.pmod(h, F.lit(n_buckets)).cast("int"))


def pack_sequences(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", token_col: str | None = None,
                   budget: int = 2048, n_buckets: int = 256,
                   hash_fn: str = "xxhash64") -> DataFrame:
    """Concatenate-then-chunk packing. Output one row per doc:
    (id, n_tokens, bucket, bin, bin_offset) where `bin` is the window the
    doc STARTS in and `bin_offset` its token offset there; a doc with
    bin_offset + n_tokens > budget straddles into bin+1. Deterministic:
    layout is a pure function of (id, tokens, budget, n_buckets, salt-free
    hash) — reruns and resumes reproduce byte-identical packing.

    Plan: one projection (token counts) -> one shuffle on bucket -> one
    per-partition window sort on the id. Partitions hold ~N/n_buckets docs;
    raise n_buckets with corpus size to keep the per-bucket sort in memory.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    tok = _tokens_or_zero(token_col, text_col)
    base = _with_bucket(df.select(F.col(id_col), tok.alias("n_tokens")),
                        id_col, n_buckets, hash_fn)
    w = (Window.partitionBy("bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_before = (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    # integer floor-div via modulo: (cum - cum%b)/b is an exact multiple,
    # so the double division is exact while per-bucket token streams stay
    # under 2^53 (they do by orders of magnitude at any sane n_buckets) —
    # and % on the non-negative cumsum is already ANSI-safe
    off = (cum_before % budget).cast("long")
    return (base
            .withColumn("bin", ((cum_before - off) / budget).cast("long"))
            .withColumn("bin_offset", off))


def pack_greedy(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", token_col: str | None = None,
                budget: int = 2048, n_buckets: int = 256,
                hash_fn: str = "xxhash64",
                oversize: str = "own_bin") -> DataFrame:
    """Whole-doc first-fit packing: docs fill a bin in id order until the
    next doc would overflow `budget`, then a new bin starts — per-bin token
    sums never exceed the budget. `oversize` controls docs longer than the
    budget by themselves: 'own_bin' (default) gives each its own overflowing
    bin; 'drop' removes them; 'error' raises at action time.

    Sequential by nature, so it runs as an Arrow-batched pandas pass per
    hash bucket (applyInPandas) — the documented slow path; the default
    `pack_sequences` stays in whole-stage codegen.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if oversize not in ("own_bin", "drop", "error"):
        raise ValueError(f"unknown oversize policy {oversize!r}")
    tok = _tokens_or_zero(token_col, text_col)
    base = _with_bucket(df.select(F.col(id_col), tok.alias("n_tokens")),
                        id_col, n_buckets, hash_fn)
    # never .add() onto df.schema — PySpark caches the StructType and add()
    # mutates it in place, corrupting the frame's own column list
    out_schema = T.StructType(
        list(base.schema.fields)
        + [T.StructField("bin", T.LongType()),
           T.StructField("bin_offset", T.LongType())])

    def fill(pdf):
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins, offs, keep = [], [], []
        b, used = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > budget:
                if oversize == "error":
                    raise ValueError(f"doc of {n} tokens exceeds budget {budget}")
                if oversize == "drop":
                    keep.append(False)
                    bins.append(-1)
                    offs.append(-1)
                    continue
            keep.append(True)
            if used and used + n > budget:
                b, used = b + 1, 0
            bins.append(b)
            offs.append(used)
            used += n
            if used >= budget:
                b, used = b + 1, 0
        pdf["bin"], pdf["bin_offset"] = bins, offs
        return pdf[keep] if oversize == "drop" else pdf

    return base.groupBy("bucket").applyInPandas(fill, out_schema)


def packing_stats(packed: DataFrame, budget: int,
                  bucket_col: str = "bucket") -> DataFrame:
    """Packing-efficiency report over `pack_sequences` output, per bucket:
    (bucket, n_docs, total_tokens, n_bins, tail_fill, n_straddle).
    `n_straddle` counts docs crossing a bin boundary — the rows a trainer
    pays attention-reset / loss-masking cost for; `tail_fill` is the only
    non-full bin's occupancy (concatenate-then-chunk fills every other bin
    exactly). ONE partial-agg groupBy on the already-packed frame — at
    10^12 docs this is a map-side-combined pass, no extra scan of text.

    Bin count stays integer-exact (no double ceil): for t > 0 bins =
    (t - 1 - (t - 1) % budget) / budget + 1, the same modulo-floor trick
    pack_sequences uses for bin ids.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    t = F.sum("n_tokens")
    tm1 = t - F.lit(1).cast("long")
    n_bins = F.when(t <= 0, F.lit(0).cast("long")) \
        .otherwise(((tm1 - tm1 % budget) / budget).cast("long") + 1)
    straddle = (F.col("bin_offset") + F.col("n_tokens")
                > F.lit(int(budget)).cast("long"))
    return packed.groupBy(bucket_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        t.alias("total_tokens"),
        n_bins.alias("n_bins"),
        (t % budget).cast("long").alias("tail_fill"),
        F.sum(straddle.cast("long")).alias("n_straddle"),
    )


def shard_assign(df: DataFrame, id_col: str = "doc_id",
                 n_shards: int = 1024, salt: str | None = None,
                 hash_fn: str = "xxhash64") -> DataFrame:
    """Deterministic global shuffle -> training-shard layout: the step that
    turns a curated corpus into write-ready shards with source ordering
    destroyed. Adds (shard, shard_pos): shard = bucket_hash31(id) %
    n_shards, shard_pos = the doc's rank within its shard ordered by the
    same hash (tie-broken on the id, so the layout is a pure function of
    ids and salt — rerunning on the same corpus reproduces it exactly, and
    re-salting yields an independent permutation for another epoch).

    Scale shape: ONE shuffle (the shard_pos window repartitions on shard);
    each window partition is one shard = corpus/n_shards rows — size
    n_shards so a shard fits an executor (at 10^12 docs and n_shards=2^20,
    ~10^6 rows each). Downstream: df.write.partitionBy('shard') with
    sortWithinPartitions('shard_pos') gives byte-stable shard files.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = bucket_hash31(F.col(id_col), hash_fn, salt)
    staged = df.withColumn("_h", h).withColumn(
        "shard", F.pmod("_h", F.lit(n_shards)).cast("int"))
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return (staged
            .withColumn("shard_pos", (F.row_number().over(w) - 1).cast("long"))
            .drop("_h"))


def curriculum_order(df: DataFrame, score_col: str,
                     id_col: str = "doc_id", n_shards: int = 1024,
                     by_quantile: bool = True, ascending: bool = True,
                     approx: bool = False) -> DataFrame:
    """Curriculum layout: order the corpus easy -> hard for curriculum
    training. Adds (shard, shard_pos) like `shard_assign`, but ordered by
    `score_col` (the difficulty proxy: perplexity, length, quality score)
    instead of a hash.

    by_quantile=True (default): shard k holds the k-th GLOBAL score
    quantile — reading shards 0..n-1 in order replays the whole-corpus
    curriculum. Boundaries are the exact `percentile` of score at
    k/n_shards (approx=True swaps in percentile_approx for the 10^12-doc
    run: one sketch pass, same plan shape — the exact flavor is what the
    DuckDB oracle can replay, cf. prototypicality's approx seam); a score
    equal to a boundary lands in the lower shard, so ties are
    deterministic. Scale shape: ONE aggregation to <= n_shards-1 boundary
    doubles broadcast back as a single row, shard assignment is a pure
    projection, then the one shard_pos window shuffle — identical cost to
    `shard_assign`, no global sort, no single-partition window.

    by_quantile=False: shard = hash31(id) % n_shards (each shard is a
    hash sample of the corpus), score-ordered WITHIN the shard — every
    data-parallel worker sees its own easy->hard ramp; zero extra passes.

    Ordering within a shard is (score, id) ascending (descending score
    when ascending=False; the id tie-break keeps either a pure function
    of the data). Output: input columns + (shard, shard_pos).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    s = F.col(score_col).cast("double")
    if by_quantile and n_shards > 1:
        fracs = F.array(*[F.lit(k / n_shards) for k in range(1, n_shards)])
        pctl = (F.percentile_approx(s, fracs) if approx
                else F.percentile(s, fracs))
        bounds = df.agg(pctl.alias("_bounds"))
        staged = df.crossJoin(F.broadcast(bounds))
        rank_up = F.size(F.filter(F.col("_bounds"), lambda b: s > b))
        shard = (rank_up if ascending
                 else (F.lit(n_shards - 1) - rank_up)).cast("int")
        staged = staged.withColumn("shard", shard).drop("_bounds")
    else:
        staged = df.withColumn(
            "shard",
            F.pmod(bucket_hash31(F.col(id_col), "xxhash64", None),
                   F.lit(n_shards)).cast("int"))
    order = [s.asc() if ascending else s.desc(), F.col(id_col).asc()]
    w = Window.partitionBy("shard").orderBy(*order)
    return staged.withColumn(
        "shard_pos", (F.row_number().over(w) - 1).cast("long"))
