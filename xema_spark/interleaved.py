"""Span-level TRANSFORMATIONS for the interleaved text+media corpus.

The validation side of the engine checks span sequences against rules
(compiler.py over the `input_hint` shape: spans:array<struct<kind,text,
media_ref,offset>>; span-sequence parity with the reference's fixture
tables, cf. /root/reference/test/xema_test.exs valid/invalid cases). A
training pipeline additionally has to TRANSFORM those sequences:

- `render_text`  — assemble the training-ready text: span pieces ordered
  by (offset, original position), text spans contributing their text,
  media spans a placeholder token (the interleaved-pretraining convention),
  malformed kinds skipped.
- `normalize_spans` — repair a span sequence: drop structurally invalid
  spans (unknown kind, null/negative offset), re-sort by offset, and
  REWRITE offsets to the exact character positions the pieces occupy in
  the rendered text, so `render_text(normalize_spans(df))` is internally
  consistent (each span starts at its own offset).

Scale shape: both are PURE PROJECTIONS — per-row array expressions, zero
shuffle, no Python; at 10^12 docs they pipeline with the parquet/Iceberg
scan. The offset-repair fold is O(k^2) array copies for k spans per doc
(concat-per-element), fine for document-sized span lists (k ~ 10^1-10^3);
it never leaves the row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xema_spark.text import token_count_or_zero

_INT_MAX = (1 << 31) - 1  # null offsets sort last, before position tiebreak


def _tagged(spans_col: str) -> Column:
    """(o=offset-or-INT_MAX, p=original index, kind, text, media_ref, offset)
    — the sortable carrier struct. Field order matters: array_sort compares
    structs lexicographically and (o, p) is unique per element, so the
    payload fields never participate in the comparison."""
    return F.transform(
        F.col(spans_col),
        lambda s, j: F.struct(
            F.coalesce(s["offset"].cast("long"), F.lit(_INT_MAX).cast("long")).alias("o"),
            j.cast("long").alias("p"),
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )


def _piece(t: Column, media_placeholder: str) -> Column:
    return (F.when(t["kind"] == "text", F.coalesce(t["text"], F.lit("")))
            .when(t["kind"] == "media", F.lit(media_placeholder))
            .otherwise(F.lit("")))


def render_text(df: DataFrame, id_col: str = "doc_id",
                spans_col: str = "spans",
                media_placeholder: str = "<media>",
                out_col: str = "rendered") -> DataFrame:
    """One row per input row: (id_col, rendered, n_pieces, n_chars).

    Pieces are ordered by (offset NULLS LAST, original position) — the
    position tiebreak keeps equal-offset spans in author order and makes
    the output deterministic for any input. Spans whose kind is neither
    'text' nor 'media' (missing kind, unknown kinds like 'blob') are
    dropped from the rendering; a doc with no renderable spans yields
    rendered = '' with n_pieces = 0, so the row count is exactly the
    input's (a curation filter can then drop empties explicitly)."""
    kept = F.filter(_tagged(spans_col),
                    lambda t: t["kind"].isin("text", "media"))
    ordered = F.array_sort(kept)
    pieces = F.transform(ordered, lambda t: _piece(t, media_placeholder))
    # stage the pieces array, then the rendered string: HOF trees are
    # CodegenFallback (interpreted) and CollapseProject re-inlines cheap
    # single-use aliases only, so each expensive expression is evaluated
    # exactly once per row
    staged = df.select(id_col, pieces.alias("_pieces"))
    # a NULL spans column propagates through filter/transform as NULL
    # (not []): concat_ws already yields '' there, but size(NULL) is -1
    # under the default legacy sizeOfNull (NULL under ANSI) — the explicit
    # gate keeps the documented "no renderable spans => n_pieces = 0"
    # contract for NULL rows under either setting
    r = staged.select(
        id_col,
        F.concat_ws("", F.col("_pieces")).alias(out_col),
        F.when(F.col("_pieces").isNotNull(), F.size("_pieces"))
        .otherwise(F.lit(0)).cast("int").alias("n_pieces"))
    return r.select(
        id_col, out_col, "n_pieces",
        F.length(out_col).cast("int").alias("n_chars"))


def normalize_spans(df: DataFrame, id_col: str = "doc_id",
                    spans_col: str = "spans",
                    media_placeholder: str = "<media>",
                    flat: bool = False) -> DataFrame:
    """Repair each row's span sequence:

    1. DROP structurally invalid spans: kind not in ('text','media'),
       or offset null/negative (the injected violation classes).
    2. SORT survivors by (offset, original position).
    3. REWRITE offsets to the cumulative character position of each piece
       in the rendered text (text spans occupy length(text) chars, media
       spans length(media_placeholder)), so offsets are dense, monotonic
       and consistent with `render_text` using the same placeholder.

    flat=False returns (id_col, spans) in the input's nested shape —
    drop-in repaired documents. flat=True explodes to one row per
    surviving span: (id_col, pos, kind, text, media_ref, offset) — the
    long-format table a downstream join or the DuckDB oracle wants.
    Docs whose spans ALL drop keep an empty array (flat mode drops them)."""
    kept = F.array_sort(F.filter(
        _tagged(spans_col),
        lambda t: t["kind"].isin("text", "media")
        & t["offset"].isNotNull() & (t["offset"] >= 0)))
    plen = F.length(F.lit(media_placeholder))
    # left fold: acc = (arr: rebuilt spans, cum: chars rendered so far)
    zero = F.struct(
        F.array().cast(
            "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
        ).alias("arr"),
        F.lit(0).cast("long").alias("cum"))
    repaired = F.aggregate(
        kept, zero,
        lambda acc, t: F.struct(
            F.concat(acc["arr"], F.array(F.struct(
                t["kind"].alias("kind"), t["text"].alias("text"),
                t["media_ref"].alias("media_ref"),
                acc["cum"].cast("int").alias("offset")))).alias("arr"),
            (acc["cum"] + F.when(t["kind"] == "text",
                                 F.coalesce(F.length(t["text"]), F.lit(0)))
             .otherwise(plen).cast("long")).alias("cum")),
        lambda acc: acc["arr"])
    # NULL spans → aggregate propagates NULL; coalesce to the same empty
    # array an all-dropped doc keeps (flat mode then drops it)
    out = df.select(id_col, F.coalesce(repaired, zero["arr"]).alias(spans_col))
    if not flat:
        return out
    return out.select(
        id_col, F.posexplode(spans_col).alias("pos", "s")
    ).select(
        id_col, F.col("pos").cast("int").alias("pos"),
        F.col("s.kind").alias("kind"), F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"))


def token_cost(df: DataFrame, id_col: str = "doc_id",
               spans_col: str = "spans", media_cost: int = 64) -> DataFrame:
    """Per-doc training-token cost of an interleaved document, the quantity
    a token-budget packer needs BEFORE sequence packing: text spans cost
    their whitespace token count, media spans a flat `media_cost` tokens
    (the fixed vision-encoder patch budget per image in interleaved
    pretraining), malformed/null-kind spans cost 0 — exactly the spans
    `render_text` skips. Output: (id_col, n_tokens).

    Scale shape: ONE projection, zero shuffle — the cost fold never leaves
    the row, so at 10^12 docs it pipelines with the scan straight into
    `packing.pack_sequences(token_col="n_tokens")`. NULL spans cost 0.
    """
    spans = F.col(spans_col)
    cost = F.aggregate(
        spans, F.lit(0).cast("long"),
        lambda acc, s: acc + (
            F.when(s["kind"] == "text", token_count_or_zero(s["text"]))
            .when(s["kind"] == "media", F.lit(int(media_cost)).cast("long"))
            .otherwise(F.lit(0).cast("long"))))
    return df.select(
        F.col(id_col),
        F.coalesce(cost, F.lit(0).cast("long")).alias("n_tokens"))


def hot_refs(df: DataFrame, spans_col: str = "spans",
             top_k: int = 20, hot_share: float = 0.01) -> DataFrame:
    """Top-k most-referenced media assets with their corpus share — the
    skew DETECTOR that sizes `stats.referential_violations(salt_buckets=)`
    (north_rule: "skew salting for hot media_refs"). Output per asset:
    (media_ref, n_refs, share, is_hot) where share = n_refs / total media
    refs and is_hot = share >= hot_share.

    Scale shape: explode -> ONE rollup aggregation (Expand doubles the
    exploded rows pre-shuffle but both grouping sets partial-aggregate
    map-side, so per-ref counts AND the grand total ride ONE shuffle) ->
    TakeOrderedAndProject(top_k + 1) — the grand-total row (NULL key) is
    the max so it always survives the cut — -> a window over those <= k+1
    collected rows to divide by the total. Nothing driver-side ever holds
    more than k+1 rows; no second corpus scan for the denominator.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    from pyspark.sql import Window
    refs = (df.select(F.explode(F.col(spans_col)["media_ref"])
                      .alias("media_ref"))
            .filter(F.col("media_ref").isNotNull()))
    counts = refs.rollup("media_ref").agg(F.count(F.lit(1)).alias("n_refs"))
    # deterministic cut: ties at the boundary break on the ref string; the
    # total row (NULL ref) coalesces to '' which sorts first in BOTH Spark
    # and DuckDB, so the oracle replays the identical k-set
    top = counts.orderBy(F.col("n_refs").desc(),
                         F.coalesce("media_ref", F.lit("")).asc()) \
                .limit(top_k + 1)
    total = F.max("n_refs").over(Window.partitionBy())
    share = F.col("n_refs").cast("double") / F.col("total_refs").cast("double")
    return (top.withColumn("total_refs", total)
            .filter(F.col("media_ref").isNotNull())
            .select("media_ref", "n_refs",
                    F.round(share, 6).alias("share"),
                    (share >= F.lit(float(hot_share))).alias("is_hot")))


def filter_text_spans(df: DataFrame, id_col: str = "doc_id",
                      spans_col: str = "spans",
                      min_chars: int = 1, min_words: int = 1,
                      blocklist: tuple[str, ...] = (),
                      keep_media: bool = True) -> DataFrame:
    """Span-level quality gate — the C4/RefinedWeb line-filtering idea
    applied where interleaved documents naturally segment: the span.
    Keeps a span iff

    - kind = 'text' AND text is non-null AND trimmed length >= min_chars
      AND whitespace-token count >= min_words AND lowercased text contains
      none of `blocklist`; or
    - kind = 'media' AND media_ref is non-null (when keep_media).

    Malformed kinds (the ones `render_text` skips) always drop. Output:
    (id_col, spans, n_kept, n_dropped) — same nested shape as the input
    (offsets untouched; compose with `normalize_spans` to re-densify), so
    a curation pass can gate on n_kept or feed the doc straight back into
    validation/rendering.

    Scale shape: ONE projection, zero shuffle, no Python — the keep
    predicate never leaves the row, so at 10^12 docs it pipelines with
    the scan exactly like render_text/token_cost.
    """
    spans = F.col(spans_col)

    def _keep(s: Column) -> Column:
        txt_ok = (s["text"].isNotNull()
                  & (F.length(F.trim(s["text"])) >= int(min_chars))
                  & (token_count_or_zero(s["text"]) >= int(min_words)))
        for b in blocklist:
            txt_ok = txt_ok & ~F.lower(s["text"]).contains(b.lower())
        keep = (s["kind"] == "text") & txt_ok
        if keep_media:
            keep = keep | ((s["kind"] == "media") & s["media_ref"].isNotNull())
        return keep

    span_t = df.schema[spans_col].dataType.simpleString()
    # NULL spans → filter propagates NULL; keep the normalize_spans
    # contract (an all-dropped / NULL doc carries an empty array)
    kept = F.coalesce(F.filter(spans, _keep),
                      F.array().cast(span_t))
    staged = df.select(
        id_col, kept.alias("_kept"),
        F.when(spans.isNotNull(), F.size(spans)).otherwise(F.lit(0))
        .cast("int").alias("_n_in"))
    return staged.select(
        id_col, F.col("_kept").alias(spans_col),
        F.size("_kept").cast("int").alias("n_kept"),
        (F.col("_n_in") - F.size("_kept")).cast("int").alias("n_dropped"))


def truncate_to_budget(df: DataFrame, budget: int, id_col: str = "doc_id",
                       spans_col: str = "spans",
                       media_cost: int = 64) -> DataFrame:
    """Context-window PREFIX truncation: keep the longest span prefix whose
    token cost fits `budget` (same cost model as `token_cost`: text spans
    their whitespace token count, media spans a flat `media_cost`,
    malformed/null kinds 0). The first span that does not fit is the cut:

    - a TEXT span at the cut is word-truncated to the remaining tokens
      (whitespace-joined — original inter-word spacing is not preserved,
      the token-level contract a trainer feeds anyway);
    - a MEDIA span at the cut is dropped (an image does not truncate);
    - everything after the cut is gone, including zero-cost spans —
      prefix semantics, not greedy bin packing (that's `pack_sequences`).

    Output: (id_col, spans, n_tokens_kept, truncated). Offsets are left
    untouched — compose with `normalize_spans` to re-densify. Pure
    per-row fold, zero shuffle, pipelines with the scan at 10^12 docs.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    spans = F.col(spans_col)
    span_t = df.schema[spans_col].dataType.simpleString()
    bl = F.lit(int(budget)).cast("long")

    def _cost(s: Column) -> Column:
        return (F.when(s["kind"] == "text", token_count_or_zero(s["text"]))
                .when(s["kind"] == "media",
                      F.lit(int(media_cost)).cast("long"))
                .otherwise(F.lit(0).cast("long")))

    def _words(s: Column) -> Column:
        # NOT lowercased (tokens() lowercases for counting; the rebuild
        # must keep the original words) — same boundaries, same count
        return F.filter(F.split(s["text"], r"\s+"), lambda t: t != "")

    def _cut_text(s: Column, rem: Column) -> Column:
        return F.struct(
            s["kind"].alias("kind"),
            F.array_join(F.slice(_words(s), 1, rem.cast("int")), " ")
            .alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"))

    zero = F.struct(
        F.array().cast(span_t).alias("arr"),
        F.lit(0).cast("long").alias("cum"),
        F.lit(False).alias("cut"))

    def _step(acc: Column, s: Column) -> Column:
        cost = _cost(s)
        rem = bl - acc["cum"]
        fits = ~acc["cut"] & (cost <= rem)
        cuts_text = (~acc["cut"] & ~(cost <= rem)
                     & (s["kind"] == "text") & (rem > 0))
        return F.struct(
            (F.when(fits, F.concat(acc["arr"], F.array(s)))
             .when(cuts_text, F.concat(acc["arr"],
                                       F.array(_cut_text(s, rem))))
             .otherwise(acc["arr"])).alias("arr"),
            (F.when(fits, acc["cum"] + cost)
             .when(cuts_text, bl)
             .otherwise(acc["cum"])).alias("cum"),
            (acc["cut"] | ~fits).alias("cut"))

    folded = F.aggregate(spans, zero, _step)
    staged = df.select(id_col, F.coalesce(folded, zero).alias("_f"))
    return staged.select(
        id_col,
        F.col("_f")["arr"].alias(spans_col),
        F.col("_f")["cum"].cast("long").alias("n_tokens_kept"),
        F.col("_f")["cut"].alias("truncated"))


def canonicalize_media_refs(docs: DataFrame, assets: DataFrame,
                            fp_col: str, id_col: str = "doc_id",
                            spans_col: str = "spans",
                            ref_col: str = "media_ref",
                            broadcast_remap: bool = True) -> DataFrame:
    """Media-asset DEDUP by content fingerprint + span rewrite: assets
    sharing `fp_col` (e.g. sha2 of the payload) collapse to one canonical
    ref (the minimum, deterministic), and every span's media_ref is
    remapped to its canonical — the corpus afterwards references each
    distinct asset exactly once, which is what makes downstream
    ref-level dedup/caching/packing see through byte-identical uploads.
    Refs absent from `assets` (dangling) pass through unchanged. Output:
    (id_col, spans, n_remapped) in the input's nested shape.

    Two plan shapes, one semantics (cf. the ann_ivf/ann_ivf_bcast pair):

    - broadcast_remap=True (default): the remap pairs (only refs whose
      canonical DIFFERS — the identity majority never ships) fold into ONE
      map column on ONE row, broadcast, and each doc rewrites its spans
      with element_at(map, ref) inside a transform — the fact side is a
      pure projection, ZERO shuffle at any corpus size. Right whenever
      the changed-ref set fits a broadcast (dim-sized, it does).
    - broadcast_remap=False: posexplode → left join remap → re-assemble
      by (id, pos). The SMJ fallback for a remap too large to broadcast;
      requires `id_col` to be unique (re-assembly groups by it — the
      duplicated-doc_id injection class must be deduped first).
    """
    canon = assets.groupBy(fp_col).agg(F.min(ref_col).alias("_canon"))
    remap = (assets.join(canon, fp_col)
             .select(F.col(ref_col).alias("_from"), "_canon")
             .filter(F.col("_from") != F.col("_canon")))
    spans = F.col(spans_col)

    if broadcast_remap:
        # HASH-BUCKETED broadcast map: Spark's map lookup (GetMapValue /
        # element_at) is a LINEAR scan of the entries array, so one flat
        # map of R changed refs costs O(R) string compares per span —
        # measured 28 s for the 200k-doc / 17k-entry sandbox shape. The
        # remap folds into `map_buckets` small maps addressed positionally
        # (element_at on an ARRAY is O(1)), making each span lookup
        # O(R / map_buckets) with identical results. The bucket array is
        # built ONCE on the single broadcast row.
        map_buckets = 1024
        bidx = F.pmod(F.hash("_from"), F.lit(map_buckets))
        per = (remap.groupBy(bidx.alias("_i"))
               .agg(F.map_from_entries(
                   F.collect_list(F.struct("_from", "_canon"))).alias("_m")))
        one = (per.agg(F.map_from_entries(
                   F.collect_list(F.struct("_i", "_m"))).alias("_outer"))
               .select(F.transform(
                   F.sequence(F.lit(0), F.lit(map_buckets - 1)),
                   lambda i: F.element_at(F.col("_outer"), i))
                   .alias("_remap")))
        m = F.col("_remap")

        def lookup(ref: Column) -> Column:
            # hash(NULL) is a constant seed -> an in-range bucket -> NULL
            # key lookup -> NULL, exactly like the flat map did; the +1
            # index is always within [1, map_buckets] (ANSI-safe)
            return F.element_at(
                F.element_at(m, F.pmod(F.hash(ref), F.lit(map_buckets))
                             .cast("int") + F.lit(1)), ref)

        new_spans = F.transform(
            spans,
            lambda s: F.struct(
                s["kind"].alias("kind"), s["text"].alias("text"),
                F.coalesce(lookup(s[ref_col]), s[ref_col])
                .alias("media_ref"),
                s["offset"].alias("offset")))
        # remap holds ONLY changed refs, so a map hit IS a rewrite
        n_remapped = F.size(F.filter(
            spans, lambda s: lookup(s[ref_col]).isNotNull()))
        return (docs.crossJoin(F.broadcast(one))
                .select(id_col, new_spans.alias(spans_col),
                        F.when(spans.isNotNull(), n_remapped)
                        .otherwise(F.lit(0)).cast("int").alias("n_remapped")))

    ex = docs.select(id_col, F.posexplode(spans_col).alias("pos", "s"))
    joined = ex.join(remap, ex["s"][ref_col] == F.col("_from"), "left")
    rebuilt = joined.select(
        id_col, "pos",
        F.struct(
            F.col("s.kind").alias("kind"), F.col("s.text").alias("text"),
            F.coalesce("_canon", F.col("s")[ref_col]).alias("media_ref"),
            F.col("s.offset").alias("offset")).alias("s2"),
        F.col("_canon").isNotNull().cast("int").alias("_chg"))
    agg = rebuilt.groupBy(id_col).agg(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "s2"))),
                    lambda t: t["s2"]).alias(spans_col),
        F.sum("_chg").cast("int").alias("n_remapped"))
    # docs whose spans are NULL/empty vanish in the explode — restore them
    # with the empty-array contract via a left join back onto the ids
    base = docs.select(id_col)
    span_t = docs.schema[spans_col].dataType.simpleString()
    return (base.join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce(spans_col,
                               F.array().cast(span_t)).alias(spans_col),
                    F.coalesce("n_remapped", F.lit(0)).cast("int")
                    .alias("n_remapped")))


def span_kind_stats(df: DataFrame, id_col: str = "doc_id",
                    spans_col: str = "spans") -> DataFrame:
    """Per-doc interleaving profile in one projection (no shuffle):
    (id_col, n_spans, n_text, n_media, n_bad_kind, text_chars,
    media_text_ratio). `n_bad_kind` counts spans that render_text would
    skip — the quick corpus-health read before a full rule validation."""
    spans = F.col(spans_col)
    n_text = F.size(F.filter(spans, lambda s: s["kind"] == "text"))
    n_media = F.size(F.filter(spans, lambda s: s["kind"] == "media"))
    text_chars = F.aggregate(
        spans, F.lit(0).cast("long"),
        lambda acc, s: acc + F.when(s["kind"] == "text",
                                    F.coalesce(F.length(s["text"]), F.lit(0))
                                    .cast("long")).otherwise(F.lit(0)))
    # base counts staged once (interpreted HOFs, multiply referenced below)
    # NULL-spans gate: a NULL spans column must profile as 0 spans —
    # filter/aggregate propagate NULL and size(NULL) is -1 under legacy
    # sizeOfNull (NULL under ANSI), so each size() needs the explicit guard
    def _n(c: Column) -> Column:
        return F.when(spans.isNotNull(), c).otherwise(F.lit(0)).cast("int")

    base = df.select(
        id_col,
        _n(F.size(spans)).alias("n_spans"),
        _n(n_text).alias("n_text"),
        _n(n_media).alias("n_media"),
        F.coalesce(text_chars, F.lit(0).cast("long")).alias("text_chars"))
    return base.select(
        id_col, "n_spans", "n_text", "n_media",
        (F.col("n_spans") - F.col("n_text") - F.col("n_media"))
        .cast("int").alias("n_bad_kind"),
        "text_chars",
        F.round(F.col("n_media").cast("double")
                / F.greatest(F.col("n_text"), F.lit(1)).cast("double"), 6)
        .alias("media_text_ratio"),
    )


def dedup_text_spans(df: DataFrame, id_col: str = "doc_id",
                     spans_col: str = "spans", min_docs: int = 2,
                     keep: str = "first", hash_fn: str = "xxhash64",
                     normalize: bool = True,
                     min_chars: int = 1) -> DataFrame:
    """Cross-document dedup at SPAN granularity for the interleaved corpus:
    a text span whose (optionally normalized) content occurs in >=
    `min_docs` DISTINCT documents is removed from every document except —
    with keep='first' — the lowest-id one, so exactly one copy of shared
    boilerplate survives the corpus while media spans and each doc's unique
    prose pass through untouched in their original order. keep='none'
    removes every copy. The span-sequence invariant is preserved minus the
    removed elements (offsets untouched — compose with `normalize_spans` to
    re-densify). Spans whose dedup key is shorter than `min_chars` never
    participate (an empty/punctuation-only span is not "boilerplate"),
    nor do media or malformed-kind spans. Adds `n_spans_dropped`; NULL span
    arrays pass through NULL. Assumes unique doc ids (duplicated ids would
    merge their drop sets).

    The char-level sibling is `dedup.remove_duplicate_spans` (unaligned
    substrings); this one exploits that interleaved documents already
    segment at span boundaries, so the whole operator is exact-match on
    span keys. Scale shape: ONE posexplode (no shuffle, pipelined with the
    scan) -> distinct-(hash, doc) partial agg -> ONE groupBy for the
    frequency/keeper table -> equi-join on the span-key hash (build side
    one row per key; AQE splits hot boilerplate keys) -> per-doc drop-index
    array joined back on the id; the rewrite is a per-row F.filter over
    the original array. No Python anywhere; hashing is 60-bit portable /
    64-bit xxhash (like `dedup.duplicate_spans` — a false dup-mark that
    deletes an innocent span is ~2^-60 per key pair, NOT the 2^-31 a
    bucket hash would give at corpus scale), and the 'portable' flavor
    makes the operator DuckDB-replayable."""
    from xema_spark.dedup import dup_keeper_table, portable_hash60
    from xema_spark.text import normalize_text

    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    if min_chars < 1:
        raise ValueError(f"min_chars must be >= 1, got {min_chars}")
    if hash_fn not in ("portable", "xxhash64"):
        raise ValueError(
            f"unknown hash_fn {hash_fn!r}: expected 'portable' or 'xxhash64'")
    s = F.col("__s")
    key = normalize_text(s["text"]) if normalize else s["text"]
    exploded = (df.select(F.col(id_col).alias("__doc"),
                          F.posexplode(spans_col).alias("__pos", "__s"))
                .filter((s["kind"] == "text") & s["text"].isNotNull())
                .select("__doc", "__pos", key.alias("__key"))
                .filter(F.length("__key") >= min_chars)
                .select("__doc", "__pos",
                        (portable_hash60(F.col("__key"))
                         if hash_fn == "portable"
                         else F.xxhash64(F.col("__key"))).alias("__h")))
    drops = exploded.join(
        dup_keeper_table(exploded, "__doc", "__h", min_docs), "__h")
    if keep == "first":
        drops = drops.filter(F.col("__doc") != F.col("__keeper"))
    per_doc = (drops.groupBy("__doc")
               .agg(F.collect_list("__pos").alias("__drop")))
    spans = F.col(spans_col)
    kept = F.when(F.col("__drop").isNull(), spans).otherwise(
        F.filter(spans, lambda x, i: ~F.array_contains(F.col("__drop"), i)))
    n_dropped = F.when(F.col("__drop").isNull(), F.lit(0)) \
        .otherwise(F.size("__drop")).cast("int")
    return (df.join(per_doc, F.col(id_col) == F.col("__doc"), "left")
            .withColumn("n_spans_dropped", n_dropped)
            .withColumn(spans_col, kept)
            .drop("__doc", "__drop"))
