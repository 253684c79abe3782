"""Span transformations: render_text / normalize_spans / span_kind_stats."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from xema_spark import interleaved
from xema_spark.datagen import SPAN_TYPE, gen_documents

_DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", T.ArrayType(SPAN_TYPE)),
])


def _docs(spark, rows):
    return spark.createDataFrame(rows, _DOC_SCHEMA)


def test_render_orders_substitutes_and_skips(spark):
    rows = [
        # out-of-order offsets + media placeholder + junk kinds skipped
        ("d1", [("media", None, "asset-1", 10),
                ("text", "hello ", None, 0),
                ("blob", "JUNK", None, 5),       # unknown kind -> skipped
                (None, "JUNK", None, 7),          # missing kind -> skipped
                ("text", "world", None, 20)]),
        # null text in a text span renders as ''
        ("d2", [("text", None, None, 0), ("text", "x", None, 1)]),
        # null offset sorts last; equal offsets keep author order
        ("d3", [("text", "b", None, None),
                ("text", "a1", None, 3), ("text", "a2", None, 3)]),
        ("d4", []),                               # empty spans -> '' row
    ]
    got = {r["doc_id"]: r for r in
           interleaved.render_text(_docs(spark, rows)).collect()}
    assert got["d1"]["rendered"] == "hello <media>world"
    assert got["d1"]["n_pieces"] == 3
    assert got["d1"]["n_chars"] == len("hello <media>world")
    assert got["d2"]["rendered"] == "x"
    assert got["d3"]["rendered"] == "a1a2b"
    assert got["d4"]["rendered"] == "" and got["d4"]["n_pieces"] == 0
    assert len(got) == 4  # row count preserved


def test_normalize_repairs_offsets_consistently_with_render(spark):
    rows = [
        ("d1", [("media", None, "asset-1", 50),
                ("text", "abc", None, 7),
                ("blob", "JUNK", None, 0),        # dropped: bad kind
                ("text", "XY", None, -4),          # dropped: negative offset
                ("text", "tail", None, None),      # dropped: null offset
                ("text", "de", None, 99)]),
    ]
    df = _docs(spark, rows)
    fixed = interleaved.normalize_spans(df)
    spans = fixed.collect()[0]["spans"]
    # survivors sorted by offset, offsets rewritten to rendered positions
    assert [(s["kind"], s["offset"]) for s in spans] == [
        ("text", 0),            # 'abc' at 0
        ("media", 3),           # '<media>' at 3
        ("text", 3 + len("<media>")),
    ]
    # internal consistency: each text span's text sits at its offset in
    # the rendered output of the SAME placeholder
    rendered = interleaved.render_text(fixed).collect()[0]["rendered"]
    assert rendered == "abc<media>de"
    for s in spans:
        if s["kind"] == "text":
            assert rendered[s["offset"]:s["offset"] + len(s["text"])] == s["text"]

    flat = interleaved.normalize_spans(df, flat=True).collect()
    assert [r["pos"] for r in flat] == [0, 1, 2]
    assert flat[1]["media_ref"] == "asset-1"
    # a doc whose spans all drop keeps an empty array (nested mode) and
    # vanishes in flat mode
    gone = _docs(spark, [("d9", [("blob", "x", None, 1)])])
    assert interleaved.normalize_spans(gone).collect()[0]["spans"] == []
    assert interleaved.normalize_spans(gone, flat=True).count() == 0


def test_span_kind_stats_counts(spark):
    rows = [("d1", [("text", "abcd", None, 0), ("media", None, "a-1", 4),
                    ("blob", "x", None, 9), ("text", None, None, 11)])]
    r = interleaved.span_kind_stats(_docs(spark, rows)).collect()[0]
    assert (r["n_spans"], r["n_text"], r["n_media"], r["n_bad_kind"]) == (4, 2, 1, 1)
    assert r["text_chars"] == 4          # null text counts 0
    assert abs(r["media_text_ratio"] - 0.5) < 1e-9


def test_render_and_normalize_are_shuffle_free(spark):
    docs = gen_documents(spark, 200)
    for df in (interleaved.render_text(docs),
               interleaved.normalize_spans(docs),
               interleaved.span_kind_stats(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    # flat mode adds only a Generate (posexplode), still no shuffle
    plan = interleaved.normalize_spans(docs, flat=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" in plan


def test_render_over_generated_corpus_row_count(spark):
    docs = gen_documents(spark, 400)
    out = interleaved.render_text(docs)
    assert out.count() == 400
    # a doc with >=1 MEDIA span always renders non-empty (the placeholder
    # guarantees content; text spans may legitimately carry null text)
    has_media = interleaved.span_kind_stats(docs).filter(F.col("n_media") > 0)
    n_empty = (out.join(has_media.select("doc_id").distinct(), "doc_id")
               .filter(F.col("rendered") == "").count())
    assert n_empty == 0


def test_null_spans_column_keeps_contracts(spark):
    # a real parquet corpus can carry spans = NULL (nullable array), which
    # datagen never emits: every operator must treat it like "no spans",
    # not propagate NULL through the HOF chain
    rows = [("dnull", None), ("dempty", [])]
    df = _docs(spark, rows)
    got = {r["doc_id"]: r for r in interleaved.render_text(df).collect()}
    for d in ("dnull", "dempty"):
        assert got[d]["rendered"] == ""
        assert got[d]["n_pieces"] == 0 and got[d]["n_chars"] == 0
    fixed = {r["doc_id"]: r["spans"]
             for r in interleaved.normalize_spans(df).collect()}
    assert fixed["dnull"] == [] and fixed["dempty"] == []
    assert interleaved.normalize_spans(df, flat=True).count() == 0
    stats = {r["doc_id"]: r for r in
             interleaved.span_kind_stats(df).collect()}
    for d in ("dnull", "dempty"):
        r = stats[d]
        assert (r["n_spans"], r["n_text"], r["n_media"],
                r["n_bad_kind"], r["text_chars"]) == (0, 0, 0, 0, 0)


def test_token_cost_hand_computed(spark):
    rows = [
        ("d1", [("text", "Hello  big world", None, 0),   # 3 tokens
                ("media", None, "asset-1", 10),           # 64 tokens
                ("text", None, None, 20),                 # null text -> 0
                ("blob", "JUNK JUNK", None, 30),          # bad kind -> 0
                (None, "JUNK", None, 40),                 # null kind -> 0
                ("text", "  a\tb\nc  ", None, 50)]),      # 3 tokens
        ("d2", [("media", None, "a", 0), ("media", None, "b", -5)]),  # 128
        ("d3", []),                                       # empty -> 0
        ("d4", None),                                     # NULL spans -> 0
    ]
    got = {r["doc_id"]: r["n_tokens"] for r in
           interleaved.token_cost(_docs(spark, rows), media_cost=64).collect()}
    assert got == {"d1": 3 + 64 + 3, "d2": 128, "d3": 0, "d4": 0}
    # cost is a pure projection: no shuffle at any corpus size
    plan = interleaved.token_cost(_docs(spark, rows)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hot_refs_counts_shares_and_cut(spark):
    # a: 4 refs, b: 2, c: 1, d: 1 -> total 8; text spans/nulls ignored
    rows = [
        ("d1", [("media", None, "a", 0), ("media", None, "a", 1),
                ("media", None, "b", 2), ("text", "x", None, 3)]),
        ("d2", [("media", None, "a", 0), ("media", None, "a", 1),
                ("media", None, "b", 2), ("media", None, "c", 3)]),
        ("d3", [("media", None, "d", 0), (None, None, None, 1)]),
    ]
    out = interleaved.hot_refs(_docs(spark, rows), top_k=3, hot_share=0.2)
    got = {r["media_ref"]: r for r in out.collect()}
    # top-3 cut, tie between c and d at n=1 breaks on ref name: c stays
    assert set(got) == {"a", "b", "c"}
    assert got["a"]["n_refs"] == 4 and got["a"]["share"] == 0.5
    assert got["b"]["n_refs"] == 2 and got["b"]["share"] == 0.25
    assert got["c"]["share"] == 0.125
    assert got["a"]["is_hot"] and got["b"]["is_hot"] and not got["c"]["is_hot"]


def test_hot_refs_plan_one_rollup_shuffle_and_takeordered(spark):
    out = interleaved.hot_refs(gen_documents(spark, 400), top_k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Expand carries both grouping sets through ONE partial aggregation;
    # the cut is TakeOrderedAndProject, never a global sort
    assert "Expand" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")
    # the share window runs AFTER the k+1 cut (tiny frame): exactly the
    # rollup exchange plus the single-partition window exchange
    assert plan.count("Exchange") <= 2


def test_hot_refs_detects_datagen_hot_asset(spark):
    # datagen's hot-ref branch fires when (i+j)%10 == 1 (the only odd
    # residue < 3) and then (i*31+j)%10 == (30i+1)%10 == 1 ALWAYS: the
    # corpus has exactly ONE mega-hot asset, asset-000001, holding ~20%
    # of all media refs — the single-hot-key regime salting exists for
    out = interleaved.hot_refs(gen_documents(spark, 2000),
                               top_k=10, hot_share=0.05).collect()
    assert len(out) == 10
    hot = [r for r in out if r["is_hot"]]
    assert [r["media_ref"] for r in hot] == ["asset-000001"]
    assert hot[0]["share"] > 0.15
    assert max(r["n_refs"] for r in out) == hot[0]["n_refs"]


def test_filter_text_spans_gates(spark):
    rows = [
        ("d1", [("text", "four words right here ok", None, 0),   # kept
                ("text", "too short", None, 10),                  # < min_words
                ("text", "x" * 30, None, 20),                     # 1 token
                ("text", None, None, 30),                         # null text
                ("text", "click here to BUY NOW cheap pills", None, 40),
                ("media", None, "asset-1", 50),                   # kept
                ("media", None, None, 60),                        # null ref
                ("blob", "junk junk junk junk", None, 70)]),      # bad kind
        ("d2", None),                                             # NULL spans
        ("d3", []),
    ]
    out = {r["doc_id"]: r for r in interleaved.filter_text_spans(
        _docs(spark, rows), min_chars=10, min_words=4,
        blocklist=("buy now",)).collect()}
    kept = [(s["kind"], s["media_ref"]) for s in out["d1"]["spans"]]
    assert kept == [("text", None), ("media", "asset-1")]
    assert out["d1"]["n_kept"] == 2 and out["d1"]["n_dropped"] == 6
    assert out["d2"]["spans"] == [] and out["d2"]["n_dropped"] == 0
    assert out["d3"]["n_kept"] == 0 and out["d3"]["n_dropped"] == 0


def test_filter_text_spans_keep_media_false_and_no_shuffle(spark):
    rows = [("d1", [("media", None, "asset-1", 0),
                    ("text", "alpha beta gamma", None, 10)])]
    out = interleaved.filter_text_spans(
        _docs(spark, rows), min_words=2, keep_media=False)
    assert [s["kind"] for s in out.collect()[0]["spans"]] == ["text"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection


def test_filter_then_normalize_offsets_dense(spark):
    rows = [("d1", [("text", "keep me please", None, 5),
                    ("text", "no", None, 0),
                    ("media", None, "asset-9", 9)])]
    gated = interleaved.filter_text_spans(
        _docs(spark, rows), min_words=3).select("doc_id", "spans")
    fixed = interleaved.normalize_spans(gated).collect()[0]["spans"]
    assert [(s["kind"], s["offset"]) for s in fixed] == [
        ("text", 0), ("media", len("keep me please"))]


_ASSET_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("fingerprint", T.StringType()),
])


def _canon_rows(spark, broadcast_remap):
    docs = _docs(spark, [
        ("d1", [("media", None, "asset-b", 0),     # remaps -> asset-a
                ("text", "hello", None, 10),
                ("media", None, "asset-a", 20),    # already canonical
                ("media", None, "dangling", 30)]), # not in assets: untouched
        ("d2", [("media", None, "asset-c", 0)]),   # fp unique: untouched
        ("d3", []),
    ])
    assets = spark.createDataFrame(
        [("asset-a", "fp1"), ("asset-b", "fp1"), ("asset-c", "fp2")],
        _ASSET_SCHEMA)
    out = interleaved.canonicalize_media_refs(
        docs, assets, "fingerprint", broadcast_remap=broadcast_remap)
    return {r["doc_id"]: r for r in out.collect()}


def test_canonicalize_media_refs_broadcast(spark):
    got = _canon_rows(spark, True)
    assert [s["media_ref"] for s in got["d1"]["spans"]] == [
        "asset-a", None, "asset-a", "dangling"]
    # text span payload survives the rewrite untouched
    assert [s["text"] for s in got["d1"]["spans"]] == [
        None, "hello", None, None]
    assert got["d1"]["n_remapped"] == 1
    assert got["d2"]["n_remapped"] == 0
    assert got["d3"]["spans"] == [] and got["d3"]["n_remapped"] == 0


def test_canonicalize_media_refs_smj_path_agrees(spark):
    a, b = _canon_rows(spark, True), _canon_rows(spark, False)
    for k in a:
        assert a[k]["spans"] == b[k]["spans"], k
        assert a[k]["n_remapped"] == b[k]["n_remapped"], k


def test_canonicalize_identity_when_no_dup_content(spark):
    docs = _docs(spark, [("d1", [("media", None, "asset-a", 0)])])
    assets = spark.createDataFrame(
        [("asset-a", "fp1"), ("asset-b", "fp2")], _ASSET_SCHEMA)
    got = interleaved.canonicalize_media_refs(
        docs, assets, "fingerprint").collect()[0]
    assert got["spans"][0]["media_ref"] == "asset-a"
    assert got["n_remapped"] == 0


def test_canonicalize_broadcast_plan_no_fact_shuffle(spark):
    docs = gen_documents(spark, 400)
    from xema_spark.datagen import gen_assets
    assets = gen_assets(spark, 400).withColumn(
        "fingerprint",
        F.md5(F.concat_ws(":", "media_type", F.pmod("bytes", F.lit(997)))))
    out = interleaved.canonicalize_media_refs(docs, assets, "fingerprint")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the one-row remap map reaches the docs via a broadcast nested-loop
    # join; every Exchange in the plan belongs to the dim-side fold
    assert "BroadcastNestedLoopJoin" in plan
    fact_side = plan.split("BroadcastNestedLoopJoin")[1].split("Broadcast")[0]
    assert "Exchange" not in fact_side


def test_truncate_to_budget_prefix_semantics(spark):
    rows = [
        # text straddles the cut: word-truncated to the remaining tokens
        ("d1", [("text", "a b c d", None, 0), ("media", None, "m1", 1),
                ("text", "x y z", None, 2)]),
        # media straddles: dropped whole, everything after gone
        ("d2", [("text", "a b c d", None, 0), ("media", None, "m1", 1),
                ("media", None, "m2", 2)]),
        # exact fit: no truncation
        ("d3", [("text", "a b", None, 0), ("media", None, "m1", 1)]),
        # zero-cost span AFTER the cut is gone (prefix, not greedy)
        ("d4", [("media", None, "m1", 0), ("media", None, "m2", 1),
                ("media", None, "m3", 2), ("blob", "junk", None, 3)]),
        # zero-cost spans within the prefix are kept
        ("d5", [("blob", "junk", None, 0), ("text", None, None, 1),
                ("text", "a b", None, 2)]),
        ("d6", None),
    ]
    out = {r["doc_id"]: r for r in interleaved.truncate_to_budget(
        _docs(spark, rows), budget=10, media_cost=5).collect()}
    assert [s["text"] for s in out["d1"]["spans"]] == ["a b c d", None, "x"]
    assert out["d1"]["n_tokens_kept"] == 10 and out["d1"]["truncated"]
    assert [s["kind"] for s in out["d2"]["spans"]] == ["text", "media"]
    assert out["d2"]["n_tokens_kept"] == 9 and out["d2"]["truncated"]
    assert out["d3"]["n_tokens_kept"] == 7 and not out["d3"]["truncated"]
    assert [s["media_ref"] for s in out["d4"]["spans"]] == ["m1", "m2"]
    assert out["d4"]["n_tokens_kept"] == 10 and out["d4"]["truncated"]
    assert len(out["d5"]["spans"]) == 3 and not out["d5"]["truncated"]
    assert out["d6"]["spans"] == [] and out["d6"]["n_tokens_kept"] == 0
    assert not out["d6"]["truncated"]


def test_truncate_preserves_case_and_plan_no_shuffle(spark):
    rows = [("d1", [("text", "Aa Bb Cc Dd", None, 0)])]
    out = interleaved.truncate_to_budget(_docs(spark, rows), budget=2)
    got = out.collect()[0]
    assert got["spans"][0]["text"] == "Aa Bb"
    assert got["n_tokens_kept"] == 2 and got["truncated"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dedup_text_spans_keep_first_media_untouched(spark):
    boiler = "Subscribe to our newsletter for updates!"
    rows = [
        ("d1", [("text", boiler, None, 0), ("media", None, "m1", 1),
                ("text", "unique prose alpha", None, 2)]),
        ("d2", [("text", "unique prose beta", None, 0),
                ("text", "subscribe to our NEWSLETTER -- for updates", None, 1),
                ("media", None, "m2", 2)]),
        ("d3", [("text", "nothing shared here", None, 0)]),
        ("d4", None),
    ]
    out = {r["doc_id"]: r for r in interleaved.dedup_text_spans(
        _docs(spark, rows), keep="first").collect()}
    # d1 is the lowest-id holder: keeps its copy, drops nothing
    assert [s["text"] for s in out["d1"]["spans"]] == \
        [boiler, None, "unique prose alpha"]
    assert out["d1"]["n_spans_dropped"] == 0
    # d2 loses the (normalized-equal) boilerplate span only; order kept
    assert [s["kind"] for s in out["d2"]["spans"]] == ["text", "media"]
    assert out["d2"]["spans"][0]["text"] == "unique prose beta"
    assert out["d2"]["n_spans_dropped"] == 1
    assert out["d3"]["n_spans_dropped"] == 0
    assert out["d4"]["spans"] is None and out["d4"]["n_spans_dropped"] == 0
    # keep='none': both copies vanish
    none = {r["doc_id"]: r for r in interleaved.dedup_text_spans(
        _docs(spark, rows), keep="none").collect()}
    assert [s["text"] for s in none["d1"]["spans"]] == \
        [None, "unique prose alpha"]
    assert none["d2"]["n_spans_dropped"] == 1


def test_dedup_text_spans_min_chars_and_errors(spark):
    import pytest

    rows = [
        ("d1", [("text", "!!!", None, 0), ("text", "real shared body", None, 1)]),
        ("d2", [("text", "???", None, 0), ("text", "Real SHARED body", None, 1)]),
    ]
    out = {r["doc_id"]: r for r in interleaved.dedup_text_spans(
        _docs(spark, rows), keep="none").collect()}
    # punctuation-only spans normalize to '' -> below min_chars, never dedup
    assert [s["text"] for s in out["d1"]["spans"]] == ["!!!"]
    assert [s["text"] for s in out["d2"]["spans"]] == ["???"]
    assert out["d1"]["n_spans_dropped"] == 1
    # exact (non-normalized) matching treats case variants as distinct
    exact = {r["doc_id"]: r for r in interleaved.dedup_text_spans(
        _docs(spark, rows), keep="none", normalize=False).collect()}
    assert exact["d1"]["n_spans_dropped"] == 0
    with pytest.raises(ValueError, match="min_docs"):
        interleaved.dedup_text_spans(_docs(spark, rows), min_docs=1)
    with pytest.raises(ValueError, match="keep"):
        interleaved.dedup_text_spans(_docs(spark, rows), keep="both")
    with pytest.raises(ValueError, match="min_chars"):
        interleaved.dedup_text_spans(_docs(spark, rows), min_chars=0)
