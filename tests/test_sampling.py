"""Reproducible sampling: membership must be a pure function of
(id, salt, rate) — stable under repartitioning, nested across rates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xema_spark import sampling


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_deterministic_sample_is_stable_and_nested(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    s1 = _ids(sampling.deterministic_sample(df, "doc_id", 0.3))
    s2 = _ids(sampling.deterministic_sample(df.repartition(7), "doc_id", 0.3))
    assert s1 == s2                      # partitioning-independent
    assert 0.2 < len(s1) / 2000 < 0.4    # rate is approximately honored

    bigger = _ids(sampling.deterministic_sample(df, "doc_id", 0.6))
    assert s1 <= bigger                  # nested: raising the rate only adds

    other_salt = _ids(sampling.deterministic_sample(df, "doc_id", 0.3, salt="v2"))
    assert other_salt != s1              # salts draw independent samples

    assert _ids(sampling.deterministic_sample(df, "doc_id", 0.0)) == set()
    assert len(_ids(sampling.deterministic_sample(df, "doc_id", 1.0))) == 2000


def test_stratified_sample_rates_per_stratum(spark):
    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("xx")),
                     (F.col("id") % 3 + 1).cast("int")).alias("lang"))
    out = sampling.stratified_deterministic_sample(
        df, "doc_id", "lang", {"en": 1.0, "de": 0.5}, default_rate=0.0)
    per = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per.get("en") == 1000         # rate 1.0 keeps the whole stratum
    assert 350 < per.get("de", 0) < 650  # ~0.5
    assert "xx" not in per               # default 0.0 drops the rest

    # a stratum's members are the same set the flat sampler would pick
    flat = _ids(sampling.deterministic_sample(
        df.filter(F.col("lang") == "de"), "doc_id", 0.5))
    assert _ids(out.filter(F.col("lang") == "de")) == flat


def test_sample_is_pushdown_friendly(spark, tmp_path):
    """The membership filter must reach the parquet scan as a plain Filter
    (no shuffle, no window) — sampling a 100TB table is a map-only scan."""
    import io
    from contextlib import redirect_stdout

    p = str(tmp_path / "s")
    spark.range(100).select(F.col("id").alias("doc_id")).write.parquet(p)
    df = sampling.deterministic_sample(spark.read.parquet(p), "doc_id", 0.5)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan and "Window" not in plan


def test_source_caps_exact_counts_and_rank_semantics(spark):
    # 3 sources: hot (200 rows), exactly-at-cap (10), under-cap (4)
    rows = ([(i, "hot") for i in range(200)]
            + [(1000 + i, "atcap") for i in range(10)]
            + [(2000 + i, "small") for i in range(4)])
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = sampling.source_caps(df, "doc_id", "source", cap=10,
                               keep_rank=True)
    per = {r["source"]: r["n"] for r in
           got.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {"hot": 10, "atcap": 10, "small": 4}
    # kept set == the 10 lowest (hash, id) of the hot source, i.e. the
    # pre-bound provably didn't change the result (naive full-window ref)
    from pyspark.sql import Window
    from xema_spark.sampling import _bucket31
    w = Window.partitionBy("source").orderBy(
        _bucket31(F.col("doc_id"), "v1", "xxhash64"), F.col("doc_id"))
    ref = (df.withColumn("rk", F.row_number().over(w))
           .filter((F.col("rk") <= 10) & (F.col("source") == "hot")))
    assert ({r["doc_id"] for r in got.filter("source = 'hot'").collect()}
            == {r["doc_id"] for r in ref.collect()})
    # ranks are 1..kept and agree with the reference order
    assert sorted(r["src_rank"] for r in
                  got.filter("source = 'hot'").collect()) == list(range(1, 11))
    # determinism under repartitioning
    again = sampling.source_caps(df.repartition(7), "doc_id", "source",
                                 cap=10)
    assert ({r["doc_id"] for r in again.collect()}
            == {r["doc_id"] for r in got.collect()})


def test_source_caps_null_source_is_its_own_group(spark):
    rows = [(i, None) for i in range(30)] + [(100 + i, "a") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id: long, source: string")
    got = sampling.source_caps(df, "doc_id", "source", cap=5)
    n_null = got.filter(F.col("source").isNull()).count()
    assert n_null == 5                       # capped, NOT silently dropped
    assert got.filter("source = 'a'").count() == 3
    # output keeps the original columns only (no helper columns leak)
    assert got.columns == ["doc_id", "source"]


def _dsir_corpus(spark):
    # raw corpus: half "code-flavored" docs, half "prose-flavored";
    # target: prose only — prose docs must out-weigh code docs
    prose = ("the quick brown fox jumps over the lazy dog while the rain "
             "falls softly on the quiet town")
    code = ("def main args return self value import module class object "
            "lambda yield assert raise except finally")
    raw = spark.createDataFrame(
        [(i, prose if i % 2 == 0 else code) for i in range(40)]
        + [(98, ""), (99, None)],
        ["doc_id", "text"])
    target = spark.createDataFrame(
        [(1000 + i, prose) for i in range(10)], ["doc_id", "text"])
    return raw, target


def test_dsir_weights_prefer_target_like_docs(spark):
    raw, target = _dsir_corpus(spark)
    got = {r["doc_id"]: r for r in
           sampling.dsir_weights(raw, target, "doc_id",
                                 n_buckets=512).collect()}
    assert len(got) == 42                      # one row per raw doc
    prose_w = got[0]["log_w"]
    code_w = got[1]["log_w"]
    assert prose_w > code_w                    # target-like docs score higher
    assert prose_w > 0 > code_w                # and on the right sides of 0
    # gram accounting: n tokens + (n-1) bigrams
    n_tok = len("the quick brown fox jumps over the lazy dog while the "
                "rain falls softly on the quiet town".split())
    assert got[0]["n_grams"] == 2 * n_tok - 1
    # no-evidence docs: empty and NULL text
    for d in (98, 99):
        assert got[d]["n_grams"] == 0 and got[d]["log_w"] == 0.0


def test_dsir_sample_deterministic_gumbel_topk(spark):
    raw, target = _dsir_corpus(spark)
    kw = dict(k=10, n_buckets=512, hash_fn="portable")
    a = sampling.dsir_sample(raw, target, "doc_id", **kw).collect()
    b = sampling.dsir_sample(raw.repartition(5), target, "doc_id",
                             **kw).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    keys = [r["key"] for r in a]
    assert keys == sorted(keys, reverse=True)  # ranked by key desc
    # weights dominate the noise here: the prose half should win most slots
    prose_picked = sum(1 for r in a if r["doc_id"] % 2 == 0 and r["doc_id"] < 90)
    assert prose_picked >= 8
    # a different noise salt re-draws the sample
    c = sampling.dsir_sample(raw, target, "doc_id",
                             noise_salt="gumbel-v2", **kw).collect()
    assert [r["doc_id"] for r in c] != [r["doc_id"] for r in a]


def test_dsir_plan_shapes(spark):
    raw, target = _dsir_corpus(spark)
    plan = sampling.dsir_sample(raw, target, "doc_id", k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    # top-k never full-sorts; both distributions ride broadcast joins
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_hash_split_disjoint_stable_and_sized(spark):
    df = spark.range(4000).select(F.col("id").alias("doc_id"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = sampling.hash_split(df, "doc_id", w)
    per = {r["split"]: r["n"] for r in
           out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(per) == {"train", "val", "test"}   # full cover, no NULL
    assert per["train"] + per["val"] + per["test"] == 4000
    assert 0.75 < per["train"] / 4000 < 0.85
    # partitioning-independent assignment
    again = sampling.hash_split(df.repartition(7), "doc_id", w)
    assert out.exceptAll(again).count() == 0
    # holdout remainder labels NULL
    hold = sampling.hash_split(df, "doc_id", {"train": 0.5})
    n_null = hold.filter(F.col("split").isNull()).count()
    assert 1700 < n_null < 2300
    # shrinking a LATER split never moves rows between EARLIER ones
    # (contiguous ranges: train's range is a prefix either way)
    a = set(r["doc_id"] for r in sampling.hash_split(
        df, "doc_id", {"train": 0.5, "val": 0.5}).filter(
        "split = 'train'").collect())
    b = set(r["doc_id"] for r in sampling.hash_split(
        df, "doc_id", {"train": 0.5, "val": 0.1}).filter(
        "split = 'train'").collect())
    assert a == b


def test_materialize_epochs_counts_and_nesting(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 100 else "b") for i in range(200)],
        ["doc_id", "src"])
    out = sampling.materialize_epochs(
        df, "doc_id", "src", {"a": 2.5, "b": 0.3}, salt="t", hash_fn="portable")
    rows = out.groupBy("src", "epoch").agg(F.count(F.lit(1)).alias("n"))
    per = {(r["src"], r["epoch"]): r["n"] for r in rows.collect()}
    # full epochs replicate every row exactly once each
    assert per[("a", 0)] == 100 and per[("a", 1)] == 100
    # partial epochs hold ~frac of the stratum
    assert 30 <= per[("a", 2)] <= 70 and 15 <= per[("b", 0)] <= 45
    assert set(e for (_, e) in per) <= {0, 1, 2}
    # default budget 0: an unknown stratum emits nothing (and no [0,-1]
    # bogus sequence rows)
    extra = spark.createDataFrame([(999, "zzz")], ["doc_id", "src"])
    assert sampling.materialize_epochs(
        extra, "doc_id", "src", {"a": 1.0}).count() == 0
    # monotone nesting: raising a budget only ADDS (doc, epoch) replicas
    lo = set((r["doc_id"], r["epoch"]) for r in sampling.materialize_epochs(
        df, "doc_id", "src", {"a": 2.3}, salt="t", hash_fn="portable").collect())
    hi = set((r["doc_id"], r["epoch"]) for r in sampling.materialize_epochs(
        df, "doc_id", "src", {"a": 2.8}, salt="t", hash_fn="portable").collect())
    assert lo <= hi
    # partitioning-independent membership
    again = sampling.materialize_epochs(
        df.repartition(7), "doc_id", "src", {"a": 2.5, "b": 0.3},
        salt="t", hash_fn="portable")
    assert out.exceptAll(again).count() == 0
    with pytest.raises(ValueError, match="must be >= 0"):
        sampling.materialize_epochs(df, "doc_id", "src", {"a": -1.0})


def test_epoch_budgets_hand_computed(spark):
    rows = ([(i, "a", 10.0) for i in range(3)]
            + [(100, "b", 10.0)]
            + [(200 + i, "c", 15.0) for i in range(2)])
    df = spark.createDataFrame(rows, ["doc_id", "src", "w"])
    out = {r["src"]: r for r in sampling.epoch_budgets(
        df, "src", {"a": 0.5, "b": 0.5}, weight_col="w").collect()}
    # masses 30/10/30, T=70; budgets share*T/mass; c absent from recipe -> 0
    assert out["a"]["mass"] == 30.0 and out["b"]["mass"] == 10.0
    assert abs(out["a"]["epochs"] - round(0.5 * 70 / 30, 6)) < 1e-9
    assert abs(out["b"]["epochs"] - round(0.5 * 70 / 10, 6)) < 1e-9
    assert out["c"]["epochs"] == 0.0 and out["c"]["target_share"] == 0.0
    assert abs(out["c"]["current_share"] - round(30 / 70, 6)) < 1e-9
    # row-count mode (no weight_col): masses 3/1/2, T=6
    cnt = {r["src"]: r["epochs"] for r in sampling.epoch_budgets(
        df, "src", {"b": 1.0}).collect()}
    assert abs(cnt["b"] - 6.0) < 1e-9 and cnt["a"] == 0.0
    # the cap bounds a scarce-stratum blow-up and reports it honestly
    capped = {r["src"]: r["epochs"] for r in sampling.epoch_budgets(
        df, "src", {"b": 1.0}, max_epochs=2.5).collect()}
    assert capped["b"] == 2.5
    # pinned total_mass overrides the observed T for the budget only
    pinned = {r["src"]: r for r in sampling.epoch_budgets(
        df, "src", {"a": 1.0}, total_mass=140.0, weight_col="w").collect()}
    assert abs(pinned["a"]["epochs"] - round(140 / 30, 6)) < 1e-9
    assert abs(pinned["a"]["current_share"] - round(30 / 70, 6)) < 1e-9
    import pytest
    with pytest.raises(ValueError, match="max_epochs"):
        sampling.epoch_budgets(df, "src", {"a": 1.0}, max_epochs=0)
    with pytest.raises(ValueError, match="total_mass"):
        sampling.epoch_budgets(df, "src", {"a": 1.0}, total_mass=-1)
    with pytest.raises(ValueError, match="share"):
        sampling.epoch_budgets(df, "src", {"a": -0.1})


def test_epoch_budgets_zero_mass_stratum(spark):
    # a stratum whose weights are all NULL/zero must get epochs 0.0, not a
    # NULL that crashes materialize_mixture's float(None) (ADVICE r4)
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 10.0), (3, "z", None), (4, "z", 0.0)],
        "doc_id long, src string, w double")
    out = {r["src"]: r for r in sampling.epoch_budgets(
        df, "src", {"a": 0.5, "z": 0.5}, weight_col="w").collect()}
    assert out["z"]["mass"] == 0.0 and out["z"]["epochs"] == 0.0
    assert out["z"]["current_share"] == 0.0
    assert abs(out["a"]["epochs"] - round(0.5 * 20 / 20, 6)) < 1e-9
    # the composed path survives (z contributes zero output rows; a gets a
    # full epoch under share 1.0 so its row count is deterministic)
    mixed = sampling.materialize_mixture(
        df, "doc_id", "src", {"a": 1.0, "z": 1.0}, weight_col="w")
    assert mixed.filter("src = 'z'").count() == 0
    assert mixed.filter("src = 'a'").count() == 2
    # ALL-zero-mass corpus: current_share divides a zero total — still 0.0
    allz = spark.createDataFrame(
        [(1, "z", 0.0)], "doc_id long, src string, w double")
    row = sampling.epoch_budgets(
        allz, "src", {"z": 1.0}, weight_col="w").collect()[0]
    assert row["epochs"] == 0.0 and row["current_share"] == 0.0


def test_materialize_mixture_realizes_shares(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        ["doc_id", "src"])
    out = sampling.materialize_mixture(
        df, "doc_id", "src", {"big": 0.5, "small": 0.5},
        salt="t", hash_fn="portable")
    per = {r["src"]: r["n"] for r in out.groupBy("src").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # planned on T=1000: each stratum targets ~500 replicas
    assert abs(per["big"] - 500) < 80 and abs(per["small"] - 500) < 80
