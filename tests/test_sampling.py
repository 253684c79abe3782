"""Reproducible sampling: membership must be a pure function of
(id, salt, rate) — stable under repartitioning, nested across rates."""

from __future__ import annotations

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
