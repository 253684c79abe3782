"""Source adapter: scheme routing + graceful Iceberg fallback (no Iceberg
runtime in this sandbox — the adapter must degrade to parquet cleanly)."""

from __future__ import annotations

import pytest

from xema_spark import io as xio
from xema_spark.datagen import gen_documents


def test_parquet_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t")
    docs = gen_documents(spark, 100)
    xio.write_table(docs, f"parquet:{p}", mode="overwrite")
    back = xio.load_table(spark, f"parquet:{p}")
    assert back.count() == 100
    assert xio.load_table(spark, p).count() == 100  # bare path works too


def test_snapshot_requires_iceberg(spark, tmp_path):
    with pytest.raises(ValueError, match="iceberg"):
        xio.load_table(spark, str(tmp_path), snapshot_id=1)


def test_iceberg_not_available_here(spark):
    assert xio.iceberg_available(spark) is False


def test_jsonl_and_csv_sources(spark, tmp_path):
    from xema_spark.io import load_table

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "s"])
    jp = str(tmp_path / "j")
    cp = str(tmp_path / "c")
    df.write.json(jp)
    df.write.options(header=True).csv(cp)
    got_j = load_table(spark, f"jsonl:{jp}").orderBy("id").collect()
    got_c = load_table(spark, f"csv:{cp}").orderBy("id").collect()
    assert [(r["id"], r["s"]) for r in got_j] == [(1, "a"), (2, "b")]
    assert [(int(r["id"]), r["s"]) for r in got_c] == [(1, "a"), (2, "b")]


def test_bare_name_prefers_existing_local_path(spark, tmp_path, monkeypatch):
    """A slash-free --input that exists as a local directory is a relative
    parquet path, not an Iceberg table name — even when the Iceberg runtime
    is on the classpath (r4 review finding: the CLI's switch to load_table
    must not regress relative bare-path invocations)."""
    from xema_spark import io as xio

    gen_documents(spark, 50).write.parquet(str(tmp_path / "docs"))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(xio, "iceberg_available", lambda _s: True)
    # resolves against the PYTHON cwd even though the JVM was launched
    # elsewhere, and never reaches the (stubbed-available) Iceberg reader
    assert xio.load_table(spark, "docs").count() == 50
