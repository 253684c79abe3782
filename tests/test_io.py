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
