"""mapInPandas sweep evaluator agrees with the Column compiler on the
flagship corpus (the benchmark-driven (a)-vs-(b) choice from SURVEY §2.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xema_spark.compiler import validate_df
from xema_spark.datagen import FLAGSHIP_RULE, gen_documents
from xema_spark.sweep import evaluate_sweep


def test_sweep_matches_column_compiler(spark):
    docs = gen_documents(spark, 800)
    a = {r["doc_id"]: r["valid"]
         for r in validate_df(docs, FLAGSHIP_RULE).select("doc_id", "valid").collect()}
    b = {}
    for r in evaluate_sweep(docs, FLAGSHIP_RULE).select("doc_id", "valid").collect():
        b[r["doc_id"]] = r["valid"] and b.get(r["doc_id"], True)
    a2 = {}
    for r in validate_df(docs, FLAGSHIP_RULE).select("doc_id", "valid").collect():
        a2[r["doc_id"]] = r["valid"] and a2.get(r["doc_id"], True)
    assert a2 == b
