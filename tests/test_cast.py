"""Cast pipeline tests mirroring the reference's cast corpus
(/root/reference/test/xema/cast/*, castable.ex semantics)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from xema_spark.cast import cast_and_validate, cast_df


def test_string_to_number_and_bool(spark):
    df = spark.createDataFrame(
        [("1", "2.5", "true"), ("x", "nope", "TRUE"), (None, None, None)],
        ["i", "f", "b"])
    rule = {"type": "object", "properties": {
        "i": {"type": "integer"}, "f": {"type": "number"}, "b": {"type": "boolean"}}}
    out = cast_df(df, rule).collect()
    assert out[0]["i"] == 1 and out[0]["f"] == 2.5 and out[0]["b"] is True
    # non-coercible -> NULL; "TRUE" does NOT cast (castable.ex:62-64 is exact-match)
    assert out[1]["i"] is None and out[1]["f"] is None and out[1]["b"] is None
    assert out[2]["i"] is None


def test_float_to_integer_only_when_intlike(spark):
    df = spark.createDataFrame([(1.0,), (1.5,)], ["i"])
    rule = {"type": "object", "properties": {"i": {"type": "integer"}}}
    out = cast_df(df, rule).collect()
    assert out[0]["i"] == 1 and out[1]["i"] is None


def test_date_cast(spark):
    df = spark.createDataFrame([("2024-02-29",), ("2024-02-30",)], ["d"])
    rule = {"type": "object", "properties": {"d": {"type": "any", "format": "date"}}}
    out = cast_df(df, rule).collect()
    assert out[0]["d"] == datetime.date(2024, 2, 29) and out[1]["d"] is None


def test_defaults_fill_in(spark):
    df = spark.createDataFrame([("5",), (None,)], ["n"])
    rule = {"type": "object",
            "properties": {"n": {"type": "integer", "default": 42}}}
    out = cast_df(df, rule).collect()
    assert out[0]["n"] == 5 and out[1]["n"] == 42


def test_cast_then_validate(spark):
    df = spark.createDataFrame([("10",), ("3",), ("xx",)], ["n"])
    rule = {"type": "object",
            "properties": {"n": {"type": "integer", "minimum": 5}},
            "required": ["n"]}
    out = cast_and_validate(df, rule)
    got = {r["n"]: r["valid"] for r in out.collect()}
    assert got[10] is True and got[3] is False and got[None] is False
