"""Shared test helper: run (rule, [(value, expected_valid)]) case tables
through BOTH the Column compiler and the pure-Python interpreter, batched by
Spark schema so a whole case family is one Spark job.

Mirrors the reference's generated conformance corpus shape
(/root/reference/test/json_schema_test_suite/draft7/*: schema + list of
(data, valid?) cases).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F
from pyspark.sql import types as T

from xema_spark.compiler import compile_rule
from xema_spark.interpreter import validate_value
from xema_spark.rules import meta_validate, normalize_rule


def spark_type_of(value: Any) -> T.DataType:
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, str):
        return T.StringType()
    if isinstance(value, list):
        elem = spark_type_of(value[0]) if value else T.StringType()
        return T.ArrayType(elem, True)
    if isinstance(value, dict):
        return T.StructType(
            [T.StructField(k, spark_type_of(v), True) for k, v in value.items()]
        )
    if value is None:
        return T.StringType()
    raise TypeError(f"unsupported test value {value!r}")


def check_cases(spark, rule, cases, *, skip_interp: bool = False,
                as_map: bool = False) -> None:
    """cases: list of (value, expected_valid). Groups by schema; one Spark job
    per schema group. Also differentially checks the Python interpreter."""
    nrule = normalize_rule(rule)
    meta_validate(nrule)

    if not skip_interp:
        for i, (value, expected) in enumerate(cases):
            got = validate_value(nrule, value)
            assert got == expected, (
                f"interpreter case {i}: value={value!r} expected={expected} got={got}")

    groups: dict[str, tuple[T.DataType, list[tuple[int, Any, bool]]]] = {}
    for i, (value, expected) in enumerate(cases):
        if as_map and isinstance(value, dict):
            vtypes = {spark_type_of(v).simpleString() for v in value.values()} or {"string"}
            assert len(vtypes) == 1, "as_map needs homogeneous dict values"
            dt: T.DataType = T.MapType(T.StringType(),
                                       spark_type_of(next(iter(value.values()))) if value else T.StringType())
        else:
            dt = spark_type_of(value)
        key = dt.simpleString()
        groups.setdefault(key, (dt, []))[1].append((i, value, expected))

    for dt, rows in groups.values():
        schema = T.StructType([
            T.StructField("case_id", T.IntegerType(), False),
            T.StructField("v", dt, True),
        ])
        df = spark.createDataFrame([(i, v) for i, v, _ in rows], schema)
        compiled = compile_rule(nrule, F.col("v"), dt)
        got = {
            r["case_id"]: (r["ok"], r["viols"])
            for r in df.select(
                "case_id",
                compiled.valid.alias("ok"),
                compiled.violations.alias("viols"),
            ).collect()
        }
        for i, v, expected in rows:
            ok, viols = got[i]
            assert ok == expected, (
                f"compiler case {i}: value={v!r} dtype={dt.simpleString()} "
                f"expected={expected} got={ok} viols={viols}")
            if expected:
                assert viols == [], f"case {i}: valid row has violations {viols}"
            else:
                assert len(viols) > 0, f"case {i}: invalid row has no violations"
