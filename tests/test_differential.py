"""Property-based differential testing: the Column compiler and the
pure-Python interpreter must agree on every (rule, value) pair. Hypothesis
generates rules + values; values are batched into one Spark job per rule to
keep runtime sane."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.helpers import spark_type_of
from xema_spark.compiler import compile_rule
from xema_spark.interpreter import validate_value
from xema_spark.rules import meta_validate, normalize_rule

# --- rule strategies (scalar + array + object subsets the engine compiles) --

scalar_numbers = st.one_of(
    st.integers(min_value=-1000, max_value=1000),
    st.floats(min_value=-1000, max_value=1000, allow_nan=False, width=32).map(float),
)

num_rules = st.fixed_dictionaries({}, optional={
    "type": st.sampled_from(["integer", "number"]),
    "minimum": st.integers(-50, 50),
    "maximum": st.integers(-50, 50),
    "exclusiveMinimum": st.integers(-50, 50),
    "exclusiveMaximum": st.integers(-50, 50),
    "multipleOf": st.sampled_from([1, 2, 3, 5, 0.5, 1.5]),
    "const": st.integers(-5, 5),
    "enum": st.lists(st.integers(-5, 5), min_size=1, max_size=4),
})

str_rules = st.fixed_dictionaries({}, optional={
    "type": st.just("string"),
    "minLength": st.integers(0, 6),
    "maxLength": st.integers(0, 8),
    "pattern": st.sampled_from(["^a", "b$", "ab+", "[0-9]", "^[a-c]{1,3}$"]),
    "const": st.sampled_from(["a", "ab", "xyz"]),
    "enum": st.lists(st.sampled_from(["a", "b", "ab", "z9"]), min_size=1, max_size=3),
})

arr_item_rules = st.fixed_dictionaries({}, optional={
    "type": st.just("integer"),
    "minimum": st.integers(-5, 5),
})

arr_rules = st.fixed_dictionaries({}, optional={
    "type": st.just("array"),
    "minItems": st.integers(0, 4),
    "maxItems": st.integers(0, 6),
    "uniqueItems": st.booleans(),
    "items": arr_item_rules,
    "contains": arr_item_rules,
})


def combo(base):
    return st.one_of(
        base,
        st.fixed_dictionaries({"not": base}),
        st.fixed_dictionaries({"anyOf": st.lists(base, min_size=1, max_size=3)}),
        st.fixed_dictionaries({"allOf": st.lists(base, min_size=1, max_size=3)}),
        st.fixed_dictionaries({"oneOf": st.lists(base, min_size=1, max_size=3)}),
        st.fixed_dictionaries({"if": base}, optional={"then": base, "else": base}),
    )


def _agree(spark, rule, values):
    try:
        nrule = normalize_rule(rule)
        meta_validate(nrule)
    except Exception:
        return  # malformed rules are rejected before compile — out of scope
    groups: dict[str, tuple[T.DataType, list]] = {}
    for i, v in enumerate(values):
        dt = spark_type_of(v)
        groups.setdefault(dt.simpleString(), (dt, []))[1].append((i, v))
    for dt, rows in groups.values():
        schema = T.StructType([T.StructField("i", T.IntegerType(), False),
                               T.StructField("v", dt, True)])
        df = spark.createDataFrame(rows, schema)
        compiled = compile_rule(nrule, F.col("v"), dt)
        got = {r["i"]: r["ok"] for r in df.select("i", compiled.valid.alias("ok")).collect()}
        for i, v in rows:
            expected = validate_value(nrule, v)
            assert got[i] == expected, (
                f"divergence: rule={nrule!r} value={v!r} "
                f"interpreter={expected} compiler={got[i]}")


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rule=combo(num_rules),
       values=st.lists(scalar_numbers, min_size=4, max_size=12))
def test_numeric_rules_agree(spark, rule, values):
    _agree(spark, rule, values)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rule=combo(str_rules),
       values=st.lists(st.text(alphabet="abcz90", max_size=8), min_size=4, max_size=12))
def test_string_rules_agree(spark, rule, values):
    _agree(spark, rule, values)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rule=arr_rules,
       values=st.lists(st.lists(st.integers(-5, 5), max_size=6), min_size=3, max_size=8))
def test_array_rules_agree(spark, rule, values):
    _agree(spark, rule, values)
