"""Thin rule builder (Xema.Builder analogue, builder.ex:26-175): builder
output is plain rule dicts that compile/validate identically to
hand-written ones."""

from __future__ import annotations

from pyspark.sql import functions as F

from xema_spark import builder as x
from xema_spark.compiler import validate_df
from xema_spark.datagen import FLAGSHIP_RULE, gen_documents


def test_builder_rules_are_plain_dicts():
    r = x.object_(properties={"a": x.string(min_length=2),
                              "n": x.integer(minimum=0, maximum=9)},
                  required=["a"])
    assert r == {"type": "object",
                 "properties": {"a": {"type": "string", "min_length": 2},
                                "n": {"type": "integer", "minimum": 0,
                                      "maximum": 9}},
                 "required": ["a"]}
    assert x.enum("a", "b") == {"enum": ["a", "b"]}
    assert x.not_(x.const(5)) == {"not": {"const": 5}}
    assert x.any_of(x.integer(), x.string()) == {
        "any_of": [{"type": "integer"}, {"type": "string"}]}
    assert x.if_then_else(x.string(), then=x.any_(min_length=1)) == {
        "if": {"type": "string"}, "then": {"min_length": 1}}
    assert x.ref("#/definitions/pos") == {"$ref": "#/definitions/pos"}
    assert x.array(items=x.number(multiple_of=2), unique_items=True) == {
        "type": "array", "items": {"type": "number", "multiple_of": 2},
        "unique_items": True}


def test_builder_flagship_equivalent(spark):
    """The flagship rule rebuilt through the builder validates every doc
    identically to the hand-written dict."""
    built = x.object_(
        properties={
            "doc_id": x.string(pattern="^doc-[0-9]{8}$"),
            "spans": x.array(
                items=x.object_(
                    properties={"kind": x.enum("text", "media"),
                                "offset": x.integer(minimum=0)},
                    required=["kind"]),
                min_items=1),
        },
        required=["doc_id", "spans"])
    docs = gen_documents(spark, 400, with_expectations=True)
    v = validate_df(docs, built, mode="verdict")
    assert v.filter(F.col("valid") != F.col("expected_valid")).count() == 0
    # same-row comparison (never join on doc_id: dup ids are injected
    # deliberately): both verdict columns in ONE projection
    both = validate_df(validate_df(docs, FLAGSHIP_RULE, mode="verdict")
                       .withColumnRenamed("valid", "v_dict"),
                       built, mode="verdict")
    assert both.filter(F.col("v_dict") != F.col("valid")).count() == 0


def test_builder_const_none_and_rate_guard():
    """const(None) is the must-be-null rule, not an accept-everything {};
    sampling validates default_rate like every stratum rate."""
    import pytest

    assert x.const(None) == {"const": None}

    from xema_spark.sampling import stratified_deterministic_sample

    class _FakeDF:  # rate validation happens before any Spark work
        pass

    with pytest.raises(ValueError, match="default_rate"):
        stratified_deterministic_sample(_FakeDF(), "id", "s", {"a": 0.5},
                                        default_rate=-0.2)
