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


def test_combiner_cast_any_of(spark):
    """anyOf cast = first-success coalesce (xema.ex:1078-1147): int-parse
    wins where it succeeds, number-parse as fallback, NULL when neither."""
    df = spark.createDataFrame([("7",), ("7.5",), ("x",)], ["v"])
    rule = {"type": "object", "properties": {
        "v": {"anyOf": [{"type": "integer"}, {"type": "number"}]}}}
    out = cast_df(df, rule).collect()
    assert out[0]["v"] == 7.0 and out[1]["v"] == 7.5 and out[2]["v"] is None


def test_combiner_cast_all_of_sequential(spark):
    """allOf casts compose sequentially (string -> number via the chain)."""
    df = spark.createDataFrame([("3",)], ["v"])
    rule = {"type": "object", "properties": {
        "v": {"allOf": [{"type": "number"}, {"minimum": 0}]}}}
    assert cast_df(df, rule).collect()[0]["v"] == 3.0


def test_decimal_cast(spark):
    df = spark.createDataFrame([("12.345",), ("bad",)], ["v"])
    rule = {"type": "object", "properties": {
        "v": {"type": "number", "decimal": {"precision": 10, "scale": 3}}}}
    out = cast_df(df, rule)
    assert "decimal(10,3)" in out.schema["v"].dataType.simpleString()
    rows = out.collect()
    assert str(rows[0]["v"]) == "12.345" and rows[1]["v"] is None


def test_additional_properties_delete(spark):
    """:delete drops undeclared columns; pattern_properties matches stay
    (xema.ex:1007-1019)."""
    df = spark.createDataFrame([(1, "a", "junk", 5)], ["id", "name", "extra", "n_x"])
    rule = {"type": "object",
            "properties": {"id": {}, "name": {"type": "string"}},
            "patternProperties": {"^n_": {}},
            "additionalProperties": False}
    out = cast_df(df, rule, additional_properties="delete")
    assert out.columns == ["id", "name", "n_x"]
    # without the opt the projection is untouched
    assert cast_df(df, rule).columns == ["id", "name", "extra", "n_x"]


def test_custom_caster_hook(spark):
    import pandas as pd

    from xema_spark.rules import register_caster

    def shouty(s):
        return s.str.upper()

    register_caster("shouty", shouty)
    df = spark.createDataFrame([("ab",), (None,)], ["v"])
    rule = {"type": "object", "properties": {"v": {"caster": "shouty"}}}
    rows = cast_df(df, rule).collect()
    assert rows[0]["v"] == "AB" and rows[1]["v"] is None


def test_custom_validator_hook(spark):
    """{'validator': name} composes a registered vectorized predicate into
    the rule tree with its own keyword row (validator.ex:1020-1041)."""
    from xema_spark.compiler import explode_violations, validate_df
    from xema_spark.rules import RuleError, register_validator

    register_validator("no_zed", lambda s: ~s.str.contains("z", na=False))
    rule = {"type": "object", "properties": {
        "t": {"type": "string", "validator": "no_zed", "minLength": 2}}}
    df = spark.createDataFrame([("ok",), ("zap",), (None,)], ["t"])
    out = validate_df(df, rule)
    rows = {r["t"]: r for r in out.collect()}
    assert rows["ok"]["valid"] is True
    assert rows["zap"]["valid"] is False
    assert rows[None]["valid"] is True  # NULL == absent convention
    kw = [r["keyword"] for r in explode_violations(out.filter(~F.col("valid")), ["t"]).collect()]
    assert kw == ["validator"]
    # unregistered name fails meta-validation at compile time
    import pytest
    with pytest.raises(RuleError):
        validate_df(df, {"type": "object", "properties": {"t": {"validator": "nope"}}})


def test_fail_mode_early_vs_finally(spark):
    """:early keeps the first failing KEYWORD GROUP per row (behaviour.ex:95,
    validator.ex:854 — the with-chain stops at the first failing check but
    that check may carry several errors, e.g. every failing property);
    :finally collects all; :immediately returns no detail (behaviour.ex:36)."""
    from pyspark.sql import Row

    from xema_spark.compiler import validate_df

    df = spark.createDataFrame([("no",)], ["t"])
    rule = {"type": "object", "properties": {
        "t": {"type": "string", "minLength": 5, "pattern": "^yes"}}}
    finally_rows = validate_df(df, rule, mode="finally").collect()[0]
    early_rows = validate_df(df, rule, mode="early").collect()[0]
    imm = validate_df(df, rule, mode="immediately")
    assert len(finally_rows["violations"]) == 2
    assert len(early_rows["violations"]) == 1
    assert early_rows["violations"][0]["keyword"] == finally_rows["violations"][0]["keyword"]
    assert "violations" not in imm.columns and imm.collect()[0]["valid"] is False

    # with-chain GROUP semantics (ADVICE r3): every per-property subtree is
    # part of the single all_properties step (validator.ex:797-827), so
    # :early keeps ALL failing properties — a minLength error on `a` does
    # NOT shadow a maximum error on `b` — while each property's own chain
    # still truncates internally (c fails maximum AND multipleOf -> only
    # maximum survives, number chain order validator.ex:201-207).
    df2 = spark.createDataFrame([Row(a="x", b="y", c=5)])
    rule2 = {"type": "object", "properties": {
        "a": {"minLength": 3}, "b": {"minLength": 3},
        "c": {"maximum": 1, "multipleOf": 7}}}
    fin2 = validate_df(df2, rule2, mode="finally").collect()[0]
    early2 = validate_df(df2, rule2, mode="early").collect()[0]
    assert len(fin2["violations"]) == 4
    assert len(early2["violations"]) == 3
    assert {v["keyword"] for v in early2["violations"]} == {"min_length", "maximum"}


def test_nested_struct_and_array_cast(spark):
    """Children-first reshaping (castable.ex:190-349): struct fields and
    array items coerce through one projection, NULL containers stay NULL."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(obj=Row(n="7", d="2024-01-02"), xs=["1", "x", "3"]),
         Row(obj=None, xs=None)])
    rule = {"type": "object", "properties": {
        "obj": {"type": "object", "properties": {
            "n": {"type": "integer", "default": -1},
            "d": {"type": "any", "format": "date"}}},
        "xs": {"type": "array", "items": {"type": "integer"}},
    }}
    rows = cast_df(df, rule).collect()
    assert rows[0]["obj"]["n"] == 7
    assert str(rows[0]["obj"]["d"]) == "2024-01-02"
    assert rows[0]["xs"] == [1, None, 3]
    assert rows[1]["obj"] is None and rows[1]["xs"] is None


def test_map_value_cast(spark):
    df = spark.createDataFrame([({"a": "1", "b": "x"},)], ["m"])
    rule = {"type": "object", "properties": {
        "m": {"type": "object", "additionalProperties": {"type": "integer"}}}}
    out = cast_df(df, rule).collect()[0]["m"]
    assert out == {"a": 1, "b": None}


def test_fail_mode_early_nested_rule(spark):
    """:early truncation is HIERARCHICAL: an earlier with-chain step at the
    top level (required, rank before all_properties — validator.ex:148-156)
    shadows every property error; with required satisfied, all failing
    properties are kept across nesting levels, each property's own node
    truncated to ITS first failing step."""
    from pyspark.sql import Row

    from xema_spark.compiler import validate_df

    df = spark.createDataFrame([Row(obj=Row(name="x", n=999), tag="nope")])
    rule = {"type": "object", "properties": {
        "obj": {"type": "object", "properties": {
            "name": {"minLength": 3, "pattern": "^ok"},
            "n": {"maximum": 100}}},
        "tag": {"pattern": "^ok"},
    }}
    fin = validate_df(df, rule, mode="finally").collect()[0]
    early = validate_df(df, rule, mode="early").collect()[0]
    # finally: name.min_length, name.pattern, n.maximum, tag.pattern
    assert len(fin["violations"]) == 4
    # early: all_properties collects obj AND tag; within name, min_length
    # (chain rank 10) shadows pattern (rank 12)
    assert {(v["path"], v["keyword"]) for v in early["violations"]} == {
        ("$.obj.name", "min_length"), ("$.obj.n", "maximum"),
        ("$.tag", "pattern")}

    # a failing earlier step (required precedes all_properties in the map
    # chain) shadows the whole property step under :early
    rule_req = dict(rule, required=["missing"])
    early_req = validate_df(df, rule_req, mode="early").collect()[0]
    fin_req = validate_df(df, rule_req, mode="finally").collect()[0]
    assert [v["keyword"] for v in early_req["violations"]] == ["required"]
    assert len(fin_req["violations"]) == 5


def test_composite_defaults_do_not_crash(spark):
    """F.lit raises for list/dict defaults; schema-legal composite defaults
    must either apply (scalar-element arrays, typed empty arrays) or be
    skipped — never crash cast compilation (ADVICE r2)."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(tags=None, meta=None, n=None)],
        "tags array<string>, meta map<string,string>, n bigint")
    rule = {"type": "object", "properties": {
        "tags": {"type": "array", "default": ["a", "b"]},
        "meta": {"default": {"k": "v"}},   # dict default: skipped, not fatal
        "n": {"type": "integer", "default": 7},
    }}
    row = cast_df(df, rule).collect()[0]
    assert row["tags"] == ["a", "b"]
    assert row["meta"] is None          # composite dict default skipped
    assert row["n"] == 7

    empty = {"type": "object", "properties": {
        "tags": {"type": "array", "default": []}}}
    assert cast_df(df, empty).collect()[0]["tags"] == []


# ---------------------------------------------------------------------------
# container reshaping (castable.ex:190-349), the typed-representable subset
# of test/xema/cast/{map,struct,tuple,keyword}_test.exs
# ---------------------------------------------------------------------------

def test_pairs_to_map_reshape(spark):
    """Keyword-list (array<struct<k,v>>) -> map (castable.ex:215-224;
    map_test.exs 'from a keyword list' / 'from an empty list'). Strictness:
    NULL or duplicate keys fail the whole cast to NULL (the ambiguous-key
    error, castable.ex:283-299) — never last-write-wins."""
    df = spark.createDataFrame(
        [(1, [("a", "1"), ("b", "2")]),
         (2, [("a", "1"), ("a", "2")]),
         (3, [(None, "1")]),
         (4, []),
         (5, None)],
        "id long, kv array<struct<k string, v string>>")
    rule = {"type": "object", "properties": {
        "kv": {"type": "map", "additional_properties": {"type": "integer"}}}}
    out = {r["id"]: r["kv"] for r in cast_df(df, rule).collect()}
    assert out[1] == {"a": 1, "b": 2}          # values cast toward the schema
    assert out[2] is None and out[3] is None   # ambiguous / NULL key
    assert out[4] == {} and out[5] is None     # empty list -> empty map


def test_map_to_struct_reshape(spark):
    """map -> struct via properties (castable.ex:259-264 to_struct).
    struct! semantics: unknown map keys fail the cast (KeyError analogue);
    missing keys become NULL fields filled by declared defaults."""
    df = spark.createDataFrame(
        [(1, {"lang": "en", "n": "5"}),
         (2, {"lang": "de"}),
         (3, {"lang": "fr", "bogus": "x"}),
         (4, None)],
        "id long, m map<string,string>")
    rule = {"type": "object", "properties": {
        "m": {"type": "struct", "properties": {
            "lang": {"type": "string"},
            "n": {"type": "integer", "default": 0}}}}}
    out = {r["id"]: r["m"] for r in cast_df(df, rule).collect()}
    assert out[1].asDict() == {"lang": "en", "n": 5}
    assert out[2].asDict() == {"lang": "de", "n": 0}
    assert out[3] is None and out[4] is None


def test_map_to_struct_via_registered_module(spark):
    """`module` names a registered StructType (struct_test.exs; the Elixir
    struct module made explicit — compiler.register_module is the same
    registry the `module` validation keyword uses). Module field types are
    authoritative: values try_cast toward them."""
    from xema_spark.compiler import register_module
    from pyspark.sql import types as T

    register_module("CastPoint", T.StructType([
        T.StructField("x", T.LongType()), T.StructField("y", T.LongType())]))
    df = spark.createDataFrame(
        [(1, {"x": "3", "y": "4"}), (2, {"x": "3", "z": "9"})],
        "id long, m map<string,string>")
    rule = {"type": "object", "properties": {
        "m": {"type": "struct", "module": "CastPoint"}}}
    out = {r["id"]: r["m"] for r in cast_df(df, rule).collect()}
    assert out[1].asDict() == {"x": 3, "y": 4}
    assert out[2] is None        # z is not a CastPoint field -> struct! error


def test_struct_to_map_reshape(spark):
    """struct -> map (castable.ex:261-279: an Elixir struct IS a map).
    Mixed-type structs need an additional_properties value schema, else the
    cast fails loudly at COMPILE time — silent stringification loses data."""
    import pytest
    from xema_spark.cast import CastError

    df = spark.createDataFrame(
        [(1, (3, 4)), (2, None)], "id long, s struct<x long, y long>")
    rule = {"type": "object", "properties": {"s": {"type": "map"}}}
    out = {r["id"]: r["s"] for r in cast_df(df, rule).collect()}
    assert out[1] == {"x": 3, "y": 4} and out[2] is None

    mixed = spark.createDataFrame([(1, ("a", 4))],
                                  "id long, s struct<x string, y long>")
    with pytest.raises(CastError, match="single common field type"):
        cast_df(mixed, rule)
    via_schema = {"type": "object", "properties": {
        "s": {"type": "map", "additional_properties": {"type": "string"}}}}
    assert cast_df(mixed, via_schema).collect()[0]["s"] == {"x": "a", "y": "4"}


def test_map_to_keyword_and_tuple_alias(spark):
    """map -> keyword = sorted entry pairs (castable.ex:281-301; insertion
    order doesn't exist in Spark maps, so key order is the deterministic
    substitute). tuple/list are at-rest aliases of array (tuple_test.exs
    'from a list'): a tuple-typed rule leaves an array column untouched."""
    df = spark.createDataFrame(
        [(1, {"b": 2, "a": 1}, [10, 20])],
        "id long, m map<string,long>, t array<long>")
    rule = {"type": "object", "properties": {
        "m": {"type": "keyword"}, "t": {"type": "tuple"}}}
    row = cast_df(df, rule).collect()[0]
    assert [(e["key"], e["value"]) for e in row["m"]] == [("a", 1), ("b", 2)]
    assert row["t"] == [10, 20]


def test_reshape_then_validate_roundtrip(spark):
    """cast-then-validate through a reshape: the reshaped struct feeds the
    normal properties/required validation pass (xema.ex:720-739)."""
    df = spark.createDataFrame(
        [(1, {"lang": "en", "n": "5"}),
         (2, {"lang": "de", "n": "999"}),
         (3, {"oops": "x"})],
        "id long, m map<string,string>")
    rule = {"type": "object",
            "required": ["m"],   # a failed reshape -> NULL m -> required
            "properties": {
                "m": {"type": "struct",
                      "properties": {"lang": {"type": "string"},
                                     "n": {"type": "integer", "maximum": 100}},
                      "required": ["lang"]}}}
    out = {r["id"]: r for r in cast_and_validate(df, rule).collect()}
    assert out[1]["valid"] is True
    assert out[2]["valid"] is False          # n > maximum after the cast
    assert out[3]["valid"] is False          # unknown key killed the cast
