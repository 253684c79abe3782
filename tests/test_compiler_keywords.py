"""Per-keyword conformance cases mirroring FIXTURES.md T3 and the reference's
draft7 corpus (/root/reference/test/json_schema_test_suite/draft7/*)."""

from __future__ import annotations

import pytest

from tests.helpers import check_cases
from xema_spark.rules import RuleError, meta_validate, normalize_rule


class TestScalars:
    def test_string_len(self, spark):
        # test/xema/string_test.exs:48-60; validator.ex:564-586
        check_cases(spark, {"type": "string", "minLength": 3, "maxLength": 4}, [
            ("foo", True), ("abcd", True), ("a", False), ("abcde", False),
            (42, False),
        ])

    def test_pattern(self, spark):
        # docs/usage.md:126-137 — unanchored search semantics
        check_cases(spark, {"type": "string", "pattern": "[0-9]-[A-B]+"}, [
            ("1-AB", True), ("x 1-A y", True), ("foo", False),
        ])

    def test_number_range_draft4_boolean_exclusive(self, spark):
        # validator.ex:483-550
        rule = {"type": "number", "minimum": 2, "maximum": 4, "exclusiveMaximum": True}
        check_cases(spark, rule, [
            (2, True), (3.9, True), (1, False), (4, False), (4.0, False),
            ("2", False),
        ])

    def test_number_range_draft6_numeric_exclusive(self, spark):
        check_cases(spark, {"exclusiveMinimum": 0}, [
            (1, True), (0, False), (-1, False), (0.001, True),
            ("x", True),  # non-number: numeric keywords don't apply
        ])

    def test_multiple_of(self, spark):
        # validator.ex:552-562; draft7/multiple_of_test.exs
        check_cases(spark, {"type": "number", "multipleOf": 1.5}, [
            (0, True), (4.5, True), (35, False),
        ])
        check_cases(spark, {"type": "integer", "multipleOf": 2}, [
            (4, True), (-4, True), (7, False),
        ])
        check_cases(spark, {"multipleOf": 0.01}, [
            (0.03, True), (0.07, True), (0.005, False),
        ])

    def test_integer_accepts_int_like_float(self, spark):
        # like_integer coercion (validator.ex:250)
        check_cases(spark, {"type": "integer"}, [
            (1.0, True), (1.5, False), (3, True), ("3", False),
        ])

    def test_enum(self, spark):
        # validator.ex:346-376 — int/float cross-match
        rule = {"enum": [1, 1.0, "red"]}
        check_cases(spark, rule, [
            (1, True), (1.0, True), ("red", True), (2, False), ("blue", False),
        ])

    def test_const(self, spark):
        # validator.ex:274-292 — numeric 5 == 5.0
        check_cases(spark, {"const": 5}, [
            (5, True), (5.0, True), (6, False), ("5", False),
        ])
        check_cases(spark, {"const": "a"}, [("a", True), ("b", False), (1, False)])

    def test_boolean_schemas(self, spark):
        # validator.ex:69-71
        check_cases(spark, True, [(1, True), ("x", True)])
        check_cases(spark, False, [(1, False), ("x", False)])

    def test_type_union(self, spark):
        # validator.ex:73-79,262-268
        check_cases(spark, {"type": ["integer", "string"]}, [
            (1, True), ("x", True), (1.5, False), (True, False),
        ])

    def test_boolean_type_not_integer(self, spark):
        check_cases(spark, {"type": "integer"}, [(True, False)])
        check_cases(spark, {"type": "boolean"}, [(True, True), (1, False)])


class TestArrays:
    def test_list_items(self, spark):
        # FIXTURES list_items; validator.ex:598-721
        rule = {"type": "array", "items": {"type": "number", "minimum": 2},
                "minItems": 1, "maxItems": 5, "uniqueItems": True}
        check_cases(spark, rule, [
            ([2, 3, 4], True), ([2, 3, 1], False), ([], False),
            ([2, 2], False), ([1, 2, 3, 4, 5, 6], False),
        ])

    def test_tuple_items_additional(self, spark):
        # validator.ex:723-777; draft7/additional_items_test.exs
        rule = {"items": [{"type": "integer"}, {"type": "integer", "minimum": 10}],
                "additionalItems": False}
        check_cases(spark, rule, [
            ([1, 11], True), ([1], True), ([1, 11, 3], False), ([1, 2], False),
        ])
        rule2 = {"items": [{"type": "integer"}],
                 "additionalItems": {"type": "integer", "minimum": 5}}
        check_cases(spark, rule2, [
            ([1], True), ([1, 6, 7], True), ([1, 3], False),
        ])

    def test_contains(self, spark):
        # draft7/contains_test.exs:8-40
        check_cases(spark, {"contains": {"minimum": 5}}, [
            ([3, 4, 5], True), ([2, 3, 4], False), ([], False), ([6], True),
        ])

    def test_unique_items_structs(self, spark):
        check_cases(spark, {"uniqueItems": True}, [
            ([{"a": 1}, {"a": 2}], True),
            ([{"a": 1}, {"a": 1}], False),
        ])

    def test_nested_arrays(self, spark):
        rule = {"items": {"type": "array", "items": {"type": "integer", "minimum": 0}}}
        check_cases(spark, rule, [
            ([[0, 1], [2]], True), ([[0], [-1]], False),
        ])


class TestObjects:
    def test_properties_required(self, spark):
        # test/xema/opt_fail_test.exs:16-31
        rule = {"type": "object",
                "properties": {"foo": {"type": "integer"}, "bar": {"type": "integer"}},
                "required": ["foo"]}
        check_cases(spark, rule, [
            ({"foo": 5, "bar": 7}, True),
            ({"bar": 7}, False),
            ({"foo": "x"}, False),
        ])

    def test_max_properties_map(self, spark):
        rule = {"type": "object", "maxProperties": 2}
        check_cases(spark, rule, [
            ({"a": 1, "b": 2}, True), ({"a": 1, "b": 2, "c": 3}, False),
        ], as_map=True)

    def test_pattern_properties_struct(self, spark):
        # validator.ex:899-917
        rule = {"patternProperties": {"^str_": {"type": "string"}}}
        check_cases(spark, rule, [
            ({"str_a": "ok", "other": 1}, True),
            ({"str_a": 4}, False),
        ])

    def test_additional_properties_struct(self, spark):
        # validator.ex:919-963
        rule = {"properties": {"foo": {"type": "integer"}},
                "additionalProperties": False}
        check_cases(spark, rule, [
            ({"foo": 1}, True),
            ({"foo": 1, "zzz": 1}, False),
        ])

    def test_additional_properties_schema_map(self, spark):
        rule = {"properties": {"foo": {"minimum": 0}},
                "additionalProperties": {"minimum": 10}}
        check_cases(spark, rule, [
            ({"foo": 1, "bar": 11}, True),
            ({"foo": 1, "bar": 2}, False),
        ], as_map=True)

    def test_property_names(self, spark):
        # validator.ex:318-344; draft7/property_names_test.exs
        rule = {"propertyNames": {"pattern": "^[a-z]+$"}}
        check_cases(spark, rule, [
            ({"abc": 1}, True), ({"A1": 1}, False),
        ])
        check_cases(spark, rule, [
            ({"abc": 1}, True), ({"A1": 1}, False),
        ], as_map=True)

    def test_pattern_properties_map(self, spark):
        rule = {"patternProperties": {"^str_": {"minimum": 10}}}
        check_cases(spark, rule, [
            ({"str_a": 11, "other": 1}, True),
            ({"str_a": 4}, False),
        ], as_map=True)

    def test_dependencies_list(self, spark):
        # validator.ex:965-1004; draft7/dependencies_test.exs
        rule = {"dependencies": {"credit_card": ["billing_address"]}}
        check_cases(spark, rule, [
            ({"credit_card": 1, "billing_address": 2}, True),
            ({"billing_address": 2}, True),
            ({"credit_card": 1}, False),
        ], as_map=True)

    def test_dependencies_schema(self, spark):
        rule = {"dependencies": {"a": {"required": ["b"]}}}
        check_cases(spark, rule, [
            ({"a": 1, "b": 2}, True), ({"a": 1}, False), ({"b": 2}, True),
        ], as_map=True)

    def test_min_properties_struct(self, spark):
        rule = {"minProperties": 2}
        check_cases(spark, rule, [
            ({"a": 1, "b": 2}, True),
        ])


class TestCombiners:
    def test_one_of(self, spark):
        # validator.ex:449-481
        rule = {"oneOf": [{"multipleOf": 3}, {"multipleOf": 5}]}
        check_cases(spark, rule, [
            (9, True), (10, True), (15, False), (2, False),
        ])

    def test_any_of_all_of_not(self, spark):
        check_cases(spark, {"anyOf": [{"minimum": 10}, {"multipleOf": 2}]}, [
            (4, True), (11, True), (3, False),
        ])
        check_cases(spark, {"allOf": [{"minimum": 2}, {"multipleOf": 2}]}, [
            (4, True), (2, True), (3, False), (0, False),
        ])
        check_cases(spark, {"not": {"type": "integer"}}, [
            (5, False), ("x", True), (1.5, True),
        ])

    def test_if_then_else(self, spark):
        # validator.ex:294-316; draft7/if_then_else_test.exs
        rule = {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10},
                "else": {"multipleOf": 2}}
        check_cases(spark, rule, [
            (-1, True), (4, True), (-100, False), (3, False),
        ])

    def test_ref_defs(self, spark):
        # the reference's own bench schema (bench/ref.exs:49-62)
        rule = {
            "definitions": {
                "pos": {"type": "integer", "minimum": 0},
                "neg": {"type": "integer", "maximum": 0},
            },
            "properties": {
                "pos": {"$ref": "#/definitions/pos"},
                "neg": {"$ref": "#/definitions/neg"},
            },
        }
        check_cases(spark, rule, [
            ({"neg": -5, "pos": 6}, True),
            ({"neg": 1, "pos": 6}, False),
        ])


class TestMetaValidation:
    def test_bad_rules_rejected(self):
        for bad in [
            {"type": "integerz"},
            {"minLength": -1},
            {"minimum": "x"},
            {"pattern": "["},
            {"enum": []},
            {"multipleOf": 0},
            {"required": [1]},
            {"oneOf": []},
        ]:
            with pytest.raises(RuleError):
                meta_validate(normalize_rule(bad))

    def test_normalization(self):
        n = normalize_rule({"type": "list", "minItems": 1,
                            "items": {"type": "map", "additionalProperties": False}})
        # container spellings whose Spark representation differs (map vs
        # struct vs keyword vs tuple) survive as the xema_type annotation —
        # cast reshaping dispatches on it; "list" needs none (array == list)
        assert n == {"type": "array", "min_items": 1,
                     "items": {"type": "object", "xema_type": "map",
                               "additional_properties": False}}
