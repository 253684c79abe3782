"""The vectorized fast path of validate_json_df must agree with the
recursive interpreter on every (rule, value) pair — the closures in
interpreter._vector_plan are conjunctive NECESSARY conditions, and when the
plan reports full coverage they are SUFFICIENT too.

Pure-Python agreement runs over the cross product of a rule battery and a
value battery (no Spark); one end-to-end case drives the actual pandas UDF
with SQL nulls and malformed JSON in the column.
"""
from __future__ import annotations

import json

import pytest

from xema_spark.interpreter import _vector_plan, validate_value
from xema_spark.rules import normalize_rule

# rules chosen to hit every vector closure, both fully-covered and
# residual-walk shapes, plus plan-disabling shapes (ref)
RULES = [
    {"type": "integer", "minimum": 0, "maximum": 10},
    {"type": ["integer", "string"]},
    {"type": "number", "exclusiveMinimum": 2, "exclusiveMaximum": 7},
    # draft-4 boolean exclusive flips the paired bound
    {"minimum": 5, "exclusiveMinimum": True},
    {"maximum": 5, "exclusiveMaximum": True},
    {"const": 5},
    {"const": True},
    {"enum": [1, "a", True, None, 2.0]},
    {"type": "string", "minLength": 2, "maxLength": 4},
    {"type": "string", "pattern": "^a.*z$"},
    {"pattern": "b"},  # non-strings pass
    {"required": ["k"]},
    {"type": "object", "required": ["k"],
     "properties": {"k": {"type": "integer", "minimum": 0, "maximum": 75}}},
    # nested fully-vectorizable properties
    {"type": "object",
     "properties": {"o": {"type": "object",
                          "properties": {"n": {"type": "number"}}}}},
    # residual keywords force the walk for survivors
    {"type": "integer", "multipleOf": 3},
    {"type": "object", "properties": {"k": {"format": "date"}},
     "required": ["k"]},
    {"type": "array", "minItems": 1},
    {"not": {"type": "string"}, "minimum": 3},
    True,
    False,
]

VALUES = [
    None, True, False, 0, 1, 5, 5.0, 4.999, 7, 10, 11, 2.5, -1, 3, 6, 9,
    "", "a", "ab", "abz", "aXYz", "abcd", "abcde", "b", 2.0,
    [], [1], ["a"], {}, {"k": 1}, {"k": -1}, {"k": 75}, {"k": 76},
    {"k": "2024-01-01"}, {"k": "x"}, {"x": 1},
    {"o": {"n": 1}}, {"o": {"n": "s"}}, {"o": {}}, {"o": 3},
]


@pytest.mark.parametrize("rule", RULES, ids=lambda r: json.dumps(r)[:48])
def test_vector_plan_agrees_with_walk(rule):
    nrule = normalize_rule(rule) if not isinstance(rule, bool) else rule
    plan = _vector_plan(nrule) if isinstance(nrule, dict) else None
    expected = [validate_value(rule, v) for v in VALUES]
    if plan is None:
        return  # nothing vectorized; the walk is the only path
    checks, full = plan
    ok = [True] * len(VALUES)
    for c in checks:
        ok = [a and b for a, b in zip(ok, c(list(VALUES)))]
    for v, exp, got in zip(VALUES, expected, ok):
        if full:
            assert got == exp, (rule, v)
        else:  # necessary condition: a vector fail is a definitive fail
            if not got:
                assert not exp, (rule, v)


def test_full_coverage_detection():
    full_rule = normalize_rule(
        {"type": "object", "required": ["k"],
         "properties": {"k": {"type": "integer", "minimum": 0}}})
    assert _vector_plan(full_rule)[1] is True
    partial = normalize_rule({"type": "integer", "multipleOf": 3})
    assert _vector_plan(partial)[1] is False
    # ref early-returns in _valid ignoring siblings: plan must refuse
    assert _vector_plan(normalize_rule(
        {"ref": "#/definitions/x", "type": "integer",
         "definitions": {"x": {"type": "string"}}})) is None


def test_validate_json_df_end_to_end(spark):
    from xema_spark.interpreter import validate_json_df

    rule = {"type": "object", "required": ["k"],
            "properties": {"k": {"type": "integer", "minimum": 0,
                                 "maximum": 75}}}
    # deep nesting: json.loads raises RecursionError on this payload — the
    # decode try must treat it as bad JSON (valid=False), not crash the task
    deep = "[" * 200_000 + "]" * 200_000
    payloads = [json.dumps(v) for v in VALUES] + [None, "{not json", "", deep]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)],
                               "i int, js string")
    got = {r["i"]: r["valid"]
           for r in validate_json_df(df, "js", rule).collect()}
    for i, p in enumerate(payloads):
        if p is None:
            assert got[i] is None, i
        else:
            try:
                exp = validate_value(rule, json.loads(p))
            except (json.JSONDecodeError, RecursionError):
                exp = False
            assert got[i] == exp, (i, p)


def test_residual_rule_end_to_end(spark):
    """A rule with a non-vectorizable keyword still validates correctly —
    the vector closures only prefilter, the walk decides survivors."""
    from xema_spark.interpreter import validate_json_df

    rule = {"type": "integer", "multipleOf": 3, "minimum": 0}
    df = spark.createDataFrame(
        [(i, json.dumps(v)) for i, v in enumerate([-3, 0, 3, 4, 6, "x", 9.0])],
        "i int, js string")
    got = {r["i"]: r["valid"]
           for r in validate_json_df(df, "js", rule).collect()}
    assert got == {0: False, 1: True, 2: True, 3: False, 4: True,
                   5: False, 6: True}
