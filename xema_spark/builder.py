"""Thin Python rule builder — the engine's Xema.Builder analogue.

The reference generates one builder function per type (integer/1, string/1,
map/1, ..., /root/reference/lib/xema/builder.ex:26-45) plus the combiners
any_of/all_of/one_of (builder.ex:94-168) and ref (builder.ex:175). Its
macro layer (`xema do ... end`, `xema_struct`) is Elixir module machinery
and stays a non-goal (SURVEY.md §7); what survives translation is the
ergonomic layer: compose rule dicts from typed function calls instead of
hand-writing keyword dicts.

Every function returns a PLAIN rule dict in the engine's normalized
(snake_case) form — builder output feeds validate_df / cast_df / the
compiler unchanged, and can be mixed freely with hand-written dicts:

    from xema_spark import builder as x
    rule = x.object_(
        properties={
            "doc_id": x.string(pattern=r"^doc-"),
            "spans": x.array(items=x.object_(
                properties={"kind": x.enum("text", "media"),
                            "offset": x.integer(minimum=0)},
                required=["kind"]), min_items=1),
        },
        required=["doc_id"])
"""

from __future__ import annotations

from typing import Any

Rule = dict


def _clean(type_: str | None, kw: dict[str, Any]) -> Rule:
    out: Rule = {} if type_ is None else {"type": type_}
    for k, v in kw.items():
        if v is None:
            continue
        out[k.rstrip("_")] = v  # not_/if_ style keyword escapes
    return out


def any_(**kw) -> Rule:
    return _clean(None, kw)


def string(min_length: int | None = None, max_length: int | None = None,
           pattern: str | None = None, format: str | None = None,
           **kw) -> Rule:
    return _clean("string", dict(min_length=min_length, max_length=max_length,
                                 pattern=pattern, format=format, **kw))


def integer(minimum=None, maximum=None, exclusive_minimum=None,
            exclusive_maximum=None, multiple_of=None, **kw) -> Rule:
    return _clean("integer", dict(
        minimum=minimum, maximum=maximum, exclusive_minimum=exclusive_minimum,
        exclusive_maximum=exclusive_maximum, multiple_of=multiple_of, **kw))


def number(minimum=None, maximum=None, exclusive_minimum=None,
           exclusive_maximum=None, multiple_of=None, **kw) -> Rule:
    return _clean("number", dict(
        minimum=minimum, maximum=maximum, exclusive_minimum=exclusive_minimum,
        exclusive_maximum=exclusive_maximum, multiple_of=multiple_of, **kw))


def boolean(**kw) -> Rule:
    return _clean("boolean", kw)


def null(**kw) -> Rule:
    return _clean("null", kw)


def array(items: Rule | list[Rule] | None = None, min_items: int | None = None,
          max_items: int | None = None, unique_items: bool | None = None,
          contains: Rule | None = None, additional_items=None, **kw) -> Rule:
    return _clean("array", dict(items=items, min_items=min_items,
                                max_items=max_items, unique_items=unique_items,
                                contains=contains,
                                additional_items=additional_items, **kw))


def object_(properties: dict[str, Rule] | None = None,
            required: list[str] | None = None,
            min_properties: int | None = None,
            max_properties: int | None = None,
            pattern_properties: dict[str, Rule] | None = None,
            additional_properties=None,
            property_names: Rule | None = None,
            dependencies: dict | None = None, **kw) -> Rule:
    return _clean("object", dict(
        properties=properties, required=required,
        min_properties=min_properties, max_properties=max_properties,
        pattern_properties=pattern_properties,
        additional_properties=additional_properties,
        property_names=property_names, dependencies=dependencies, **kw))


# map is the reference's name for open objects (builder.ex type list); alias
map_ = object_


def enum(*values, **kw) -> Rule:
    return _clean(None, dict(enum=list(values), **kw))


def const(value, **kw) -> Rule:
    # const(None) is the must-be-null rule — it must survive _clean's
    # None-means-absent convention, not silently become {}
    return {"const": value, **_clean(None, kw)}


def any_of(*schemas: Rule, **kw) -> Rule:
    return _clean(None, dict(any_of=list(schemas), **kw))


def all_of(*schemas: Rule, **kw) -> Rule:
    return _clean(None, dict(all_of=list(schemas), **kw))


def one_of(*schemas: Rule, **kw) -> Rule:
    return _clean(None, dict(one_of=list(schemas), **kw))


def not_(schema: Rule, **kw) -> Rule:
    return _clean(None, {"not": schema, **kw})


def if_then_else(if_: Rule, then: Rule | None = None,
                 else_: Rule | None = None) -> Rule:
    out: Rule = {"if": if_}
    if then is not None:
        out["then"] = then
    if else_ is not None:
        out["else"] = else_
    return out


def ref(pointer: str) -> Rule:
    """builder.ex:175 — a $ref node (local JSON pointer or registered URI)."""
    return {"$ref": pointer}
