"""Rule model: JSON-Schema dicts -> normalized rule trees + meta-validation.

Mirrors the reference's schema-build stage (Xema.new/2 -> init/2 -> schema/2,
/root/reference/lib/xema.ex:222-364) and its JSON-Schema import key/type
renaming (/root/reference/lib/xema/json_schema.ex:126-197): camelCase keywords
become snake_case, JSON type names are canonicalized, and the rule source is
itself validated before compilation — the reference meta-validates schemas at
build time (/root/reference/lib/xema/schema_validator.ex:456-464); we do the
same with `meta_validate`, raising `RuleError` on a malformed rule.

A normalized rule is a plain dict with snake_case keys (or a bool: the
JSON-Schema boolean schemas true/false, /root/reference/lib/xema/validator.ex:69-71).
Normalization is pure driver-side Python — it runs once per rule, never per row.
"""

from __future__ import annotations

import re
from typing import Any

Rule = dict[str, Any] | bool


class RuleError(ValueError):
    """Raised when a rule fails meta-validation (malformed schema source)."""


# camelCase / $-prefixed JSON Schema keyword -> engine snake_case
# (cf. json_schema.ex:126-197 key renaming on import)
_KEY_RENAMES = {
    "minLength": "min_length",
    "maxLength": "max_length",
    "minItems": "min_items",
    "maxItems": "max_items",
    "minProperties": "min_properties",
    "maxProperties": "max_properties",
    "multipleOf": "multiple_of",
    "exclusiveMinimum": "exclusive_minimum",
    "exclusiveMaximum": "exclusive_maximum",
    "uniqueItems": "unique_items",
    "additionalItems": "additional_items",
    "additionalProperties": "additional_properties",
    "patternProperties": "pattern_properties",
    "propertyNames": "property_names",
    "allOf": "all_of",
    "anyOf": "any_of",
    "oneOf": "one_of",
    "$ref": "ref",
    "$defs": "definitions",
    "$id": "id",
    "$schema": "schema",
    "$comment": "comment",
    "contentEncoding": "content_encoding",
    "contentMediaType": "content_media_type",
    "readOnly": "read_only",
    "writeOnly": "write_only",
}

# JSON type names + the reference's Elixir aliases (schema.ex:181-214)
_TYPE_ALIASES = {
    "list": "array",
    "map": "object",
    "float": "number",
    "keyword": "object",
    "atom": "string",
    "any": "any",
    "nil": "null",
    "struct": "object",
    "tuple": "array",
}

# Container spellings whose Spark representations DIFFER even though they
# canonicalize to the same JSON type — the reference's Castable protocol
# dispatches cast direction on these (castable.ex:190-349: list->map,
# map->struct, map->keyword, ...). normalize_rule records the raw spelling
# as the `xema_type` annotation so cast_column can pick the reshape; the
# validator ignores it (annotation-only).
_RESHAPE_SPELLINGS = {"map", "keyword", "struct", "tuple"}
_VALID_TYPES = {"string", "integer", "number", "boolean", "array", "object", "null", "any"}

# Keywords whose value is a single subschema
_SUBSCHEMA_KEYS = {
    "not", "if", "then", "else", "contains", "property_names",
    "additional_items", "additional_properties",
}
# Keywords whose value is a list of subschemas
_SUBSCHEMA_LIST_KEYS = {"all_of", "any_of", "one_of"}
# Keywords whose value is a map of name -> subschema
_SUBSCHEMA_MAP_KEYS = {"properties", "pattern_properties", "definitions"}

# Annotation-only keywords (no validation effect; schema.ex:74-124,
# docs/unsupported.md:5-6) — carried through untouched.
_ANNOTATION_KEYS = {
    "title", "description", "comment", "examples", "default", "id", "schema",
    "content_encoding", "content_media_type", "read_only", "write_only", "data",
    "xema_type",
}


def _canon_type(t: Any) -> Any:
    if isinstance(t, list):
        return [_canon_type(x) for x in t]
    if isinstance(t, str):
        return _TYPE_ALIASES.get(t, t)
    raise RuleError(f"'type' must be a string or list of strings, got {t!r}")


def normalize_rule(rule: Rule) -> Rule:
    """Normalize a JSON-Schema dict (or bool) into the engine rule form."""
    if isinstance(rule, bool):
        return rule
    if not isinstance(rule, dict):
        raise RuleError(f"rule must be a dict or bool, got {type(rule).__name__}")
    out: dict[str, Any] = {}
    for k, v in rule.items():
        k = _KEY_RENAMES.get(k, k)
        if k == "type":
            # keep the container spelling (map vs struct vs keyword vs
            # tuple) that canonicalization erases — cast reshaping needs it
            if isinstance(v, str) and v in _RESHAPE_SPELLINGS \
                    and "xema_type" not in rule:
                out.setdefault("xema_type", v)
            v = _canon_type(v)
        elif k in _SUBSCHEMA_KEYS:
            v = normalize_rule(v) if isinstance(v, (dict, bool)) else v
        elif k in _SUBSCHEMA_LIST_KEYS:
            if not isinstance(v, list):
                raise RuleError(f"{k} expects a list of schemas")
            v = [normalize_rule(s) for s in v]
        elif k in _SUBSCHEMA_MAP_KEYS:
            if not isinstance(v, dict):
                raise RuleError(f"{k} expects an object of schemas")
            v = {name: normalize_rule(s) for name, s in v.items()}
        elif k == "items":
            # single-schema form (validator.ex:694-721) vs tuple form
            # (validator.ex:723-777)
            if isinstance(v, list):
                v = [normalize_rule(s) for s in v]
            else:
                v = normalize_rule(v)
        elif k == "dependencies":
            # key-list form vs schema form (validator.ex:965-1004)
            if not isinstance(v, dict):
                raise RuleError("dependencies expects an object")
            v = {
                name: (list(dep) if isinstance(dep, (list, tuple)) else normalize_rule(dep))
                for name, dep in v.items()
            }
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# custom validator / caster registry (the engine's rule-level escape hatch,
# reference: validator.ex:1020-1041 `validator` and xema.ex:779-797 `caster`).
# A registered function is VECTORIZED: pandas Series in -> Series out
# (booleans for validators, coerced values for casters) — it compiles to an
# Arrow-batched pandas UDF, never a per-row Python call.
# ---------------------------------------------------------------------------

_VALIDATORS: dict[str, Any] = {}
_CASTERS: dict[str, Any] = {}


def register_validator(name: str, fn: Any) -> None:
    """Register `fn(values: pd.Series) -> pd.Series[bool]` under `name`;
    rules reference it as {"validator": name}."""
    _VALIDATORS[name] = fn


def register_caster(name: str, fn: Any) -> None:
    """Register `fn(values: pd.Series) -> pd.Series` under `name`; rules
    reference it as {"caster": name} (failures should come back as None)."""
    _CASTERS[name] = fn


def get_validator(name: str) -> Any:
    if name not in _VALIDATORS:
        raise RuleError(f"validator {name!r} is not registered "
                        "(xema_spark.rules.register_validator)")
    return _VALIDATORS[name]


def get_caster(name: str) -> Any:
    if name not in _CASTERS:
        raise RuleError(f"caster {name!r} is not registered "
                        "(xema_spark.rules.register_caster)")
    return _CASTERS[name]


# ---------------------------------------------------------------------------
# official meta-schema validation (the reference validates imported schemas
# against the bundled draft meta-schemas, lib/xema/json_schema/validator.ex;
# the engine dogfoods its own interpreter for the same check)
# ---------------------------------------------------------------------------

_META_URIS = {
    "draft4": "http://json-schema.org/draft-04/schema",
    "draft6": "http://json-schema.org/draft-06/schema",
    "draft7": "http://json-schema.org/draft-07/schema",
}
_META_CACHE: dict[str, Any] = {}


def _meta_schema(draft: str) -> Any:
    if draft not in _META_CACHE:
        import json
        import os
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "meta_schemas", f"draft{draft[-1].zfill(2)}.json")
        with open(path, encoding="utf-8") as f:
            _META_CACHE[draft] = json.load(f)
    return _META_CACHE[draft]


def validate_schema_document(schema: Any, draft: str = "draft7") -> bool:
    """True iff `schema` is a valid JSON-Schema document per the official
    draft meta-schema — evaluated by the engine's OWN interpreter over the
    bundled meta-schema (which is recursive; the interpreter's lazy $ref
    resolution handles that). The reference runs the identical check on
    import (json_schema/validator.ex)."""
    if draft not in _META_URIS:
        raise RuleError(f"unknown draft {draft!r} (use draft4/draft6/draft7)")
    from xema_spark.interpreter import validate_value
    return validate_value(_meta_schema(draft), schema)


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise RuleError(msg)


def _is_num(x: Any) -> bool:
    return isinstance(x, (int, float)) and not isinstance(x, bool)


def meta_validate(rule: Rule, path: str = "#") -> None:
    """Validate a *normalized* rule tree before compiling it.

    The reference validates schema sources against a meta-schema before use
    (schema_validator.ex:456-464); this is the engine's equivalent, kept to
    the keyword subset we compile.
    """
    if isinstance(rule, bool):
        return
    _require(isinstance(rule, dict), f"{path}: rule must be dict/bool")

    t = rule.get("type")
    if t is not None:
        types = t if isinstance(t, list) else [t]
        for x in types:
            _require(x in _VALID_TYPES, f"{path}/type: unknown type {x!r}")

    for k in ("min_length", "max_length", "min_items", "max_items",
              "min_properties", "max_properties"):
        if k in rule:
            v = rule[k]
            _require(isinstance(v, int) and not isinstance(v, bool) and v >= 0,
                     f"{path}/{k}: expected non-negative integer, got {v!r}")
    for k in ("minimum", "maximum"):
        if k in rule:
            _require(_is_num(rule[k]), f"{path}/{k}: expected number")
    for k in ("exclusive_minimum", "exclusive_maximum"):
        if k in rule:
            # draft-4 boolean form (modifies minimum/maximum,
            # validator.ex:511-550) or draft-6 numeric form
            # (validator.ex:483-509)
            v = rule[k]
            _require(isinstance(v, bool) or _is_num(v),
                     f"{path}/{k}: expected number or boolean")
            if isinstance(v, bool) and v:
                base = "minimum" if k == "exclusive_minimum" else "maximum"
                _require(base in rule, f"{path}/{k}: boolean form requires {base}")
    if "multiple_of" in rule:
        v = rule["multiple_of"]
        _require(_is_num(v) and v > 0, f"{path}/multiple_of: expected number > 0")
    if "pattern" in rule:
        v = rule["pattern"]
        _require(isinstance(v, str), f"{path}/pattern: expected string")
        try:
            re.compile(v)
        except re.error as e:
            raise RuleError(f"{path}/pattern: invalid regex {v!r}: {e}") from e
    if "format" in rule:
        _require(isinstance(rule["format"], str), f"{path}/format: expected string")
    if "enum" in rule:
        v = rule["enum"]
        _require(isinstance(v, list) and len(v) > 0, f"{path}/enum: expected non-empty list")
    if "required" in rule:
        v = rule["required"]
        _require(isinstance(v, list) and all(isinstance(x, str) for x in v),
                 f"{path}/required: expected list of strings")
    if "unique_items" in rule:
        _require(isinstance(rule["unique_items"], bool),
                 f"{path}/unique_items: expected boolean")
    if "ref" in rule:
        _require(isinstance(rule["ref"], str), f"{path}/ref: expected string")
    if "validator" in rule:
        _require(isinstance(rule["validator"], str),
                 f"{path}/validator: expected registered-validator name")
        get_validator(rule["validator"])
    if "caster" in rule:
        _require(isinstance(rule["caster"], str),
                 f"{path}/caster: expected registered-caster name")
        get_caster(rule["caster"])
    if "decimal" in rule:
        v = rule["decimal"]
        _require(isinstance(v, dict) and
                 isinstance(v.get("precision"), int) and isinstance(v.get("scale"), int),
                 f"{path}/decimal: expected {{precision, scale}} ints")

    for k in _SUBSCHEMA_KEYS:
        if k in rule and isinstance(rule[k], (dict, bool)):
            meta_validate(rule[k], f"{path}/{k}")
    for k in _SUBSCHEMA_LIST_KEYS:
        if k in rule:
            _require(isinstance(rule[k], list) and rule[k],
                     f"{path}/{k}: expected non-empty list")
            for i, s in enumerate(rule[k]):
                meta_validate(s, f"{path}/{k}/{i}")
    for k in _SUBSCHEMA_MAP_KEYS:
        if k in rule:
            for name, s in rule[k].items():
                meta_validate(s, f"{path}/{k}/{name}")
    items = rule.get("items")
    if isinstance(items, list):
        for i, s in enumerate(items):
            meta_validate(s, f"{path}/items/{i}")
    elif items is not None:
        meta_validate(items, f"{path}/items")
    deps = rule.get("dependencies")
    if deps:
        for name, dep in deps.items():
            if isinstance(dep, list):
                _require(all(isinstance(x, str) for x in dep),
                         f"{path}/dependencies/{name}: expected list of keys")
            else:
                meta_validate(dep, f"{path}/dependencies/{name}")


def inline_remote_refs(rule: Rule, registry: dict[str, Rule],
                       _depth: int = 0) -> Rule:
    """Inline every non-local $ref from the registry into a self-contained
    rule tree — the engine's version of the reference's default `inline:
    true` deref pass (behaviour.ex:23,160-223). A remote target's own local
    refs are resolved against ITS root during inlining; cycles beyond depth
    32 raise (circular remote refs are not Column-compilable anyway)."""
    if _depth > 32:
        raise RuleError("circular remote $ref chain (inline depth exceeded)")
    if isinstance(rule, bool):
        return rule
    ref = rule.get("ref")
    if isinstance(ref, str) and not ref.startswith("#"):
        base, _, frag = ref.partition("#")
        if base not in registry:
            raise RuleError(f"$ref {ref!r}: URI not in the rule registry")
        remote_root = normalize_rule(registry[base])
        target = resolve_pointer(remote_root, "#" + frag if frag else "#")
        # the subtree leaves its document, so its internal LOCAL refs must be
        # inlined against the REMOTE root now (they would otherwise resolve
        # against the host document at compile time)
        target = _inline_local(target, remote_root, _depth + 1)
        return inline_remote_refs(target, registry, _depth + 1)
    out: dict = {}
    for k, v in rule.items():
        if isinstance(v, (dict, bool)) and k in (_SUBSCHEMA_KEYS | {"items"}):
            v = inline_remote_refs(v, registry, _depth + 1)
        elif k in _SUBSCHEMA_LIST_KEYS or (k == "items" and isinstance(v, list)):
            v = [inline_remote_refs(s, registry, _depth + 1) for s in v]
        elif k in _SUBSCHEMA_MAP_KEYS:
            v = {n: inline_remote_refs(s, registry, _depth + 1) for n, s in v.items()}
        elif k == "dependencies":
            v = {n: (d if isinstance(d, list) else inline_remote_refs(d, registry, _depth + 1))
                 for n, d in v.items()}
        out[k] = v
    return out


def _inline_local(rule: Rule, doc_root: Rule, _depth: int = 0) -> Rule:
    """Deref local '#...' pointers of `rule` against `doc_root` (used when a
    subtree is inlined across documents). Depth-capped for cycles."""
    if _depth > 32:
        raise RuleError("circular local $ref chain during cross-document inline")
    if isinstance(rule, bool):
        return rule
    ref = rule.get("ref")
    if isinstance(ref, str) and ref.startswith("#"):
        return _inline_local(resolve_pointer(doc_root, ref), doc_root, _depth + 1)
    out: dict = {}
    for k, v in rule.items():
        if isinstance(v, (dict, bool)) and k in (_SUBSCHEMA_KEYS | {"items"}):
            v = _inline_local(v, doc_root, _depth + 1)
        elif k in _SUBSCHEMA_LIST_KEYS or (k == "items" and isinstance(v, list)):
            v = [_inline_local(s, doc_root, _depth + 1) for s in v]
        elif k in _SUBSCHEMA_MAP_KEYS:
            v = {n: _inline_local(s, doc_root, _depth + 1) for n, s in v.items()}
        elif k == "dependencies":
            v = {n: (d if isinstance(d, list) else _inline_local(d, doc_root, _depth + 1))
                 for n, d in v.items()}
        out[k] = v
    return out


def resolve_pointer(root: Rule, pointer: str,
                    registry: dict[str, Rule] | None = None) -> Rule:
    """Resolve a JSON pointer against the normalized root rule.

    Local pointers ('#', '#/definitions/x') mirror Schema.fetch
    (schema.ex:263-304). Non-local refs ('http://host/schema#/frag') resolve
    through `registry` — the engine's loader surface is a plain dict of
    pre-normalized rule documents keyed by URI (the driver-side analogue of
    the reference's Loader behaviour, loader.ex:9-15; no network I/O, by
    design — fetch happens before compile, as in behaviour.ex:323-386).
    """
    if pointer == "#" or pointer == "":
        return root
    if not pointer.startswith("#"):
        base, _, frag = pointer.partition("#")
        if registry is None or base not in registry:
            raise RuleError(f"$ref {pointer!r}: URI not in the rule registry")
        target_root = registry[base]
        if not frag:
            return target_root
        return resolve_pointer(target_root, "#" + frag, registry)
    if not pointer.startswith("#/"):
        raise RuleError(f"unsupported $ref {pointer!r}")
    from urllib.parse import unquote

    node: Any = root
    for raw in pointer[2:].split("/"):
        # URI-fragment percent-decoding first (RFC 6901 §6: '%25field' ->
        # '%field'), then the ~-escapes
        token = unquote(raw).replace("~1", "/").replace("~0", "~")
        # keys were renamed during normalization
        token = _KEY_RENAMES.get(token, token)
        if isinstance(node, list):
            node = node[int(token)]
        elif isinstance(node, dict) and token in node:
            node = node[token]
        else:
            raise RuleError(f"$ref {pointer!r}: token {token!r} not found")
    if not isinstance(node, (dict, bool)):
        raise RuleError(f"$ref {pointer!r} does not resolve to a schema")
    return node
