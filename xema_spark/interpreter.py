"""Pure-Python rule interpreter over plain Python values.

Three jobs:
1. compile-time constant evaluation (the compiler runs string rules against
   static struct field names, e.g. `property_names` on a StructType —
   /root/reference/lib/xema/validator.ex:318-344 done at plan time);
2. the differential-test oracle: the Column compiler must agree with this
   interpreter on typed data (tests/test_differential.py);
3. the dynamic escape hatch: `validate_json_df` runs full draft-7-subset
   semantics over a JSON string column via an Arrow-vectorized pandas UDF —
   the engine's analogue of the reference's custom `validator` callback
   (validator.ex:1020-1041), for payloads whose shape isn't known at plan time.

Unlike the compiler's typed-column convention (NULL == absent), this
interpreter sees real JSON, so `None` is a JSON null *instance* and draft-7
semantics apply exactly (a null fails `type: "integer"`, etc.).
"""

from __future__ import annotations

import json
import math
import re
from typing import Any

from xema_spark import formats as _formats
from xema_spark.rules import Rule, normalize_rule, resolve_pointer


def _is_num(x: Any) -> bool:
    return isinstance(x, (int, float)) and not isinstance(x, bool)


def _type_of(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (list, tuple)):
        return "array"
    if isinstance(v, dict):
        return "object"
    return "unknown"


def _type_ok(tname: str, v: Any) -> bool:
    t = _type_of(v)
    if tname == "any":
        return True
    if tname == "integer":
        # int-like floats count (validator.ex:250)
        return t == "integer" or (t == "number" and float(v).is_integer())
    if tname == "number":
        return t in ("integer", "number")
    return t == tname


def _eq(a: Any, b: Any) -> bool:
    """const/enum equality with numeric cross-match but bool != 1
    (validator.ex:274-292,346-376)."""
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if _is_num(a) and _is_num(b):
        return float(a) == float(b)
    if type(a) is not type(b) and not (isinstance(a, (list, tuple)) and isinstance(b, (list, tuple))):
        return False
    if isinstance(a, (list, tuple)):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict):
        return a.keys() == b.keys() and all(_eq(a[k], b[k]) for k in a)
    return a == b


def _uniq_key(v: Any) -> str:
    def norm(x: Any) -> Any:
        if isinstance(x, bool):
            return ("b", x)
        if _is_num(x):
            return ("n", float(x))
        if isinstance(x, (list, tuple)):
            return ("a", [norm(e) for e in x])
        if isinstance(x, dict):
            return ("o", sorted((k, norm(val)) for k, val in x.items()))
        return (type(x).__name__, x)

    return json.dumps(norm(v), default=str)


def validate_value(rule: Rule, value: Any, root: Rule | None = None,
                   _depth: int = 0, registry: dict[str, Rule] | None = None) -> bool:
    """True iff `value` satisfies the (normalized or raw) rule.

    `registry` maps absolute URIs to (raw or normalized) remote rule
    documents for non-local $refs — the interpreter's analogue of the
    reference's Loader behaviour (loader.ex:9-15). Refs are resolved LAZILY
    with RFC 3986 base-URI tracking ($id changes the base for refs below
    it), which — unlike inlining — also supports recursive documents such
    as the draft meta-schemas."""
    rule = normalize_rule(rule) if not isinstance(rule, bool) else rule
    if root is None:
        root = rule
    if registry is not None:
        registry = {uri: normalize_rule(doc) for uri, doc in registry.items()}
    return _valid(rule, value, root, _depth, registry, "")


def _pointer_walk_base(root: Rule, pointer: str, base: str) -> str:
    """Fold the $id of every node along a local pointer path into `base`
    (the target node's own $id is applied by _valid itself)."""
    from urllib.parse import unquote, urljoin

    if isinstance(root, dict) and isinstance(root.get("id"), str):
        base = urljoin(base, root["id"])
    if not pointer.startswith("#/"):
        return base
    node: Any = root
    for raw in pointer[2:].split("/")[:-1]:
        token = unquote(raw).replace("~1", "/").replace("~0", "~")
        if isinstance(node, list):
            node = node[int(token)]
        elif isinstance(node, dict) and token in node:
            node = node[token]
        else:
            return base
        if isinstance(node, dict) and isinstance(node.get("id"), str):
            base = urljoin(base, node["id"])
    return base


_DATA_KEYS = {"enum", "const", "examples", "default", "data"}  # values, not schemas


def _collect_ids(node: Any, base: str, out: dict[str, Any]) -> None:
    """Index every subschema that declares an $id under its absolute URI
    (draft-7 location-by-$id: a subschema with id 'http://h/node' is the
    target of $ref 'node' resolved against base 'http://h/')."""
    from urllib.parse import urljoin

    if isinstance(node, dict):
        if isinstance(node.get("id"), str):
            base = urljoin(base, node["id"])
            # full URI (anchors like '#foo' keep their fragment) AND the
            # fragmentless document URI both address this node
            out.setdefault(base, node)
            out.setdefault(base.partition("#")[0], node)
        for k, v in node.items():
            if k not in _DATA_KEYS:
                _collect_ids(v, base, out)
    elif isinstance(node, list):
        for v in node:
            _collect_ids(v, base, out)


def _renorm(rule: Rule) -> Rule:
    """Ref targets reached through unknown keys (e.g. a remote document whose
    top level is a plain {'name': {...}} map) were never visited by
    normalize_rule — normalize on the way out (idempotent)."""
    return rule if isinstance(rule, bool) else normalize_rule(rule)


def _deref(ref: str, root: Rule, base: str,
           registry: dict[str, Rule] | None) -> tuple[Rule, Rule, str]:
    """Resolve a $ref -> (target_rule, new_document_root, new_base)."""
    from urllib.parse import urljoin

    if ref == "#" or ref.startswith("#/"):
        return (_renorm(resolve_pointer(root, ref)), root,
                _pointer_walk_base(root, ref, base))
    # everything else — absolute/relative URIs and '#anchor' ids — resolves
    # against the current base URI
    absolute = urljoin(base, ref) if base else ref
    uri, _, frag = absolute.partition("#")
    if registry is not None and uri in registry:
        doc = registry[uri]
        pointer = "#" + frag if frag else "#"
        target = resolve_pointer(doc, pointer)
        return _renorm(target), doc, _pointer_walk_base(doc, pointer, uri)
    # not a known document: try subschemas of the current document that
    # declare this URI (or this exact anchor) as their $id
    idx: dict[str, Any] = {}
    _collect_ids(root, "", idx)
    if absolute in idx:  # exact match (covers '#anchor'-style ids)
        return _renorm(idx[absolute]), root, uri
    if uri in idx:
        node = idx[uri]
        target = resolve_pointer(node, "#" + frag) if frag else node
        return _renorm(target), root, uri
    from xema_spark.rules import RuleError
    raise RuleError(f"$ref {ref!r}: URI {uri!r} not in the rule registry")


def _valid(rule: Rule, v: Any, root: Rule, depth: int,
           registry: dict[str, Rule] | None = None, base: str = "") -> bool:
    if depth > 64:
        raise RecursionError("rule recursion too deep")
    if rule is True:
        return True
    if rule is False:
        return False
    if isinstance(rule.get("id"), str):
        from urllib.parse import urljoin
        base = urljoin(base, rule["id"])
    if "ref" in rule:
        target, new_root, new_base = _deref(rule["ref"], root, base, registry)
        return _valid(target, v, new_root, depth + 1, registry, new_base)

    t = rule.get("type")
    if t is not None:
        types = t if isinstance(t, list) else [t]
        if not any(_type_ok(tn, v) for tn in types):
            return False
    if "const" in rule and not _eq(v, rule["const"]):
        return False
    if "enum" in rule and not any(_eq(v, e) for e in rule["enum"]):
        return False
    if "validator" in rule:
        import pandas as pd

        from xema_spark.rules import get_validator
        if not bool(get_validator(rule["validator"])(pd.Series([v])).iloc[0]):
            return False

    if _is_num(v):
        ex_min, ex_max = rule.get("exclusive_minimum"), rule.get("exclusive_maximum")
        if "minimum" in rule:
            m = rule["minimum"]
            if (v <= m) if ex_min is True else (v < m):
                return False
        if "maximum" in rule:
            m = rule["maximum"]
            if (v >= m) if ex_max is True else (v > m):
                return False
        if _is_num(ex_min) and not v > ex_min:
            return False
        if _is_num(ex_max) and not v < ex_max:
            return False
        if "multiple_of" in rule:
            m = rule["multiple_of"]
            if isinstance(v, int) and isinstance(m, int):
                if v % m != 0:
                    return False
            else:
                d = v / m
                if abs(d - round(d)) > 1e-9 * max(1.0, abs(d)):
                    return False

    if isinstance(v, str):
        if "min_length" in rule and len(v) < rule["min_length"]:
            return False
        if "max_length" in rule and len(v) > rule["max_length"]:
            return False
        if "pattern" in rule and not re.search(rule["pattern"], v):
            return False
        if "format" in rule and not _formats.python_check(rule["format"], v):
            return False

    if isinstance(v, (list, tuple)):
        if "min_items" in rule and len(v) < rule["min_items"]:
            return False
        if "max_items" in rule and len(v) > rule["max_items"]:
            return False
        if rule.get("unique_items") and len({_uniq_key(x) for x in v}) != len(v):
            return False
        items = rule.get("items")
        if isinstance(items, (dict, bool)):
            if not all(_valid(items, x, root, depth + 1, registry, base) for x in v):
                return False
        elif isinstance(items, list):
            for i, sub in enumerate(items):
                if i < len(v) and not _valid(sub, v[i], root, depth + 1, registry, base):
                    return False
            extra = rule.get("additional_items")
            if extra is False and len(v) > len(items):
                return False
            if isinstance(extra, (dict, bool)) and extra is not True:
                if not all(_valid(extra, x, root, depth + 1, registry, base) for x in v[len(items):]):
                    return False
        if "contains" in rule:
            if not any(_valid(rule["contains"], x, root, depth + 1, registry, base) for x in v):
                return False

    if isinstance(v, dict):
        props = rule.get("properties", {})
        pattern_props = rule.get("pattern_properties", {})
        for name, sub in props.items():
            if name in v and not _valid(sub, v[name], root, depth + 1, registry, base):
                return False
        for regex, sub in pattern_props.items():
            cre = re.compile(regex)
            for name, val in v.items():
                if cre.search(name) and not _valid(sub, val, root, depth + 1, registry, base):
                    return False
        for name in rule.get("required", []):
            if name not in v:
                return False
        if "min_properties" in rule and len(v) < rule["min_properties"]:
            return False
        if "max_properties" in rule and len(v) > rule["max_properties"]:
            return False
        if "property_names" in rule:
            if not all(_valid(rule["property_names"], k, root, depth + 1, registry, base) for k in v):
                return False
        extra_rule = rule.get("additional_properties")
        if extra_rule is not None and extra_rule is not True:
            pres = [re.compile(r) for r in pattern_props]
            for name, val in v.items():
                if name in props or any(r.search(name) for r in pres):
                    continue
                if extra_rule is False:
                    return False
                if not _valid(extra_rule, val, root, depth + 1, registry, base):
                    return False
        for key, dep in rule.get("dependencies", {}).items():
            if key in v:
                if isinstance(dep, list):
                    if not all(d in v for d in dep):
                        return False
                elif not _valid(dep, v, root, depth + 1, registry, base):
                    return False

    if "not" in rule and _valid(rule["not"], v, root, depth + 1, registry, base):
        return False
    if "all_of" in rule and not all(_valid(s, v, root, depth + 1, registry, base) for s in rule["all_of"]):
        return False
    if "any_of" in rule and not any(_valid(s, v, root, depth + 1, registry, base) for s in rule["any_of"]):
        return False
    if "one_of" in rule and sum(_valid(s, v, root, depth + 1, registry, base) for s in rule["one_of"]) != 1:
        return False
    if "if" in rule:
        branch = rule.get("then", True) if _valid(rule["if"], v, root, depth + 1, registry, base) \
            else rule.get("else", True)
        if not _valid(branch, v, root, depth + 1, registry, base):
            return False
    return True


# --------------------------------------------------------------------------
# vectorized fast path for validate_json_df
#
# _valid interprets the rule dict per VALUE: every row re-resolves keyword
# keys, re-enters the recursion, and (worst) re-compiles pattern regexes.
# For the hottest keywords the work per row is a single comparison, so the
# interpretation overhead dominates. _vector_plan compiles the top level of
# a normalized rule ONCE into a list of closures, each evaluating one
# keyword over the whole decoded Arrow batch; rows failing any closure are
# definitively invalid (every top-level keyword in _valid is an independent
# AND term), and when the closures cover every constraining keyword —
# recursively through single-level `properties` sub-rules — the batch never
# enters the per-value walk at all. Measured on the sf0.1 v_json_dynamic
# input: see SCALING.md.
# --------------------------------------------------------------------------

#: top-level keywords with a vector closure below
_VECTOR_KEYS = frozenset({
    "type", "enum", "const", "minimum", "maximum", "exclusive_minimum",
    "exclusive_maximum", "min_length", "max_length", "pattern", "required",
    "properties"})
#: keys that constrain nothing by themselves — their presence must not
#: disable the fully-covered fast exit
_ANNOTATION_KEYS = frozenset({
    "$schema", "id", "title", "description", "default", "examples",
    "definitions", "comment"})


def _type_pred(types: tuple) -> Any:
    """Per-value predicate replicating _type_ok over a type union, with the
    isinstance fast path (bool is an int subclass, so every numeric check
    excludes it explicitly, matching _type_of)."""
    def one(tn: str):
        if tn == "any":
            return lambda v: True
        if tn == "string":
            return lambda v: isinstance(v, str)
        if tn == "object":
            return lambda v: isinstance(v, dict)
        if tn == "array":
            return lambda v: isinstance(v, (list, tuple))
        if tn == "boolean":
            return lambda v: isinstance(v, bool)
        if tn == "null":
            return lambda v: v is None
        if tn == "integer":
            # int-like floats count (validator.ex:250)
            return lambda v: (isinstance(v, int) and not isinstance(v, bool)) \
                or (isinstance(v, float) and v.is_integer())
        if tn == "number":
            return lambda v: isinstance(v, (int, float)) and not isinstance(v, bool)
        return lambda v, _t=tn: _type_of(v) == _t
    preds = [one(tn) for tn in types]
    if len(preds) == 1:
        return preds[0]
    return lambda v: any(p(v) for p in preds)


def _vector_plan(nrule: Any) -> tuple[list, bool] | None:
    """(checks, fully_covered) for the top level of a NORMALIZED rule, or
    None when nothing there is vectorizable. Each check maps the decoded
    batch (a list of Python values) to a list of per-row PASS booleans; the
    caller ANDs them. Contract: each closure reproduces _valid's semantics
    for its keyword exactly, and closures may only be combined
    conjunctively — which matches _valid, where every top-level keyword is
    an independent AND term. `ref` early-returns in _valid ignoring sibling
    keys and `validator` needs the pandas hook, so `ref` disables the plan
    and `validator` just blocks full coverage (it stays in the walk)."""
    if not isinstance(nrule, dict) or "ref" in nrule:
        return None
    keys = set(nrule)
    if not (keys & _VECTOR_KEYS):
        return None
    checks: list = []
    handled: set = set()

    if "type" in nrule:
        t = nrule["type"]
        pred = _type_pred(tuple(t) if isinstance(t, list) else (t,))
        checks.append(lambda vals, _p=pred: [_p(v) for v in vals])
        handled.add("type")

    if "const" in nrule:
        cv = nrule["const"]
        checks.append(lambda vals, _c=cv: [_eq(v, _c) for v in vals])
        handled.add("const")
    if "enum" in nrule:
        ev = list(nrule["enum"])
        checks.append(
            lambda vals, _e=ev: [any(_eq(v, e) for e in _e) for v in vals])
        handled.add("enum")

    # numeric ranges apply only to numeric instances (non-numbers pass);
    # draft-4 boolean exclusive_* flips the paired bound, draft-6 numeric
    # exclusive_* is its own bound — byte-for-byte the _valid logic
    ex_min, ex_max = nrule.get("exclusive_minimum"), nrule.get("exclusive_maximum")
    if "minimum" in nrule:
        m, strict = nrule["minimum"], ex_min is True
        checks.append(lambda vals, _m=m, _s=strict: [
            not _is_num(v) or ((v > _m) if _s else (v >= _m)) for v in vals])
        handled.add("minimum")
    if "maximum" in nrule:
        m, strict = nrule["maximum"], ex_max is True
        checks.append(lambda vals, _m=m, _s=strict: [
            not _is_num(v) or ((v < _m) if _s else (v <= _m)) for v in vals])
        handled.add("maximum")
    if _is_num(ex_min):
        checks.append(lambda vals, _m=ex_min: [
            not _is_num(v) or v > _m for v in vals])
    if _is_num(ex_max):
        checks.append(lambda vals, _m=ex_max: [
            not _is_num(v) or v < _m for v in vals])
    # bool forms act via minimum/maximum; numeric forms were just emitted
    handled.update({"exclusive_minimum", "exclusive_maximum"} & keys)

    # string keywords apply only to string instances
    if "min_length" in nrule:
        n = nrule["min_length"]
        checks.append(lambda vals, _n=n: [
            not isinstance(v, str) or len(v) >= _n for v in vals])
        handled.add("min_length")
    if "max_length" in nrule:
        n = nrule["max_length"]
        checks.append(lambda vals, _n=n: [
            not isinstance(v, str) or len(v) <= _n for v in vals])
        handled.add("max_length")
    if "pattern" in nrule:
        cre = re.compile(nrule["pattern"])  # compiled ONCE per batch plan
        checks.append(lambda vals, _c=cre: [
            not isinstance(v, str) or _c.search(v) is not None for v in vals])
        handled.add("pattern")

    if "required" in nrule:
        req = tuple(nrule["required"])
        checks.append(lambda vals, _r=req: [
            not isinstance(v, dict) or all(k in v for k in _r) for v in vals])
        handled.add("required")

    # single-level (recursively, whole-subtree) vectorizable `properties`:
    # each named sub-rule plans independently; a present property value
    # must pass the sub-plan, an absent one passes (matching _valid). The
    # keyword counts as handled only when EVERY sub-rule is itself fully
    # covered — partial sub-plans still run as prefilters.
    if "properties" in nrule and isinstance(nrule["properties"], dict):
        all_full = True
        for name, sub in nrule["properties"].items():
            sp = _vector_plan(sub) if isinstance(sub, dict) else (
                ([], True) if sub is True else None)
            if sp is None:
                all_full = False
                continue
            sub_checks, sub_full = sp
            all_full = all_full and sub_full

            def prop_check(vals, _n=name, _cs=tuple(sub_checks)):
                res = [True] * len(vals)
                idx = [i for i, v in enumerate(vals)
                       if isinstance(v, dict) and _n in v]
                if idx:
                    sub_vals = [vals[i][_n] for i in idx]
                    for c in _cs:
                        for i, r in zip(idx, c(sub_vals)):
                            if not r:
                                res[i] = False
                return res

            checks.append(prop_check)
        if all_full:
            handled.add("properties")

    if not checks:
        return None
    fully_covered = not (keys - handled - _ANNOTATION_KEYS)
    return checks, fully_covered


def validate_json_df(df, json_col: str, rule: Rule, valid_col: str = "valid"):
    """Dynamic-shape escape hatch: validate a JSON string column with full
    draft-7-subset semantics via an Arrow-vectorized pandas UDF. The hot
    keywords (type / enum / const / ranges / lengths / pattern / required /
    scalar `properties`) run as batch-level closures compiled once from the
    rule (_vector_plan); only rows that survive them — and only under rules
    with residual non-vectorizable keywords — enter the per-value recursive
    walk. This is still the slow path relative to the Column compiler and
    exists for payloads with no static schema."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    nrule = normalize_rule(rule)
    plan = _vector_plan(nrule) if isinstance(nrule, dict) else None

    def batch(s):  # no type hints: pandas is function-local, so pyspark's
        # hint resolution would fail on the stringified 'pd.Series'
        vals, status = [], []  # status: None=SQL null, False=bad JSON
        for x in s:
            if x is None:
                vals.append(None)
                status.append(None)
                continue
            try:
                vals.append(json.loads(x))
                status.append(True)
            except (json.JSONDecodeError, RecursionError):
                # RecursionError: json.loads recurses on deeply nested
                # payloads — in the untrusted-payload escape hatch that must
                # be a verdict (invalid), never a task crash
                vals.append(None)
                status.append(False)

        if plan is not None:
            checks, full = plan
            ok = [st is True for st in status]
            for c in checks:
                ok = [a and b for a, b in zip(ok, c(vals))]
        else:
            checks, full = [], False
            ok = [st is True for st in status]

        out = []
        for i, st in enumerate(status):
            if st is None:
                out.append(None)
            elif st is False or not ok[i]:
                out.append(False)
            elif full:
                out.append(True)
            else:
                try:  # nrule is pre-normalized: call the walk directly
                    out.append(_valid(nrule, vals[i], nrule, 0, None, ""))
                except RecursionError:
                    out.append(False)
        return pd.Series(out, dtype="boolean")

    udf = F.pandas_udf(batch, BooleanType())
    return df.withColumn(valid_col, udf(F.col(json_col)))
