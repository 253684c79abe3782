"""Rule-tree -> Spark Column compiler: the engine core.

The reference validates one value at a time with a recursive interpreter
(do_validate/3, /root/reference/lib/xema/validator.ex:68-215). This module
instead compiles the rule tree ONCE on the driver into a pair of
pyspark.sql.Column expressions per rule node:

    Compiled(valid: Column<boolean>, violations: Column<array<struct>>)

which Catalyst folds into whole-stage-codegen'd predicates evaluated in a
single per-partition pass — no per-row Python anywhere in this module.
Recursion over subschemas becomes recursion over StructType/ArrayType/MapType
fields; per-element checks use SQL higher-order functions (forall / exists /
transform / filter), never explode-then-rejoin.

Null convention (documented divergence, by design): a NULL value is treated
as *absent* and passes every per-value keyword except `type: "null"`-style
presence checks; presence is enforced by the parent's `required` (the
reference skips absent keys the same way, validator.ex:846-849). This lets a
typed columnar engine keep one consistent absent-vs-null story.

Fail modes (behaviour.ex:36, validator.ex:121-169): the reference's
`:immediately` maps to verdict-only evaluation (select just `valid`; Catalyst
column-pruning drops every violation expression), `:finally` maps to
selecting `violations` too. See `validate_df(mode=...)`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xema_spark.rules import Rule, meta_validate, normalize_rule, resolve_pointer
from xema_spark import formats as _formats
from xema_spark import interpreter as _interp


class CompileError(ValueError):
    """Raised when a rule cannot be compiled against the given Spark type."""


VIOLATION_STRUCT_TYPE = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("keyword", T.StringType()),
        T.StructField("message", T.StringType()),
    ]
)
VIOLATION_ARRAY_TYPE = T.ArrayType(VIOLATION_STRUCT_TYPE)

_MAX_REF_DEPTH = 64
_FLOAT_EPS = 1e-9

# Compile-scoped options (set by validate_df around compile_rule; a module
# flag avoids threading one more parameter through every recursion site).
# 'early' switches the per-node violation combiner to first-failing-GROUP
# truncation (the reference's fail: :early with-chains, validator.ex:99-215).
_OPTS = {"exact_graphemes": False, "early": False}

# With-chain group ranks — one rank per `:ok <-` step of the reference's
# non-:finally chains, in reference order (validator.ex:99-107 default
# keywords run BEFORE type-specific ones, :99-215). Checks sharing a rank
# form ONE chain step: e.g. every per-property subtree is part of the single
# all_properties step (validator.ex:797-827), so :early keeps ALL failing
# properties of that step while dropping later steps. :finally ignores ranks
# entirely (violations stay in compile/append order).
_G_TYPE = 1
_G_ENUM = 2
_G_NOT = 3
_G_ALL_OF = 4
_G_ANY_OF = 5
_G_ONE_OF = 6
_G_CONST = 7
_G_IF = 8
_G_MODULE = 9
# type-specific steps, 5 slots in chain order (string: min/max_length,
# pattern, format; number: min, max, ex_max, ex_min, multiple_of; list:
# min/max_items, unique, items, contains; map: size, keys, required,
# property_names, dependencies, all_properties)
_G_T1, _G_T2, _G_T3, _G_T4, _G_T5, _G_PROPS = 10, 11, 12, 13, 14, 15
_G_VALIDATOR = 99  # custom_validator is the chain's last step (validator.ex:95)


def _grapheme_length(col: Column) -> Column:
    """Exact grapheme-cluster count (the reference's String.length semantics,
    validator.ex:564-586) via an Arrow-vectorized pandas UDF with \\X.
    Default string lengths use F.length (codepoints) — the documented fast
    path; this is the opt-in exact mode (SURVEY §2.1 #10)."""
    from pyspark.sql.types import IntegerType

    def batch(s):  # no hints: pandas is not module-global here
        import regex as _rx
        pat = _rx.compile(r"\X")
        return s.map(lambda x: None if x is None else len(pat.findall(x))).astype("Int32")

    return F.pandas_udf(batch, IntegerType())(col)


def _strlen(col: Column) -> Column:
    return _grapheme_length(col) if _OPTS["exact_graphemes"] else F.length(col)


def _tail(col: Column, k: int) -> Column:
    """Elements after position k. Length is computed from size() — a literal
    Int.MaxValue length overflows (start+length) inside higher-order-function
    codegen and silently returns the full array."""
    return F.slice(col, k + 1, F.greatest(F.lit(0), F.size(col) - F.lit(k)))


@dataclass
class Compiled:
    """Compiled rule node: a non-null boolean verdict Column and a violations
    array Column (empty array when valid)."""

    valid: Column
    violations: Column


def _empty_viols() -> Column:
    return F.array().cast(VIOLATION_ARRAY_TYPE)


def _mk_viol(path: Column, keyword: str, message: str) -> Column:
    return F.struct(
        path.alias("path"),
        F.lit(keyword).alias("keyword"),
        F.lit(message).alias("message"),
    )


def _guard(col: Column, pred: Column) -> Column:
    """null value => vacuously valid; null predicate => fail (non-null input
    that could not be proven valid)."""
    return F.when(col.isNull(), F.lit(True)).otherwise(F.coalesce(pred, F.lit(False)))


def _check(col: Column, pred: Column, path: Column, keyword: str, message: str) -> Compiled:
    ok = _guard(col, pred)
    return Compiled(ok, F.when(ok, _empty_viols()).otherwise(F.array(_mk_viol(path, keyword, message))))


def _and_all(parts: list[Compiled]) -> Compiled:
    if not parts:
        return Compiled(F.lit(True), _empty_viols())
    valid = parts[0].valid
    for p in parts[1:]:
        valid = valid & p.valid
    viols = parts[0].violations if len(parts) == 1 else F.concat(*[p.violations for p in parts])
    return Compiled(valid, viols)


def _first_failing_group(checks: list[tuple[int, Compiled]]) -> Column:
    """Violations of the FIRST failing with-chain step at this node — the
    reference's fail: :early combiner (behaviour.ex:95, validator.ex:148-169):
    the chain aborts at the first failing step, but that step keeps every
    error it collected (e.g. all failing properties under all_properties,
    all failing items under items). Checks sharing a rank are one step;
    steps are tried in chain-rank order (stable within a rank, so :finally's
    append order is preserved inside a step). Nested nodes truncate
    themselves the same way — their sub-compile already ran in early mode."""
    if not checks:
        return _empty_viols()
    order = sorted(range(len(checks)), key=lambda i: checks[i][0])
    groups: list[list[Compiled]] = []
    last_rank: int | None = None
    for i in order:
        rank, comp = checks[i]
        if rank != last_rank:
            groups.append([])
            last_rank = rank
        groups[-1].append(comp)
    chain = None
    for comps in groups:
        g = _and_all(comps)
        chain = F.when(~g.valid, g.violations) if chain is None else chain.when(~g.valid, g.violations)
    return chain.otherwise(_empty_viols())


def _is_num(x: Any) -> bool:
    return isinstance(x, (int, float)) and not isinstance(x, bool)


def _numeric(dt: T.DataType) -> bool:
    return isinstance(dt, T.NumericType)


def _integral(dt: T.DataType) -> bool:
    return isinstance(dt, T.IntegralType) or (isinstance(dt, T.DecimalType) and dt.scale == 0)


# ---------------------------------------------------------------------------
# type keyword (validator.ex:226-268; like_integer coercion validator.ex:250)
# ---------------------------------------------------------------------------

def _type_pred(tname: str, col: Column, dtype: T.DataType) -> Column:
    if tname == "any":
        return F.lit(True)
    if tname == "null":
        return col.isNull()
    if tname == "string":
        return F.lit(isinstance(dtype, T.StringType))
    if tname == "boolean":
        return F.lit(isinstance(dtype, T.BooleanType))
    if tname == "array":
        return F.lit(isinstance(dtype, T.ArrayType))
    if tname == "object":
        return F.lit(isinstance(dtype, (T.StructType, T.MapType)))
    if tname == "number":
        return F.lit(_numeric(dtype))
    if tname == "integer":
        if _integral(dtype):
            return F.lit(True)
        if _numeric(dtype):
            # int-like floats count as integer (validator.ex:250)
            return col == F.floor(col)
        return F.lit(False)
    raise CompileError(f"unknown type {tname!r}")


# ---------------------------------------------------------------------------
# scalar keyword compilers
# ---------------------------------------------------------------------------

def _const_pred(value: Any, col: Column, dtype: T.DataType) -> Column:
    # numeric 5 == 5.0 cross-match (validator.ex:274-292)
    if value is None:
        return col.isNull()
    if isinstance(value, bool):
        return col == F.lit(value) if isinstance(dtype, T.BooleanType) else F.lit(False)
    if _is_num(value):
        if not _numeric(dtype):
            return F.lit(False)
        return col.cast("double") == F.lit(float(value))
    if isinstance(value, str):
        return col == F.lit(value) if isinstance(dtype, T.StringType) else F.lit(False)
    if isinstance(value, list):
        if not isinstance(dtype, T.ArrayType):
            return F.lit(False)
        if len(value) == 0:
            return F.size(col) == 0
        elem_preds = [
            _const_pred(v, F.try_element_at(col, F.lit(i + 1)), dtype.elementType)
            for i, v in enumerate(value)
        ]
        pred = F.size(col) == len(value)
        for i, (ep, v) in enumerate(zip(elem_preds, value)):
            present = F.try_element_at(col, F.lit(i + 1)).isNotNull() if v is not None else F.lit(True)
            pred = pred & F.coalesce(ep & (present | F.lit(v is None)), F.lit(False))
        return pred
    raise CompileError(f"const of type {type(value).__name__} not supported on {dtype.simpleString()}")


def _enum_pred(values: list, col: Column, dtype: T.DataType) -> Column:
    preds = [_const_pred(v, col, dtype) for v in values]
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def _multiple_of_pred(m: Any, col: Column, dtype: T.DataType) -> Column:
    if not _numeric(dtype):
        return F.lit(True)
    if _integral(dtype) and isinstance(m, int):
        return F.pmod(col, F.lit(m)) == 0
    d = col.cast("double") / F.lit(float(m))
    return F.abs(d - F.round(d, 0)) <= F.lit(_FLOAT_EPS) * F.greatest(F.lit(1.0), F.abs(d))


# ---------------------------------------------------------------------------
# object helpers
# ---------------------------------------------------------------------------

def _struct_fields(dtype: T.StructType) -> dict[str, T.DataType]:
    return {f.name: f.dataType for f in dtype.fields}


# named struct shapes for the `module` keyword (the reference's Elixir-struct
# check, validator.ex:143,258: value.__struct__ == module). Spark structs
# carry no runtime tag, so "which module is this" is a schema property:
# register the module's expected StructType and the check compiles to a
# constant shape assertion. Unregistered names are accepted (annotation-only,
# matching COVERAGE.md §2.1 #36's at-rest-alias stance for unknown modules).
_MODULES: dict[str, T.StructType] = {}


def register_module(name: str, dtype: T.StructType) -> None:
    _MODULES[name] = dtype


def _struct_shape_matches(dtype: T.StructType, expected: T.StructType) -> bool:
    got = {f.name: f.dataType.simpleString() for f in dtype.fields}
    want = {f.name: f.dataType.simpleString() for f in expected.fields}
    return got == want


def _struct_present(col: Column, name: str) -> Column:
    # struct-field NULL == absent key (engine convention, see module doc)
    return col.getField(name).isNotNull()


def _quote_path_seg(name: str) -> str:
    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        return "." + name
    return "['" + name.replace("'", "\\'") + "']"


# ---------------------------------------------------------------------------
# main compile
# ---------------------------------------------------------------------------

def compile_rule(
    rule: Rule,
    col: Column,
    dtype: T.DataType,
    path: Column | None = None,
    root: Rule | None = None,
    _depth: int = 0,
) -> Compiled:
    """Compile a normalized rule against (col, dtype); returns Compiled.

    `root` is the rule document used to resolve local $refs ($ref inlining
    happens here at compile time, the Column-tree analogue of the reference's
    default inline: true, /root/reference/lib/xema/behaviour.ex:23,160-223;
    cycles terminate because recursion descends the finite Spark type tree,
    with _MAX_REF_DEPTH as a backstop for non-descending cycles).
    """
    if path is None:
        path = F.lit("$")
    if root is None:
        root = rule
    if _depth > _MAX_REF_DEPTH:
        raise CompileError("rule recursion exceeds max depth (circular $ref without structural descent)")

    # boolean schemas (validator.ex:69-71)
    if rule is True:
        return Compiled(F.lit(True), _empty_viols())
    if rule is False:
        ok = col.isNull()  # null==absent passes even the false schema at a property position
        return Compiled(ok, F.when(ok, _empty_viols()).otherwise(F.array(_mk_viol(path, "schema", "schema is false"))))

    if "ref" in rule:
        target = resolve_pointer(root, rule["ref"])
        return compile_rule(target, col, dtype, path, root, _depth + 1)

    checks: list[tuple[int, Compiled]] = []

    # --- type (validator.ex:226-268) ---
    if "type" in rule:
        t = rule["type"]
        types = t if isinstance(t, list) else [t]
        pred = _type_pred(types[0], col, dtype)
        for tn in types[1:]:
            pred = pred | _type_pred(tn, col, dtype)
        if "null" in types:
            # explicit nullable union: non-guarded isNull already passes
            pass
        checks.append((_G_TYPE, _check(col, pred, path, "type", f"expected type {t!r}")))

    # --- const / enum (validator.ex:274-292, 346-376) ---
    if "const" in rule:
        checks.append((_G_CONST, _check(col, _const_pred(rule["const"], col, dtype), path, "const",
                                        f"expected const {rule['const']!r}")))
    if "enum" in rule:
        checks.append((_G_ENUM, _check(col, _enum_pred(rule["enum"], col, dtype), path, "enum",
                                       f"value not in enum {rule['enum']!r}")))

    # --- custom validator hook (validator.ex:1020-1041): a registered
    #     Series->Series function compiled to ONE Arrow-batched pandas UDF,
    #     composed into the tree as its own keyword row ---
    if "validator" in rule:
        from xema_spark.rules import get_validator

        vname = rule["validator"]
        vfn = get_validator(vname)

        def _vbatch(s, _fn=vfn):
            import pandas as pd
            out = _fn(s)
            return out if isinstance(out, pd.Series) else pd.Series(out)

        vudf = F.pandas_udf(_vbatch, T.BooleanType())
        checks.append((_G_VALIDATOR, _check(col, vudf(col), path, "validator",
                                            f"custom validator {vname!r} failed")))

    # --- numeric bounds (validator.ex:483-562) ---
    if _numeric(dtype):
        ex_min = rule.get("exclusive_minimum")
        ex_max = rule.get("exclusive_maximum")
        if "minimum" in rule:
            m = rule["minimum"]
            strict = ex_min is True  # draft-4 boolean form folds in (validator.ex:511-530)
            pred = (col > F.lit(m)) if strict else (col >= F.lit(m))
            kw = "exclusive_minimum" if strict else "minimum"
            checks.append((_G_T1, _check(col, pred, path, kw, f"value must be {'>' if strict else '>='} {m}")))
        if "maximum" in rule:
            m = rule["maximum"]
            strict = ex_max is True
            pred = (col < F.lit(m)) if strict else (col <= F.lit(m))
            kw = "exclusive_maximum" if strict else "maximum"
            checks.append((_G_T2, _check(col, pred, path, kw, f"value must be {'<' if strict else '<='} {m}")))
        if _is_num(ex_min):  # draft-6 numeric form (validator.ex:497-509)
            checks.append((_G_T4, _check(col, col > F.lit(ex_min), path, "exclusive_minimum",
                                          f"value must be > {ex_min}")))
        if _is_num(ex_max):  # (validator.ex:483-495)
            checks.append((_G_T3, _check(col, col < F.lit(ex_max), path, "exclusive_maximum",
                                          f"value must be < {ex_max}")))
        if "multiple_of" in rule:
            m = rule["multiple_of"]
            checks.append((_G_T5, _check(col, _multiple_of_pred(m, col, dtype), path, "multiple_of",
                                          f"value must be a multiple of {m}")))

    # --- string keywords (validator.ex:564-596; format validator.ex:1007-1017) ---
    if isinstance(dtype, T.StringType):
        if "min_length" in rule:
            n = rule["min_length"]
            checks.append((_G_T1, _check(col, _strlen(col) >= n, path, "min_length",
                                          f"string length must be >= {n}")))
        if "max_length" in rule:
            n = rule["max_length"]
            checks.append((_G_T2, _check(col, _strlen(col) <= n, path, "max_length",
                                          f"string length must be <= {n}")))
        if "pattern" in rule:
            p = rule["pattern"]
            checks.append((_G_T3, _check(col, col.rlike(p), path, "pattern",
                                          f"string must match {p!r}")))
        if "format" in rule:
            fmt = rule["format"]
            pred = _formats.predicate(fmt, col)
            if pred is not None:  # unknown formats pass (validator.ex:1017)
                checks.append((_G_T4, _check(col, pred, path, "format", f"invalid {fmt}")))

    # --- array keywords ---
    if isinstance(dtype, T.ArrayType):
        checks.extend(_compile_array(rule, col, dtype, path, root, _depth))

    # --- object keywords ---
    if isinstance(dtype, T.StructType):
        checks.extend(_compile_struct(rule, col, dtype, path, root, _depth))
    elif isinstance(dtype, T.MapType):
        checks.extend(_compile_map(rule, col, dtype, path, root, _depth))

    # --- combiners (validator.ex:388-481) ---
    if "not" in rule:
        sub = compile_rule(rule["not"], col, dtype, path, root, _depth + 1)
        checks.append((_G_NOT, _check(col, ~sub.valid, path, "not", "value must not match schema")))
    if "all_of" in rule:
        subs = [compile_rule(s, col, dtype, path, root, _depth + 1) for s in rule["all_of"]]
        checks.append((_G_ALL_OF, _and_all(subs)))
    if "any_of" in rule:
        subs = [compile_rule(s, col, dtype, path, root, _depth + 1) for s in rule["any_of"]]
        pred = subs[0].valid
        for s in subs[1:]:
            pred = pred | s.valid
        checks.append((_G_ANY_OF, _check(col, pred, path, "any_of", "no anyOf branch matched")))
    if "one_of" in rule:
        subs = [compile_rule(s, col, dtype, path, root, _depth + 1) for s in rule["one_of"]]
        total = subs[0].valid.cast("int")
        for s in subs[1:]:
            total = total + s.valid.cast("int")
        checks.append((_G_ONE_OF, _check(col, total == 1, path, "one_of",
                                         "exactly one oneOf branch must match")))
    if "if" in rule:
        # if/then/else (validator.ex:294-316)
        cif = compile_rule(rule["if"], col, dtype, path, root, _depth + 1)
        cthen = (compile_rule(rule["then"], col, dtype, path, root, _depth + 1)
                 if "then" in rule else Compiled(F.lit(True), _empty_viols()))
        celse = (compile_rule(rule["else"], col, dtype, path, root, _depth + 1)
                 if "else" in rule else Compiled(F.lit(True), _empty_viols()))
        valid = F.when(cif.valid, cthen.valid).otherwise(celse.valid)
        viols = F.when(cif.valid, cthen.violations).otherwise(celse.violations)
        checks.append((_G_IF, Compiled(_guard(col, valid), F.when(col.isNull(), _empty_viols()).otherwise(viols))))

    out = _and_all([c for _, c in checks])
    valid = _guard(col, out.valid)
    # Violations are gated behind the verdict: higher-order functions are
    # CodegenFallback (interpreted), and CASE WHEN short-circuits per row, so
    # the (heavy) violation-building tree only ever runs for invalid rows —
    # measured 4x on the flagship corpus (~2% invalid).
    body = _first_failing_group(checks) if _OPTS["early"] else out.violations
    viols = F.when(valid, _empty_viols()).otherwise(body)
    return Compiled(valid, viols)


# ---------------------------------------------------------------------------
# arrays (validator.ex:598-777)
# ---------------------------------------------------------------------------

def _compile_array(rule: Rule, col: Column, dtype: T.ArrayType, path: Column,
                   root: Rule, depth: int) -> list[tuple[int, Compiled]]:
    checks: list[tuple[int, Compiled]] = []
    elem_dt = dtype.elementType

    if "min_items" in rule:
        n = rule["min_items"]
        checks.append((_G_T1, _check(col, F.size(col) >= n, path, "min_items",
                                     f"array must have >= {n} items")))
    if "max_items" in rule:
        n = rule["max_items"]
        checks.append((_G_T2, _check(col, F.size(col) <= n, path, "max_items",
                                     f"array must have <= {n} items")))
    if rule.get("unique_items"):
        # hash-set walk in the reference (validator.ex:618-649) ==
        # distinct-size equality columnar
        checks.append((_G_T3, _check(col, F.size(col) == F.size(F.array_distinct(col)),
                                     path, "unique_items", "array items must be unique")))

    items = rule.get("items")
    if isinstance(items, (dict, bool)) and items is not True:
        # single-schema form: every element valid (validator.ex:694-721)
        def elem_valid(x: Column) -> Column:
            return compile_rule(items, x, elem_dt, path, root, depth + 1).valid

        pred = F.forall(col, elem_valid)

        def elem_viols(x: Column, i: Column) -> Column:
            p = F.concat(path, F.lit("["), i.cast("string"), F.lit("]"))
            return compile_rule(items, x, elem_dt, p, root, depth + 1).violations

        viols = F.flatten(F.transform(col, elem_viols))
        ok = _guard(col, pred)
        checks.append((_G_T4, Compiled(ok, F.when(col.isNull(), _empty_viols()).otherwise(viols))))
    elif isinstance(items, list):
        # tuple form + additional_items (validator.ex:684-692,723-777)
        for i, sub in enumerate(items):
            elem = F.try_element_at(col, F.lit(i + 1))
            p = F.concat(path, F.lit(f"[{i}]"))
            checks.append((_G_T4, compile_rule(sub, elem, elem_dt, p, root, depth + 1)))
        extra = rule.get("additional_items")
        k = len(items)
        if extra is False:
            checks.append((_G_T4, _check(col, F.size(col) <= k, path, "additional_items",
                                         f"no more than {k} items allowed")))
        elif isinstance(extra, (dict, bool)) and extra is not True:
            tail = _tail(col, k)

            def extra_valid(x: Column) -> Column:
                return compile_rule(extra, x, elem_dt, path, root, depth + 1).valid

            def extra_viols(x: Column, i: Column) -> Column:
                p = F.concat(path, F.lit("["), (i + k).cast("string"), F.lit("]"))
                return compile_rule(extra, x, elem_dt, p, root, depth + 1).violations

            ok = _guard(col, F.forall(tail, extra_valid))
            viols = F.when(col.isNull(), _empty_viols()).otherwise(F.flatten(F.transform(tail, extra_viols)))
            checks.append((_G_T4, Compiled(ok, viols)))

    if "contains" in rule:
        # >=1 element valid (validator.ex:651-675). A NULL element is
        # "absent" under the typed-column convention, and an absent element
        # cannot serve as an existence witness — without the isNotNull guard
        # [null] would vacuously satisfy any contains subschema (even
        # contains: false), because per-value keywords null-guard to true.
        sub = rule["contains"]

        def any_valid(x: Column) -> Column:
            return x.isNotNull() & compile_rule(sub, x, elem_dt, path, root, depth + 1).valid

        checks.append((_G_T5, _check(col, F.exists(col, any_valid), path, "contains",
                                     "no array item matches contains schema")))
    return checks


# ---------------------------------------------------------------------------
# objects as StructType (validator.ex:830-1004; struct keys are compile-time)
# ---------------------------------------------------------------------------

def _compile_struct(rule: Rule, col: Column, dtype: T.StructType, path: Column,
                    root: Rule, depth: int) -> list[tuple[int, Compiled]]:
    checks: list[tuple[int, Compiled]] = []
    fields = _struct_fields(dtype)
    props: dict[str, Rule] = rule.get("properties", {})
    pattern_props: dict[str, Rule] = rule.get("pattern_properties", {})

    # module check (validator.ex:143,258 — value.__struct__ == module): the
    # columnar analogue is a COMPILE-TIME shape assertion. A module name is
    # registered with its StructType (register_module); a mismatching
    # physical schema means no row can ever satisfy the rule, so the check
    # resolves to a constant per-rule verdict rather than per-row work.
    if "module" in rule:
        expected = _MODULES.get(rule["module"])
        shape_ok = expected is None or _struct_shape_matches(dtype, expected)
        checks.append((_G_MODULE, _check(col, F.lit(bool(shape_ok)), path, "module",
                                         f"struct shape does not match module {rule['module']!r}")))

    # properties: absent keys skipped (validator.ex:830-859, 846-849)
    for name, sub in props.items():
        if name in fields:
            p = F.concat(path, F.lit(_quote_path_seg(name)))
            checks.append((_G_PROPS, compile_rule(sub, col.getField(name), fields[name], p, root, depth + 1)))
        # property declared in rule but not in the physical schema: it can
        # never be present, so nothing to validate (absent => skip).

    # pattern_properties: key-regex match resolved at compile time on the
    # static field list (validator.ex:899-917)
    for regex, sub in pattern_props.items():
        cre = re.compile(regex)
        for name, fdt in fields.items():
            if cre.search(name):
                p = F.concat(path, F.lit(_quote_path_seg(name)))
                checks.append((_G_PROPS, compile_rule(sub, col.getField(name), fdt, p, root, depth + 1)))

    # required (validator.ex:861-875)
    for name in rule.get("required", []):
        if name in fields:
            pred = _struct_present(col, name)
        else:
            pred = F.lit(False)  # physically impossible to satisfy
        checks.append((_G_T3, _check(col, pred, path, "required", f"required property {name!r} is missing")))

    # min/max_properties: present == non-null field (validator.ex:877-897)
    if "min_properties" in rule or "max_properties" in rule:
        n_present: Column = F.lit(0)
        for name in fields:
            n_present = n_present + _struct_present(col, name).cast("int")
        if "min_properties" in rule:
            n = rule["min_properties"]
            checks.append((_G_T1, _check(col, n_present >= n, path, "min_properties",
                                         f"object must have >= {n} properties")))
        if "max_properties" in rule:
            n = rule["max_properties"]
            checks.append((_G_T1, _check(col, n_present <= n, path, "max_properties",
                                         f"object must have <= {n} properties")))

    # property_names: evaluate the name rule per static field name on the
    # driver (validator.ex:318-344); a field with an invalid name must be absent
    if "property_names" in rule:
        name_rule = rule["property_names"]
        for name in fields:
            if not _interp.validate_value(name_rule, name, root=root):
                checks.append((_G_T4, _check(col, ~_struct_present(col, name), path, "property_names",
                                             f"property name {name!r} is invalid")))

    # additional_properties (validator.ex:919-963): fields beyond
    # properties ∪ pattern_properties
    extra_rule = rule.get("additional_properties")
    if extra_rule is not None and extra_rule is not True:
        pres = [re.compile(r) for r in pattern_props]
        undeclared = [n for n in fields
                      if n not in props and not any(r.search(n) for r in pres)]
        for name in undeclared:
            p = F.concat(path, F.lit(_quote_path_seg(name)))
            if extra_rule is False:
                checks.append((_G_PROPS, _check(col, ~_struct_present(col, name), path,
                                                "additional_properties",
                                                f"additional property {name!r} not allowed")))
            else:
                checks.append((_G_PROPS, compile_rule(extra_rule, col.getField(name), fields[name],
                                                      p, root, depth + 1)))

    # dependencies (validator.ex:965-1004)
    for key, dep in rule.get("dependencies", {}).items():
        has_key = _struct_present(col, key) if key in fields else F.lit(False)
        if isinstance(dep, list):
            need = F.lit(True)
            for d in dep:
                need = need & (_struct_present(col, d) if d in fields else F.lit(False))
            checks.append((_G_T5, _check(col, ~has_key | need, path, "dependencies",
                                         f"property {key!r} requires {dep!r}")))
        else:
            sub = compile_rule(dep, col, dtype, path, root, depth + 1)
            checks.append((_G_T5, _check(col, ~has_key | sub.valid, path, "dependencies",
                                         f"schema dependency of {key!r} not satisfied")))
    return checks


# ---------------------------------------------------------------------------
# objects as MapType (open maps; validator.ex:779-963 runtime-key variants)
# ---------------------------------------------------------------------------

def _compile_map(rule: Rule, col: Column, dtype: T.MapType, path: Column,
                 root: Rule, depth: int) -> list[tuple[int, Compiled]]:
    checks: list[tuple[int, Compiled]] = []
    val_dt = dtype.valueType
    props: dict[str, Rule] = rule.get("properties", {})
    pattern_props: dict[str, Rule] = rule.get("pattern_properties", {})

    for name, sub in props.items():
        p = F.concat(path, F.lit(_quote_path_seg(name)))
        checks.append((_G_PROPS, compile_rule(sub, F.try_element_at(col, F.lit(name)), val_dt, p, root, depth + 1)))

    for name in rule.get("required", []):
        checks.append((_G_T3, _check(col, F.map_contains_key(col, F.lit(name)), path, "required",
                                     f"required property {name!r} is missing")))

    if "min_properties" in rule:
        n = rule["min_properties"]
        checks.append((_G_T1, _check(col, F.size(col) >= n, path, "min_properties",
                                     f"object must have >= {n} properties")))
    if "max_properties" in rule:
        n = rule["max_properties"]
        checks.append((_G_T1, _check(col, F.size(col) <= n, path, "max_properties",
                                     f"object must have <= {n} properties")))

    def _value_pred(sub_rule: Rule):
        # closure factory, NOT a default-arg lambda: pyspark derives the
        # lambda-variable count from the function arity, so a defaulted extra
        # parameter would receive a Column
        return lambda x: compile_rule(sub_rule, x, val_dt, path, root, depth + 1).valid

    for regex, sub in pattern_props.items():
        matched_vals = F.map_values(F.map_filter(col, lambda k, v: k.rlike(regex)))
        checks.append((_G_PROPS, _check(col, F.forall(matched_vals, _value_pred(sub)), path,
                                        "pattern_properties",
                                        f"value of key matching {regex!r} is invalid")))

    if "property_names" in rule:
        name_rule = rule["property_names"]

        def nv(k: Column) -> Column:
            return compile_rule(name_rule, k, T.StringType(), path, root, depth + 1).valid

        checks.append((_G_T4, _check(col, F.forall(F.map_keys(col), nv), path, "property_names",
                                     "a property name is invalid")))

    extra_rule = rule.get("additional_properties")
    if extra_rule is not None and extra_rule is not True:
        declared = list(props.keys())
        regexes = list(pattern_props.keys())

        def is_extra(k: Column, v: Column) -> Column:
            pred = ~k.isin(declared) if declared else F.lit(True)
            for r in regexes:
                pred = pred & ~k.rlike(r)
            return pred

        extras = F.map_filter(col, is_extra)
        if extra_rule is False:
            checks.append((_G_PROPS, _check(col, F.size(extras) == 0, path, "additional_properties",
                                            "additional properties not allowed")))
        else:
            def ev(x: Column) -> Column:
                return compile_rule(extra_rule, x, val_dt, path, root, depth + 1).valid

            checks.append((_G_PROPS, _check(col, F.forall(F.map_values(extras), ev), path,
                                            "additional_properties", "an additional property is invalid")))

    for key, dep in rule.get("dependencies", {}).items():
        has_key = F.map_contains_key(col, F.lit(key))
        if isinstance(dep, list):
            need = F.lit(True)
            for d in dep:
                need = need & F.map_contains_key(col, F.lit(d))
            checks.append((_G_T5, _check(col, ~has_key | need, path, "dependencies",
                                         f"property {key!r} requires {dep!r}")))
        else:
            sub = compile_rule(dep, col, dtype, path, root, depth + 1)
            checks.append((_G_T5, _check(col, ~has_key | sub.valid, path, "dependencies",
                                         f"schema dependency of {key!r} not satisfied")))
    return checks


# ---------------------------------------------------------------------------
# DataFrame-level API
# ---------------------------------------------------------------------------

def validate_df(
    df: DataFrame,
    rule: Rule,
    target: str | None = None,
    mode: str = "violations",
    valid_col: str = "valid",
    violations_col: str = "violations",
    registry: dict | None = None,
    exact_graphemes: bool = False,
) -> DataFrame:
    """Validate a DataFrame against a JSON-Schema rule in one projection.

    target=None validates each row as an object built from all columns
    (one row == one value in reference terms, validator.ex:51-66);
    target='c' validates just that column. mode='verdict' appends only the
    boolean (the reference's fail: :immediately analogue, behaviour.ex:86);
    mode='violations' appends the violations array too.

    Reference fail-mode mapping (behaviour.ex:36, validator.ex:121-169):
      :immediately -> 'verdict'     boolean only, no error detail
      :early       -> 'early'      per node, only the FIRST failing
                                   with-chain step's violations survive, but
                                   that step keeps every error it collected
                                   (all failing properties/items) — applied
                                   recursively at each nesting level, exactly
                                   the reference's aborted with-chains
      :finally     -> 'violations' every violation collected per row
    """
    rule = normalize_rule(rule)
    if registry:
        from xema_spark.rules import inline_remote_refs

        rule = inline_remote_refs(rule, registry)
    meta_validate(rule)
    mode = {"immediately": "verdict", "finally": "violations"}.get(mode, mode)
    if target is None:
        col = F.struct(*[F.col(c) for c in df.columns])
        dtype: T.DataType = T.StructType([T.StructField(f.name, f.dataType) for f in df.schema.fields])
    else:
        col = F.col(target)
        dtype = df.schema[target].dataType
    prev = dict(_OPTS)
    _OPTS["exact_graphemes"] = exact_graphemes
    # :early is compiled in, not post-filtered: each node's violations become
    # a CASE chain over its with-chain steps (_first_failing_group), so
    # nested levels truncate themselves too — a flat keyword/group filter on
    # the final array cannot express that hierarchy (it either drops sibling
    # properties' errors of the same failing step or keeps later steps).
    _OPTS["early"] = mode == "early"
    try:
        compiled = compile_rule(rule, col, dtype)
    finally:
        _OPTS.update(prev)
    if mode == "verdict":
        return df.withColumn(valid_col, compiled.valid)
    return df.withColumn(valid_col, compiled.valid).withColumn(violations_col, compiled.violations)


def validate_many(df: DataFrame, rules: dict[str, Rule],
                  mode: str = "violations") -> DataFrame:
    """Validate one table against N rule documents in ONE projection — one
    scan produces valid_<name> (+ violations_<name>) per rule. The dataset-
    scope analogue of running N Xema.validate calls per value, fused so the
    100TB input is read once."""
    from pyspark.sql import types as T2

    col = F.struct(*[F.col(c) for c in df.columns])
    dtype = T2.StructType([T2.StructField(f.name, f.dataType) for f in df.schema.fields])
    out = df
    for name, rule in rules.items():
        nrule = normalize_rule(rule)
        meta_validate(nrule)
        compiled = compile_rule(nrule, col, dtype)
        out = out.withColumn(f"valid_{name}", compiled.valid)
        if mode == "violations":
            out = out.withColumn(f"violations_{name}", compiled.violations)
    return out


def explode_violations(df: DataFrame, id_cols: list[str],
                       violations_col: str = "violations",
                       on_error=None) -> DataFrame:
    """Exploded violation rows (doc_id, path, keyword, message) — the columnar
    analogue of the reference's error tree rendering
    (/root/reference/lib/xema/validation_error.ex:95-119).

    on_error: the Behaviour.on_error/1 hook analogue
    (/root/reference/lib/xema/behaviour.ex:106-123 — customize how errors
    are rendered): a callable (path, keyword, message Columns) -> message
    Column, applied in the same projection (no second pass)."""
    ex = df.filter(F.size(F.col(violations_col)) > 0).select(
        *id_cols, F.explode(violations_col).alias("v")
    )
    msg = F.col("v.message")
    if on_error is not None:
        msg = on_error(F.col("v.path"), F.col("v.keyword"), msg)
    return ex.select(*id_cols,
                     F.col("v.path").alias("path"),
                     F.col("v.keyword").alias("keyword"),
                     msg.alias("message"))
