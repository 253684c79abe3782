"""Cast/coercion pipeline: the engine's analogue of Xema.cast/3
(/root/reference/lib/xema.ex:713-739) — coerce values TOWARD a rule, then
validate the result.

The reference walks the value recursively (children first, then the node via
the Castable protocol, /root/reference/lib/xema/castable.ex). Columnar
translation: each (column, target-type) pair becomes a try_cast-based
expression compiled once; failures surface as NULL + a cast-violation row
instead of raising (ANSI-safe by construction). Defaults fill in after the
cast (xema.ex:1021-1069).

Supported coercions (castable.ex:45-188):
  string -> integer / number / boolean("true"/"false") / date / timestamp / decimal
  integer -> number / string;  number -> string;  boolean -> string
plus `default` fill-in via coalesce, plus container RESHAPING
(castable.ex:190-349): map->struct (rule type "struct", struct! strictness),
struct->map and array-of-pairs->map (rule type "map", ambiguous/NULL keys
fail), map->sorted entries (rule type "keyword"). tuple<->list are at-rest
aliases of array (SURVEY.md §1.2), identity; atom stays a string alias.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from xema_spark.rules import Rule, meta_validate, normalize_rule


class CastError(ValueError):
    pass


_NUMERIC_TARGETS = {"integer": "bigint", "number": "double"}


def _default_col(d, dtype: T.DataType | None) -> Column | None:
    """Typed Column for a schema `default`, or None when it can't be built.
    F.lit raises for list/dict values, so composite defaults need explicit
    construction (arrays of scalars, typed empty arrays); dict defaults and
    heterogeneous lists are skipped rather than crashing cast compilation —
    validation still sees the original NULL."""
    if d is None:
        return None
    if isinstance(d, (str, int, float, bool)):
        return F.lit(d)
    if isinstance(d, list):
        if not d:
            return (F.array().cast(dtype) if isinstance(dtype, T.ArrayType)
                    else None)
        if all(isinstance(x, (str, int, float, bool)) for x in d):
            arr = F.array(*[F.lit(x) for x in d])
            return arr.cast(dtype) if isinstance(dtype, T.ArrayType) else arr
    return None


_SPARK_OF_TYPE = {"integer": "bigint", "number": "double",
                  "string": "string", "boolean": "boolean"}


def _declared_spark_type(sub) -> str | None:
    """Spark type string a scalar property rule declares, or None."""
    if not isinstance(sub, dict):
        return None
    t = sub.get("type")
    t = t[0] if isinstance(t, list) and t else t
    return _SPARK_OF_TYPE.get(t) if isinstance(t, str) else None


def _map_to_struct(col: Column, dtype: T.MapType, rule: Rule) -> Column | None:
    """map<string,V> -> struct (castable.ex:259-264 via to_struct/struct!).
    The target field set comes from a registered `module` (authoritative,
    field types included — the Elixir struct module) or, without one, from
    the rule's `properties` (field types derived from each property's
    declared scalar type; the reference no-ops a module-less map->struct,
    castable.ex:258 — deriving from properties is the engine's useful
    extension). struct! semantics kept: a map key that is NOT a target
    field fails the cast (KeyError analogue -> NULL); missing keys become
    NULL fields (filled by `default`s where declared, validation's
    `required` catches the rest)."""
    from xema_spark.compiler import _MODULES

    props = rule.get("properties", {})
    module = rule.get("module")
    target = _MODULES.get(module) if isinstance(module, str) else None
    if target is not None:
        names = [f.name for f in target.fields]
        types: dict[str, T.DataType] = {f.name: f.dataType for f in target.fields}
    elif props:
        names = list(props.keys())
        types = {}
    else:
        return None
    fields = []
    for name in names:
        v = F.try_element_at(col, F.lit(name))
        sub = props.get(name)
        if isinstance(sub, dict):
            v = cast_column(v, dtype.valueType, sub)
            if "default" in sub:
                dlit = _default_col(sub["default"], types.get(name))
                if dlit is not None:
                    v = F.coalesce(v, dlit)
        st = types.get(name)
        if st is not None:
            v = v.try_cast(st)
        else:
            dt = _declared_spark_type(sub)
            if dt is not None:
                v = v.try_cast(dt)
        fields.append(v.alias(name))
    declared = F.array(*[F.lit(n) for n in names])
    unknown = F.size(F.array_except(F.map_keys(col), declared)) > 0
    return (F.when(col.isNull(), F.lit(None))
            .when(unknown, F.lit(None))
            .otherwise(F.struct(*fields)))


def _struct_to_map(col: Column, dtype: T.StructType, rule: Rule) -> Column:
    """struct -> map<string, V> (the columnar face of castable.ex:261-279
    Map casts — an Elixir struct IS a map, dropping the tag). V comes from
    an `additional_properties` value schema when given (each field cast
    toward it), else the fields' single common Spark type; mixed-type
    structs without a value schema fail LOUDLY at compile (CastError) —
    silently stringifying would lose data."""
    sub = rule.get("additional_properties")
    sub = sub if isinstance(sub, dict) else None
    vt = _declared_spark_type(sub) if sub else None
    if vt is None:
        kinds = {f.dataType.simpleString() for f in dtype.fields}
        if len(kinds) != 1:
            raise CastError(
                "struct->map cast needs a single common field type or an "
                f"additional_properties value schema; got {sorted(kinds)}")
    vals = []
    for f in dtype.fields:
        v = col.getField(f.name)
        if sub is not None:
            v = cast_column(v, f.dataType, sub)
        if vt is not None:
            v = v.try_cast(vt)
        vals.append(v)
    m = F.map_from_arrays(
        F.array(*[F.lit(f.name) for f in dtype.fields]), F.array(*vals))
    return F.when(col.isNull(), F.lit(None)).otherwise(m)


def _pairs_to_map(col: Column, dtype: T.ArrayType, rule: Rule) -> Column:
    """array<struct<k,v>> (keyword list at rest) -> map (castable.ex:215-224
    List -> :map). check_keyword is the element schema here (pairs by
    construction); the reference's strictness guards carry over as NULL
    failures: a NULL key, or two pairs sharing a key (the ambiguous-key
    error, castable.ex:283-299), fails the whole cast — never a silent
    last-write-wins merge. An empty list casts to an empty map
    (castable.ex:196-198)."""
    et: T.StructType = dtype.elementType  # type: ignore[assignment]
    kf, vf = et.fields[0].name, et.fields[1].name
    sub = rule.get("additional_properties")
    sub = sub if isinstance(sub, dict) else None

    def entry(x):
        v = x.getField(vf)
        if sub is not None:
            v = cast_column(v, et.fields[1].dataType, sub)
        return F.struct(x.getField(kf).alias("key"), v.alias("value"))

    keys = F.transform(col, lambda x: x.getField(kf))
    ok = ((F.size(F.array_distinct(keys)) == F.size(keys))
          & ~F.exists(keys, lambda k: k.isNull()))
    return (F.when(col.isNull(), F.lit(None))
            .when(ok, F.map_from_entries(F.transform(col, entry)))
            .otherwise(F.lit(None)))


def _reshape_column(col: Column, dtype: T.DataType, rule: Rule) -> Column | None:
    """Cross-representation container cast, or None when (source type,
    target spelling) is not a reshape pair. tuple<->list are at-rest
    aliases of array (SURVEY §1.2) — identity, handled by falling through.
    Maps with non-string keys don't reshape (field names are strings)."""
    target = rule.get("xema_type") if isinstance(rule, dict) else None
    if target is None:
        return None
    if target == "struct" and isinstance(dtype, T.MapType) \
            and isinstance(dtype.keyType, T.StringType):
        return _map_to_struct(col, dtype, rule)
    if target == "map":
        if isinstance(dtype, T.StructType):
            return _struct_to_map(col, dtype, rule)
        if isinstance(dtype, T.ArrayType) \
                and isinstance(dtype.elementType, T.StructType) \
                and len(dtype.elementType.fields) == 2:
            return _pairs_to_map(col, dtype, rule)
    if target == "keyword" and isinstance(dtype, T.MapType):
        # map -> keyword list-of-pairs (castable.ex:281-301). Spark maps
        # are unordered; sort by key so the result is deterministic
        # cross-engine (the reference's insertion order doesn't exist here)
        return F.array_sort(F.map_entries(col))
    return None


def cast_column(col: Column, dtype: T.DataType, rule: Rule) -> Column:
    """Coerce one column toward the rule's declared type. Non-coercible
    values become NULL (caught by the subsequent validation pass as a
    `type`/`required` violation, mirroring the reference's {:error, ...})."""
    if isinstance(rule, bool):
        return col
    # custom caster hook (xema.ex:779-797): a registered Series->Series
    # function, compiled to one Arrow-batched pandas UDF; it REPLACES the
    # built-in coercion for this node (as the reference's caster does)
    if "caster" in rule:
        from xema_spark.rules import get_caster

        cfn = get_caster(rule["caster"])

        def _cbatch(s, _fn=cfn):
            import pandas as pd
            out = _fn(s)
            return out if isinstance(out, pd.Series) else pd.Series(out)

        ret = rule.get("caster_type", "string")
        return F.pandas_udf(_cbatch, ret)(col)
    # combiner cast (xema.ex:1078-1147): first subschema (in declaration
    # order) whose cast succeeds wins — columnar translation: coalesce over
    # the per-subschema cast expressions (failed casts surface as NULL).
    # all_of applies its members' casts sequentially.
    for comb in ("any_of", "one_of"):
        if comb in rule:
            branches = [cast_column(col, dtype, s) for s in rule[comb]]
            return F.coalesce(*branches) if len(branches) > 1 else branches[0]
    if "all_of" in rule:
        out = col
        for s in rule["all_of"]:
            out = cast_column(out, dtype, s)
        return out
    # string -> Decimal(p, s) (castable.ex:54-60 Decimal.new); rule carries
    # {"decimal": {"precision": p, "scale": s}}
    if "decimal" in rule and isinstance(dtype, (T.StringType, T.NumericType)):
        d = rule["decimal"]
        return col.try_cast(f"decimal({d['precision']},{d['scale']})")
    # container RESHAPING (castable.ex:190-349): the Castable protocol's
    # cross-representation casts, dispatched on (source Spark type, target
    # spelling). The target spelling is the rule's pre-canonicalization
    # `type` ("map"/"struct"/"keyword"/"tuple"), preserved by normalize_rule
    # as the `xema_type` annotation. All failures surface as NULL (caught by
    # the validation pass), mirroring the scalar casts' ANSI-safe contract.
    reshaped = _reshape_column(col, dtype, rule)
    if reshaped is not None:
        return reshaped
    # nested reshaping (castable.ex:190-349 walks children first): structs
    # rebuild field-by-field with each property's cast applied; map values
    # cast through transform_values; array items through transform — all
    # Column expressions, one projection regardless of depth
    if isinstance(dtype, T.StructType) and "properties" in rule:
        props = rule["properties"]
        fields = []
        for f in dtype.fields:
            c = col.getField(f.name)
            sub = props.get(f.name)
            if isinstance(sub, dict):
                c = cast_column(c, f.dataType, sub)
                if "default" in sub:
                    dlit = _default_col(sub["default"], f.dataType)
                    if dlit is not None:
                        c = F.coalesce(c, dlit)
            fields.append(c.alias(f.name))
        rebuilt = F.struct(*fields)
        return F.when(col.isNull(), F.lit(None)).otherwise(rebuilt)
    if isinstance(dtype, T.MapType) and isinstance(rule.get("additional_properties"), dict):
        sub = rule["additional_properties"]
        return F.transform_values(col, lambda _k, v: cast_column(v, dtype.valueType, sub))
    if isinstance(dtype, T.ArrayType) and isinstance(rule.get("items"), dict):
        sub = rule["items"]
        return F.transform(col, lambda x: cast_column(x, dtype.elementType, sub))
    if "type" not in rule:
        return col
    t = rule["type"]
    t = t[0] if isinstance(t, list) else t

    if t in _NUMERIC_TARGETS:
        if isinstance(dtype, T.StringType):
            return col.try_cast(_NUMERIC_TARGETS[t])
        if t == "integer" and isinstance(dtype, T.FractionalType):
            # only int-like floats cast (castable/helper.ex:31-43)
            return F.when(col == F.floor(col), col.cast("bigint"))
        if isinstance(dtype, T.NumericType):
            return col.cast(_NUMERIC_TARGETS[t])
        return col
    if t == "boolean" and isinstance(dtype, T.StringType):
        # only the exact strings "true"/"false" cast (castable.ex:62-64)
        return F.when(col == "true", F.lit(True)) \
            .when(col == "false", F.lit(False)).otherwise(F.lit(None).cast("boolean"))
    if t == "string":
        if isinstance(dtype, (T.NumericType, T.BooleanType)):
            return col.cast("string")
        return col
    fmt = rule.get("format")
    if t == "any" and isinstance(dtype, T.StringType):
        if fmt == "date":
            return F.try_to_date(col, "yyyy-MM-dd")
        if fmt in ("date-time", "date_time"):
            return F.try_to_timestamp(col)
    return col


def cast_df(df: DataFrame, rule: Rule, with_defaults: bool = True,
            additional_properties: str | None = None) -> DataFrame:
    """Coerce every rule-declared property of the frame (one projection),
    applying `default` fill-ins. The caller runs validate_df afterwards, the
    same cast-then-validate sequence as the reference (xema.ex:720-739).

    additional_properties='delete' (xema.ex:1007-1019): when the rule says
    additional_properties: false, columns not declared in `properties` and
    not matching any pattern_properties regex are DROPPED instead of failing
    validation — the data-repair projection a pipeline wants. Pure column
    pruning: at scale this also narrows the scan (Catalyst pushes the
    projection into the reader)."""
    import re as _re

    rule = normalize_rule(rule)
    meta_validate(rule)
    props: dict[str, Rule] = rule.get("properties", {}) if isinstance(rule, dict) else {}
    patterns = [_re.compile(p) for p in rule.get("pattern_properties", {})] \
        if isinstance(rule, dict) else []
    delete_extra = (additional_properties == "delete"
                    and isinstance(rule, dict)
                    and rule.get("additional_properties") is False)
    out = []
    for f in df.schema.fields:
        if delete_extra and f.name not in props \
                and not any(p.search(f.name) for p in patterns):
            continue
        c: Column = F.col(f.name)
        sub = props.get(f.name)
        if isinstance(sub, dict):
            c = cast_column(c, f.dataType, sub)
            if with_defaults and "default" in sub:
                dlit = _default_col(sub["default"], f.dataType)
                if dlit is not None:
                    c = F.coalesce(c, dlit)
        out.append(c.alias(f.name))
    return df.select(*out)


def cast_and_validate(df: DataFrame, rule: Rule, **kw) -> DataFrame:
    from xema_spark.compiler import validate_df

    return validate_df(cast_df(df, rule), rule, **kw)
