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
plus `default` fill-in via coalesce. Elixir-specific targets (atom, keyword,
tuple, struct module) are at-rest aliases only (SURVEY.md §1.2) and are not
distinct here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from xema_spark.rules import Rule, meta_validate, normalize_rule


class CastError(ValueError):
    pass


_NUMERIC_TARGETS = {"integer": "bigint", "number": "double"}


def cast_column(col: Column, dtype: T.DataType, rule: Rule) -> Column:
    """Coerce one column toward the rule's declared type. Non-coercible
    values become NULL (caught by the subsequent validation pass as a
    `type`/`required` violation, mirroring the reference's {:error, ...})."""
    if isinstance(rule, bool) or "type" not in rule:
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


def cast_df(df: DataFrame, rule: Rule, with_defaults: bool = True) -> DataFrame:
    """Coerce every rule-declared property of the frame (one projection),
    applying `default` fill-ins. The caller runs validate_df afterwards, the
    same cast-then-validate sequence as the reference (xema.ex:720-739)."""
    rule = normalize_rule(rule)
    meta_validate(rule)
    props: dict[str, Rule] = rule.get("properties", {}) if isinstance(rule, dict) else {}
    out = []
    for f in df.schema.fields:
        c: Column = F.col(f.name)
        sub = props.get(f.name)
        if isinstance(sub, dict):
            c = cast_column(c, f.dataType, sub)
            if with_defaults and "default" in sub:
                c = F.coalesce(c, F.lit(sub["default"]))
        out.append(c.alias(f.name))
    return df.select(*out)


def cast_and_validate(df: DataFrame, rule: Rule, **kw) -> DataFrame:
    from xema_spark.compiler import validate_df

    return validate_df(cast_df(df, rule), rule, **kw)
