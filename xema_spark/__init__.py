"""xema_spark — a from-scratch PySpark-native schema + constraint validation engine.

Re-expresses the JSON-Schema-style keyword semantics of the reference
(egze/xema, an Elixir per-value validator: /root/reference/lib/xema/validator.ex)
as compiled Spark Column-expression predicate trees evaluated in a single
per-partition pass over columnar tables, plus the dataset-scope validation
operators (column stats, uniqueness, referential integrity, distribution
drift) that only exist at table scope.

This is NOT a port: the reference walks one Elixir value at a time with a
recursive interpreter; this engine compiles a rule tree ONCE on the driver
into pyspark.sql.Column expressions (JVM-side, whole-stage-codegen friendly)
and lets Catalyst pick the physical plan. Python touches data only where a
keyword is genuinely not expressible as a Column (ipv6/uri formats, custom
validators) and then only through Arrow-vectorized pandas UDFs.
"""

from xema_spark.rules import normalize_rule, meta_validate, RuleError
from xema_spark.compiler import compile_rule, validate_df, Compiled, VIOLATION_ARRAY_TYPE

__all__ = [
    "normalize_rule",
    "meta_validate",
    "RuleError",
    "compile_rule",
    "validate_df",
    "Compiled",
    "VIOLATION_ARRAY_TYPE",
]

__version__ = "0.1.0"
