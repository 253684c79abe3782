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

from xema_spark.rules import (
    RuleError,
    meta_validate,
    normalize_rule,
    register_caster,
    register_validator,
    validate_schema_document,
)
from xema_spark.compiler import (
    VIOLATION_ARRAY_TYPE,
    Compiled,
    compile_rule,
    explode_violations,
    register_module,
    validate_df,
    validate_many,
)
from xema_spark import builder
from xema_spark.cast import cast_and_validate, cast_df
from xema_spark.pipeline import curate
from xema_spark.runner import read_verdicts, run_validation
from xema_spark.sampling import (
    deterministic_sample,
    stratified_deterministic_sample,
)
from xema_spark.stats import (
    drift_report,
    read_stats_sidecar,
    stats_profile,
    write_stats_sidecar,
)

__all__ = [
    "normalize_rule",
    "meta_validate",
    "RuleError",
    "register_validator",
    "register_caster",
    "register_module",
    "validate_schema_document",
    "compile_rule",
    "validate_df",
    "validate_many",
    "explode_violations",
    "Compiled",
    "VIOLATION_ARRAY_TYPE",
    "builder",
    "cast_df",
    "cast_and_validate",
    "run_validation",
    "read_verdicts",
    "curate",
    "deterministic_sample",
    "stratified_deterministic_sample",
    "stats_profile",
    "write_stats_sidecar",
    "read_stats_sidecar",
    "drift_report",
]

__version__ = "0.1.0"
