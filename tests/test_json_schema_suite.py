"""Official JSON-Schema-Test-Suite conformance (draft4 / draft6 / draft7).

The corpus under tests/json_schema_test_suite/ is the public suite
(https://github.com/json-schema-org/JSON-Schema-Test-Suite), recovered from
the reference repo's generated test files by tools/convert_json_schema_suite.py
— the reference runs the same corpus (test/json_schema_test_suite/, generated
by test/support/mix/tasks/gen/test_suite.ex). The generation-time exclusions
are the reference's own (content/ecmascript-regex/zeroTerminatedFloats/
non-bmp-regex/idn-*/iri-* and two location-independent-identifier cases,
gen/test_suite.ex:12-37); no file present in the corpus is skipped here.

Every case runs through interpreter.validate_value (full JSON semantics).
Remote $refs resolve through a URI registry of the suite's own remote
fixture documents plus the draft-04/06/07 meta-schemas (all public JSON).

test_compiler_conformance additionally runs every typed-representable,
null-free case FROM ALL THREE DRAFTS through the Column compiler on literal
expressions — batched into a handful of Spark jobs (one wide select per
chunk).
"""

from __future__ import annotations

import json
import os

import pytest

from xema_spark.interpreter import validate_value

HERE = os.path.dirname(os.path.abspath(__file__))
SUITE = os.path.join(HERE, "json_schema_test_suite")

REGISTRY: dict[str, dict] = {}
for rel, uri in [
    ("remotes/integer.json", "http://localhost:1234/integer.json"),
    ("remotes/subSchemas.json", "http://localhost:1234/subSchemas.json"),
    ("remotes/name.json", "http://localhost:1234/name.json"),
    ("remotes/name-defs.json", "http://localhost:1234/name-defs.json"),
    ("remotes/folder/folderInteger.json", "http://localhost:1234/folder/folderInteger.json"),
    ("remotes/baseUriChange/folderInteger.json",
     "http://localhost:1234/baseUriChange/folderInteger.json"),
    ("remotes/baseUriChangeFolder/folderInteger.json",
     "http://localhost:1234/baseUriChangeFolder/folderInteger.json"),
    ("remotes/baseUriChangeFolderInSubschema/folderInteger.json",
     "http://localhost:1234/baseUriChangeFolderInSubschema/folderInteger.json"),
]:
    with open(os.path.join(SUITE, rel), encoding="utf-8") as f:
        REGISTRY[uri] = json.load(f)
# the official draft meta-schemas ship with the package (rules._meta_schema)
from xema_spark.rules import _meta_schema  # noqa: E402

for _draft, _uri in [("draft4", "http://json-schema.org/draft-04/schema"),
                     ("draft6", "http://json-schema.org/draft-06/schema"),
                     ("draft7", "http://json-schema.org/draft-07/schema")]:
    REGISTRY[_uri] = _meta_schema(_draft)


def _corpus_files() -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(SUITE):
        if os.path.basename(dirpath) in ("remotes", "meta") or \
                f"{os.sep}remotes{os.sep}" in dirpath:
            continue
        for fn in sorted(files):
            if fn.endswith(".json"):
                out.append(os.path.relpath(os.path.join(dirpath, fn), SUITE))
    return sorted(out)


CORPUS = _corpus_files()


def _cases(rel: str):
    with open(os.path.join(SUITE, rel), encoding="utf-8") as f:
        for group in json.load(f):
            for t in group["tests"]:
                yield group["description"], group["schema"], t


@pytest.mark.parametrize("rel", CORPUS)
def test_interpreter_conformance(rel):
    failures = []
    for gdesc, schema, t in _cases(rel):
        got = validate_value(schema, t["data"], registry=REGISTRY)
        if got != t["valid"]:
            failures.append(f"{gdesc} | {t['description']}: "
                            f"expected {t['valid']}, got {got}")
    assert not failures, f"{rel}: {len(failures)} failing cases:\n" + "\n".join(failures[:20])


# ---------------------------------------------------------------------------
# compiler conformance on typed-representable cases
# ---------------------------------------------------------------------------

def _lit_expr(v):
    """Build (Column, DataType) for a typed-representable value, else None.

    Typed-representable = maps to a Spark literal tree: scalars, homogeneous
    scalar arrays, and flat objects with identifier keys and scalar values.
    Values containing JSON null anywhere are excluded: the compiler's
    NULL==absent convention intentionally diverges from JSON null-instance
    semantics there (SURVEY.md §1.2)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(v, bool):
        return F.lit(v), T.BooleanType()
    if isinstance(v, int):
        if not (-(1 << 63) <= v < (1 << 63)):
            return None
        return F.lit(v).cast("long"), T.LongType()
    if isinstance(v, float):
        return F.lit(v), T.DoubleType()
    if isinstance(v, str):
        return F.lit(v), T.StringType()
    if isinstance(v, list):
        kinds = {type(x) for x in v}
        if v and kinds <= {str}:
            return F.array(*[F.lit(x) for x in v]), T.ArrayType(T.StringType())
        if v and kinds <= {int} and not kinds & {bool} \
                and all(-(1 << 63) <= x < (1 << 63) for x in v):
            return (F.array(*[F.lit(x).cast("long") for x in v]),
                    T.ArrayType(T.LongType()))
        if v and kinds <= {int, float} and not kinds & {bool}:
            return (F.array(*[F.lit(float(x)) for x in v]),
                    T.ArrayType(T.DoubleType()))
        if not v:
            return F.array().cast("array<string>"), T.ArrayType(T.StringType())
        return None
    if isinstance(v, dict):
        if not v:
            return None  # empty struct is not a Spark type
        fields, cols = [], []
        for k, x in v.items():
            if not k.isidentifier():
                return None
            sub = _lit_expr(x)
            if sub is None or isinstance(x, (list, dict)):
                return None
            fields.append(T.StructField(k, sub[1]))
            cols.append(sub[0].alias(k))
        return F.struct(*cols), T.StructType(fields)
    return None


def _contains_null(v) -> bool:
    if v is None:
        return True
    if isinstance(v, list):
        return any(_contains_null(x) for x in v)
    if isinstance(v, dict):
        return any(_contains_null(x) for x in v.values())
    return False


def test_compiler_conformance(spark):
    """Typed-representable suite cases through the Column compiler, batched:
    all cases of a chunk evaluate as one wide single-row select."""
    from pyspark.sql import functions as F

    from xema_spark.compiler import compile_rule
    from xema_spark.rules import RuleError, normalize_rule

    cases = []  # (case_id_str, Column for compiled valid, expected bool)
    for rel in CORPUS:
        # draft-4/6 files run too: the engine folds their keyword variants
        # (boolean exclusiveMinimum, pre-draft-6 semantics) at normalize time
        # exactly as the reference's from_json_schema import does
        for gdesc, schema, t in _cases(rel):
            if _contains_null(t["data"]):
                continue
            le = _lit_expr(t["data"])
            if le is None:
                continue
            col, dtype = le
            try:
                nrule = normalize_rule(schema) if not isinstance(schema, bool) else schema
                # remote refs / meta-schema refs need the registry: the
                # compiler consumes inline_remote_refs output; recursive
                # remote docs are out of Column-compilation scope
                compiled = compile_rule(nrule, col, dtype)
            except (RuleError, RecursionError, ValueError, KeyError):
                continue  # not Column-compilable (remote ref, unsupported form)
            cases.append((f"{rel}|{gdesc}|{t['description']}",
                          compiled.valid, t["valid"]))

    per_draft = {}
    for name, _c, _e in cases:
        per_draft[name.split(os.sep)[0]] = per_draft.get(name.split(os.sep)[0], 0) + 1
    # the battery must cover ALL THREE drafts (draft-4/6 keyword variants —
    # boolean exclusiveMinimum etc. — fold in at normalize time), not just
    # draft-7; a draft dropping out of the compilable set is a regression
    assert set(per_draft) == {"draft4", "draft6", "draft7"}, per_draft
    assert all(n > 300 for n in per_draft.values()), per_draft
    print(f"compiler battery cases per draft: {per_draft}")
    assert len(cases) > 400, f"suspiciously few compilable cases: {len(cases)}"
    failures = []
    chunk = 300  # fewer jobs: per-job fixed latency dominates the battery
    for i in range(0, len(cases), chunk):
        part = cases[i:i + chunk]
        row = spark.range(1).select(
            *[c.alias(f"c{j}") for j, (_n, c, _e) in enumerate(part)]).head()
        for j, (name, _c, expected) in enumerate(part):
            got = row[f"c{j}"]
            if bool(got) != expected:
                failures.append(f"{name}: expected {expected}, got {got}")
    assert not failures, f"{len(failures)} compiler mismatches:\n" + "\n".join(failures[:25])
