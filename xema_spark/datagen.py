"""Deterministic synthesis of the interleaved text+media corpus.

The authoritative input shape (BASELINE.json `input_hint`):

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)
    assets(media_ref: string, media_type: string, bytes: bigint)

Generation follows FIXTURES.md T1/T2 exactly: row i has 1 + (i % 7) spans
alternating text/media; every 13th doc carries an injected violation class
cycling through {missing kind, kind='blob', negative offset, empty spans,
dangling media_ref, dup marker}; every 101st doc repeats the previous doc_id
(uniqueness violations); the hot-ref branch fires on ~20% of media spans
(residue (i+j)%10 == 1, the only odd residue < 3) and its target
(i*31+j)%10 == (30i+1)%10 collapses to asset 1 — ONE mega-hot media_ref
(skew for the referential join).

Everything is a closed-form function of the row index, built with
spark.range + Column expressions — no RNG state, no driver-side rows, no
Python on the executors — so the same code generates 10^3 docs for tests and
10^12 docs on a cluster with identical per-index content (seed-42-free
determinism: the "seed" is the index arithmetic itself).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOCUMENTS_TYPE = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
    ]
)

_LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua ut enim ad minim "
    "veniam quis nostrud exercitation ullamco laboris nisi ut aliquip ex ea"
)

# violation classes injected on every 13th doc (FIXTURES.md T1)
CLS_MISSING_KIND = 0
CLS_BAD_KIND = 1
CLS_NEG_OFFSET = 2
CLS_EMPTY_SPANS = 3
CLS_DANGLING_REF = 4
CLS_DUP_MARKER = 5  # no row-level effect; uniqueness handled via i % 101

N_HOT_ASSETS = 10
DANGLE_TAIL = 97  # number of distinct dangling refs past the asset table


def n_assets_for(n_docs: int) -> int:
    return max(100, n_docs // 10)


def _zero_pad(prefix: str, n: Column, width: int) -> Column:
    """format_string(prefix + '%0{width}d', n) for non-negative n, ~2.4x
    cheaper (measured 1.34s -> 0.56s for 3 ids x 2.4M rows at local[8]):
    java.util.Formatter re-parses the format per call, lpad is a byte copy.
    lpad TRUNCATES values wider than `width`, so those take the plain-cast
    branch — identical to %0Nd, which stops padding there (verified on the
    10^8 boundary)."""
    s = n.cast("string")
    return F.concat(F.lit(prefix),
                    F.when(n < 10 ** width, F.lpad(s, width, "0")).otherwise(s))


def violation_class(i: Column) -> Column:
    """-1 for clean docs, else the injected class (cycles every 13th doc)."""
    return F.when(i % 13 == 0, (i / 13).cast("long") % 6).otherwise(F.lit(-1))


def gen_documents(
    spark: SparkSession,
    n_docs: int,
    n_partitions: int | None = None,
    with_expectations: bool = False,
) -> DataFrame:
    """The interleaved corpus as a DataFrame (columnar, lazily generated).

    with_expectations=True appends test-oracle columns (violation_class,
    expected_valid) — used by pytest, dropped for the production shape.
    """
    if n_partitions is None:
        n_partitions = max(4, spark.sparkContext.defaultParallelism)
    n_assets = n_assets_for(n_docs)
    df = spark.range(0, n_docs, 1, n_partitions)
    i = F.col("id")
    cls = violation_class(i)

    # doc_id: every 101st doc (i>0) repeats the previous id (dup injection)
    base_id = F.when((i % 101 == 0) & (i > 0), i - 1).otherwise(i)
    doc_id = _zero_pad("doc-", base_id, 8)

    n_spans = F.when(cls == CLS_EMPTY_SPANS, F.lit(0)).otherwise(1 + (i % 7))

    def span(j: Column) -> Column:
        is_text = ((i + j) % 2) == 0
        kind = F.when((cls == CLS_MISSING_KIND) & (j == 0), F.lit(None).cast("string")) \
            .when((cls == CLS_BAD_KIND) & (j == 0), F.lit("blob")) \
            .otherwise(F.when(is_text, F.lit("text")).otherwise(F.lit("media")))
        text_len = 1 + F.pmod(i * 13 + j * 7, F.lit(120))
        text = F.when(
            is_text & (F.pmod(i * 7 + j, F.lit(17)) != 0),
            F.substring(F.lit(_LOREM), 1, 500).substr(F.lit(1), text_len),
        ).otherwise(F.lit(None).cast("string"))
        # media refs: the hot branch needs i+j odd (media spans), so it
        # fires at residue 1 only (~20% of media spans) and (i*31+j)%10
        # then collapses to (30i+1)%10 == 1 — ONE mega-hot asset, the
        # worst-case key for an unsalted reducer (see interleaved.hot_refs)
        hot = F.pmod(i + j, F.lit(10)) < 3
        asset_id = F.when(hot, F.pmod(i * 31 + j, F.lit(N_HOT_ASSETS))) \
            .otherwise(F.pmod(i * 31 + j * 7, F.lit(n_assets)))
        asset_id = F.when(cls == CLS_DANGLING_REF,
                          n_assets + F.pmod(i, F.lit(DANGLE_TAIL))).otherwise(asset_id)
        media_ref = F.when(~is_text, _zero_pad("asset-", asset_id, 6)) \
            .otherwise(F.lit(None).cast("string"))
        offset = (j * 100 + F.pmod(i, F.lit(50))).cast("int")
        offset = F.when((cls == CLS_NEG_OFFSET) & (j == 0), F.lit(-5)).otherwise(offset).cast("int")
        return F.struct(kind.alias("kind"), text.alias("text"),
                        media_ref.alias("media_ref"), offset.alias("offset"))

    spans = F.when(n_spans == 0, F.array().cast(T.ArrayType(SPAN_TYPE))) \
        .otherwise(F.transform(F.sequence(F.lit(0), n_spans - 1), lambda j: span(j.cast("long"))))

    out = df.select(doc_id.alias("doc_id"), spans.alias("spans"))
    if with_expectations:
        row_invalid = cls.isin(CLS_MISSING_KIND, CLS_BAD_KIND, CLS_NEG_OFFSET, CLS_EMPTY_SPANS)
        out = df.select(
            doc_id.alias("doc_id"),
            spans.alias("spans"),
            cls.alias("violation_class"),
            (~row_invalid).alias("expected_valid"),
        )
    return out


def gen_assets(spark: SparkSession, n_docs: int) -> DataFrame:
    """Asset dimension: refs asset-000000..asset-{n_assets-1}; docs reference
    up to n_assets + DANGLE_TAIL so exactly the tail refs dangle."""
    n_assets = n_assets_for(n_docs)
    df = spark.range(0, n_assets, 1, max(2, spark.sparkContext.defaultParallelism // 4))
    j = F.col("id")
    return df.select(
        F.format_string("asset-%06d", j).alias("media_ref"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.pmod(j, F.lit(3)) + 1).cast("int")).alias("media_type"),
        (1024 + F.pmod(j * 7919, F.lit(1 << 20))).alias("bytes"),
    )


FLAGSHIP_RULE = {
    "type": "object",
    "properties": {
        "doc_id": {"type": "string", "pattern": "^doc-[0-9]{8}$"},
        "spans": {
            "type": "array",
            "minItems": 1,
            "items": {
                "type": "object",
                "properties": {
                    "kind": {"enum": ["text", "media"]},
                    "offset": {"type": "integer", "minimum": 0},
                },
                "required": ["kind"],
            },
        },
    },
    "required": ["doc_id", "spans"],
}
