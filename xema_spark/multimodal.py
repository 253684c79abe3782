"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns + typed metadata structs. The
Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas signatures,
partition sizing — is real and tested; the actual byte decoding is stubbed:
this container has no image/audio libraries, so `decode_media` tries PIL/
soundfile behind an import-guard and otherwise produces a DETERMINISTIC FAKE
derived from the payload bytes (md5-seeded), clearly marked via the
`decoder` output field ('stub' vs the real library name).

At 100TB the pattern matters more than the decoder: mapInPandas streams
Arrow record batches through Python once, emits fixed-width features, and
never collects; binary columns ride along untouched by the JVM.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType([
    T.StructField("media_type", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
    T.StructField("decoder", T.StringType()),
])

# Real decoding is an explicit opt-in (decode_media(..., real_decode=True)),
# NOT import-detection: merely having PIL installed must not change behavior
# (or worse, crash) for callers who expect the deterministic stub.


def _stub_meta(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decode: features are a pure function of the bytes
    (md5-seeded) so tests are stable and the pipeline shape is exercised."""
    h = hashlib.md5(payload).digest()
    return {
        "media_type": media_type,
        "width": 64 + h[0] * 8,
        "height": 64 + h[1] * 8,
        "n_frames": 1 if media_type == "image" else 1 + h[2],
        "duration_ms": 0 if media_type == "image" else (1 + h[3]) * 250,
        "decoder": "stub",
    }


def decode_media(df: DataFrame, payload_col: str = "payload",
                 type_col: str = "media_type",
                 out_col: str = "media_meta",
                 batch_size_hint: int = 1024,
                 real_decode: bool = False) -> DataFrame:
    """Attach decoded metadata via mapInPandas (one Python crossing, Arrow
    batches). Default is the deterministic stub; real_decode=True is the
    splice point for an actual decoder (PIL.Image.open(BytesIO(payload)) for
    images, soundfile for audio) and raises until one is wired in."""
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, MEDIA_META_TYPE)])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for payload, mtype in zip(pdf[payload_col], pdf[type_col]):
                if payload is None:
                    metas.append(None)
                    continue
                mtype = mtype or "image"
                if real_decode:  # pragma: no cover
                    raise NotImplementedError(
                        "real media decode goes here (no codec libs in this container)")
                metas.append(_stub_meta(bytes(payload), mtype))
            out = pdf.copy()
            out[out_col] = metas
            yield out

    return df.mapInPandas(decode, out_schema)


def frame_sample_offsets(df: DataFrame, meta_col: str = "media_meta",
                         n_samples: int = 4,
                         out_col: str = "frame_offsets_ms") -> DataFrame:
    """Evenly-spaced frame-sample timestamps from the decoded duration —
    pure Column arithmetic (the decode already paid the Python crossing)."""
    dur = F.col(f"{meta_col}.duration_ms")
    offs = F.when(
        dur > 0,
        F.transform(F.sequence(F.lit(0), F.lit(n_samples - 1)),
                    lambda i: (i * dur / n_samples).cast("int")),
    ).otherwise(F.array(F.lit(0).cast("int")))
    return df.withColumn(out_col, offs)


def extract_features(df: DataFrame, payload_col: str = "payload",
                     out_col: str = "features", dim: int = 8,
                     real_extract: bool = False) -> DataFrame:
    """Fixed-width float feature vector per payload via mapInPandas (one
    Arrow-batched Python crossing; the shape a CLIP/audio-embedding stage
    would use). The stub derives features from md5(payload) bytes —
    deterministic and SQL-reproducible; real_extract=True is the splice
    point for an actual model and raises until one is wired in."""
    out_schema = T.StructType(df.schema.fields +
                              [T.StructField(out_col, T.ArrayType(T.DoubleType()))])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                if payload is None:
                    feats.append(None)
                    continue
                if real_extract:  # pragma: no cover
                    raise NotImplementedError(
                        "real feature extraction goes here (no model libs in this container)")
                h = hashlib.md5(bytes(payload)).digest()
                feats.append([round(h[i] / 255.0, 6) for i in range(dim)])
            out = pdf.copy()
            out[out_col] = feats
            yield out

    return df.mapInPandas(extract, out_schema)


def resize_media(df: DataFrame, width: int, height: int,
                 meta_col: str = "media_meta",
                 real_resize: bool = False) -> DataFrame:
    """Resize plumbing: rewrites the metadata dims (pure Column struct
    rebuild — the cheap part is real); the payload transcode itself is the
    stub seam (real_resize=True raises until a codec is wired in). Aspect
    metadata stays consistent so downstream consumers see the target dims."""
    if real_resize:  # pragma: no cover
        raise NotImplementedError(
            "real payload transcode goes here (no codec libs in this container)")
    m = F.col(meta_col)
    new_meta = F.when(m.isNull(), F.lit(None).cast(MEDIA_META_TYPE)).otherwise(
        F.struct(
            m.getField("media_type").alias("media_type"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            m.getField("n_frames").alias("n_frames"),
            m.getField("duration_ms").alias("duration_ms"),
            F.concat(m.getField("decoder"), F.lit("+resize-stub")).alias("decoder"),
        ))
    return df.withColumn(meta_col, new_meta)


def synth_media_payloads(df: DataFrame, ref_col: str = "media_ref",
                         type_col: str | None = None) -> DataFrame:
    """Test-support: deterministic binary payloads derived from the ref
    string (the container has no real media files)."""
    payload = F.encode(F.concat(F.lit("payload:"), F.col(ref_col)), "utf-8")
    mt = (F.col(type_col) if type_col else
          F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                       (F.pmod(F.xxhash64(ref_col), F.lit(3)) + 1).cast("int")))
    return df.withColumn("payload", payload).withColumn("media_type", mt)
