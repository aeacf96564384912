"""Multimodal column handling: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted via Arrow-batched pandas on
``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is a
clearly marked deterministic fake (`_fake_decode_dims`) / a
``NotImplementedError`` real path — but the Spark-side plumbing is real
and tested: binary column construction, schema, partition-preserving
``mapInPandas`` with Arrow batches, and metadata extraction.

Scale: payload bytes never leave the executor; metadata-only projections
prune the binary column out of the scan entirely (check ReadSchema in
the plan), which at 100 TB is the difference between scanning metadata
and scanning every image.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import Tables

try:  # optional real decode path — PIL is not in this container, but
    # the plumbing supports it wherever it exists
    import importlib.util as _ilu

    DECODE_AVAILABLE = _ilu.find_spec("PIL") is not None
except Exception:  # pragma: no cover
    DECODE_AVAILABLE = False


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))          AS payload_bytes,
           sha256(text)                        AS payload_sha,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS header_byte,
           CASE WHEN octet_length(encode(text)) >= 256 THEN 'blob' ELSE 'inline' END
                                               AS storage_class
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata extraction (JVM-side only).

    The fixture has no binary column, so the payload is
    ``encode(text, 'utf-8')`` — the shape (binary column + metadata
    projection) is what matters.
    """
    t = Tables(spark, sf_dir)
    payload = F.encode(F.col("text"), "utf-8")
    return t.documents.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("payload_bytes"),
        F.sha2(F.col("text"), 256).alias("payload_sha"),
        F.ascii(F.substring("text", 1, 1)).cast("long").alias("header_byte"),
        F.when(F.octet_length(payload) >= 256, "blob").otherwise("inline").alias("storage_class"),
    )


def _fake_decode_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decoder: (width, height, channels) from bytes.

    STUB — stands in for PIL.Image.open / av frame decode, which are not
    in this container. Derives stable pseudo-dimensions from payload
    length and first bytes so tests are reproducible.
    """
    n = len(payload)
    w = 64 + (n % 512)
    h = 64 + ((payload[0] if n else 0) * 7 % 512)
    return (w, h, 3)


def _pil_decode_dims(payload: bytes) -> tuple[int, int, int]:
    """Real decode via PIL (only called when the library is present).
    Raises on undecodable bytes — callers decide the fallback."""
    import io

    from PIL import Image  # noqa: PLC0415 — gated import

    with Image.open(io.BytesIO(payload)) as img:
        return (img.width, img.height, len(img.getbands()))


def decode_images(df: DataFrame, payload_col: str = "payload", mode: str = "fake") -> DataFrame:
    """Decode a binary image column into (width, height, channels, n_bytes).

    ``mode``:
      - ``"fake"`` (default): deterministic stub dims — used by the
        registered query so its output never depends on which libraries
        happen to be installed;
      - ``"real"``: PIL decode; raises NotImplementedError if PIL is
        absent; undecodable payloads yield NULL dims (the 100 TB
        posture: corrupt images must not kill a 10^9-row decode job);
      - ``"auto"``: real if PIL is installed, else fake.

    Either way the Spark plumbing is identical: Arrow batches in/out,
    partition-preserving mapInPandas, stable output schema.
    """
    if mode == "auto":
        mode = "real" if DECODE_AVAILABLE else "fake"
    if mode == "real" and not DECODE_AVAILABLE:
        raise NotImplementedError("real image decode requires PIL (pillow)")
    out_schema = (
        "doc_id long, n_bytes long, width int, height int, channels int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            dims: list[tuple] = []
            for p in payloads:
                raw = p if p is not None else b""
                if mode == "real":
                    try:
                        dims.append(_pil_decode_dims(raw))
                    except Exception:
                        dims.append((None, None, None))
                else:
                    dims.append(_fake_decode_dims(raw))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "width": pd.array([d[0] for d in dims], dtype="Int32"),
                    "height": pd.array([d[1] for d in dims], dtype="Int32"),
                    "channels": pd.array([d[2] for d in dims], dtype="Int32"),
                }
            )

    return df.mapInPandas(batches, schema=out_schema)


@register(
    "multimodal_decode_stub",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           CAST(64 + (octet_length(encode(text)) % 512) AS INT) AS width,
           CAST(64 + (CASE WHEN octet_length(encode(text)) = 0 THEN 0
                           ELSE ('0x' || left(hex(encode(text)), 2))::BIGINT
                      END * 7) % 512 AS INT) AS height,
           CAST(3 AS INT) AS channels
    FROM documents
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode pipeline over fake binary payloads.

    The stub decoder's dims are deterministic arithmetic over the
    payload bytes, so even this Arrow-batched Python path gets a full
    value oracle (first payload byte == first UTF-8 byte, extracted in
    SQL via blob hex) — what's verified end-to-end is the mapInPandas
    machinery: Arrow in/out, schema, null-safe byte handling."""
    t = Tables(spark, sf_dir)
    with_payload = t.documents.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return decode_images(with_payload)


def sample_frames(df: DataFrame, payload_col: str, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' over an opaque video-ish payload: emit one row
    per frame offset (0, every_n_bytes, ...). Demonstrates the
    1-row-in/N-rows-out mapInPandas shape used for video frame extraction.
    """
    out_schema = "doc_id long, frame_no int, frame_offset long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_no": [], "frame_offset": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                n = len(payload) if payload is not None else 0
                for i, off in enumerate(range(0, n, every_n_bytes)):
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(i)
                    rows["frame_offset"].append(off)
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=out_schema)


def resize_images(df: DataFrame, payload_col: str = "payload",
                  target: tuple[int, int] = (224, 224)) -> DataFrame:
    """'Resize' stage: maps decoded dims to target dims + a scale factor.

    STUB decode (no codec libs); the Spark plumbing — chained
    mapInPandas stages with Arrow batches — is real: this composes after
    ``decode_images`` without materializing between stages.
    """
    out_schema = "doc_id long, width int, height int, scale_x double, scale_y double"
    tw, th = target

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": tw,
                    "height": th,
                    "scale_x": tw / pdf["width"].astype("float64"),
                    "scale_y": th / pdf["height"].astype("float64"),
                }
            )

    return df.mapInPandas(batches, schema=out_schema)


FEATURE_DIM = 8


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Feature-extraction stage: fixed-size deterministic feature vector
    per payload (byte-histogram moments — stands in for a CNN/CLIP
    embedding; the array<float> output schema and batch shape are what a
    real model UDF produces).
    """
    import numpy as np

    out_schema = f"doc_id long, features array<double>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf[payload_col]:
                b = np.frombuffer(payload if payload is not None else b"", dtype=np.uint8)
                if b.size == 0:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                # deterministic 8-dim sketch: mean/std + 6 coarse
                # histogram-bin rates
                hist = np.bincount(b >> 6, minlength=4) / b.size
                feats.append(
                    [float(b.mean()), float(b.std())]
                    + [float(x) for x in hist]
                    + [float(b.min()), float(b.max())]
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.mapInPandas(batches, schema=out_schema)
