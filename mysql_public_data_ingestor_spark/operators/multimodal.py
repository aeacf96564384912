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


# --- registered pipeline stages (frame-sample / resize / features) ---------
#
# Each library stage above gets a fully oracle-paired registered query:
# the decode is a deterministic stub (no codec libs in this container,
# SURVEY §2.B multimodal row), but the Spark-side machinery under test —
# Arrow-batched mapInPandas, 1-row-in/N-rows-out explosion, chained
# stages without intermediate materialization, typed metadata schemas —
# is the real 100 TB plumbing, and every output value is reproducible
# arithmetic over the payload bytes, so DuckDB can verify it exactly.

FRAME_STRIDE = 256  # bytes per pseudo-frame for the registered query


@register(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(unnest(range(0, CAST(ceil(octet_length(encode(text)) / {FRAME_STRIDE}.0)
                                      AS BIGINT))) AS INT)          AS frame_no,
           CAST(unnest(range(0, CAST(ceil(octet_length(encode(text)) / {FRAME_STRIDE}.0)
                                      AS BIGINT))) * {FRAME_STRIDE} AS BIGINT)
                                                                    AS frame_offset
    FROM documents
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over opaque binary payloads: one
    output row per {FRAME_STRIDE}-byte pseudo-frame (1-row-in/N-rows-out
    mapInPandas — the exact shape of real video frame extraction, where
    the per-frame decode happens executor-side and only frame metadata
    is emitted).

    A zero-byte payload yields zero frames (not a zero-offset row) on
    both engines. Scale: payload bytes never cross the Arrow boundary
    more than once, and output size is bounded by total corpus bytes /
    stride regardless of row count."""
    t = Tables(spark, sf_dir)
    with_payload = t.documents.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return sample_frames(with_payload, "payload", every_n_bytes=FRAME_STRIDE)


RESIZE_TARGET = (224, 224)


@register(
    "multimodal_resize_plan",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             64 + (octet_length(encode(text)) % 512) AS w0,
             64 + (CASE WHEN octet_length(encode(text)) = 0 THEN 0
                        ELSE ('0x' || left(hex(encode(text)), 2))::BIGINT
                   END * 7) % 512 AS h0
      FROM documents
    )
    SELECT doc_id,
           CAST(224 AS INT)              AS width,
           CAST(224 AS INT)              AS height,
           224.0 / CAST(w0 AS DOUBLE)    AS scale_x,
           224.0 / CAST(h0 AS DOUBLE)    AS scale_y
    FROM dims
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained decode -> resize mapInPandas stages with no intermediate
    materialization (one Python worker pass per partition per stage,
    Arrow batches between) — the image-preprocessing shape of a training
    pipeline. Scale factors are a single IEEE division over the decoded
    dims, so even this Python path is bit-exact against the oracle."""
    t = Tables(spark, sf_dir)
    with_payload = t.documents.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    decoded = decode_images(with_payload)  # doc_id, n_bytes, width, height, channels
    return resize_images_from_dims(decoded, target=RESIZE_TARGET)


def resize_images_from_dims(decoded: DataFrame,
                            target: tuple[int, int] = (224, 224)) -> DataFrame:
    """Resize stage over an already-decoded dims frame (chains after
    ``decode_images`` output schema)."""
    out_schema = "doc_id long, width int, height int, scale_x double, scale_y double"
    tw, th = target

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array([tw] * len(pdf), dtype="Int32"),
                    "height": pd.array([th] * len(pdf), dtype="Int32"),
                    "scale_x": tw / pdf["width"].astype("float64"),
                    "scale_y": th / pdf["height"].astype("float64"),
                }
            )

    return decoded.mapInPandas(batches, schema=out_schema)


@register(
    "multimodal_feature_stats",
    oracle="""
    WITH bytes_of AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             list_transform(range(0, octet_length(encode(text))),
                            i -> ('0x' || substr(hex(encode(text)), 2*i + 1, 2))::BIGINT)
               AS bl
      FROM documents
    )
    SELECT doc_id,
           CAST(n_bytes AS BIGINT)                                   AS n_bytes,
           CAST(coalesce(list_sum(bl), 0) AS BIGINT)                 AS byte_sum,
           CAST(coalesce(list_sum(list_transform(bl, b -> b * b)), 0) AS BIGINT)
                                                                     AS byte_sumsq,
           CAST(list_min(bl) AS INT)                                 AS byte_min,
           CAST(list_max(bl) AS INT)                                 AS byte_max,
           CAST(len(list_filter(bl, b -> b // 64 = 0)) AS BIGINT)    AS hist0,
           CAST(len(list_filter(bl, b -> b // 64 = 1)) AS BIGINT)    AS hist1,
           CAST(len(list_filter(bl, b -> b // 64 = 2)) AS BIGINT)    AS hist2,
           CAST(len(list_filter(bl, b -> b // 64 = 3)) AS BIGINT)    AS hist3
    FROM bytes_of
    """,
)
def multimodal_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction stage as exact integer sufficient statistics
    per payload: byte sum / sum-of-squares (the mean/std numerators a
    CNN-free baseline featurizer uses), min/max, and a 4-bin coarse
    byte histogram — numpy over Arrow batches, like a real model UDF,
    but with integer outputs so the oracle check is exact rather than
    tolerance-based. Empty payloads yield NULL min/max and zero sums."""
    import numpy as np

    t = Tables(spark, sf_dir)
    with_payload = t.documents.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    out_schema = (
        "doc_id long, n_bytes long, byte_sum long, byte_sumsq long, "
        "byte_min int, byte_max int, hist0 long, hist1 long, hist2 long, hist3 long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ["doc_id", "n_bytes", "byte_sum", "byte_sumsq",
                                    "byte_min", "byte_max", "hist0", "hist1",
                                    "hist2", "hist3"]}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(payload if payload is not None else b"", dtype=np.uint8)
                i64 = b.astype(np.int64)
                rows["doc_id"].append(doc_id)
                rows["n_bytes"].append(int(b.size))
                rows["byte_sum"].append(int(i64.sum()))
                rows["byte_sumsq"].append(int((i64 * i64).sum()))
                rows["byte_min"].append(int(b.min()) if b.size else None)
                rows["byte_max"].append(int(b.max()) if b.size else None)
                hist = np.bincount(b >> 6, minlength=4)
                for k in range(4):
                    rows[f"hist{k}"].append(int(hist[k]))
            out = pd.DataFrame(rows)
            out["byte_min"] = pd.array(out["byte_min"], dtype="Int32")
            out["byte_max"] = pd.array(out["byte_max"], dtype="Int32")
            yield out

    return with_payload.mapInPandas(batches, schema=out_schema)


# --- byte-range chunk manifest ---------------------------------------------

CHUNK_BYTES = 1024  # fixed chunk size for blob-store range reads


@register(
    "multimodal_chunk_manifest",
    oracle=f"""
    WITH meta AS (
      SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
      FROM documents
    )
    SELECT doc_id,
           CAST(c AS BIGINT) AS chunk_id,
           CAST(c * {CHUNK_BYTES} AS BIGINT) AS byte_offset,
           CAST(least({CHUNK_BYTES}, payload_bytes - c * {CHUNK_BYTES}) AS BIGINT)
             AS chunk_bytes,
           (c = (payload_bytes + {CHUNK_BYTES - 1}) // {CHUNK_BYTES} - 1)
             AS is_last
    FROM meta, unnest(range(0, (payload_bytes + {CHUNK_BYTES - 1}) // {CHUNK_BYTES}))
         AS t(c)
    WHERE payload_bytes > 0
    """,
)
def multimodal_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-range chunk manifest for large binary payloads: the plan a
    blob-store reader executes to fetch a video/audio payload in fixed
    ranges (parallel range-GETs, resumable transfer, per-chunk
    checksumming downstream) — pure metadata arithmetic, so the payload
    bytes themselves NEVER move: the manifest derives from the length
    column alone and the binary column prunes out of the scan.

    Scale: one projection + a per-row sequence explode bounded by
    payload size / chunk size; no shuffle at all. The 100 TB point is
    that chunk planning for petabyte blob fetches is a metadata-only
    query over lengths, not a pass over payloads.
    """
    t = Tables(spark, sf_dir)
    payload_bytes = F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long")
    n_chunks = F.floor(
        (F.col("payload_bytes") + F.lit(CHUNK_BYTES - 1)) / F.lit(CHUNK_BYTES)
    ).cast("long")
    meta = t.documents.select(
        "doc_id", payload_bytes.alias("payload_bytes")
    ).filter(F.col("payload_bytes") > 0)
    c = F.col("chunk_id")
    return (
        meta.select(
            "doc_id",
            "payload_bytes",
            n_chunks.alias("nc"),
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_id"
            ),
        )
        .select(
            "doc_id",
            c.alias("chunk_id"),
            (c * CHUNK_BYTES).alias("byte_offset"),
            F.least(
                F.lit(CHUNK_BYTES).cast("long"),
                F.col("payload_bytes") - c * CHUNK_BYTES,
            ).alias("chunk_bytes"),
            (c == F.col("nc") - 1).alias("is_last"),
        )
    )
