"""Multimodal column conventions + processing plumbing.

Convention: media ride as opaque ``binary`` columns with a typed
metadata struct alongside (mime, byte length, modality-specific fields).
Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so the heavy per-item work stays columnar and
per-partition (no driver involvement, no shuffle).

The actual codec calls are STUBBED (image/audio libraries are not in
this container): `decode_image_real` raises NotImplementedError and the
pipeline uses `fake_decode_features` — a deterministic stand-in keyed on
the bytes — so the Spark-side plumbing (schema, batching, partition
behavior) is real and tested.

Scale: each mapInPandas batch is one Arrow RecordBatch (default 10k
rows; tune `spark.sql.execution.arrow.maxRecordsPerBatch` down for
multi-MB blobs so a batch fits executor memory). Blobs should live in
their own parquet column so column pruning skips them unless asked for.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media binary, mime string, byte_len int, "
    "width int, height int, mean_intensity double"
)


def decode_image_real(data: bytes) -> dict:
    """Real decode path — requires an image codec (PIL/cv2), absent here."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "production deployments plug PIL/cv2 in here"
    )


def fake_decode_features(data: bytes) -> dict:
    """Deterministic stand-in for decode: derives pseudo width/height/
    intensity purely from the byte content (stable across runs)."""
    n = len(data)
    return {
        "byte_len": n,
        "width": n % 640,
        "height": (n * 7) % 480,
        "mean_intensity": round((sum(data[:64]) % 2551) / 10.0, 1) if n else 0.0,
    }


def attach_media(documents: DataFrame) -> DataFrame:
    """Make the documents table multimodal: the utf-8 bytes of `text`
    stand in for an image payload (deterministic, schema-realistic)."""
    return documents.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.lit("image/fake").alias("mime"),
    )


def decode_media(media_df: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """mapInPandas decode/feature-extract stage.

    One Arrow batch in → one batch out; partition-parallel, zero shuffle.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = decode_image_real if use_real_codec else fake_decode_features
        for pdf in batches:
            feats = pdf["media"].map(lambda b: decode(bytes(b)))
            out = pdf[["doc_id", "media", "mime"]].copy()
            out["byte_len"] = feats.map(lambda d: d["byte_len"]).astype("int32")
            out["width"] = feats.map(lambda d: d["width"]).astype("int32")
            out["height"] = feats.map(lambda d: d["height"]).astype("int32")
            out["mean_intensity"] = feats.map(lambda d: d["mean_intensity"]).astype("float64")
            yield out

    return media_df.mapInPandas(decode_batches, schema=MEDIA_SCHEMA)


def frame_sample(media_df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling stub for video payloads: emits (doc_id, frame_no)
    rows for every n-th pseudo-frame (frame count derived from byte_len).
    Real decoders replace the frame-count derivation; the explode-style
    fan-out and schema are the production shape."""
    frames = media_df.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), (F.length("media") / (64 * every_n)).cast("int"))
        ).alias("frame_no"),
    )
    return frames.withColumn("frame_offset_bytes", F.col("frame_no") * 64 * every_n)
