"""Multimodal columns (SURVEY.md §2.K5): binary payloads + typed metadata.

Real pipelines carry image/audio/video as opaque ``binary`` columns with
typed metadata and run decode/feature-extract as Arrow-batched Python over
``mapInPandas``. The decode libraries are not in this container, so the
decode step is STUBBED behind a deterministic fake (clearly marked below);
the Spark-side plumbing — schema, batch iteration, UDF signatures,
partition behavior — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.registry import query


@query(
    "q_multimodal_bytes",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def q_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 binary-column plumbing: text → utf-8 BLOB, byte length + digest.

    (The fixtures ship no true media blobs; encoding text exercises the
    BinaryType path end-to-end — scan, codegen octet length, digest.)"""
    d = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.md5("text").alias("payload_md5"),
    )


def fake_decode_image(payload: bytes) -> tuple[int, int, int, float]:
    """STUB decoder — deterministic fake standing in for PIL/ffmpeg.

    A real deployment replaces this body with e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # not in this container
        return img.width, img.height, len(img.getbands()), ...

    The fake derives (width, height, channels, mean_byte) purely from the
    payload bytes so results are stable for tests.
    """
    n = len(payload)
    width = 64 + (n % 577)
    height = 64 + ((n * 7) % 419)
    channels = 3
    mean_byte = round(sum(payload[:256]) / max(1, min(n, 256)), 4)
    return width, height, channels, mean_byte


@query("q_media_features")  # rows-only: decode is stubbed (see fake_decode_image)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 media feature extraction over mapInPandas: binary payload →
    (width, height, channels, mean_byte) with an Arrow-batched iterator —
    the exact shape a real image/audio decoder plugs into. Batches stream
    through Python with bounded memory (maxRecordsPerBatch), partitioning
    untouched — at 100 TB this runs one Python worker per core with no
    shuffle."""
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(fake_decode_image)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": feats.map(lambda t: t[0]),
                "height": feats.map(lambda t: t[1]),
                "channels": feats.map(lambda t: t[2]),
                "mean_byte": feats.map(lambda t: t[3]),
            })

    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    )
    return d.mapInPandas(
        extract,
        "doc_id long, width int, height int, channels int, mean_byte double",
    )


_TARGET_W, _TARGET_H = 224, 224  # the classic vision-model input size


def fake_resize_image(payload: bytes, w: int, h: int) -> tuple[int, int, int]:
    """STUB resize — deterministic fake standing in for
    ``PIL.Image.resize((w, h))``; returns (out_w, out_h, out_n_bytes) with
    byte size scaled by the area ratio of the fake-decoded dims."""
    src_w, src_h, channels, _ = fake_decode_image(payload)
    scale = (w * h) / (src_w * src_h)
    return w, h, max(1, int(len(payload) * scale))


@query("q_media_resize")  # rows-only: decode/resize are stubbed
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 batch resize plumbing: binary payload → fixed 224×224 target,
    Arrow-batched over mapInPandas. Same no-shuffle scale posture as
    q_media_features; a real deployment swaps fake_resize_image for PIL."""
    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["payload"].map(
                lambda p: fake_resize_image(p, _TARGET_W, _TARGET_H))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "out_w": out.map(lambda t: t[0]),
                "out_h": out.map(lambda t: t[1]),
                "out_n_bytes": out.map(lambda t: t[2]),
            })

    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    )
    return d.mapInPandas(
        resize, "doc_id long, out_w int, out_h int, out_n_bytes int")


_FRAME_LEN = 64   # chars per "frame"
_FRAME_STRIDE = 4  # keep every 4th frame


@query(
    "q_frame_sample",
    oracle=f"""
    WITH frames AS (
      SELECT doc_id,
             unnest(range(0, greatest(CAST(ceil(CAST(n_chars AS DOUBLE)
                                                / {_FRAME_LEN}) AS BIGINT),
                                      1))) AS frame_idx,
             text
      FROM documents
    )
    SELECT doc_id, frame_idx,
           md5(substr(text, frame_idx * {_FRAME_LEN} + 1, {_FRAME_LEN}))
             AS frame_md5
    FROM frames
    WHERE frame_idx % {_FRAME_STRIDE} = 0
    """,
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 frame sampling: treat each payload as a sequence of fixed-size
    frames, keep every Nth (the video keyframe-sampling access pattern).
    Pure codegen — sequence/explode/substring/digest, no Python — and
    oracle-checked; a real video pipeline swaps the substring slicer for
    an ffmpeg seek inside the same explode-shaped plan."""
    d = load(spark, sf_dir, "documents")
    # greatest(...,1): an empty payload still yields frame 0 (and a
    # descending-sequence footgun if it didn't — sequence(0,-1) counts DOWN)
    n_frames = F.greatest(
        F.ceil(F.col("n_chars").cast("double") / _FRAME_LEN), F.lit(1))
    return (
        d.select(
            "doc_id", "text",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"))
        .filter(F.col("frame_idx") % _FRAME_STRIDE == 0)
        .select(
            "doc_id", "frame_idx",
            F.md5(F.substring(F.col("text"),
                              F.col("frame_idx") * _FRAME_LEN + 1,
                              _FRAME_LEN)).alias("frame_md5"))
    )
