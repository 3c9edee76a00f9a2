"""Multimodal columns (SURVEY.md §2.K5): binary payloads + typed metadata.

Real pipelines carry image/audio/video as opaque ``binary`` columns with
typed metadata and run decode/feature-extract as Arrow-batched Python over
``mapInPandas``. The media libraries (PIL/ffmpeg/soundfile) are not in
this container, so the BYTES are synthesized — but as of round 4 the
decode is REAL for two published uncompressed formats: binary PPM (P6)
images and canonical PCM16 WAV audio are parsed byte-for-byte (magic
checks, headers, sample/pixel planes) and every derived number is
integer-exact, so closed-form DuckDB oracles hash-match the full
decode → transform → reduce path. Swapping a real codec in changes only
the Python decode body; schema, Arrow batching, and the no-shuffle
partitioning are identical.
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


# ---------------------------------------------------------------------------
# Real media decode (round 4 — replaces the round-3 deterministic stubs).
#
# The container has no PIL/ffmpeg, so the BYTES are synthesized, but the
# decode is REAL: binary PPM (P6) images — a published uncompressed format —
# are built into the binary column and then parsed back byte-for-byte
# (magic check, ASCII header, pixel plane), resized with an integer 2×2
# box filter, and summarized. Every output is integer arithmetic, so the
# DuckDB oracle recomputes the same numbers from the generating formula in
# closed form — the hash match proves the parser and the filter are exact,
# not merely that the plumbing runs. A production deployment swaps
# synth_ppm for `spark.read.format("binaryFile")` and decode_ppm's body
# for the PIL/ffmpeg call — every Spark-side shape (schema, Arrow
# batching, no-shuffle partitioning) is unchanged.
# ---------------------------------------------------------------------------


def synth_ppm(doc_id: int) -> bytes:
    """Deterministic PPM (P6) image for a document: dims derive from the
    id (w ∈ {6..18} even, h ∈ {4..12} even) and pixel byte *i* is
    (doc_id·7 + i·13) mod 256 — the closed form the oracle re-evaluates."""
    w = 6 + (doc_id % 7) * 2
    h = 4 + (doc_id % 5) * 2
    import numpy as np
    pixels = ((doc_id * 7 + 13 * np.arange(w * h * 3, dtype=np.int64))
              % 256).astype(np.uint8)
    return b"P6\n" + f"{w} {h}\n255\n".encode("ascii") + pixels.tobytes()


def decode_ppm(payload: bytes):
    """REAL binary-PPM parser: validates the P6 magic, reads the ASCII
    `width height maxval` header, and returns (w, h, uint8 pixel array).
    Raises ValueError on malformed input — nothing here knows how the
    bytes were produced."""
    import re

    import numpy as np
    m = re.match(rb"P6\n(\d+) (\d+)\n255\n", payload)
    if not m:
        raise ValueError("not a P6 PPM payload")
    w, h = int(m.group(1)), int(m.group(2))
    pixels = np.frombuffer(payload, dtype=np.uint8, offset=m.end())
    if pixels.size != w * h * 3:
        raise ValueError(f"truncated pixel plane: {pixels.size} != {w*h*3}")
    return w, h, pixels


def _media_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + synthesized PPM payload as a true BinaryType column —
    the stand-in for `spark.read.format("binaryFile")` over an image
    bucket. One Arrow-batched pass, no shuffle."""
    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [synth_ppm(int(i)) for i in pdf["doc_id"]],
            })

    return (load(spark, sf_dir, "documents")
            .select("doc_id")
            .mapInPandas(synth, "doc_id long, payload binary"))


@query(
    "q_media_features",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             6 + (doc_id % 7) * 2 AS width,
             4 + (doc_id % 5) * 2 AS height
      FROM documents
    ), px AS (
      SELECT doc_id, width, height,
             unnest(range(0, width * height * 3)) AS i
      FROM dims
    )
    SELECT doc_id,
           CAST(width AS INTEGER) AS width,
           CAST(height AS INTEGER) AS height,
           3 AS channels,
           CAST(9 + length(CAST(width AS VARCHAR))
                  + length(CAST(height AS VARCHAR))
                  + width * height * 3 AS INTEGER) AS n_bytes,
           CAST(SUM((doc_id * 7 + i * 13) % 256) AS BIGINT) AS sum_pixels
    FROM px GROUP BY doc_id, width, height
    """,
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 media feature extraction, REAL decode: binary PPM payloads are
    parsed (magic, header, pixel plane) inside an Arrow-batched
    mapInPandas and reduced to (width, height, channels, n_bytes,
    sum_pixels). The oracle recomputes every value from the pixel
    generating formula in closed form, so the hash match proves the
    parser reads back exactly the bytes that were written. Batches
    stream through Python with bounded memory, partitioning untouched —
    at 100 TB this runs one Python worker per core with no shuffle."""
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_ppm(bytes(payload))
                rows.append((int(doc_id), w, h, 3, len(payload),
                             int(px.sum(dtype="int64"))))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "channels",
                               "n_bytes", "sum_pixels"])

    return _media_corpus(spark, sf_dir).mapInPandas(
        extract,
        "doc_id long, width int, height int, channels int, "
        "n_bytes int, sum_pixels long",
    )


@query(
    "q_media_resize",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 6 + (doc_id % 7) * 2 AS w, 4 + (doc_id % 5) * 2 AS h
      FROM documents
    ), ys AS (
      SELECT doc_id, w, h, unnest(range(0, h // 2)) AS oy FROM dims
    ), xs AS (
      SELECT doc_id, w, h, oy, unnest(range(0, w // 2)) AS ox FROM ys
    ), cs AS (
      SELECT doc_id, w, h, oy, ox, unnest([0, 1, 2]) AS c FROM xs
    )
    SELECT doc_id,
           CAST(w // 2 AS INTEGER) AS out_w,
           CAST(h // 2 AS INTEGER) AS out_h,
           CAST(SUM((  (doc_id*7 + (((2*oy  )*w + 2*ox  )*3 + c)*13) % 256
                     + (doc_id*7 + (((2*oy  )*w + 2*ox+1)*3 + c)*13) % 256
                     + (doc_id*7 + (((2*oy+1)*w + 2*ox  )*3 + c)*13) % 256
                     + (doc_id*7 + (((2*oy+1)*w + 2*ox+1)*3 + c)*13) % 256
                    ) // 4) AS BIGINT) AS sum_resized
    FROM cs GROUP BY doc_id, w, h
    """,
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 media resize, REAL decode + integer 2×2 box filter: each PPM
    payload is parsed, reshaped to (h, w, 3), and downsampled by exact
    integer block averaging (floor of the 4-pixel sum — dims are even by
    construction). The oracle evaluates the identical filter over the
    generating formula per output pixel, so the hash match pins the
    whole decode→filter→reduce path bit-for-bit. Same no-shuffle scale
    posture as q_media_features; swapping the box filter for a real
    PIL/ffmpeg resample changes only decode-side Python."""
    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_ppm(bytes(payload))
                a = px.reshape(h, w, 3).astype(np.int64)
                out = (a[0::2, 0::2] + a[0::2, 1::2]
                       + a[1::2, 0::2] + a[1::2, 1::2]) // 4
                rows.append((int(doc_id), w // 2, h // 2, int(out.sum())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "out_w", "out_h", "sum_resized"])

    return _media_corpus(spark, sf_dir).mapInPandas(
        resize, "doc_id long, out_w int, out_h int, sum_resized long")


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


# ---------------------------------------------------------------------------
# Audio: PCM WAV — the second real decoder (round 4). Same discipline as
# PPM: bytes are synthesized (no audio libs in the container) but the
# decode is REAL — RIFF/fmt/data chunk parsing, int16 PCM samples — and
# every output is integer arithmetic the oracle recomputes in closed form.
# ---------------------------------------------------------------------------

_WAV_RATE = 8000


def _wav_n_samples(doc_id: int) -> int:
    return 256 + (doc_id % 17) * 64     # 256..1280 samples


def _wav_sample(doc_id: int, i: int) -> int:
    return ((doc_id * 11 + i * 17) % 65536) - 32768  # int16 range


def synth_wav(doc_id: int) -> bytes:
    """Deterministic 16-bit mono PCM WAV: canonical 44-byte RIFF header
    + n samples with sample i = (doc_id·11 + i·17) mod 2^16 − 2^15."""
    import struct

    import numpy as np
    n = _wav_n_samples(doc_id)
    samples = ((doc_id * 11 + 17 * np.arange(n, dtype=np.int64))
               % 65536 - 32768).astype("<i2")
    data = samples.tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, _WAV_RATE,
                                   _WAV_RATE * 2, 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def decode_wav(payload: bytes):
    """REAL canonical-PCM WAV parser: validates RIFF/WAVE magics, reads
    the fmt chunk (must be PCM16 mono), locates the data chunk, and
    returns (sample_rate, int16 sample array). Raises ValueError on
    malformed input."""
    import struct

    import numpy as np
    # bytes slices never raise, so a short payload could otherwise sneak
    # past the magic checks into struct.unpack (struct.error, not the
    # promised ValueError) — guard the fixed 44-byte header first
    if len(payload) < 44:
        raise ValueError("payload shorter than canonical 44-byte header")
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    if payload[12:16] != b"fmt ":
        raise ValueError("missing fmt chunk")
    (fmt_size, audio_fmt, channels, rate, _byte_rate, _align,
     bits) = struct.unpack("<IHHIIHH", payload[16:36])
    if (fmt_size, audio_fmt, channels, bits) != (16, 1, 1, 16):
        raise ValueError("not canonical PCM16 mono")
    if payload[36:40] != b"data":
        raise ValueError("missing data chunk")
    (data_len,) = struct.unpack("<I", payload[40:44])
    if (len(payload) - 44) % 2 != 0:
        # np.frombuffer would silently drop the odd tail byte, making a
        # truncated payload look one sample shorter instead of invalid
        raise ValueError("odd-length sample plane")
    samples = np.frombuffer(payload, dtype="<i2", offset=44)
    if samples.size * 2 != data_len:
        raise ValueError("truncated data chunk")
    return rate, samples


@query(
    "q_audio_features",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, 256 + (doc_id % 17) * 64 AS n_samples
      FROM documents
    ), sm AS (
      SELECT doc_id, n_samples,
             unnest(range(0, n_samples)) AS i
      FROM dims
    ), vals AS (
      SELECT doc_id, n_samples,
             (doc_id * 11 + i * 17) % 65536 - 32768 AS s
      FROM sm
    )
    SELECT doc_id,
           {_WAV_RATE} AS sample_rate,
           CAST(n_samples AS BIGINT) AS n_samples,
           CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
           CAST(MAX(ABS(s)) AS BIGINT) AS peak
    FROM vals GROUP BY doc_id, n_samples
    """,
)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 audio feature extraction, REAL decode: canonical PCM WAV
    payloads (synthesized — no audio libs in the container) are parsed
    chunk by chunk inside Arrow-batched mapInPandas and reduced to
    (sample_rate, n_samples, sum|s|, peak). Integer outputs only; the
    oracle recomputes them from the sample generating formula, so the
    hash match proves the RIFF parser reads back exactly the samples
    written. Same no-shuffle posture as the image path; a real
    deployment swaps synth for `binaryFile` ingest and the body of
    decode_wav for soundfile/ffmpeg."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                payload = synth_wav(int(doc_id))
                rate, s = decode_wav(payload)
                a = np.abs(s.astype(np.int64))
                rows.append((int(doc_id), rate, s.size,
                             int(a.sum()), int(a.max())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "n_samples",
                               "sum_abs", "peak"])

    return (load(spark, sf_dir, "documents").select("doc_id")
            .mapInPandas(extract,
                         "doc_id long, sample_rate int, n_samples long, "
                         "sum_abs long, peak long"))


_AUDIO_FRAME = 256  # samples per analysis window


@query(
    "q_audio_frame_energy",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, 256 + (doc_id % 17) * 64 AS n_samples
      FROM documents
    ), fr AS (
      SELECT doc_id, n_samples,
             unnest(range(0, n_samples // {_AUDIO_FRAME}))
               AS frame_idx
      FROM dims
    ), sm AS (
      SELECT doc_id, frame_idx,
             unnest(range(0, {_AUDIO_FRAME})) AS k
      FROM fr
    ), vals AS (
      SELECT doc_id, frame_idx,
             (doc_id * 11 + (frame_idx * {_AUDIO_FRAME} + k) * 17)
               % 65536 - 32768 AS s
      FROM sm
    )
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(SUM(s * s) // {_AUDIO_FRAME} AS BIGINT) AS mean_energy
    FROM vals GROUP BY doc_id, frame_idx
    """,
)
def q_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 windowed audio analysis: per 256-sample frame, integer mean
    energy (Σs²//frame) — the framing every VAD / loudness gate runs
    before a model sees audio. Full frames only (trailing remainder
    dropped, both engines). Decode is the same real WAV parser;
    arithmetic is integer ⇒ bit-exact cross-engine."""
    import numpy as np

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                _, s = decode_wav(synth_wav(int(doc_id)))
                n_fr = s.size // _AUDIO_FRAME
                a = s[:n_fr * _AUDIO_FRAME].astype(np.int64) \
                    .reshape(n_fr, _AUDIO_FRAME)
                energy = (a * a).sum(axis=1) // _AUDIO_FRAME
                rows.extend((int(doc_id), f, int(e))
                            for f, e in enumerate(energy))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "mean_energy"])

    return (load(spark, sf_dir, "documents").select("doc_id")
            .mapInPandas(
                frames,
                "doc_id long, frame_idx long, mean_energy long"))


# ---------------------------------------------------------------------------
# Real VIDEO decode (round 5): YUV4MPEG2 (.y4m) — a published uncompressed
# video container (the mjpegtools/ffmpeg interchange format): one ASCII
# stream header, then per frame a "FRAME\n" marker + raw planes (C444 ⇒
# w·h·3 bytes/frame). The bytes are synthesized (no ffmpeg in the
# container) but the parser is real and format-faithful: magic + parameter
# validation, frame-marker iteration, exact plane sizing, malformed-input
# rejection. All derived numbers integer ⇒ closed-form DuckDB oracle.
# ---------------------------------------------------------------------------


def synth_y4m(doc_id: int) -> bytes:
    """Deterministic Y4M clip: dims (w ∈ {4..10} even, h ∈ {4..8} even),
    2 + doc_id % 4 frames; byte *i* of frame *f* is
    (doc_id·5 + f·17 + i·11) mod 256 — the closed form the oracle
    re-evaluates."""
    import numpy as np
    w = 4 + (doc_id % 4) * 2
    h = 4 + (doc_id % 3) * 2
    n_frames = 2 + doc_id % 4
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode("ascii")
    out = [head]
    idx = np.arange(w * h * 3, dtype=np.int64)
    for f in range(n_frames):
        out.append(b"FRAME\n")
        out.append(((doc_id * 5 + f * 17 + idx * 11) % 256)
                   .astype(np.uint8).tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes):
    """REAL YUV4MPEG2 parser: validates the stream magic and C444
    parameters, then iterates FRAME markers reading exact w·h·3-byte
    planes. Raises ValueError on malformed input (bad magic, stray bytes
    between frames, truncated plane, zero frames) — nothing here knows
    how the bytes were produced."""
    import re

    import numpy as np
    m = re.match(rb"YUV4MPEG2 W(\d+) H(\d+) F25:1 Ip A1:1 C444\n", payload)
    if not m:
        raise ValueError("not a YUV4MPEG2 C444 stream")
    w, h = int(m.group(1)), int(m.group(2))
    fsize = w * h * 3
    frames = []
    off = m.end()
    while off < len(payload):
        if payload[off:off + 6] != b"FRAME\n":
            raise ValueError(f"expected FRAME marker at offset {off}")
        off += 6
        if len(payload) - off < fsize:
            raise ValueError("truncated frame plane")
        frames.append(np.frombuffer(payload, dtype=np.uint8,
                                    count=fsize, offset=off))
        off += fsize
    if not frames:
        raise ValueError("zero frames")
    return w, h, frames


@query(
    "q_video_features",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             4 + (doc_id % 4) * 2 AS w,
             4 + (doc_id % 3) * 2 AS h,
             2 + doc_id % 4 AS n_frames
      FROM documents
    ), fr AS (
      SELECT doc_id, w, h, n_frames,
             unnest(range(0, n_frames)) AS frame
      FROM dims
    ), px AS (
      SELECT doc_id, w, h, n_frames, frame,
             unnest(range(0, w * h * 3)) AS i
      FROM fr
    )
    SELECT doc_id,
           CAST(frame AS INTEGER) AS frame,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(n_frames AS INTEGER) AS n_frames,
           CAST(SUM(CASE WHEN i < w * h
                         THEN (doc_id * 5 + frame * 17 + i * 11) % 256
                         ELSE 0 END) AS BIGINT) AS sum_y,
           CAST(SUM((doc_id * 5 + frame * 17 + i * 11) % 256) AS BIGINT)
             AS sum_frame
    FROM px GROUP BY doc_id, frame, w, h, n_frames
    """,
)
def q_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 video decode, REAL container parse: synthesized YUV4MPEG2
    clips are parsed frame-by-frame (magic + parameter validation, FRAME
    markers, exact C444 plane sizing) inside Arrow-batched mapInPandas,
    emitting one row per frame with the luma-plane and whole-frame
    integer sums. The oracle recomputes both from the generating formula
    in closed form, so the hash match proves the container walk reads
    back exactly the bytes written — completing K5's image + audio +
    VIDEO decode trio. Per-doc fan-out is bounded by frame count; no
    shuffle; a production deployment swaps synth_y4m for binaryFile and
    the parser body for ffmpeg."""
    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [synth_y4m(int(i)) for i in pdf["doc_id"]],
            })

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, frames = decode_y4m(bytes(payload))
                for f, plane in enumerate(frames):
                    rows.append((int(doc_id), f, w, h, len(frames),
                                 int(plane[:w * h].sum(dtype="int64")),
                                 int(plane.sum(dtype="int64"))))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame", "width", "height",
                               "n_frames", "sum_y", "sum_frame"])

    return (load(spark, sf_dir, "documents")
            .select("doc_id")
            .mapInPandas(synth, "doc_id long, payload binary")
            .mapInPandas(
                extract,
                "doc_id long, frame int, width int, height int, "
                "n_frames int, sum_y long, sum_frame long"))
