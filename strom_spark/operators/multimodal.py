"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side design is real and tested — schema, partitioning, Arrow
batch shape, UDF signatures.  For decoding: :func:`wav_decode` is a
REAL stdlib-only PCM-WAV decoder (header + frames + audio features);
for formats that need native codecs (JPEG/MP4/...) this container has
no libraries, so ``decode_fn=None`` falls back to a deterministic
byte-statistics stand-in, clearly marked — pass a real decode_fn
(PIL/torchaudio/ffmpeg) in production, or ``strict=True`` to raise.

At 100 TB the constraints this module encodes:
  - media bytes travel as ``binary`` columns inside parquet — scanned
    lazily, column-pruned away unless the plan touches them;
  - decode/feature-extract runs in ``mapInPandas`` (Arrow batches,
    constant memory per batch, linear scan — no shuffle);
  - per-file batch memory is bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it small for
    large blobs;
  - derived features (small, typed) should be written to their own
    table so downstream analytics never re-scan the blobs.
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence

import pandas as pd

from pyspark.sql import functions as F

from ..component import Component
from ..flow import Flow

#: schema for a multimodal asset table
ASSET_SCHEMA = (
    "asset_id bigint, media_type string, content binary, "
    "width int, height int, duration_ms int, sample_rate int"
)

#: schema of extracted features
FEATURE_SCHEMA = (
    "asset_id bigint, media_type string, n_bytes bigint, "
    "content_hash string, feat array<double>"
)


def _fake_decode(content: bytes, media_type: str) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 features derived
    from byte statistics.  NOT a real decode — replace via decode_fn."""
    if content is None or len(content) == 0:
        return [0.0] * 8
    arr = memoryview(content)
    n = len(arr)
    step = max(1, n // 64)
    sampled = bytes(arr[::step])[:64]
    s = sum(sampled)
    return [
        float(n),
        float(s % 997),
        float(sampled[0]),
        float(sampled[-1]),
        float(max(sampled)),
        float(min(sampled)),
        float(s / max(len(sampled), 1)),
        float(len(set(sampled))),
    ]


def wav_decode(content: bytes, media_type: str = "audio") -> list[float]:
    """REAL decoder for PCM WAV (RIFF) — stdlib-only (``wave`` +
    ``struct``), no native media libraries needed.  Parses the header
    and the PCM frames and returns 8 deterministic audio features:

    [n_channels, sample_rate, n_frames, duration_ms,
     peak_abs, mean, rms, zero_crossings]

    Supports 8-bit unsigned and 16-bit signed PCM (the two classic
    uncompressed encodings).  Raises on compressed/float WAV — at that
    point you genuinely need a native codec; pass your own decode_fn.
    """
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(content), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        sr = w.getframerate()
        nf = w.getnframes()
        raw = w.readframes(nf)
    if sw == 2:
        samples = struct.unpack(f"<{len(raw) // 2}h", raw)
    elif sw == 1:
        samples = tuple(b - 128 for b in raw)
    else:
        raise ValueError(f"unsupported PCM sample width: {sw} bytes")
    n = len(samples)
    if n == 0:
        return [float(nch), float(sr), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    peak = float(max(abs(s) for s in samples))
    mean = sum(samples) / n
    rms = (sum(s * s for s in samples) / n) ** 0.5
    zc = sum(
        1 for i in range(1, n) if (samples[i - 1] >= 0) != (samples[i] >= 0)
    )
    return [
        float(nch),
        float(sr),
        float(nf),
        1000.0 * nf / sr,
        peak,
        mean,
        rms,
        float(zc),
    ]


def ppm_decode(content: bytes, media_type: str = "image") -> list[float]:
    """REAL decoder for PPM images (portable pixmap: P6 binary and P3
    ASCII) — stdlib-only, no native codecs.  Parses the header
    (including ``#`` comments) and the 8-bit RGB raster and returns 8
    deterministic image features:

    [width, height, maxval, n_pixels, mean_r, mean_g, mean_b,
     mean_luma]  (luma = 0.299 R + 0.587 G + 0.114 B)

    Raises on 16-bit rasters (maxval > 255) and other netpbm variants
    — pass a real decode_fn (PIL) for those in production.
    """
    if not content or content[:1] != b"P" or content[1:2] not in (b"3", b"6"):
        raise ValueError("not a PPM (P3/P6) payload")
    binary = content[1:2] == b"6"

    # header tokens: magic, width, height, maxval; '#' starts a comment
    # running to end-of-line; any whitespace separates tokens.
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(content):
            raise ValueError("truncated PPM header")
        c = content[pos : pos + 1]
        if c == b"#":
            nl = content.find(b"\n", pos)
            pos = len(content) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(content) and not content[end : end + 1].isspace():
                end += 1
            tokens.append(int(content[pos:end]))
            pos = end
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError(f"16-bit PPM (maxval={maxval}) not supported")
    n_px = width * height
    if binary:
        pos += 1  # exactly one whitespace byte after maxval
        raster = content[pos : pos + 3 * n_px]
        if len(raster) < 3 * n_px:
            raise ValueError("truncated PPM raster")
        vals = raster
    else:
        vals = [int(t) for t in content[pos:].split()]
        if len(vals) < 3 * n_px:
            raise ValueError("truncated PPM raster")
    sr = sum(vals[0 : 3 * n_px : 3])
    sg = sum(vals[1 : 3 * n_px : 3])
    sb = sum(vals[2 : 3 * n_px : 3])
    mr, mg, mb = sr / n_px, sg / n_px, sb / n_px
    return [
        float(width),
        float(height),
        float(maxval),
        float(n_px),
        mr,
        mg,
        mb,
        0.299 * mr + 0.587 * mg + 0.114 * mb,
    ]


class MediaFeatures(Component):
    """Decode + feature-extract binary media via mapInPandas.

    ``decode_fn(content: bytes, media_type: str) -> list[float]``; when
    None, a deterministic byte-statistics fake is used (container has
    no media libs).  To make the stub explicit, ``strict=True`` raises
    NotImplementedError instead of faking.
    """

    def __init__(
        self,
        input: str,
        output: str | None = None,
        *,
        id_col: str = "asset_id",
        content_col: str = "content",
        media_type_col: str = "media_type",
        decode_fn: Callable[[bytes, str], list] | None = None,
        strict: bool = False,
        label: str | None = None,
    ):
        self.input = input
        self.output = output or input
        self.id_col = id_col
        self.content_col = content_col
        self.media_type_col = media_type_col
        self.decode_fn = decode_fn
        self.strict = strict
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        df = flow[self.input]
        id_col, content_col, mt_col = self.id_col, self.content_col, self.media_type_col
        decode = self.decode_fn
        strict = self.strict
        if strict and decode is None:
            raise NotImplementedError(
                "no media decoder available in this environment; pass decode_fn="
            )
        if decode is None:
            decode = _fake_decode

        # hash/size computed JVM-side before Python — blobs enter Arrow
        # only for the decode itself.
        prepared = df.select(
            F.col(id_col).alias("asset_id"),
            F.col(mt_col).alias("media_type"),
            F.length(F.col(content_col)).cast("bigint").alias("n_bytes"),
            F.md5(F.col(content_col)).alias("content_hash"),
            F.col(content_col).alias("__content"),
        )

        def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                feats = [
                    decode(c, m)
                    for c, m in zip(pdf["__content"], pdf["media_type"])
                ]
                out = pdf.drop(columns="__content")
                out["feat"] = feats
                yield out

        out = prepared.mapInPandas(extract, schema=FEATURE_SCHEMA)
        return flow.without(self.input).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)


def synthetic_assets(spark, n: int = 100, seed: int = 7):
    """Deterministic synthetic asset table for tests (binary payloads
    derived from the id — no media libs involved)."""
    rows = []
    for i in range(n):
        media = ["image", "audio", "video"][i % 3]
        content = bytes(((i * 31 + j * seed) % 251) for j in range((i % 50) * 20 + 16))
        rows.append(
            {
                "asset_id": i,
                "media_type": media,
                "content": content,
                "width": 64 if media == "image" else None,
                "height": 64 if media == "image" else None,
                "duration_ms": 1000 * (i % 30) if media != "image" else None,
                "sample_rate": 16000 if media == "audio" else None,
            }
        )
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)
