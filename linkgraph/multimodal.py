"""Multimodal columns — image/audio/video as opaque ``BINARY`` payloads
with typed metadata, processed by Arrow-vectorized ``mapInPandas`` stages.

Scale design: payloads never leave the executors (no driver collect), all
per-media compute is numpy over Arrow record batches, and the media table
partitions by ``media_id`` like any other fact table — at 100 TB the
decode/feature stages are embarrassingly parallel scans. The pieces a
production deployment swaps in are ONLY the codec calls.

Codec stubbing (this container ships no image/audio libraries): payloads
synthesized by :func:`synthesize_media` carry a ``FAKE`` header whose
pixels/samples are a documented closed form, so decode is deterministic
and every downstream stage (resize, channel stats, frame sampling, RMS
loudness) is REAL numpy code with driver-checkable oracles. A payload
without the ``FAKE`` magic routes to the real codec path, which is gated:
Pillow/soundfile if importable, else ``NotImplementedError`` — the
clearly-marked stub the deployment replaces.

Fake payload formats (little-endian):

- image: ``b"FAKEIMG\\0" u16 width u16 height u8 channels`` — pixel
  ``(y, x, c)`` of media m = ``(31*y + 17*x + 7*c + m) % 256``.
- audio: ``b"FAKEAUD\\0" u32 sample_rate u32 n_samples`` — sample i of
  media m = ``((13*i + 29*m) % 65536 - 32768) / 32768``.
- video: ``b"FAKEVID\\0" u16 width u16 height u8 channels u16 n_frames``
  — frame f is the image form with ``m -> m + 1000003 * f``.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

_IMG_MAGIC = b"FAKEIMG\x00"
_AUD_MAGIC = b"FAKEAUD\x00"
_VID_MAGIC = b"FAKEVID\x00"

MEDIA_SCHEMA = (
    "media_id long, doc_id long, kind string, payload binary, "
    "width int, height int, channels int, sample_rate int, "
    "n_samples int, n_frames int"
)

DECODED_IMAGE_SCHEMA = "media_id long, width int, height int, channels int, pixels binary"
FRAME_SCHEMA = "media_id long, frame int, width int, height int, channels int, pixels binary"


def synthesize_media(
    spark: SparkSession,
    n_media: int,
    *,
    kind: str = "image",
    seed: int = 0,
    width: int = 64,
    height: int = 64,
    channels: int = 3,
    sample_rate: int = 16_000,
    n_samples: int = 16_000,
    n_frames: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic media table (one row per media_id; payload built
    executor-side in an Arrow batch UDF — nothing materializes on the
    driver)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            mids = b["id"].to_numpy()
            payloads = []
            for m in mids:
                if kind == "image":
                    payloads.append(
                        _IMG_MAGIC + struct.pack("<HHB", width, height, channels)
                    )
                elif kind == "audio":
                    payloads.append(
                        _AUD_MAGIC + struct.pack("<II", sample_rate, n_samples)
                    )
                elif kind == "video":
                    payloads.append(
                        _VID_MAGIC
                        + struct.pack("<HHBH", width, height, channels, n_frames)
                    )
                else:
                    raise ValueError(f"unknown kind {kind!r}")
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "doc_id": mids % 1000,
                    "kind": kind,
                    "payload": payloads,
                    "width": width if kind != "audio" else 0,
                    "height": height if kind != "audio" else 0,
                    "channels": channels if kind != "audio" else 0,
                    "sample_rate": sample_rate if kind == "audio" else 0,
                    "n_samples": n_samples if kind == "audio" else 0,
                    "n_frames": n_frames if kind == "video" else 0,
                }
            )

    base = spark.range(int(n_media), numPartitions=num_partitions)
    return base.mapInPandas(gen, MEDIA_SCHEMA)


def _fake_pixels(m: int, width: int, height: int, channels: int):
    import numpy as np

    y = np.arange(height, dtype=np.int64)[:, None, None] * 31
    x = np.arange(width, dtype=np.int64)[None, :, None] * 17
    c = np.arange(channels, dtype=np.int64)[None, None, :] * 7
    return ((y + x + c + int(m)) % 256).astype("uint8")


def decode_images(media: DataFrame) -> DataFrame:
    """media(kind='image') → ``(media_id, width, height, channels,
    pixels BINARY)`` with ``pixels`` a row-major uint8 buffer. The FAKE
    path synthesizes the documented closed form; real codecs are gated."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for b in batches:
            out = {"media_id": [], "width": [], "height": [], "channels": [], "pixels": []}
            for m, payload in zip(b["media_id"], b["payload"]):
                buf = bytes(payload)
                if buf.startswith(_IMG_MAGIC):
                    w, h, ch = struct.unpack_from("<HHB", buf, len(_IMG_MAGIC))
                    px = _fake_pixels(m, w, h, ch)
                else:
                    try:  # real-codec path — swapped in where Pillow exists
                        from PIL import Image  # noqa: F401
                        import io

                        img = Image.open(io.BytesIO(buf))
                        px = np.asarray(img.convert("RGB"))
                        h, w, ch = px.shape
                    except ImportError as exc:
                        raise NotImplementedError(
                            "non-synthetic image decode requires pillow, "
                            "which this container does not ship; the Spark "
                            "plumbing (schema, batching, partitioning) is "
                            "identical for the real codec"
                        ) from exc
                out["media_id"].append(m)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["pixels"].append(px.tobytes())
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(dec, DECODED_IMAGE_SCHEMA)


def resize_images(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of decoded pixel buffers — real numpy over
    Arrow batches (the stage a deployment would run with cv2/PIL kernels)."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for b in batches:
            out = {"media_id": [], "width": [], "height": [], "channels": [], "pixels": []}
            for m, w, h, ch, buf in zip(
                b["media_id"], b["width"], b["height"], b["channels"], b["pixels"]
            ):
                px = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(h, w, ch)
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                rp = px[yi][:, xi]
                out["media_id"].append(m)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["channels"].append(ch)
                out["pixels"].append(np.ascontiguousarray(rp).tobytes())
            yield pd.DataFrame(out)

    return decoded.mapInPandas(rs, DECODED_IMAGE_SCHEMA)


def image_channel_stats(decoded: DataFrame) -> DataFrame:
    """Per-channel mean/std feature extraction — ``(media_id, channel,
    mean, std)``; the canonical embed-adjacent feature stage."""

    def st(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for b in batches:
            out = {"media_id": [], "channel": [], "mean": [], "std": []}
            for m, w, h, ch, buf in zip(
                b["media_id"], b["width"], b["height"], b["channels"], b["pixels"]
            ):
                px = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(h, w, ch)
                mu = px.mean(axis=(0, 1))
                sd = px.std(axis=(0, 1))
                for c in range(ch):
                    out["media_id"].append(m)
                    out["channel"].append(c)
                    out["mean"].append(float(mu[c]))
                    out["std"].append(float(sd[c]))
            yield pd.DataFrame(out)

    return decoded.mapInPandas(
        st, "media_id long, channel int, mean double, std double"
    )


def sample_frames(media: DataFrame, *, stride: int = 2) -> DataFrame:
    """video → every ``stride``-th frame as a decoded image row (the
    frame-sampling stage of a video-ingest pipeline)."""

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"media_id": [], "frame": [], "width": [], "height": [], "channels": [], "pixels": []}
            for m, payload in zip(b["media_id"], b["payload"]):
                buf = bytes(payload)
                if not buf.startswith(_VID_MAGIC):
                    raise NotImplementedError(
                        "non-synthetic video demux requires an ffmpeg "
                        "binding; not shipped in this container"
                    )
                w, h, ch, nf = struct.unpack_from("<HHBH", buf, len(_VID_MAGIC))
                for f in range(0, nf, stride):
                    px = _fake_pixels(int(m) + 1_000_003 * f, w, h, ch)
                    out["media_id"].append(m)
                    out["frame"].append(f)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(ch)
                    out["pixels"].append(px.tobytes())
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload"
    ).mapInPandas(fs, FRAME_SCHEMA)


def audio_loudness(media: DataFrame) -> DataFrame:
    """audio → RMS loudness per media — real numpy; the FAKE samples are
    the documented closed form, real decode is gated like images."""

    def rms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for b in batches:
            out = {"media_id": [], "sample_rate": [], "n_samples": [], "rms": []}
            for m, payload in zip(b["media_id"], b["payload"]):
                buf = bytes(payload)
                if not buf.startswith(_AUD_MAGIC):
                    raise NotImplementedError(
                        "non-synthetic audio decode requires soundfile; "
                        "not shipped in this container"
                    )
                sr, n = struct.unpack_from("<II", buf, len(_AUD_MAGIC))
                i = np.arange(n, dtype=np.int64)
                samples = (((13 * i + 29 * int(m)) % 65536) - 32768) / 32768.0
                out["media_id"].append(m)
                out["sample_rate"].append(sr)
                out["n_samples"].append(n)
                out["rms"].append(float(np.sqrt((samples**2).mean())))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload"
    ).mapInPandas(rms, "media_id long, sample_rate int, n_samples int, rms double")
