"""Multimodal plumbing: schema/batch shape is real; decode is the
documented deterministic fake, so every stage is value-checkable."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph import multimodal as MM


def test_image_decode_and_stats(spark):
    media = MM.synthesize_media(spark, 10, kind="image", width=8, height=6, channels=3)
    assert media.count() == 10
    dec = MM.decode_images(media)
    rows = {r["media_id"]: r for r in dec.collect()}
    assert len(rows) == 10
    r0 = rows[0]
    px = np.frombuffer(r0["pixels"], dtype=np.uint8).reshape(6, 8, 3)
    # closed form: (31y + 17x + 7c + m) % 256
    assert px[0, 0, 0] == 0
    assert px[1, 2, 1] == (31 + 34 + 7) % 256
    stats = {(r["media_id"], r["channel"]): r for r in MM.image_channel_stats(dec).collect()}
    want = np.mean([(31 * y + 17 * x + 0 + 3) % 256 for y in range(6) for x in range(8)])
    assert stats[(3, 0)]["mean"] == pytest.approx(want)


def test_resize_nearest(spark):
    media = MM.synthesize_media(spark, 3, kind="image", width=8, height=8, channels=1)
    dec = MM.decode_images(media)
    small = MM.resize_images(dec, 4, 4)
    r = {x["media_id"]: x for x in small.collect()}[1]
    assert (r["width"], r["height"]) == (4, 4)
    px = np.frombuffer(r["pixels"], dtype=np.uint8).reshape(4, 4, 1)
    full = np.frombuffer(
        {x["media_id"]: x for x in dec.collect()}[1]["pixels"], dtype=np.uint8
    ).reshape(8, 8, 1)
    np.testing.assert_array_equal(px, full[::2, ::2])


def test_frame_sampling(spark):
    media = MM.synthesize_media(
        spark, 2, kind="video", width=4, height=4, channels=3, n_frames=8
    )
    frames = MM.sample_frames(media, stride=3)
    got = {(r["media_id"], r["frame"]) for r in frames.collect()}
    assert got == {(m, f) for m in (0, 1) for f in (0, 3, 6)}
    one = [r for r in frames.collect() if r["media_id"] == 1 and r["frame"] == 3][0]
    px = np.frombuffer(one["pixels"], dtype=np.uint8).reshape(4, 4, 3)
    assert px[0, 0, 0] == (1 + 1_000_003 * 3) % 256


def test_audio_rms(spark):
    media = MM.synthesize_media(
        spark, 4, kind="audio", sample_rate=8000, n_samples=1000
    )
    out = {r["media_id"]: r for r in MM.audio_loudness(media).collect()}
    i = np.arange(1000)
    samples = (((13 * i + 29 * 2) % 65536) - 32768) / 32768.0
    assert out[2]["rms"] == pytest.approx(float(np.sqrt((samples**2).mean())))
    assert out[2]["sample_rate"] == 8000


def test_real_codec_path_is_gated(spark):
    # a non-FAKE payload must raise the documented NotImplementedError
    df = spark.createDataFrame(
        [(1, 1, "image", bytearray(b"\x89PNG...."), 0, 0, 0, 0, 0, 0)],
        MM.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception) as ei:
        MM.decode_images(df).collect()
    assert "NotImplementedError" in str(ei.value) or "pillow" in str(ei.value)
