"""Multimodal binary-column plumbing: decode/feature/resize/frame-sample
stages over Arrow batches, with the deterministic fake codecs (real codec
libraries are isolated behind the codec argument)."""

import numpy as np
import pytest

from sparkrdf.multimodal import (
    audio_features,
    decode_image_fake,
    encode_image_fake,
    image_features,
    real_image_codec_unavailable,
    resize_images,
    sample_frames,
    synthesize_media,
)


def test_image_features(spark):
    media = synthesize_media(spark, 20, kind="image")
    feats = image_features(media).collect()
    assert len(feats) == 20
    ok = [r for r in feats if r["ok"]]
    assert len(ok) == 20
    r0 = {r["doc_id"]: r for r in ok}["image3"]
    assert r0["width"] == 16 + 3 % 17 and r0["channels"] == 3
    assert 0.0 <= r0["mean_luma"] <= 255.0
    assert len(r0["phash"]) == 16  # 64-bit hex fingerprint
    # deterministic across runs
    again = {r["doc_id"]: r["phash"] for r in image_features(media).collect()}
    assert again["image3"] == r0["phash"]


def test_corrupt_rows_survive(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": ["good", "bad"], "payload": [encode_image_fake(np.zeros((4, 4, 3), dtype=np.uint8)), b"JUNK"]}
    )
    df = spark.createDataFrame(pdf)
    rows = {r["doc_id"]: r for r in image_features(df).collect()}
    assert rows["good"]["ok"] is True
    assert rows["bad"]["ok"] is False and rows["bad"]["phash"] is None


def test_resize_roundtrip(spark):
    media = synthesize_media(spark, 5, kind="image")
    small = resize_images(media, width=8, height=8)
    rows = small.collect()
    assert all(r["ok"] for r in rows)
    arr = decode_image_fake(bytes(rows[0]["payload"]))
    assert arr.shape == (8, 8, 3)
    # resized output feeds the feature stage unchanged (composability)
    feats = image_features(small)
    assert all(r["width"] == 8 and r["height"] == 8 for r in feats.collect())


def test_audio_features(spark):
    media = synthesize_media(spark, 10, kind="audio")
    rows = {r["doc_id"]: r for r in audio_features(media).collect()}
    assert len(rows) == 10 and all(r["ok"] for r in rows.values())
    r = rows["audio4"]
    assert r["sample_rate"] == 8000
    assert r["duration_s"] == pytest.approx(r["n_samples"] / 8000)
    assert r["rms"] > 0 and r["zero_crossings"] > 0


def test_frame_sampling(spark):
    media = synthesize_media(spark, 6, kind="video")
    frames = sample_frames(media, every_n=2).collect()
    assert all(r["ok"] for r in frames)
    # only even frame indices sampled
    assert {r["frame_idx"] % 2 for r in frames} == {0}
    # sampled frames decode as images
    arr = decode_image_fake(bytes(frames[0]["frame"]))
    assert arr.shape == (8, 8, 3)


def test_real_codec_stub_raises():
    with pytest.raises(NotImplementedError):
        real_image_codec_unavailable(b"\xff\xd8")
