"""Multimodal plumbing: schemas, batch shapes, decode/resize/frame-sample
fan-out. Codec step is a deterministic stub (no PIL in container); the
Spark-side behavior is what's under test."""

import hashlib

from crawleria_spark.multimodal import (
    decode_media,
    extract_features,
    frame_sample,
    resize_images,
)


def _media_df(spark):
    rows = [
        ("m1", "image", b"PNGDATA" * 100),
        ("m2", "video", b"MP4DATA" * 500),
        ("m3", "audio", b"WAVDATA" * 50),
        ("m4", "image", b""),
    ]
    return spark.createDataFrame(rows, "media_id string, media_type string, content binary")


def test_decode_media(spark):
    out = decode_media(_media_df(spark), type_col="media_type")
    rows = {r["media_id"]: r["meta"] for r in out.collect()}
    assert rows["m1"]["media_type"] == "image"
    assert rows["m1"]["width"] is not None and rows["m1"]["height"] is not None
    assert rows["m1"]["duration_s"] is None
    assert rows["m3"]["width"] is None and rows["m3"]["duration_s"] is not None
    assert rows["m1"]["n_bytes"] == 700
    assert rows["m1"]["sha256"] == hashlib.sha256(b"PNGDATA" * 100).hexdigest()
    # determinism: same bytes → same meta
    again = {r["media_id"]: r["meta"] for r in decode_media(_media_df(spark)).collect()}
    assert again == rows


def test_resize_plan(spark):
    decoded = decode_media(_media_df(spark))
    out = resize_images(decoded, max_width=500)
    rows = {r["media_id"]: r for r in out.collect()}
    for mid, r in rows.items():
        meta = r["meta"]
        if meta["width"] is None:
            assert not r["resized"]
        elif meta["width"] > 500:
            assert r["resized"] and r["target_width"] == 500
            # aspect ratio preserved
            assert abs(r["target_height"] - meta["height"] * 500 / meta["width"]) <= 1
        else:
            assert not r["resized"] and r["target_width"] == meta["width"]


def test_frame_sample(spark):
    decoded = decode_media(_media_df(spark))
    frames = frame_sample(decoded, every_s=2.0, max_frames=8).collect()
    assert all(r["media_id"] == "m2" for r in frames)  # only the video
    ts = sorted(r["frame_ts"] for r in frames)
    assert ts[0] == 0.0 and len(ts) <= 8
    assert all(abs(t % 2.0) < 1e-9 for t in ts)


def test_extract_features(spark):
    out = extract_features(_media_df(spark), dim=8)
    rows = out.collect()
    assert all(len(r["features"]) == 8 for r in rows)
    import numpy as np

    for r in rows:
        assert abs(np.linalg.norm(r["features"]) - 1.0) < 1e-5


def test_encode_for_llm(spark):
    import base64

    from crawleria_spark.multimodal import encode_for_llm

    out = encode_for_llm(_media_df(spark), cap=2).collect()
    assert len(out) == 2  # A9 cap
    for r in out:
        assert base64.b64decode(r["b64"]) == bytes(r["content"])


def test_real_pil_decode_path(spark):
    import pytest
    """Exercise the real-PIL decode branch (S10/P4) wherever PIL exists:
    a tiny in-process PNG must decode to its true dimensions, and the
    resize plan must honor them. Skipped in codec-less containers — the
    import-guard there is covered by test_decode_media's stub path."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    PIL_Image.new("RGB", (2400, 600), color=(1, 2, 3)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        [("p1", "image", bytearray(png)), ("p2", "image", bytearray(b"not a png"))],
        "media_id string, media_type string, content binary",
    )
    out = {r["media_id"]: r for r in resize_images(decode_media(df), max_width=1920).collect()}
    good = out["p1"]["meta"]
    assert (good["format"], good["width"], good["height"]) == ("png", 2400, 600)
    assert good["decode_error"] is None
    assert (out["p1"]["target_width"], out["p1"]["target_height"]) == (1920, 480)
    assert out["p1"]["resized"] is True
    # corrupt bytes → error row, not a task failure
    assert out["p2"]["meta"]["decode_error"] is not None
    assert out["p2"]["resized"] is False
