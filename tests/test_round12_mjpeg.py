"""Round-12 MJPEG-in-AVI (VERDICT r11 Next #3): '00dc' frames are per-frame
baseline JPEGs — encode_avi(codec='MJPG') composes encode_jpeg into the AVI
writer, decode_video routes '00dc' through the real _decode_jpeg when strf
biCompression == 'MJPG'. Coverage: exact round-trip on constant frames (the
catalog row's regime — DC-only + edge-replicated padding is lossless),
bounded error on arbitrary gray/color content, grayscale→RGB expansion,
codec discrimination, per-frame independence (DC prediction resets per
frame), and the Spark catalog row vs the pure-Python pipeline."""

import hashlib

import numpy as np
import pytest

from legate_pandas_spark.operators.multimodal import (
    _MJPG_FOURCC,
    decode_video,
    encode_avi,
)


def test_constant_gray_frames_roundtrip_exactly():
    rng = np.random.RandomState(2)
    for h, w, f in ((3, 5, 2), (8, 8, 4), (6, 11, 3)):
        vals = rng.randint(0, 256, size=f)
        frames = [np.full((h, w), v, dtype=np.uint8) for v in vals]
        m = decode_video(encode_avi(frames, codec="MJPG"))
        assert m["codec"] == "mjpeg" and m["fmt"] == "avi"
        assert (m["width"], m["height"], m["n_frames"]) == (w, h, f)
        for fr, v in zip(m["frames"], vals):
            assert fr.shape == (h, w, 3)
            assert (fr == v).all()


def test_arbitrary_gray_content_bounded_error():
    rng = np.random.RandomState(8)
    frames = [rng.randint(0, 256, size=(12, 9)).astype(np.uint8) for _ in range(3)]
    m = decode_video(encode_avi(frames, codec="MJPG"))
    for got, want in zip(m["frames"], frames):
        err = np.abs(got[:, :, 0].astype(int) - want.astype(int)).max()
        assert err <= 2  # all-ones quant: coefficient rounding only
        assert (got[:, :, 0] == got[:, :, 1]).all()  # gray expanded to RGB


def test_arbitrary_color_content_bounded_error():
    rng = np.random.RandomState(13)
    frames = [rng.randint(0, 256, size=(8, 8, 3)).astype(np.uint8) for _ in range(2)]
    m = decode_video(encode_avi(frames, codec="MJPG"))
    for got, want in zip(m["frames"], frames):
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 4  # + YCbCr


def test_frames_decode_independently():
    """Each '00dc' chunk is a complete JPEG: frame k must not depend on
    frame k-1 (no cross-frame DC prediction leakage)."""
    a = np.full((8, 8), 10, dtype=np.uint8)
    b = np.full((8, 8), 200, dtype=np.uint8)
    both = decode_video(encode_avi([a, b], codec="MJPG"))["frames"]
    solo = decode_video(encode_avi([b], codec="MJPG"))["frames"]
    assert (both[1] == solo[0]).all()


def test_mjpg_headers_are_real():
    frames = [np.full((4, 4), 50, dtype=np.uint8)]
    payload = encode_avi(frames, codec="MJPG")
    import struct

    i = payload.index(b"strf") + 8 + 16
    (compression,) = struct.unpack("<I", payload[i : i + 4])
    assert compression == _MJPG_FOURCC
    assert b"00dc" in payload and b"00db" not in payload
    # the chunk body really is a JPEG stream
    j = payload.index(b"00dc") + 8
    assert payload[j : j + 2] == b"\xff\xd8"


def test_dib_codec_field_unchanged():
    frames = [np.full((2, 3, 3), 9, dtype=np.uint8)]
    m = decode_video(encode_avi(frames))
    assert m["codec"] == "dib"


def test_spark_catalog_row_matches_pure_python(spark, sf_dir):
    from legate_pandas_spark.operators import QUERIES, load_all
    from legate_pandas_spark.operators.multimodal import _MJPEG_SAMPLE_STRIDE
    from legate_pandas_spark.sources.tables import load_table

    load_all()
    got = (
        QUERIES["multimodal_mjpeg_decode"](spark, sf_dir)
        .toPandas()
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
    )
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .toPandas()
        .dropna(subset=["text"])
    )
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        data = text.encode("utf-8")
        digest = hashlib.md5(data).digest()
        n = len(data)
        w, h, f = (n % 9) + 3, (n % 6) + 3, (n % 5) + 2
        for j in range(0, f, _MJPEG_SAMPLE_STRIDE):
            g = digest[(5 * j + 1) % 16]
            rows.append((doc_id, j, w, h, f, f * 100000, g * 1000, g))
    import pandas as pd

    want = (
        pd.DataFrame(
            rows,
            columns=[
                "doc_id", "frame_idx", "width", "height", "n_frames",
                "duration_us", "mean_pixel_x1000", "top_left_r",
            ],
        )
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for col in want.columns:
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col
