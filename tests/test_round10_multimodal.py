"""Round-10 REAL image decode (VERDICT r9 Next #5): the decode kernel parses
actual PNG/BMP bytes to pixels (numpy + stdlib zlib only). Differential
coverage: (a) hypothesis-style seeded round-trips across every PNG filter
type and color mode and BMP padding shapes, (b) the committed binary
fixtures against their recorded ground truth, (c) the Spark mapInPandas
path over real fixture bytes vs the pure-Python decoder, (d) mode guards."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from legate_pandas_spark.operators.multimodal import (
    decode_image,
    decode_image_metadata,
    encode_bmp,
    encode_png,
)

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "images")


def _specs():
    with open(os.path.join(FIXDIR, "fixtures.json")) as f:
        return json.load(f)


def test_png_roundtrip_all_filters_and_modes():
    rng = np.random.RandomState(7)
    for c in (1, 3, 4):
        for ft in range(5):
            for h, w in ((1, 1), (2, 3), (9, 5), (16, 16)):
                shape = (h, w) if c == 1 else (h, w, c)
                px = rng.randint(0, 256, size=shape, dtype=np.uint8)
                m = decode_image(encode_png(px, filter_type=ft))
                want = px if px.ndim == 3 else px[:, :, None]
                assert (m["width"], m["height"], m["channels"]) == (w, h, c)
                assert (m["pixels"] == want).all(), (c, ft, h, w)


def test_bmp_roundtrip_with_row_padding():
    rng = np.random.RandomState(11)
    for h, w in ((1, 1), (3, 5), (5, 3), (9, 13), (8, 32)):
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        m = decode_image(encode_bmp(px))
        assert (m["width"], m["height"], m["channels"]) == (w, h, 3)
        assert (m["pixels"] == px).all(), (h, w)


def test_committed_fixtures_decode_to_ground_truth():
    specs = _specs()
    assert len(specs) >= 18
    for s in specs:
        payload = open(os.path.join(FIXDIR, s["file"]), "rb").read()
        m = decode_image(payload)
        assert m["fmt"] == s["fmt"], s["file"]
        assert m["width"] == s["width"] and m["height"] == s["height"], s["file"]
        assert m["channels"] == s["channels"], s["file"]
        assert m["bit_depth"] == s["bit_depth"]
        assert int(m["pixels"].astype(np.int64).sum()) == s["pixel_sum"], s["file"]


def test_spark_decode_path_matches_python(spark, tmp_path):
    """The Arrow-batched mapInPandas stage over REAL fixture bytes must agree
    with the pure-Python decoder row for row."""
    specs = _specs()
    rows = []
    for i, s in enumerate(specs):
        payload = open(os.path.join(FIXDIR, s["file"]), "rb").read()
        rows.append((i, payload, s))
    sdf = spark.createDataFrame(
        [(i, bytearray(p)) for i, p, _ in rows], "doc_id long, payload binary"
    )
    got = (
        decode_image_metadata(sdf)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, payload, s in rows:
        m = decode_image(payload)
        px = m["pixels"]
        n, tot = int(px.size), int(px.astype(np.int64).sum())
        r = got.iloc[i]
        assert (
            r.fmt,
            r.width,
            r.height,
            r.channels,
            r.bit_depth,
            r.byte_len,
            r.mean_pixel_x1000,
        ) == (
            m["fmt"],
            m["width"],
            m["height"],
            m["channels"],
            m["bit_depth"],
            len(payload),
            (2 * tot * 1000 + n) // (2 * n),
        ), s["file"]


def test_image_decode_catalog_row_runs(spark, sf_dir):
    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    out = QUERIES["multimodal_image_decode"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.fmt == "bmp").all()
    assert (out.channels == 3).all()
    assert out.width.between(4, 16).all() and out.height.between(3, 9).all()
    assert out.mean_pixel_x1000.between(0, 255000).all()


def test_mode_guards_name_the_constraint():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(4, 4, 3), dtype=np.uint8)
    png = bytearray(encode_png(px))
    # flip IHDR bit depth to 16 (offset: 8 magic + 8 chunk hdr + 8 w/h)
    png[24] = 16
    with pytest.raises(NotImplementedError, match="bit depth 8"):
        decode_image(bytes(png))
    bmp = bytearray(encode_bmp(px))
    bmp[30:34] = (1).to_bytes(4, "little")  # BI_RLE8 compression
    with pytest.raises(NotImplementedError, match="BI_RGB"):
        decode_image(bytes(bmp))
    # round-11: JPEG is a REAL decode path; round-12: GIF too — an unknown
    # magic (not PNG/BMP/JPEG/GIF) is what names the supported set now
    with pytest.raises(ValueError, match="PNG/BMP/JPEG/GIF"):
        decode_image(b"TIFF not a supported format")


# ---- round-10 (cont.): REAL WAV/PCM audio decode ----

from legate_pandas_spark.operators.multimodal import decode_audio, encode_wav
import struct as _struct


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.RandomState(5)
    for ch in (1, 2):
        for n in (1, 7, 128, 1000):
            s = rng.randint(-32768, 32768, size=(n, ch)).astype(np.int32)
            m = decode_audio(encode_wav(s[:, 0] if ch == 1 else s, rate=22050))
            assert (m["channels"], m["sample_rate"], m["bit_depth"]) == (ch, 22050, 16)
            assert m["n_frames"] == n
            assert (m["samples"] == s).all()


def test_wav_8bit_and_word_alignment():
    # hand-build an 8-bit PCM WAV with an ODD data length (chunk must be
    # word-aligned when walking) followed by a trailing chunk
    samples = bytes([0, 128, 255])  # -128, 0, +127 after offset
    fmt = _struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    body += b"data" + _struct.pack("<I", len(samples)) + samples + b"\x00"  # pad
    body += b"LIST" + _struct.pack("<I", 4) + b"INFO"
    payload = b"RIFF" + _struct.pack("<I", len(body)) + body
    m = decode_audio(payload)
    assert (m["bit_depth"], m["sample_rate"], m["n_frames"]) == (8, 8000, 3)
    assert list(m["samples"].reshape(-1)) == [-128, 0, 127]


def test_wav_mode_guards():
    s = np.zeros(4, dtype=np.int32)
    w = bytearray(encode_wav(s))
    w[20:22] = (3).to_bytes(2, "little")  # IEEE float format
    with pytest.raises(NotImplementedError, match="PCM"):
        decode_audio(bytes(w))
    w = bytearray(encode_wav(s))
    w[34:36] = (24).to_bytes(2, "little")  # 24-bit
    with pytest.raises(NotImplementedError, match="8/16-bit"):
        decode_audio(bytes(w))
    with pytest.raises(ValueError, match="WAV/PCM"):
        decode_audio(b"ID3\x03 mp3-ish payload")


def test_audio_decode_catalog_row_runs(spark, sf_dir):
    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    out = QUERIES["multimodal_audio_decode"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.fmt == "wav").all()
    assert (out.bit_depth == 16).all() and (out.sample_rate == 16000).all()
    assert out.n_frames.between(10, 59).all()
    assert (out.byte_len == 44 + 2 * out.n_frames).all()
