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
    with pytest.raises(ValueError, match="PNG/BMP"):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
