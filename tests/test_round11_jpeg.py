"""Round-11 REAL baseline JPEG codec (VERDICT r10 Next #4 — the last image
codec family): encoder writes real SOI/DQT/SOF0/DHT/SOS streams (Annex K
tables, byte stuffing), decoder walks markers, reconstructs Huffman tables
from the stream, entropy-decodes, dequantizes, IDCTs. Differential coverage:
(a) EXACT round-trip on constant-block images with an all-ones quant table
(the catalog row's regime — DC-only blocks are lossless through the full
pipeline), (b) bounded reconstruction error on arbitrary content at several
quant levels, (c) byte-stuffing and non-multiple-of-8 geometry, (d) the
Spark mapInPandas catalog row vs the pure-Python decoder, (e) mode guards
naming the constraint."""

import numpy as np
import pytest

from legate_pandas_spark.operators.multimodal import (
    _decode_jpeg,
    decode_image,
    encode_jpeg,
)

Q16 = np.full((8, 8), 16, dtype=np.int64)


def _const_image(rng, by, bx):
    consts = rng.randint(0, 256, size=(by, bx)).astype(np.uint8)
    return np.kron(consts, np.ones((8, 8), np.uint8)), consts


def test_constant_blocks_roundtrip_exactly():
    rng = np.random.RandomState(5)
    for by, bx in ((1, 1), (1, 3), (2, 2), (3, 4)):
        img, _ = _const_image(rng, by, bx)
        m = decode_image(encode_jpeg(img))
        assert (m["width"], m["height"], m["channels"]) == (bx * 8, by * 8, 1)
        assert m["bit_depth"] == 8 and m["fmt"] == "jpeg"
        assert (m["pixels"][:, :, 0] == img).all(), (by, bx)


def test_random_content_bounded_error():
    rng = np.random.RandomState(9)
    for h, w in ((8, 8), (20, 28), (1, 1), (13, 9)):
        img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        m = _decode_jpeg(encode_jpeg(img))
        err = np.abs(m["pixels"][:, :, 0].astype(int) - img.astype(int)).max()
        assert err <= 2, (h, w, err)  # all-ones quant: coefficient rounding only
    for h, w in ((16, 16), (17, 23)):
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        m = _decode_jpeg(encode_jpeg(img))
        err = np.abs(m["pixels"].astype(int) - img.astype(int)).max()
        assert err <= 4, (h, w, err)  # + YCbCr round-trip rounding


def test_quantized_smooth_content_bounded_error():
    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    smooth = ((xx + yy) * 2 % 256).astype(np.uint8)
    m = _decode_jpeg(encode_jpeg(smooth, quant=Q16))
    err = np.abs(m["pixels"][:, :, 0].astype(int) - smooth.astype(int))
    # interior error bounded by quantization; the %256 wrap edges ring harder
    assert np.median(err) <= 8 and err.max() <= 80


def test_entropy_stream_contains_stuffed_bytes_and_survives():
    """0xFF bytes inside the entropy segment must be stuffed with 0x00 and
    transparently removed on read — find a seeded image whose stream
    actually exercises it."""
    rng = np.random.RandomState(3)
    for _ in range(50):
        img = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
        payload = encode_jpeg(img)
        scan = payload[payload.rindex(b"\xff\xda") : -2]
        if b"\xff\x00" in scan:
            m = _decode_jpeg(payload)
            assert np.abs(m["pixels"][:, :, 0].astype(int) - img.astype(int)).max() <= 2
            return
    pytest.fail("no stuffed byte produced in 50 seeds")


def test_decode_is_deterministic():
    rng = np.random.RandomState(1)
    payload = encode_jpeg(rng.randint(0, 256, size=(9, 11, 3)).astype(np.uint8))
    a, b = _decode_jpeg(payload), _decode_jpeg(payload)
    assert (a["pixels"] == b["pixels"]).all()


def _patch_marker(payload: bytes, old: bytes, new: bytes) -> bytes:
    i = payload.index(old)
    return payload[:i] + new + payload[i + len(old) :]


def test_mode_guards_name_the_constraint():
    img = np.full((8, 8), 100, dtype=np.uint8)
    payload = encode_jpeg(img)
    with pytest.raises(NotImplementedError, match="baseline sequential"):
        _decode_jpeg(_patch_marker(payload, b"\xff\xc0", b"\xff\xc2"))
    # 2x2 sampling factor byte inside SOF0 (precision, h, w, nc, cid, SAMP)
    i = payload.index(b"\xff\xc0")
    bad = payload[: i + 11] + b"\x22" + payload[i + 12 :]
    with pytest.raises(NotImplementedError, match="4:4:4"):
        _decode_jpeg(bad)
    # DRI segment inserted before SOS
    j = payload.index(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x08"
    with pytest.raises(NotImplementedError, match="restart"):
        _decode_jpeg(payload[:j] + dri + payload[j:])
    with pytest.raises(ValueError, match="not a JPEG"):
        _decode_jpeg(b"\x00\x01\x02")


def test_entropy_bytes_match_hand_derived_t81_bits():
    """Mirrored-bug guard: encoder and decoder are both ours, so a
    consistent spec deviation (wrong zigzag, wrong canonical code order)
    would cancel in every round-trip. These scan bytes are derived BY HAND
    from ITU-T T.81 + the Annex K tables, independent of both codecs.

    c=128: level-shifted DC diff 0 → DC-lum category 0, canonical code '00';
    EOB is AC-lum symbol 0x00 → 4th code of length 4 → '1010'; 1-padded:
    00 1010 11 = 0x2B.
    c=130: DC = 8·(130−128) = 16 → category 5, code '110', amplitude
    '10000'; + EOB, 1-padded: 110 10000 1010 1111 = 0xD0 0xAF."""
    for c, want_scan in ((128, bytes([0b00101011])), (130, bytes([0b11010000, 0b10101111]))):
        img = np.full((8, 8), c, dtype=np.uint8)
        payload = encode_jpeg(img)
        i = payload.index(b"\xff\xda")
        seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
        head, scan = payload[: i + 2 + seglen], payload[i + 2 + seglen : -2]
        # encoder emits exactly the hand-derived bits
        assert scan == want_scan, (c, scan.hex())
        # decoder reads hand-written bits spliced in (not encoder output)
        m = _decode_jpeg(head + want_scan + b"\xff\xd9")
        assert (m["pixels"] == c).all(), c


def test_spark_catalog_row_matches_pure_python(spark, sf_dir):
    """The mapInPandas catalog row over real corpus docs vs the same
    construction + decode computed driver-side."""
    import hashlib

    from legate_pandas_spark.operators import QUERIES, load_all
    from legate_pandas_spark.sources.tables import load_table

    load_all()
    got = (
        QUERIES["multimodal_jpeg_decode"](spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(40)
        .toPandas()
    )
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        data = text.encode("utf-8")
        digest = hashlib.md5(data).digest()
        bx, by = (len(data) % 3) + 1, (len(data) % 2) + 1
        consts = np.frombuffer(
            (digest * ((bx * by) // 16 + 1))[: bx * by], dtype=np.uint8
        ).reshape(by, bx)
        img = np.kron(consts, np.ones((8, 8), np.uint8))
        px = _decode_jpeg(encode_jpeg(img))["pixels"][:, :, 0]
        assert (px == img).all()
        row = got.loc[doc_id]
        n, s = px.size, int(px.astype(np.int64).sum())
        assert row["width"] == bx * 8 and row["height"] == by * 8
        assert row["mean_pixel_x1000"] == (2 * s * 1000 + n) // (2 * n)
        assert row["top_left"] == px[0, 0] and row["bottom_right"] == px[-1, -1]
