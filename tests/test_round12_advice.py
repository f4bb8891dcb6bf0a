"""Round-12 ADVICE fixes (VERDICT r11 ADVICE, all in the codec layer):

1. T.81 B.1.1.2 — any number of 0xFF fill bytes may precede a marker id, and
   TEM (0x01) / RSTn (0xD0-0xD7) are parameterless; the marker walk must not
   raise "marker sync lost" or misread a length field on legal streams.
2. A legal baseline 3-component stream may be non-interleaved (one scan per
   component, T.81 B.2.3); reading only the first SOS must RAISE naming the
   constraint, not silently decode with neutral chroma.
3. A negative biHeight in an AVI strf means top-down DIB rows (the BMP rule);
   decode must not reverse rows for those frames.
"""

import struct

import numpy as np
import pytest

from legate_pandas_spark.operators.multimodal import (
    _decode_jpeg,
    _dib_frame_bytes,
    decode_video,
    encode_avi,
    encode_jpeg,
)


def _splice_before(payload: bytes, marker: bytes, blob: bytes) -> bytes:
    i = payload.index(marker)
    return payload[:i] + blob + payload[i:]


def test_fill_bytes_before_markers_are_skipped():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(16, 24)).astype(np.uint8)
    payload = encode_jpeg(img)
    ref = _decode_jpeg(payload)["pixels"]
    # one, two, and many fill bytes before different marker segments
    for marker, pad in ((b"\xff\xdb", 1), (b"\xff\xc0", 2), (b"\xff\xda", 7)):
        padded = _splice_before(payload, marker, b"\xff" * pad)
        got = _decode_jpeg(padded)["pixels"]
        assert (got == ref).all(), marker


def test_tem_and_rst_markers_are_parameterless():
    img = np.full((8, 16), 77, dtype=np.uint8)
    payload = encode_jpeg(img)
    ref = _decode_jpeg(payload)["pixels"]
    # a standalone TEM before DHT and an RST4 before SOF0: neither carries a
    # length field; a walker that reads one would desync on the next segment
    patched = _splice_before(payload, b"\xff\xc4", b"\xff\x01")
    patched = _splice_before(patched, b"\xff\xc0", b"\xff\xd4")
    got = _decode_jpeg(patched)["pixels"]
    assert (got == ref).all()


def test_non_interleaved_multi_scan_raises():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
    payload = encode_jpeg(img)
    # rewrite the interleaved 3-component SOS (seglen 12) as a 1-component
    # scan (seglen 8) — a legal non-interleaved stream's FIRST scan
    i = payload.index(b"\xff\xda")
    seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
    assert seglen == 12  # 2 + 1 + 3*2 + 3
    body = payload[i + 4 : i + 2 + seglen]
    ns, comp0 = body[0], body[1:3]
    assert ns == 3
    new_sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1]) + comp0 + body[7:10]
    patched = payload[:i] + new_sos + payload[i + 2 + seglen :]
    with pytest.raises(NotImplementedError, match="interleaved single-scan"):
        _decode_jpeg(patched)


def _negate_strf_height(payload: bytes, w: int, h: int) -> bytes:
    pat = struct.pack("<Iii", 40, w, h)
    i = payload.index(pat)
    return payload[:i] + struct.pack("<Iii", 40, w, -h) + payload[i + 12 :]


def test_top_down_dib_frames_decode_unflipped():
    rng = np.random.RandomState(3)
    h, w = 6, 5
    frames = [rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8) for _ in range(4)]
    # hand-build a top-down AVI: rows stored first-row-first, biHeight < 0.
    # _dib_frame_bytes writes rows bottom-up, so feeding it the vertically
    # flipped frame yields the original rows in top-down order.
    payload = encode_avi([f[::-1] for f in frames])
    payload = _negate_strf_height(payload, w, h)
    meta = decode_video(payload)
    assert meta["height"] == h and meta["n_frames"] == len(frames)
    for got, want in zip(meta["frames"], frames):
        assert (got == want).all()


def test_bottom_up_dib_unchanged():
    rng = np.random.RandomState(4)
    frames = [rng.randint(0, 256, size=(4, 7, 3)).astype(np.uint8) for _ in range(2)]
    meta = decode_video(encode_avi(frames))
    for got, want in zip(meta["frames"], frames):
        assert (got == want).all()


def test_dib_helper_row_order_pin():
    # independent pin of the helper the top-down construction leans on
    f = np.arange(2 * 1 * 3, dtype=np.uint8).reshape(2, 1, 3)
    raw = _dib_frame_bytes(f)
    # bottom row first, BGR order, padded to 4 bytes
    assert raw[:3] == bytes([5, 4, 3]) and raw[4:7] == bytes([2, 1, 0])
