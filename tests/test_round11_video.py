"""Round-11 REAL video decode (uncompressed RIFF/AVI): writer emits real
avih/strh/strf headers + '00db' DIB frames; parser walks the chunks and
decodes every frame. Raw DIB is lossless, so round-trips are exact."""

import numpy as np
import pytest

from legate_pandas_spark.operators.multimodal import (
    _VIDEO_SAMPLE_STRIDE,
    decode_video,
    encode_avi,
)


def test_avi_roundtrip_exact_across_geometries():
    rng = np.random.RandomState(4)
    for h, w, f in ((1, 1, 1), (3, 5, 4), (2, 7, 9), (5, 2, 2)):
        frames = [rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8) for _ in range(f)]
        m = decode_video(encode_avi(frames))
        assert (m["width"], m["height"], m["n_frames"]) == (w, h, f)
        assert m["usec_per_frame"] == 100_000 and m["fmt"] == "avi"
        for a, b in zip(m["frames"], frames):
            assert (a == b).all(), (h, w, f)


def test_avi_row_padding_is_exercised():
    """w=3 → 9-byte rows padded to 12; a padding defect shifts every row."""
    rng = np.random.RandomState(6)
    frames = [rng.randint(0, 256, size=(4, 3, 3)).astype(np.uint8)]
    m = decode_video(encode_avi(frames))
    assert (m["frames"][0] == frames[0]).all()


def test_avi_mode_guards():
    frames = [np.full((2, 2, 3), 7, dtype=np.uint8)]
    payload = bytearray(encode_avi(frames))
    # '00dc' in a BI_RGB stream decodes as a raw DIB frame (round-12: the
    # chunk id alone no longer implies compression — strf biCompression does)
    i = payload.index(b"00db")
    m = decode_video(bytes(payload[:i]) + b"00dc" + bytes(payload[i + 4 :]))
    assert (m["frames"][0] == frames[0]).all()
    # non-BI_RGB, non-MJPG strf compression field (1 = BI_RLE8)
    j = payload.index(b"strf") + 8 + 16
    bad = payload[:j] + (1).to_bytes(4, "little") + payload[j + 4 :]
    with pytest.raises(NotImplementedError, match="BI_RGB"):
        decode_video(bytes(bad))
    with pytest.raises(ValueError, match="not an AVI"):
        decode_video(b"RIFF\x04\x00\x00\x00WAVE")


def test_spark_catalog_row_matches_pure_python(spark, sf_dir):
    import hashlib

    from legate_pandas_spark.operators import QUERIES, load_all
    from legate_pandas_spark.sources.tables import load_table

    load_all()
    got = (
        QUERIES["multimodal_video_decode"](spark, sf_dir)
        .toPandas()
        .set_index(["doc_id", "frame_idx"])
        .sort_index()
    )
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(25)
        .toPandas()
    )
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        data = text.encode("utf-8")
        digest = hashlib.md5(data).digest()
        n = len(data)
        w, h, f = (n % 6) + 2, (n % 4) + 2, (n % 7) + 2
        for j in range(0, f, _VIDEO_SAMPLE_STRIDE):
            need = 3 * j + w * h * 3
            seq = (digest * (need // 16 + 2))[3 * j : 3 * j + w * h * 3]
            fr = np.frombuffer(seq, dtype=np.uint8).reshape(h, w, 3)
            row = got.loc[(doc_id, j)]
            npx, s = fr.size, int(fr.astype(np.int64).sum())
            assert (row["width"], row["height"], row["n_frames"]) == (w, h, f)
            assert row["duration_us"] == f * 100_000
            assert row["mean_pixel_x1000"] == (2 * s * 1000 + npx) // (2 * npx)
            assert row["top_left_r"] == fr[0, 0, 0]
