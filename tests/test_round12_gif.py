"""Round-12 GIF codec: the LZW bit-level conventions are pinned three
independent ways so mirrored encoder/decoder bugs cannot cancel (the JPEG
hand-derived-bits precedent from round 11):

1. a HAND-DERIVED spec vector — codes and LSB-first byte packing for
   indices [0,1,2,3,0,1,2,3,0,1] at min_code_size=2 worked out on paper
   from GIF89a Appendix F (CLEAR=4, EOI=5, width bump when the encoder
   defines code 2^width);
2. real-world THIRD-PARTY GIFs from the Python distribution (written by
   encoders that exercise width bumps and extension blocks) must decode to
   self-consistent index streams — a wrong bump convention desyncs the
   stream within a few codes and raises;
3. roundtrips crossing every width bump (3→12 bits) and the 4096-entry
   CLEAR reset.
"""

import os

import numpy as np
import pytest

from legate_pandas_spark.operators.multimodal import (
    _decode_gif,
    _lzw_compress,
    _lzw_decompress,
    decode_image,
    encode_gif,
)

THIRD_PARTY_GIFS = [
    p
    for p in [
        "/root/.pyenv/versions/3.13.0/lib/python3.13/test/tkinterdata/python.gif",
        "/root/.pyenv/versions/3.13.0/lib/python3.13/idlelib/Icons/idle_32.gif",
        "/root/.pyenv/versions/3.13.0/lib/python3.13/idlelib/Icons/tk.gif",
    ]
    if os.path.exists(p)
]


def test_lzw_hand_derived_spec_vector():
    # Paper derivation (min_code_size=2, CLEAR=4, EOI=5, first entry #6):
    # input 0,1,2,3,0,1,2,3,0,1 emits codes
    #   (4,w3)(0,w3)(1,w3)(2,w3)(3,w4)(6,w4)(8,w4)(6,w4)(5,w4)
    # — the width bumps to 4 when entry #8 (=2^3) is DEFINED while
    # processing the fourth pixel, so code 2 still goes out at 3 bits and
    # code 3 at 4. LSB-first packing gives exactly these bytes:
    expected = bytes([0x44, 0x34, 0x86, 0x56])
    assert _lzw_compress([0, 1, 2, 3, 0, 1, 2, 3, 0, 1], 2) == expected
    assert _lzw_decompress(expected, 2) == [0, 1, 2, 3, 0, 1, 2, 3, 0, 1]


def test_lzw_kwkwk_case():
    # code == next_code (the cScSc pattern): first output repeats
    seq = [1, 1, 1, 1, 1, 1, 1]
    c = _lzw_compress(seq, 2)
    assert _lzw_decompress(c, 2) == seq


@pytest.mark.parametrize(
    "n,pal_bits,seed",
    [(10, 2, 0), (500, 2, 1), (5000, 4, 2), (30000, 2, 3), (60000, 8, 4)],
)
def test_lzw_roundtrip_across_width_bumps_and_reset(n, pal_bits, seed):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 1 << pal_bits, size=n)
    mcs = max(2, pal_bits)
    out = _lzw_decompress(_lzw_compress(idx, mcs), mcs)
    assert out == list(idx)


def test_lzw_low_entropy_hits_4096_reset():
    # long runs build deep dictionary chains fast; 200k pixels of a 2-symbol
    # alternation with bursts forces multiple CLEAR resets
    idx = np.zeros(200_000, dtype=np.int64)
    idx[::7] = 1
    idx[::11] = 2
    out = _lzw_decompress(_lzw_compress(idx, 2), 2)
    assert out == list(idx)


def test_gif_roundtrip_full_container():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, size=(9, 13))
    meta = _decode_gif(encode_gif(idx, pal))
    assert (meta["fmt"], meta["width"], meta["height"]) == ("gif", 13, 9)
    assert meta["palette_size"] == 16 and meta["bit_depth"] == 8
    assert (meta["indices"] == idx).all()
    assert (meta["pixels"] == pal[idx]).all()


def test_gif_large_frame_multiblock():
    # >255 LZW bytes forces multi-sub-block framing
    rng = np.random.default_rng(8)
    pal = np.arange(768, dtype=np.uint8).reshape(256, 3) % 256
    idx = rng.integers(0, 256, size=(64, 64))
    meta = _decode_gif(encode_gif(idx, pal))
    assert (meta["indices"] == idx).all()


@pytest.mark.skipif(not THIRD_PARTY_GIFS, reason="no stdlib GIF assets here")
@pytest.mark.parametrize("path", THIRD_PARTY_GIFS)
def test_third_party_gif_decodes(path):
    """Real encoder output (not ours): the block walk must skip GIF89a
    extensions, and the LZW width-bump convention must match the ecosystem —
    a desync raises 'code out of range' within a few codes. Dimensions are
    independently verifiable from the fixed-layout header."""
    payload = open(path, "rb").read()
    meta = decode_image(payload)
    assert meta["fmt"] == "gif"
    w = payload[6] | (payload[7] << 8)
    h = payload[8] | (payload[9] << 8)
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["pixels"].shape == (h, w, 3)
    assert meta["indices"].max() < meta["palette_size"]


def test_gif_guards():
    pal = np.zeros((16, 3), dtype=np.uint8)
    g = bytearray(encode_gif(np.zeros((2, 2), dtype=np.int64), pal))
    # flip the interlace bit in the image descriptor
    pos = 13 + 48  # header + GCT
    assert g[pos] == 0x2C
    g[pos + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="non-interlaced"):
        _decode_gif(bytes(g))
    with pytest.raises(ValueError, match="not a GIF"):
        _decode_gif(b"NOTAGIF" * 4)


def test_gif_catalog_row_matches_duckdb_oracle(spark, sf_dir, duck):
    from legate_pandas_spark.operators import ORACLES, QUERIES, load_all

    load_all()
    got = (
        QUERIES["multimodal_gif_decode"](spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        duck.execute(ORACLES["multimodal_gif_decode"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    for c in ["width", "height", "palette_size", "mean_rgb_x1000", "first_index", "last_index"]:
        assert (got[c].astype("int64") == exp[c].astype("int64")).all(), c
