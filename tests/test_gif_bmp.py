"""GIF (LZW) and BMP codec tests — the image-codec-trio completion (r15).

Layers, mirroring test_wav.py's discipline:
1. hand-built spec goldens (bytes derived on paper from the GIF89a spec's
   Appendix F bit-packing rules — no reference encoder involved);
2. an INDEPENDENTLY TRANSCRIBED LZW decoder (string-table formulation, vs
   the operator's prefix/suffix-array formulation) cross-checked on
   adversarial random streams;
3. encoder↔decoder roundtrips across the code-width growth boundaries
   (the 2^w ± 1 off-by-one family), interlace, forced-clear and
   deferred-clear stream shapes;
4. honest-rejection paths (truncation, bad signatures, out-of-range
   indices) raise ValueError, never mis-decode.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from duckdb_ml_spark.operators.bmp import bmp_decode, bmp_encode
from duckdb_ml_spark.operators.gif import (
    gif_decode,
    gif_encode,
    lzw_decode,
    lzw_encode,
)


# --- independent reference LZW decoder (string-table formulation) -------------


def _ref_lzw_decode(payload: bytes, min_code: int, n_pixels: int) -> bytes:
    """Deliberately different implementation style from operators/gif.py:
    a list of byte-string table entries and a bit-cursor over a bit string,
    transcribed from the spec text alone."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    bits = "".join(f"{b:08b}"[::-1] for b in payload)  # LSB-first per byte
    pos = 0
    width = min_code + 1
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code + 1

    reset()
    out = b""
    prev: bytes | None = None
    while len(out) < n_pixels:
        code_bits = bits[pos : pos + width]
        assert len(code_bits) == width, "ref decoder ran out of bits"
        code = int(code_bits[::-1], 2)
        pos += width
        if code == clear:
            reset()
            prev = None
            continue
        assert code != eoi, "ref decoder hit EOI early"
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        else:
            assert code == len(table), "code beyond table"
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        if len(table) == (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry
    return out[:n_pixels]


# --- goldens ------------------------------------------------------------------


def test_lzw_hand_golden():
    # 1x3 pixels [1,1,1], min code size 2: codes CLEAR(4),1,6,EOI(5) at
    # 3 bits, LSB-first -> 0b10001100, 0b00001011 (derived on paper)
    assert lzw_encode(bytes([1, 1, 1]), 2) == bytes([0x8C, 0x0B])
    assert lzw_decode(bytes([0x8C, 0x0B]), 2, 3) == bytes([1, 1, 1])


def test_gif_hand_built_container():
    # hand-assembled single-frame GIF: 3x1 white-on-2-color palette
    data = bytearray()
    data += b"GIF89a" + struct.pack("<HHBBB", 3, 1, 0x80, 0, 0)
    data += bytes([0, 0, 0, 255, 255, 255])  # palette: 0=black, 1=white
    data += b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 1, 0)
    data += bytes([2, 2, 0x8C, 0x0B, 0])  # min code 2, 2-byte sub-block
    data += b"\x3b"
    out = gif_decode(bytes(data))
    assert out.shape == (1, 3, 3) and (out == 255).all()


def test_gif_partial_frame_background_fill():
    # 1x1 white frame at (1,0) on a 3x1 screen, background color 0 (black)
    data = bytearray()
    data += b"GIF89a" + struct.pack("<HHBBB", 3, 1, 0x80, 0, 0)
    data += bytes([0, 0, 0, 255, 255, 255])
    data += b"\x2c" + struct.pack("<HHHHB", 1, 0, 1, 1, 0)
    # pixels [1]: codes CLEAR(4),1,EOI(5) at 3 bits LSB-first -> 0b01001100
    data += bytes([2, 2, 0x4C, 0x01, 0])
    data += b"\x3b"
    out = gif_decode(bytes(data))
    assert out.shape == (1, 3, 3)
    assert (out[0, 0] == 0).all() and (out[0, 1] == 255).all() and (out[0, 2] == 0).all()


def test_gif_extension_blocks_skipped():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4) * 17
    data = bytearray(gif_encode(img))
    # splice a graphic-control and a comment extension before the image
    # descriptor (after header + LSD + 768-byte GCT)
    at = 13 + 768
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    comment = b"\x21\xfe\x05hello\x00"
    spliced = bytes(data[:at]) + gce + comment + bytes(data[at:])
    assert np.array_equal(gif_decode(spliced)[:, :, 0], img)


# --- cross-checks vs the independent decoder ----------------------------------


def test_lzw_cross_check_independent_decoder():
    rng = np.random.default_rng(11)
    for n, mc in [(5, 2), (64, 4), (300, 8), (1000, 8), (6000, 8)]:
        raw = bytes(rng.integers(0, 1 << mc, size=n, dtype=np.uint8))
        for kw in ({}, {"clear_every": 13}, {"defer_clear": True}):
            enc = lzw_encode(raw, mc, **kw)
            assert lzw_decode(enc, mc, n) == raw, (n, mc, kw)
            assert _ref_lzw_decode(enc, mc, n) == raw, (n, mc, kw)


def test_lzw_width_growth_boundaries():
    """Pixel counts bracketing every code-width bump (the 2^w ± 1 family
    that produced the canonical encoder's one-entry-late bump rule)."""
    rng = np.random.default_rng(13)
    for n in [253, 254, 255, 256, 257, 509, 510, 511, 512, 513, 1021, 1022, 1023, 1024, 1025]:
        raw = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        enc = lzw_encode(raw, 8)
        assert lzw_decode(enc, 8, n) == raw, n
        assert _ref_lzw_decode(enc, 8, n) == raw, n


def test_lzw_table_cap_and_deferred_clear():
    # low-entropy long stream grows the table to the 4096 cap; defer_clear
    # freezes at 12-bit codes (the wild-GIF shape), the default clears
    rng = np.random.default_rng(17)
    raw = bytes(np.repeat(rng.integers(0, 8, size=30000, dtype=np.uint8), 3))
    for kw in ({}, {"defer_clear": True}):
        enc = lzw_encode(raw, 8, **kw)
        assert lzw_decode(enc, 8, len(raw)) == raw, kw
        assert _ref_lzw_decode(enc, 8, len(raw)) == raw, kw


# --- container roundtrips -----------------------------------------------------


def test_gif_roundtrip_shapes_and_modes():
    rng = np.random.default_rng(7)
    for shape in [(1, 1), (3, 5), (17, 23), (64, 64), (100, 101)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for interlace in (False, True):
            rgb = gif_decode(gif_encode(img, interlace=interlace))
            assert rgb.shape == shape + (3,)
            assert (rgb == img[:, :, None]).all(), (shape, interlace)


def test_gif_interlace_row_schedule():
    # rows labeled by index: deinterlacing must restore exact row order
    img = np.tile(np.arange(16, dtype=np.uint8)[:, None] * 16, (1, 5))
    assert np.array_equal(gif_decode(gif_encode(img, interlace=True))[:, :, 0], img)


def test_gif_rejects_malformed():
    good = gif_encode(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        gif_decode(b"not a gif at all")
    with pytest.raises(ValueError):
        gif_decode(good[:20])  # truncated inside the color table
    with pytest.raises(ValueError):
        gif_decode(good[:-4])  # truncated sub-block chain
    # pixel index beyond a small palette
    bad = bytearray()
    bad += b"GIF89a" + struct.pack("<HHBBB", 3, 1, 0x80, 0, 0)
    bad += bytes([0, 0, 0, 255, 255, 255])
    bad += b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 1, 0)
    # codes CLEAR(4),2,EOI at 3 bits: index 2 with a 2-color palette
    bad += bytes([2, 2, 0x54, 0x01, 0]) + b"\x3b"
    with pytest.raises(ValueError):
        gif_decode(bytes(bad))


def test_gif87a_signature_accepted():
    img = np.full((2, 2), 9, dtype=np.uint8)
    assert (gif_decode(gif_encode(img, version=b"GIF87a"))[:, :, 0] == img).all()


# --- BMP ----------------------------------------------------------------------


def test_bmp_roundtrip_gray_and_rgb():
    rng = np.random.default_rng(3)
    for shape in [(1, 1), (4, 4), (5, 7), (13, 3), (33, 31)]:
        g = rng.integers(0, 256, size=shape, dtype=np.uint8)
        c = rng.integers(0, 256, size=shape + (3,), dtype=np.uint8)
        for top_down in (False, True):
            assert (bmp_decode(bmp_encode(g, top_down=top_down)) == g[:, :, None]).all()
            assert (bmp_decode(bmp_encode(c, top_down=top_down)) == c).all()


def test_bmp_row_padding_non_multiple_of_four():
    # width 3 gray -> stride 4; width 5 rgb -> stride 16: padding must be
    # sliced off, not decoded as pixels
    g = np.arange(9, dtype=np.uint8).reshape(3, 3) * 20
    assert (bmp_decode(bmp_encode(g))[:, :, 0] == g).all()
    c = np.arange(5 * 5 * 3, dtype=np.uint8).reshape(5, 5, 3)
    assert (bmp_decode(bmp_encode(c)) == c).all()


def test_bmp_rejects_malformed():
    with pytest.raises(ValueError):
        bmp_decode(b"definitely not a bmp")
    good = bmp_encode(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        bmp_decode(good[:40])
    # RLE8 compression flag -> honest rejection
    bad = bytearray(good)
    struct.pack_into("<I", bad, 30, 1)
    with pytest.raises(ValueError):
        bmp_decode(bytes(bad))
    # 16-bit depth -> honest rejection
    bad = bytearray(good)
    struct.pack_into("<H", bad, 28, 16)
    with pytest.raises(ValueError):
        bmp_decode(bytes(bad))


# --- seam integration ---------------------------------------------------------


def test_decode_media_gif_bmp_arms(spark):
    """The one decode seam routes GIF and BMP signatures to the stdlib
    decoders (before any PIL branch — PIL's asarray on palette images
    yields indices); features come back exactly byte/255 in float32."""
    import pandas as pd

    from duckdb_ml_spark.operators.multimodal import _DECODE_DIM, decode_media

    side = int(_DECODE_DIM**0.5)
    rng = np.random.default_rng(5)
    grids = [rng.integers(0, 256, size=(side, side), dtype=np.uint8) for _ in range(4)]
    payloads = [
        gif_encode(grids[0]),
        gif_encode(grids[1], interlace=True),
        bmp_encode(grids[2]),
        bmp_encode(grids[3], top_down=True),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(4)), "media": payloads})
    )
    rows = {r.doc_id: r for r in decode_media(df, fake=None).collect()}
    for i, grid in enumerate(grids):
        want = (grid.ravel().astype(np.float32) / np.float32(255.0)).tolist()
        got = rows[i].features
        assert got == pytest.approx(want, abs=0), i
