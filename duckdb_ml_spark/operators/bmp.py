"""Pure stdlib+numpy BMP (Windows DIB) codec — the uncompressed-raster arm of
the one decode seam.

The trivial sibling of gif.py: no entropy coding, but the container details
(BITMAPINFOHEADER layout, 4-byte row padding, bottom-up vs top-down row
order, BGR byte order, palette indirection for 8-bit) are exactly the kind
of thing a silent mis-decode hides in, so they get the same from-spec
treatment (Microsoft's public BMP file-format documentation) and the same
honesty contract.

Covered:
- BITMAPINFOHEADER (40-byte) and the larger V4/V5 headers (size >= 40; the
  extra fields don't affect pixel decode for BI_RGB).
- 24-bit BI_RGB (BGR triples, rows padded to 4 bytes, bottom-up and
  top-down), returned as (h, w, 3) RGB.
- 8-bit BI_RGB palette images (BGRA palette entries), returned as (h, w, 3)
  RGB via palette lookup.

Deliberately NOT implemented (raise ValueError, never mis-decode): RLE4/
RLE8/bitfields compression, 1/2/4/16/32-bit depths, OS/2 BITMAPCOREHEADER.

Encoder twin `bmp_encode` (8-bit grayscale palette or 24-bit) exists for
tests; a grayscale identity palette makes decode byte-exact, same as gif.py.
"""

from __future__ import annotations

import struct

import numpy as np


def _fail(msg: str):
    raise ValueError(f"bmp: {msg}")


def bmp_decode(data: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB."""
    if len(data) < 54:
        _fail("shorter than file + info headers")
    if data[:2] != b"BM":
        _fail(f"bad signature {data[:2]!r}")
    pix_off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        _fail(f"header size {hdr_size} (BITMAPCOREHEADER not supported)")
    w, h_raw = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    if w <= 0 or h_raw == 0:
        _fail(f"bad dimensions {w}x{h_raw}")
    if planes != 1:
        _fail(f"planes {planes} != 1")
    if compression != 0:
        _fail(f"compression {compression} (only BI_RGB supported)")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw

    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        need = pix_off + stride * h
        if len(data) < need:
            _fail("truncated pixel data")
        rows = np.frombuffer(
            data[pix_off : pix_off + stride * h], dtype=np.uint8
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        rgb = rows[:, :, ::-1]  # BGR → RGB
    elif bpp == 8:
        n_colors = struct.unpack("<I", data[46:50])[0] or 256
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > len(data):
            _fail("truncated palette")
        pal = np.frombuffer(
            data[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRA → RGB
        stride = (w + 3) & ~3
        if len(data) < pix_off + stride * h:
            _fail("truncated pixel data")
        idx = np.frombuffer(
            data[pix_off : pix_off + stride * h], dtype=np.uint8
        ).reshape(h, stride)[:, :w]
        if idx.max(initial=0) >= n_colors:
            _fail("pixel index beyond palette")
        rgb = pal[idx]
    else:
        _fail(f"bit depth {bpp} (only 8 and 24 supported)")
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def bmp_encode(arr, top_down: bool = False) -> bytes:
    """uint8 (h, w) grayscale → 8-bit palette BMP (identity grayscale
    palette), or (h, w, 3) RGB → 24-bit BMP."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        h, w = a.shape
        stride = (w + 3) & ~3
        pal = np.zeros((256, 4), dtype=np.uint8)
        pal[:, 0] = pal[:, 1] = pal[:, 2] = np.arange(256)  # B=G=R=i
        pal_bytes = pal.tobytes()
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w] = a if top_down else a[::-1]
        pix = rows.tobytes()
        bpp = 8
    elif a.ndim == 3 and a.shape[2] == 3:
        h, w = a.shape[:2]
        stride = (w * 3 + 3) & ~3
        pal_bytes = b""
        rows = np.zeros((h, stride), dtype=np.uint8)
        bgr = a[:, :, ::-1] if top_down else a[::-1, :, ::-1]
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        pix = rows.tobytes()
        bpp = 24
    else:
        raise ValueError(f"bmp_encode: expected (h,w) or (h,w,3), got {a.shape}")
    pix_off = 14 + 40 + len(pal_bytes)
    header = b"BM" + struct.pack("<IHHI", pix_off + len(pix), 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, -h if top_down else h, 1, bpp, 0, len(pix), 2835, 2835,
        256 if bpp == 8 else 0, 0,
    )
    return header + info + pal_bytes + pix
