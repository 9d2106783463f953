"""Pure stdlib+numpy GIF codec (LZW) — the palette-image arm of the one
decode seam.

Completes the image-codec trio next to png.py (lossless, DEFLATE) and
jpeg.py (lossy, Huffman/DCT): GIF is the palette + LZW family, everywhere in
crawled web data, and the container ships no PIL — so the established
discipline applies: implement the byte-level codec from the public spec
(CompuServe GIF89a, 1990-07-31, the W3C-hosted specification), value-check
it, and be honest about coverage. Note PIL itself is the WRONG tool for this
seam even when importable: ``np.asarray(Image.open(gif))`` yields the raw
palette INDICES (mode "P"), not pixels — the multimodal dispatch therefore
routes GIF signatures here before the PIL branch.

Covered:
- GIF87a and GIF89a signatures; logical screen descriptor; global and local
  color tables (any 2..256 size); background-color fill when a frame covers
  only part of the logical screen.
- The full variable-width LZW scheme (spec Appendix F): LSB-first bit
  packing across 255-byte sub-blocks, clear/EOI codes, the KwKwK case
  (code == next free slot), code width growth at 2^width up to the 12-bit
  cap, and the deferred-clear state (table full at 4096 → widths freeze
  until the encoder sends a clear).
- Interlaced images (the 8/8/4/2 four-pass row schedule).
- Extension blocks are walked and skipped (graphic control 0xF9, comment
  0xFE, application 0xFF, plain text 0x01) — none affect first-frame pixel
  values.

Deliberately NOT implemented (raise ValueError, never mis-decode):
multi-frame animation compositing (frame disposal/blending semantics —
`gif_decode` renders the FIRST frame only and ignores later image blocks),
transparency compositing (the transparent index is a GCE attribute of
animation blending; a single frame's palette lookup is still exact).

Encoder twin `gif_encode` (grayscale palette, optional interlace, optional
forced-clear stress mode) exists for tests and for the mm_decode_gif query
kernel: a grayscale identity palette makes the decode byte-exact
(palette[i] = (i,i,i); ITU-R 601 luma of (v,v,v) is v), which is what turns
a real LZW pipeline into a value-hash-checkable driver row — the same
construction as the PNG row's filter roundtrip and the JPEG row's DC-only
blocks.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12
_TABLE_CAP = 1 << _MAX_CODE_WIDTH  # 4096

# interlace passes: (first row, row step) per the spec's Appendix E
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _fail(msg: str):
    raise ValueError(f"gif: {msg}")


# --- sub-block walking --------------------------------------------------------


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a length-prefixed sub-block chain; return (payload, pos
    after the 0x00 terminator)."""
    out = bytearray()
    n = len(data)
    while True:
        if pos >= n:
            _fail("truncated sub-block chain")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return bytes(out), pos
        if pos + ln > n:
            _fail("truncated sub-block payload")
        out += data[pos : pos + ln]
        pos += ln


def _skip_subblocks(data: bytes, pos: int) -> int:
    n = len(data)
    while True:
        if pos >= n:
            _fail("truncated sub-block chain")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return pos
        pos += ln
        if pos > n:
            _fail("truncated sub-block payload")


# --- LZW ----------------------------------------------------------------------


def lzw_decode(payload: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW: LSB-first codes of growing width → index bytes.

    Decodes exactly `n_pixels` indices (the image descriptor fixes the pixel
    count; trailing garbage after EOI is ignored per spec). Table layout:
    0..clear-1 literals, clear, EOI, then compound entries; width grows when
    the next free slot reaches 2^width (12-bit cap, deferred clear)."""
    if not 2 <= min_code_size <= 8:
        _fail(f"LZW minimum code size {min_code_size} outside 2..8")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # prefix/suffix arrays instead of a list of byte strings: entry expansion
    # walks parent links, O(length) per emit, no quadratic re-copying
    prefix = np.zeros(_TABLE_CAP, dtype=np.int32)
    suffix = np.zeros(_TABLE_CAP, dtype=np.uint8)
    width = min_code_size + 1
    next_slot = eoi + 1
    prev = -1

    bitpos = 0
    total_bits = len(payload) * 8

    def read_code(w: int) -> int:
        nonlocal bitpos
        if bitpos + w > total_bits:
            _fail("truncated LZW stream (no EOI)")
        byte0 = bitpos >> 3
        # up to 12 bits span at most 3 bytes
        chunk = int.from_bytes(payload[byte0 : byte0 + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << w) - 1)
        bitpos += w
        return code

    def expand(code: int) -> bytes:
        seq = bytearray()
        c = code
        while c >= clear:  # compound entry: walk parent links
            seq.append(suffix[c])
            c = int(prefix[c])
        seq.append(c)
        seq.reverse()
        return bytes(seq)

    while len(out) < n_pixels:
        code = read_code(width)
        if code == clear:
            width = min_code_size + 1
            next_slot = eoi + 1
            prev = -1
            continue
        if code == eoi:
            _fail(f"EOI after {len(out)} of {n_pixels} pixels")
        if prev < 0:
            # first code after a clear must be a literal
            if code >= clear:
                _fail(f"first code {code} after clear is not a literal")
            out.append(code)
            prev = code
            continue
        if code < next_slot:
            seq = expand(code)
        elif code == next_slot and next_slot < _TABLE_CAP:
            # KwKwK: the code being defined right now — prev + its own head
            seq = expand(prev)
            seq += seq[:1]
        else:
            _fail(f"LZW code {code} beyond table size {next_slot}")
        out += seq
        if next_slot < _TABLE_CAP:
            prefix[next_slot] = prev
            suffix[next_slot] = seq[0]
            next_slot += 1
            if next_slot == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        # else: table full — width frozen at 12 until the encoder clears
        prev = code
    return bytes(out[:n_pixels])


def lzw_encode(
    indices: bytes,
    min_code_size: int,
    clear_every: int | None = None,
    defer_clear: bool = False,
) -> bytes:
    """GIF-variant LZW compress. `clear_every`: force a clear code after that
    many emitted codes (tests use it to exercise decoder reset paths; None =
    clear only when the table fills). `defer_clear`: never clear on a full
    table — freeze at 12-bit codes and keep emitting from the full table, the
    wild-GIF "deferred clear" stream shape the decoder must also accept."""
    clear = 1 << min_code_size
    eoi = clear + 1

    bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    width = min_code_size + 1
    next_slot = eoi + 1
    emitted = 0

    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        emitted += 1
        if next_slot < _TABLE_CAP:
            table[cand] = next_slot
            next_slot += 1
            # one entry LATER than the decoder's bump: the decoder adds entry
            # j only while processing code j+1, so its table runs one entry
            # behind the encoder's at each read — the canonical compress-
            # derived GIF encoder (free_ent > maxcode AFTER emitting) bumps
            # at 2^w + 1 to stay bit-synchronized (pinned by the >=512-entry
            # roundtrip tests; at 2^w both sides desync at code 255)
            if next_slot == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
                width += 1
        need_clear = (next_slot >= _TABLE_CAP and not defer_clear) or (
            clear_every is not None and emitted >= clear_every
        )
        if need_clear:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code_size + 1
            next_slot = eoi + 1
            emitted = 0
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        bits.append(acc & 0xFF)
    return bytes(bits)


# --- container ----------------------------------------------------------------


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for first, step in _INTERLACE_PASSES:
        for y in range(first, h, step):
            out[y] = rows[src]
            src += 1
    return out


def gif_decode(data: bytes) -> np.ndarray:
    """GIF bytes → (h, w, 3) uint8 RGB of the first frame on the logical
    screen (background color fills any area the frame doesn't cover)."""
    if len(data) < 13:
        _fail("shorter than header + logical screen descriptor")
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        _fail(f"bad signature {data[:6]!r}")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    if sw == 0 or sh == 0:
        _fail("zero-sized logical screen")
    pos = 13
    gct = None
    if packed & 0x80:
        ncol = 2 << (packed & 0x07)
        if pos + 3 * ncol > len(data):
            _fail("truncated global color table")
        gct = np.frombuffer(data[pos : pos + 3 * ncol], dtype=np.uint8).reshape(ncol, 3)
        pos += 3 * ncol

    while True:
        if pos >= len(data):
            _fail("missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            _fail("no image data")
        if block == 0x21:  # extension: label + sub-blocks, pixel-irrelevant
            if pos >= len(data):
                _fail("truncated extension")
            pos = _skip_subblocks(data, pos + 1)
            continue
        if block != 0x2C:
            _fail(f"unknown block introducer 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(data):
            _fail("truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if w == 0 or h == 0:
            _fail("zero-sized image")
        if left + w > sw or top + h > sh:
            _fail("image exceeds logical screen")
        lct = None
        if ipacked & 0x80:
            ncol = 2 << (ipacked & 0x07)
            if pos + 3 * ncol > len(data):
                _fail("truncated local color table")
            lct = np.frombuffer(data[pos : pos + 3 * ncol], dtype=np.uint8).reshape(
                ncol, 3
            )
            pos += 3 * ncol
        palette = lct if lct is not None else gct
        if palette is None:
            _fail("no color table (neither global nor local)")
        if pos >= len(data):
            _fail("truncated before LZW minimum code size")
        min_code = data[pos]
        payload, pos = _read_subblocks(data, pos + 1)
        idx = np.frombuffer(lzw_decode(payload, min_code, w * h), dtype=np.uint8)
        if idx.max(initial=0) >= len(palette):
            _fail("pixel index beyond color table")
        rows = idx.reshape(h, w)
        if ipacked & 0x40:
            rows = _deinterlace(rows)
        frame = palette[rows]  # (h, w, 3)
        if (left, top, w, h) == (0, 0, sw, sh):
            return frame
        if gct is None or bg >= len(gct):
            _fail("partial frame with no valid background color")
        canvas = np.empty((sh, sw, 3), dtype=np.uint8)
        canvas[:, :] = gct[bg]
        canvas[top : top + h, left : left + w] = frame
        return canvas


def gif_encode(
    arr,
    interlace: bool = False,
    clear_every: int | None = None,
    defer_clear: bool = False,
    version: bytes = b"GIF89a",
) -> bytes:
    """uint8 (h, w) grayscale → single-frame GIF with the 256-entry identity
    grayscale palette (palette[i] = (i,i,i)) — decode is pixel-exact."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError(f"gif_encode: expected 2-D grayscale, got shape {a.shape}")
    h, w = a.shape
    out = bytearray()
    out += version
    # logical screen: GCT flag, color resolution 8, GCT size 7 (256 entries)
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | 0x07, 0, 0)
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    if interlace:
        order = [
            y for first, step in _INTERLACE_PASSES for y in range(first, h, step)
        ]
        a = a[order]
    min_code = 8
    out.append(min_code)
    lzw = lzw_encode(
        a.tobytes(), min_code, clear_every=clear_every, defer_clear=defer_clear
    )
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
