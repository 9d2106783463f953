"""Pure stdlib+numpy FLAC codec — the lossless-audio-compression arm of the
one decode seam.

Completes the audio side the way gif.py completed the image side: wav.py
covers the WAV container's voice codecs (G.711, IMA/MS-ADPCM — all
fixed-rate), but crawled audio at rest is overwhelmingly FLAC, which is a
genuinely different machine: bit-level framing, Rice/Golomb entropy coding,
and linear prediction. Implemented from the public IETF specification
(RFC 9639, "Free Lossless Audio Codec", December 2024) with the established
discipline: byte-level from-spec, value-checked, honest about coverage.

Covered (decode):
- "fLaC" magic, STREAMINFO parse, all other metadata blocks skipped.
- Frame sync + header: both blocking strategies, all block-size codes
  (192/576*2^n/256*2^n and the 8/16-bit follow-up forms), the sample-rate
  code table + follow-up forms, UTF-8-style coded frame/sample numbers,
  CRC-8 header check and CRC-16 frame check (both verified, not skipped).
- Subframes: CONSTANT, VERBATIM, FIXED orders 0-4, and LPC of any order
  (quantized coefficients + shift from the stream), wasted-bits unpacking.
- Rice residual: both 4-bit (method 0) and 5-bit (method 1) parameter
  widths, multi-partition partition orders, and the escape-to-raw-binary
  partition form; zigzag de-mapping.
- Channel assignments: independent (1..8 channels), left/side, right/side,
  mid/side (side channel carries the +1 bit of depth per spec).
- Bit depths 8/12/16/20/24/32; STREAMINFO MD5 verified when present.

Deliberately NOT implemented (raise ValueError, never mis-decode):
streams whose CRCs do not verify, sample-rate/bit-depth codes marked
invalid by the RFC, and blocking-strategy/blocksize combinations the RFC
forbids (e.g. blocksize codes 0b0000).

Encoder twin `flac_encode` (tests + the mm_decode_flac query kernel):
CONSTANT / VERBATIM / FIXED-with-best-order per subframe with real Rice
parameter estimation and multi-partition residual coding, independent or
left/side / right/side / mid/side stereo, one frame per block. The encoder
never emits LPC; LPC decode is exercised by a spec-transcribed frame
builder in the tests. FLAC is lossless, so encode→decode is sample-exact by
construction — which is what makes mm_decode_flac a value-hash-checkable
driver row against a pure integer SQL oracle (the mulaw/JPEG/GIF
discipline).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_BLOCKSIZE_TABLE = {
    0b0001: 192,
    **{n: 576 << (n - 2) for n in range(0b0010, 0b0110)},
    **{n: 256 << (n - 8) for n in range(0b1000, 0b10000)},
}
_SAMPLE_RATE_TABLE = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}
_BITDEPTH_TABLE = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}
_FIXED_COEFS = {  # prediction = sum(coef * past), RFC 9639 §4.2.2
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fail(msg: str):
    raise ValueError(f"flac: {msg}")


# --- CRCs (RFC 9639 §9.2: CRC-8 poly x^8+x^2+x+1, CRC-16 poly x^16+x^15+x^2+1)


def _make_crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


# --- bit IO -------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader with byte-position access (CRC spans use it)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0  # bits consumed within data[pos]

    def read(self, n: int) -> int:
        out = 0
        while n > 0:
            if self.pos >= len(self.data):
                _fail("truncated stream")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.pos]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            n -= take
            if self.bit == 8:
                self.pos += 1
                self.bit = 0
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                _fail("runaway unary code")
        return q

    def align(self):
        if self.bit:
            self.pos += 1
            self.bit = 0


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


# --- UTF-8-style coded numbers (RFC 9639 §9.1.5, extended to 36 bits) ---------


def _encode_coded_number(val: int) -> bytes:
    if val < 0x80:
        return bytes([val])
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if val < (1 << bits):
            lead = (0xFF << (8 - nbytes)) & 0xFF
            out = [lead | (val >> (6 * (nbytes - 1)))]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((val >> (6 * i)) & 0x3F))
            return bytes(out)
    _fail(f"coded number {val} exceeds 36 bits")


def _read_coded_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        _fail(f"bad coded-number lead byte 0x{first:02x}")
    val = first & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            _fail("bad coded-number continuation byte")
        val = (val << 6) | (cont & 0x3F)
    return val


# --- residual coding ----------------------------------------------------------


def _zigzag(residuals: np.ndarray) -> np.ndarray:
    r = residuals.astype(np.int64)
    return np.where(r >= 0, r << 1, (-r << 1) - 1)


def _read_residuals(br: _BitReader, blocksize: int, pred_order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        _fail(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        _fail("block size not divisible by partition count")
    part_len = blocksize >> porder
    if part_len <= pred_order and porder > 0 or (porder == 0 and blocksize <= pred_order):
        _fail("partition shorter than predictor order")
    out = np.empty(blocksize - pred_order, dtype=np.int64)
    w = 0
    for p in range(nparts):
        n = part_len - (pred_order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw_bits = br.read(5)
            for i in range(n):
                out[w + i] = br.read_signed(raw_bits) if raw_bits else 0
        else:
            for i in range(n):
                q = br.unary()
                u = (q << param) | br.read(param)
                out[w + i] = (u >> 1) ^ -(u & 1)  # zigzag
        w += n
    return out


def _write_residuals(bw: _BitWriter, residuals: np.ndarray, blocksize: int, pred_order: int, porder: int):
    """Rice-code residuals with a per-partition estimated parameter (the
    standard mean-based estimate: smallest k with n<<k >= sum|zigzag|)."""
    zz = _zigzag(residuals)
    nparts = 1 << porder
    part_len = blocksize >> porder
    # 5-bit parameter space (method 1) iff any partition needs k > 14
    params, spans = [], []
    w = 0
    for p in range(nparts):
        n = part_len - (pred_order if p == 0 else 0)
        part = zz[w : w + n]
        total = int(part.sum())
        k = 0
        while (n << k) < total and k < 30:
            k += 1
        params.append(k)
        spans.append(part)
        w += n
    method = 0 if max(params) <= 14 else 1
    pbits = 4 if method == 0 else 5
    bw.write(method, 2)
    bw.write(porder, 4)
    for k, part in zip(params, spans):
        bw.write(k, pbits)
        for u in part:
            bw.unary(int(u) >> k)
            if k:
                bw.write(int(u) & ((1 << k) - 1), k)


# --- subframes ----------------------------------------------------------------


def _decode_subframe(br: _BitReader, blocksize: int, depth: int) -> np.ndarray:
    if br.read(1) != 0:
        _fail("subframe padding bit set")
    sftype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits flag: count-1 follows unary-coded
        wasted = br.unary() + 1
        depth -= wasted
        if depth <= 0:
            _fail("wasted bits exceed bit depth")
    if sftype == 0:  # CONSTANT
        out = np.full(blocksize, br.read_signed(depth), dtype=np.int64)
    elif sftype == 1:  # VERBATIM
        out = np.array([br.read_signed(depth) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= sftype <= 12:  # FIXED order 0-4
        order = sftype - 8
        out = _predict(br, blocksize, depth, order, _FIXED_COEFS[order], 0)
    elif sftype >= 32:  # LPC order (sftype & 31) + 1
        order = (sftype & 31) + 1
        if blocksize <= order:
            _fail("LPC order >= block size")
        warmup = [br.read_signed(depth) for _ in range(order)]
        prec = br.read(4)
        if prec == 0b1111:
            _fail("invalid LPC coefficient precision code")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            _fail("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residuals(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warmup
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[i - 1 - j]
            out[i] = res[i - order] + (pred >> shift)
    else:
        _fail(f"reserved subframe type {sftype}")
    return out << wasted


def _predict(br: _BitReader, blocksize: int, depth: int, order: int, coefs, shift: int) -> np.ndarray:
    warmup = [br.read_signed(depth) for _ in range(order)]
    res = _read_residuals(br, blocksize, order)
    out = np.empty(blocksize, dtype=np.int64)
    out[:order] = warmup
    for i in range(order, blocksize):
        pred = 0
        for j, c in enumerate(coefs):
            pred += c * out[i - 1 - j]
        out[i] = res[i - order] + (pred >> shift if shift else pred)
    return out


def _fixed_residuals(samples: np.ndarray, order: int) -> np.ndarray:
    res = samples.astype(np.int64)
    for _ in range(order):  # order-th difference == fixed predictor residual
        res = np.diff(res)
    return res


def _encode_subframe(bw: _BitWriter, samples: np.ndarray, depth: int, blocksize: int):
    s = samples.astype(np.int64)
    if np.all(s == s[0]):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(int(s[0]), depth)
        return
    # pick the fixed order with the smallest total |residual| (libFLAC's
    # classic estimator), capped so warmup fits the block
    best_order, best_cost = 0, None
    for order in range(min(5, len(s))):
        cost = int(np.abs(_fixed_residuals(s, order)).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_cost = order, cost
    res = _fixed_residuals(s, best_order)
    verbatim_bits = depth * len(s)
    # porder: largest that divides blocksize with partitions > order, <= 6
    porder = 0
    while (
        porder < 6
        and blocksize % (1 << (porder + 1)) == 0
        and (blocksize >> (porder + 1)) > best_order
        and (blocksize >> (porder + 1)) >= 16
    ):
        porder += 1
    trial = _BitWriter()
    _write_residuals(trial, res, blocksize, best_order, porder)
    fixed_bits = depth * best_order + trial.nbits + 8 * len(trial.out)
    if fixed_bits < verbatim_bits:
        bw.write(0, 1)
        bw.write(8 + best_order, 6)  # FIXED
        bw.write(0, 1)
        for v in s[:best_order]:
            bw.write(int(v), depth)
        _write_residuals(bw, res, blocksize, best_order, porder)
    else:
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for v in s:
            bw.write(int(v), depth)


# --- stream-level codec -------------------------------------------------------


def flac_encode(
    samples: np.ndarray,
    sample_rate: int = 8000,
    depth: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "independent",
) -> bytes:
    """(n,) or (n, channels) int samples → FLAC bytes.

    stereo_mode for 2-channel input: independent | left_side | right_side |
    mid_side (spec channel assignments 8/9/10)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    if n == 0:
        _fail("no samples")
    if not 1 <= channels <= 8:
        _fail(f"{channels} channels")
    lim = 1 << (depth - 1)
    if s.min() < -lim or s.max() >= lim:
        _fail(f"samples exceed {depth}-bit range")
    if stereo_mode != "independent" and channels != 2:
        _fail("stereo decorrelation needs exactly 2 channels")

    # STREAMINFO (34 bytes)
    md5 = hashlib.md5()
    width = (depth + 7) // 8
    inter = s.reshape(-1)  # interleaved frames
    for v in inter:
        md5.update(int(v).to_bytes(width, "little", signed=True))
    info = _BitWriter()
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(channels - 1, 3)
    info.write(depth - 1, 5)
    info.write(n, 36)
    info.align()
    header = b"fLaC" + bytes([0x80, 0, 0, 34]) + info.bytes() + md5.digest()

    out = bytearray(header)
    for frame_idx, start in enumerate(range(0, n, block_size)):
        blk = s[start : start + block_size]
        bs = len(blk)
        fw = _BitWriter()
        fw.write(0b11111111111110, 14)
        fw.write(0, 1)  # reserved
        fw.write(0, 1)  # fixed blocking strategy
        # block size: 16-bit follow-up form keeps any size legal
        fw.write(0b0111, 4)
        sr_code = {v: k for k, v in _SAMPLE_RATE_TABLE.items()}.get(sample_rate)
        fw.write(sr_code if sr_code is not None else 0b0000, 4)
        if stereo_mode == "independent":
            fw.write(channels - 1, 4)
        else:
            fw.write({"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode], 4)
        depth_code = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110, 32: 0b111}
        if depth not in depth_code:
            _fail(f"unsupported encode bit depth {depth}")
        fw.write(depth_code[depth], 3)
        fw.write(0, 1)  # reserved
        fw.align()
        head = fw.bytes() + _encode_coded_number(frame_idx) + struct.pack(">H", bs - 1)
        head += bytes([crc8(head)])

        body = _BitWriter()
        if stereo_mode == "independent":
            chans = [(blk[:, c], depth) for c in range(channels)]
        else:
            left = blk[:, 0]
            right = blk[:, 1]
            side = left - right
            if stereo_mode == "left_side":
                chans = [(left, depth), (side, depth + 1)]
            elif stereo_mode == "right_side":
                chans = [(side, depth + 1), (right, depth)]
            else:
                mid = (left + right) >> 1
                chans = [(mid, depth), (side, depth + 1)]
        for cs, cd in chans:
            _encode_subframe(body, cs, cd, bs)
        body.align()
        frame = head + body.bytes()
        out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)


def flac_decode(data: bytes, verify_md5: bool = True):
    """FLAC bytes → (sample_rate, depth, samples (n, channels) int64)."""
    if data[:4] != b"fLaC":
        _fail(f"bad magic {data[:4]!r}")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            _fail("truncated metadata block header")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        pos += 4
        if pos + blen > len(data):
            _fail("truncated metadata block")
        if btype == 0:
            streaminfo = data[pos : pos + blen]
        elif btype == 127:
            _fail("invalid metadata block type 127")
        pos += blen
        if last:
            break
    if streaminfo is None or len(streaminfo) != 34:
        _fail("missing or malformed STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min block size
    si.read(16)  # max block size
    si.read(24)
    si.read(24)
    sample_rate = si.read(20)
    channels = si.read(3) + 1
    depth = si.read(5) + 1
    total = si.read(36)
    md5_ref = streaminfo[18:34]

    frames: list[np.ndarray] = []
    got = 0
    while (total == 0 or got < total) and pos < len(data):
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            _fail(f"lost frame sync at byte {pos}")
        if br.read(1) != 0:
            _fail("reserved frame-header bit set")
        br.read(1)  # blocking strategy (coded number length differs only >31 bits)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bd_code = br.read(3)
        if br.read(1) != 0:
            _fail("reserved frame-header bit set")
        _read_coded_number(br)
        if bs_code == 0b0000:
            _fail("reserved block-size code 0")
        elif bs_code == 0b0110:
            bs = br.read(8) + 1
        elif bs_code == 0b0111:
            bs = br.read(16) + 1
        else:
            bs = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 0b0000:
            sr = sample_rate
        elif sr_code in _SAMPLE_RATE_TABLE:
            sr = _SAMPLE_RATE_TABLE[sr_code]
        elif sr_code == 0b1100:
            sr = br.read(8) * 1000
        elif sr_code == 0b1101:
            sr = br.read(16)
        elif sr_code == 0b1110:
            sr = br.read(16) * 10
        else:
            _fail("invalid sample-rate code 15")
        if sr != sample_rate:
            _fail("frame sample rate disagrees with STREAMINFO")
        if bd_code == 0b000:
            bd = depth
        elif bd_code in _BITDEPTH_TABLE:
            bd = _BITDEPTH_TABLE[bd_code]
        else:
            _fail(f"reserved bit-depth code {bd_code}")
        if bd != depth:
            _fail("frame bit depth disagrees with STREAMINFO")
        br.align()
        header_span = data[pos : br.pos]
        if crc8(header_span) != br.read(8):
            _fail("frame header CRC-8 mismatch")

        if ch_code < 8:
            nch = ch_code + 1
            if nch != channels:
                _fail("frame channel count disagrees with STREAMINFO")
            cols = [_decode_subframe(br, bs, depth) for _ in range(nch)]
            blk = np.stack(cols, axis=1)
        elif ch_code in (8, 9, 10):
            if channels != 2:
                _fail("stereo decorrelation in a non-stereo stream")
            if ch_code == 8:  # left/side
                left = _decode_subframe(br, bs, depth)
                side = _decode_subframe(br, bs, depth + 1)
                blk = np.stack([left, left - side], axis=1)
            elif ch_code == 9:  # right/side
                side = _decode_subframe(br, bs, depth + 1)
                right = _decode_subframe(br, bs, depth)
                blk = np.stack([right + side, right], axis=1)
            else:  # mid/side
                mid = _decode_subframe(br, bs, depth)
                side = _decode_subframe(br, bs, depth + 1)
                m2 = (mid << 1) | (side & 1)
                blk = np.stack([(m2 + side) >> 1, (m2 - side) >> 1], axis=1)
        else:
            _fail(f"reserved channel assignment {ch_code}")
        br.align()
        frame_span = data[pos : br.pos]
        footer = br.read(16)
        if crc16(frame_span) != footer:
            _fail("frame CRC-16 mismatch")
        frames.append(blk)
        got += bs
        pos = br.pos
    if total and got != total:
        _fail(f"decoded {got} of {total} samples")
    samples = np.concatenate(frames, axis=0) if frames else np.zeros((0, channels), np.int64)
    if total:
        samples = samples[:total]
    if verify_md5 and md5_ref != b"\x00" * 16:
        md5 = hashlib.md5()
        width = (depth + 7) // 8
        for v in samples.reshape(-1):
            md5.update(int(v).to_bytes(width, "little", signed=True))
        if md5.digest() != md5_ref:
            _fail("decoded-sample MD5 mismatch")
    return sample_rate, depth, samples
