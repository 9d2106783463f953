"""FLAC codec tests (RFC 9639) — the lossless-audio arm of the decode seam.

Layers, mirroring test_gif_bmp.py / test_wav.py:
1. encode↔decode sample-exactness across signal classes (random/smooth/
   constant), depths, block boundaries, and all four stereo assignments;
2. LPC decode exercised by a frame BUILDER transcribed from the spec in
   this test file (the encoder never emits LPC) — residuals computed here
   independently from the decoder's prediction loop;
3. integrity machinery is real: frame-header CRC-8, frame CRC-16 and the
   STREAMINFO sample-MD5 each detect single-bit corruption;
4. honest-rejection paths raise ValueError, never mis-decode;
5. compression sanity: predictable signals actually compress (the Rice +
   fixed-predictor path is doing real entropy coding, not verbatim).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from duckdb_ml_spark.operators.flac import (
    _BitWriter,
    _encode_coded_number,
    _write_residuals,
    crc8,
    crc16,
    flac_decode,
    flac_encode,
)


def test_roundtrip_mono_signal_classes():
    rng = np.random.default_rng(5)
    for depth in (8, 16):
        lim = 1 << (depth - 1)
        signals = {
            "random": rng.integers(-lim, lim, size=10000, dtype=np.int64),
            "smooth": (np.sin(np.arange(12000) / 50) * (lim * 0.7)).astype(np.int64),
            "const": np.full(5000, 17, dtype=np.int64),
            "short": rng.integers(-lim, lim, size=37, dtype=np.int64),
            "ramp": np.arange(-1000, 1000, dtype=np.int64) % lim,
        }
        for name, s in signals.items():
            sr, d, out = flac_decode(flac_encode(s, depth=depth))
            assert sr == 8000 and d == depth, (depth, name)
            assert out.shape == (len(s), 1) and (out[:, 0] == s).all(), (depth, name)


def test_roundtrip_stereo_all_assignments():
    rng = np.random.default_rng(6)
    left = (np.sin(np.arange(9000) / 30) * 20000).astype(np.int64)
    right = left + rng.integers(-100, 100, size=9000)
    st = np.stack([left, right], axis=1)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        _, _, out = flac_decode(flac_encode(st, stereo_mode=mode))
        assert (out == st).all(), mode


def test_roundtrip_block_boundaries():
    rng = np.random.default_rng(7)
    for n in (1, 191, 192, 4095, 4096, 4097, 8192):
        s = rng.integers(-128, 128, size=n, dtype=np.int64)
        _, _, out = flac_decode(flac_encode(s, depth=8, block_size=4096))
        assert (out[:, 0] == s).all(), n


def test_compression_on_predictable_signal():
    s = (np.sin(np.arange(50000) / 40) * 25000).astype(np.int64)
    enc = flac_encode(s, depth=16)
    assert len(enc) < 0.3 * 2 * len(s)  # raw would be 2 bytes/sample


def test_multichannel_independent():
    rng = np.random.default_rng(8)
    s = rng.integers(-2000, 2000, size=(3000, 4), dtype=np.int64)
    _, _, out = flac_decode(flac_encode(s))
    assert (out == s).all()


# --- LPC decode via a spec-transcribed frame builder --------------------------


def _build_lpc_stream(samples: np.ndarray, coefs: list[int], shift: int, prec: int) -> bytes:
    """Hand-assemble a one-frame FLAC stream whose single subframe is LPC
    (RFC 9639 §4.2.3): warmup, 4-bit precision-1, 5-bit shift, quantized
    coefficients, Rice residuals. Residuals are computed HERE, independently
    of the decoder's reconstruction loop."""
    order = len(coefs)
    n = len(samples)
    depth = 16
    res = np.empty(n - order, dtype=np.int64)
    for i in range(order, n):
        pred = sum(c * int(samples[i - 1 - j]) for j, c in enumerate(coefs))
        res[i - order] = int(samples[i]) - (pred >> shift)

    info = _BitWriter()
    info.write(n, 16)
    info.write(n, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(8000, 20)
    info.write(0, 3)  # 1 channel
    info.write(depth - 1, 5)
    info.write(n, 36)
    info.align()
    header = b"fLaC" + bytes([0x80, 0, 0, 34]) + info.bytes() + b"\x00" * 16

    fw = _BitWriter()
    fw.write(0b11111111111110, 14)
    fw.write(0, 2)
    fw.write(0b0111, 4)  # 16-bit block size follows
    fw.write(0b0100, 4)  # 8000 Hz
    fw.write(0, 4)  # 1 channel independent
    fw.write(0b100, 3)  # 16-bit samples
    fw.write(0, 1)
    fw.align()
    head = fw.bytes() + _encode_coded_number(0) + struct.pack(">H", n - 1)
    head += bytes([crc8(head)])

    body = _BitWriter()
    body.write(0, 1)
    body.write(32 | (order - 1), 6)  # LPC subframe type
    body.write(0, 1)  # no wasted bits
    for v in samples[:order]:
        body.write(int(v), depth)
    body.write(prec - 1, 4)
    body.write(shift, 5)
    for c in coefs:
        body.write(c, prec)
    _write_residuals(body, res, n, order, 0)
    body.align()
    frame = head + body.bytes()
    return header + frame + struct.pack(">H", crc16(frame))


def test_lpc_subframe_decode():
    rng = np.random.default_rng(9)
    # a stable-ish AR(2) signal so residuals stay small, plus noise
    n = 600
    s = np.zeros(n, dtype=np.int64)
    s[0], s[1] = 100, 120
    for i in range(2, n):
        s[i] = (3 * s[i - 1] - s[i - 2]) // 2 + int(rng.integers(-50, 50))
        s[i] = max(-30000, min(30000, s[i]))
    for coefs, shift, prec in ([[3, -1], 1, 4], [[205, -103], 7, 9], [[512], 9, 11]):
        stream = _build_lpc_stream(s, coefs, shift, prec)
        _, _, out = flac_decode(stream)
        assert (out[:, 0] == s).all(), (coefs, shift, prec)


# --- integrity + rejection ----------------------------------------------------


def test_crc_and_md5_detect_corruption():
    rng = np.random.default_rng(10)
    s = rng.integers(-128, 128, size=1000, dtype=np.int64)
    enc = bytearray(flac_encode(s, depth=8))
    # corrupt the frame footer CRC-16
    bad = bytearray(enc)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-16"):
        flac_decode(bytes(bad))
    # corrupt a byte inside the frame header (after STREAMINFO = 4+4+34+…)
    bad = bytearray(enc)
    bad[4 + 4 + 34 + 2] ^= 0x01  # frame header byte → CRC-8 or sync breaks
    with pytest.raises(ValueError):
        flac_decode(bytes(bad))
    # corrupt the STREAMINFO MD5 → decoded-sample MD5 mismatch
    bad = bytearray(enc)
    bad[4 + 4 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        flac_decode(bytes(bad))
    # verify_md5=False skips that check
    sr, d, out = flac_decode(bytes(bad), verify_md5=False)
    assert (out[:, 0] == s).all()


def test_rejects_malformed():
    with pytest.raises(ValueError):
        flac_decode(b"not flac")
    with pytest.raises(ValueError):
        flac_decode(b"fLaC")  # no metadata
    good = flac_encode(np.arange(100, dtype=np.int64))
    with pytest.raises(ValueError):
        flac_decode(good[:40])  # truncated
    with pytest.raises(ValueError):
        flac_encode(np.array([40000], dtype=np.int64), depth=16)  # out of range


def test_decode_media_flac_arm(spark):
    """The one decode seam routes fLaC signatures to the real decoder and
    emits the same 16-bin pooled features as the RIFF arm."""
    import pandas as pd

    from duckdb_ml_spark.operators.multimodal import _DECODE_DIM, decode_media

    rng = np.random.default_rng(12)
    pcm = rng.integers(-128, 128, size=400, dtype=np.int64)
    payload = flac_encode(pcm, depth=8, block_size=192)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "media": [payload]}))
    row = decode_media(df, fake=None).collect()[0]
    cut = (np.arange(_DECODE_DIM + 1) * len(pcm)) // _DECODE_DIM
    want = np.array(
        [pcm[cut[k] : cut[k + 1]].astype(np.float64).mean() for k in range(_DECODE_DIM)]
    )
    want = (want / 32768.0).astype(np.float32)
    assert row.n_bytes == len(payload)
    assert np.array_equal(np.array(row.features, dtype=np.float32), want)


def test_encoder_range_and_shape_validation():
    with pytest.raises(ValueError):
        flac_encode(np.zeros((0,), dtype=np.int64))
    with pytest.raises(ValueError):
        flac_encode(np.zeros((10, 9), dtype=np.int64))  # 9 channels
    with pytest.raises(ValueError):
        flac_encode(np.zeros((10, 3), dtype=np.int64), stereo_mode="mid_side")
