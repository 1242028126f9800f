"""Baseline JPEG codec (llm/jpeg.py).

Round-trips alone can hide symmetric bugs (a wrong zigzag on both
sides cancels), so this file also checks the decoder against a
HAND-BUILT bitstream (independent bit-level construction with its own
Huffman tables) and the building blocks against closed-form facts
(DCT orthonormality, spec zigzag prefix)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from uofi_payroll_etl_main_spark.llm.jpeg import (
    _DCT,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)
from uofi_payroll_etl_main_spark.llm.multimodal import decode_media


def _smooth(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([40 + y * 3, 30 + x * 2, 60 + x + y], axis=-1).astype(np.uint8)


def test_zigzag_matches_spec_prefix():
    # first row of the T.81 figure A.6 scan order
    assert list(ZIGZAG[:16]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(ZIGZAG) == list(range(64))


def test_dct_matrix_is_orthonormal():
    assert np.allclose(_DCT @ _DCT.T, np.eye(8), atol=1e-12)


@pytest.mark.parametrize("quality,subsampling,tol", [(95, "444", 4), (95, "420", 6), (100, "444", 2)])
def test_roundtrip_smooth_image(quality, subsampling, tol):
    px = _smooth(24, 33)  # non-multiple-of-8/16 dims exercise padding+crop
    w, h, out = decode_jpeg(encode_jpeg(px, quality=quality, subsampling=subsampling))
    assert (w, h) == (33, 24)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= tol


def test_constant_color_is_lossless_even_at_low_quality():
    px = np.full((8, 8, 3), 130, np.uint8)
    _, _, out = decode_jpeg(encode_jpeg(px, quality=50))
    assert np.array_equal(out, px)


def test_grayscale_roundtrip():
    g = (np.mgrid[0:10, 0:13][0] * 7 + 30).astype(np.uint8)
    w, h, out = decode_jpeg(encode_jpeg(g, quality=95))
    assert (w, h) == (13, 10)
    assert out.shape == (10, 13, 3)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 2
    # gray replicates across channels
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


def test_restart_markers_do_not_change_pixels():
    px = _smooth(40, 24)
    plain = decode_jpeg(encode_jpeg(px, quality=90))[2]
    with_rst = encode_jpeg(px, quality=90, restart_interval=2)
    assert b"\xff\xdd" in with_rst  # DRI present
    assert b"\xff\xd0" in with_rst  # at least one RST0
    assert np.array_equal(decode_jpeg(with_rst)[2], plain)


def test_high_frequency_content_psnr():
    # the synthetic gradient wraps mod 256 -> hard edges; JPEG may ring
    # but must stay recognizable (PSNR) and dimensionally exact
    rng = np.mgrid[0:16, 0:16]
    px = ((rng[0] * 37 + rng[1] * 91) % 256).astype(np.uint8)
    px = np.stack([px, px[::-1], px.T], axis=-1)
    w, h, out = decode_jpeg(encode_jpeg(px, quality=95))
    assert (w, h) == (16, 16)
    mse = np.mean((out.astype(float) - px.astype(float)) ** 2)
    assert 10 * np.log10(255**2 / mse) > 25.0


def test_decode_media_dispatches_jpeg():
    px = _smooth(8, 9)
    got = decode_media(encode_jpeg(px, quality=95), "image")
    assert got["width"] == 9 and got["height"] == 8
    assert got["pixels"].shape == (8, 9, 3)
    assert np.abs(got["pixels"].astype(int) - px.astype(int)).max() <= 4


def test_progressive_sof_raises():
    px = _smooth(8, 8)
    payload = bytearray(encode_jpeg(px))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(payload))


def test_truncated_stream_raises_cleanly():
    px = _smooth(16, 16)
    payload = encode_jpeg(px, quality=90)
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(payload[: len(payload) // 2])


# --------------------------------------------------------------------------
# Decoder independence: a bitstream built BY HAND (own tables, own bit
# packing) must decode to closed-form pixel values.
# --------------------------------------------------------------------------

def _seg(marker: bytes, body: bytes) -> bytes:
    return marker + struct.pack(">H", len(body) + 2) + body


def _hand_built_gray(dc_diff_bits: str, quant_dc: int) -> bytes:
    """Single 8x8 grayscale JPEG, one DC coefficient, all-flat quant
    table.  Huffman tables chosen BY THE TEST: DC codes '0'->size 0,
    '10'->size 2; AC '0' -> EOB."""
    qzz = bytes([quant_dc]) + bytes([1] * 63)
    dqt = _seg(b"\xff\xdb", b"\x00" + qzz)
    sof = _seg(b"\xff\xc0", struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    # DC table 0: one 1-bit code (size 0), one 2-bit code (size 2)
    dc_counts = [1, 1] + [0] * 14
    dht_dc = _seg(b"\xff\xc4", bytes([0x00] + dc_counts) + bytes([0, 2]))
    # AC table 0: one 1-bit code -> EOB
    ac_counts = [1] + [0] * 15
    dht_ac = _seg(b"\xff\xc4", bytes([0x10] + ac_counts) + bytes([0x00]))
    sos = _seg(b"\xff\xda", bytes([1, 1, 0x00, 0, 63, 0]))
    bits = dc_diff_bits + "0"  # DC then EOB
    bits += "1" * ((8 - len(bits) % 8) % 8)
    entropy = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    return b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + entropy + b"\xff\xd9"


def test_hand_built_zero_dc_decodes_to_mid_gray():
    w, h, out = decode_jpeg(_hand_built_gray(dc_diff_bits="0", quant_dc=1))
    assert (w, h) == (8, 8)
    assert np.array_equal(out, np.full((8, 8, 3), 128, np.uint8))


def test_hand_built_nonzero_dc_closed_form():
    # '10' selects size 2; value bits '10' = 2 >= 2 -> diff = +2.
    # dequant DC = 2 * 16 = 32; orthonormal IDCT of a DC-only block is
    # constant 32/8 = 4 -> pixel 128 + 4 = 132 everywhere.
    w, h, out = decode_jpeg(_hand_built_gray(dc_diff_bits="10" + "10", quant_dc=16))
    assert np.array_equal(out, np.full((8, 8, 3), 132, np.uint8))


def test_hand_built_negative_dc_closed_form():
    # value bits '01' = 1 < 2 -> extend -> 1 - 4 + 1 = -2 -> pixel 124.
    w, h, out = decode_jpeg(_hand_built_gray(dc_diff_bits="10" + "01", quant_dc=16))
    assert np.array_equal(out, np.full((8, 8, 3), 124, np.uint8))


def test_encoder_emits_parseable_segments():
    payload = encode_jpeg(_smooth(12, 17), quality=85)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    # SOF dims match input
    i = payload.index(b"\xff\xc0")
    _, h, w, nc = struct.unpack_from(">BHHB", payload, i + 4)
    assert (h, w, nc) == (12, 17, 3)
    # two quant tables, two huffman tables, one scan
    assert payload.count(b"\xff\xdb") >= 2
    assert payload.count(b"\xff\xc4") >= 2
    assert payload.count(b"\xff\xda") == 1
