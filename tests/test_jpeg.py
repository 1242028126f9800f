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
    encode_jpeg_progressive,
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


def test_invalid_progressive_header_raises():
    # flipping a baseline SOF0 to SOF2 yields an ILLEGAL progressive
    # stream (its SOS covers Ss=0..Se=63, which progressive forbids);
    # the decoder must refuse rather than misread it
    px = _smooth(8, 8)
    payload = bytearray(encode_jpeg(px))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive DC scan"):
        decode_jpeg(bytes(payload))


def test_arithmetic_sof_raises():
    px = _smooth(8, 8)
    payload = bytearray(encode_jpeg(px))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC9  # SOF9: arithmetic sequential
    with pytest.raises(NotImplementedError, match="arithmetic"):
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


# --------------------------------------------------------------------------
# Progressive (SOF2): spectral selection + successive approximation
# --------------------------------------------------------------------------

def _textured(h: int, w: int, seed: int = 7, gray: bool = False) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (127 + 60 * np.sin(xx / 5.0) + 50 * np.cos(yy / 7.0)).clip(0, 255)
    if gray:
        return (base + rng.integers(-20, 20, base.shape)).clip(0, 255).astype(np.uint8)
    px = np.stack([base, np.roll(base, 3, 0), np.roll(base, 5, 1)], axis=-1)
    return (px + rng.integers(-20, 20, px.shape)).clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize(
    "shape,sub,quality",
    [
        ((24, 40, 3), "444", 90),
        ((24, 40, 3), "420", 90),
        ((17, 31, 3), "444", 50),  # odd dims exercise padding + comp grids
        ((17, 31, 3), "420", 50),  # 420 comp grid != MCU-padded grid
        ((16, 16), "444", 90),     # grayscale
        ((9, 13), "444", 75),
    ],
)
def test_progressive_decodes_identical_to_baseline_twin(shape, sub, quality):
    # same quant tables + same DCT => a progressive encode must decode
    # to EXACTLY the coefficients of its baseline twin, hence identical
    # pixels -- the strongest possible cross-check of both new halves
    px = _textured(*shape[:2], gray=len(shape) == 2)
    base = decode_jpeg(encode_jpeg(px, quality=quality, subsampling=sub))
    prog_payload = encode_jpeg_progressive(px, quality=quality, subsampling=sub)
    assert b"\xff\xc2" in prog_payload  # really SOF2
    prog = decode_jpeg(prog_payload)
    assert base[0] == prog[0] and base[1] == prog[1]
    assert np.array_equal(base[2], prog[2])


def test_progressive_coefficient_fuzz_eobruns_and_refinement():
    # Coefficient-level fuzz of the progressive AC codec: sparse random
    # zigzag blocks force long EOB runs (many all-zero bands), ZRL
    # inside refinement (gaps > 16 before a newly-nonzero +/-1), and
    # correction-bit buffering across blocks.  Encode DC+AC at Al=1
    # then refine to Al=0; decode must reproduce the blocks exactly.
    from uofi_payroll_etl_main_spark.llm.jpeg import (
        _AC_PROG_BITS,
        _AC_PROG_SYMBOLS,
        _BitReader,
        _BitWriter,
        _DC_BITS,
        _DC_SYMBOLS,
        _ProgEncState,
        _ScanState,
        _decode_block_prog,
        _emit_eobrun,
        _encode_ac_first,
        _encode_ac_refine,
        _encode_dc_first,
        _encode_dc_refine,
    )

    rng = np.random.default_rng(13)
    blocks = []
    for i in range(120):
        zz = np.zeros(64, dtype=np.int32)
        zz[0] = int(rng.integers(-300, 300))
        density = rng.choice([0, 1, 2, 5, 12])
        for _ in range(density):
            k = int(rng.integers(1, 64))
            zz[k] = int(rng.integers(-40, 40))
        if i % 7 == 0:  # isolated late +/-1: ZRL-in-refinement bait
            zz[1:] = 0
            zz[int(rng.integers(40, 64))] = int(rng.choice([-1, 1]))
        blocks.append(zz)

    def dec_table(bits, symbols):
        table, code, k = {}, 0, 0
        for li, cnt in enumerate(bits):
            for _ in range(cnt):
                table[(li + 1, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        return table

    dc_t = dec_table(_DC_BITS, _DC_SYMBOLS)
    ac_t = dec_table(_AC_PROG_BITS, _AC_PROG_SYMBOLS)

    scans = []  # (ss, se, ah, al) in a legal progression
    scans.append((0, 0, 0, 1))   # DC first
    scans.append((1, 20, 0, 1))  # AC first, low band
    scans.append((21, 63, 0, 1)) # AC first, high band
    scans.append((0, 0, 1, 0))   # DC refine
    scans.append((1, 63, 1, 0))  # AC refine, full band

    payloads = []
    for ss, se, ah, al in scans:
        bw = _BitWriter()
        st = _ProgEncState()
        pred = 0
        for zz in blocks:
            if ss == 0 and ah == 0:
                pred = _encode_dc_first(bw, zz, al, pred)
            elif ss == 0:
                _encode_dc_refine(bw, zz, al)
            elif ah == 0:
                _encode_ac_first(bw, zz, ss, se, al, st)
            else:
                _encode_ac_refine(bw, zz, ss, se, al, st)
        _emit_eobrun(bw, st)
        bw.pad_to_byte()
        payloads.append(bytes(bw.buf) + b"\xff\xd9")

    out = [np.zeros(64, dtype=np.int32) for _ in blocks]
    for (ss, se, ah, al), payload in zip(scans, payloads):
        br = _BitReader(payload, 0)
        st = _ScanState(1)
        for zz in out:
            _decode_block_prog(br, zz, 0, dc_t, ac_t, ss, se, ah, al, st)

    for i, (want, got) in enumerate(zip(blocks, out)):
        assert np.array_equal(want, got), (i, want.tolist(), got.tolist())


def test_progressive_through_decode_media_and_synth_rotation():
    from uofi_payroll_etl_main_spark.llm.jpeg import encode_jpeg_progressive as ejp

    px = _textured(12, 18)
    d = decode_media(ejp(px, quality=92), "image")
    assert (d["width"], d["height"]) == (18, 12)
    assert d["pixels"].shape == (12, 18, 3)


@pytest.mark.parametrize("sub,ri", [("444", 1), ("444", 3), ("420", 2)])
def test_progressive_restart_markers(sub, ri):
    # restart markers inside PROGRESSIVE scans: entropy state (DC
    # predictors AND EOB runs / correction-bit buffers) must reset at
    # every RSTn in every scan of the script
    px = _textured(24, 40, seed=3)
    ref = decode_jpeg(encode_jpeg(px, quality=85, subsampling=sub))[2]
    payload = encode_jpeg_progressive(
        px, quality=85, subsampling=sub, restart_interval=ri
    )
    assert b"\xff\xdd" in payload and b"\xff\xd0" in payload
    assert np.array_equal(decode_jpeg(payload)[2], ref)
