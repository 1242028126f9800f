"""Baseline JPEG codec -- pure Python + numpy, no third-party imaging libs.

Closes the multimodal codec gap (reference scope: multimodal payloads are
opaque binary; this repo's beyond-reference multimodal path decodes them
for real -- see llm/multimodal.py).  Real corpora are JPEG-first, so the
decode kernel must speak it without PIL.

Scope (ITU-T T.81, Huffman entropy coding):
  decoder -- baseline sequential (SOF0/SOF1, single- or multi-scan) AND
    progressive (SOF2: spectral selection + successive approximation,
    EOB runs, AC/DC refinement scans per G.1.2), 8-bit samples, 1 or 3
    components, arbitrary DQT/DHT tables as declared in the file,
    arbitrary integer sampling factors (4:4:4 / 4:2:0 / 4:2:2 ...),
    restart markers (DRI/RSTn).  Arithmetic coding, 12-bit, lossless,
    and hierarchical modes raise NotImplementedError -- swap in PIL at
    deployment for those; `decode_media` dispatch is unchanged.
  encoders -- used by synth_media and the tests to produce conforming
    files: baseline (4:4:4 or 4:2:0, optional grayscale, optional
    restart interval) and progressive (fixed 4-phase scan script, see
    encode_jpeg_progressive), IJG-style quality scaling of the Annex-K
    quantization tables.  Huffman tables are self-built canonical
    tables carried in DHT (any conforming decoder reads them from the
    file; the spec does not require the Annex-K defaults).

The DCT is an exact orthonormal 8x8 DCT-II via one numpy matmul per
block batch; entropy coding is the only per-symbol Python loop (inherent
to Huffman).  Both halves run inside Arrow-batched `mapInPandas` workers
(llm/multimodal.py), so per-executor throughput is the only concern and
batches amortize the Python overhead.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "encode_jpeg_progressive", "decode_jpeg"]


# --------------------------------------------------------------------------
# Constant tables
# --------------------------------------------------------------------------

def _zigzag_order() -> np.ndarray:
    """Raster index of the k-th zigzag element, derived from the spec's
    diagonal walk (up-right on even anti-diagonals) rather than typed in."""
    out = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            ij.reverse()  # even diagonals walk bottom-left -> top-right
        out.extend(8 * i + j for i, j in ij)
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag_order()

# Annex K.1/K.2 quantization tables (raster order here; DQT carries
# them in zigzag order per the spec).
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)


def _quality_table(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 -> table as-is, 100 -> all ones."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# Orthonormal 8x8 DCT-II matrix: forward coeffs = D @ block @ D.T,
# inverse block = D.T @ coeffs @ D.
_K = np.arange(8, dtype=np.float64)
_DCT = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) * 0.5
_DCT[0, :] *= 1 / np.sqrt(2)


# Self-built canonical Huffman tables (carried in DHT, so any decoder
# reads them from the file).  DC: 12 category symbols, all 4-bit codes
# 0..11 (the all-ones 4-bit code stays unused per Annex C).  AC: EOB,
# ZRL, and (run 0..15, size 1..10), all 8-bit codes 0..161.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_BITS = [0] * 16
_DC_BITS[3] = 12  # twelve codes of length 4 (index 3 = length 4)
_AC_BITS = [0] * 16
_AC_BITS[7] = 162  # all codes length 8


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length_idx, count in enumerate(bits):
        for _ in range(count):
            out[symbols[k]] = (code, length_idx + 1)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_SYMBOLS)

# Progressive AC table: adds the EOB-run symbols (r<<4 for r=1..14,
# EOBn codes runs of 2^r..2^(r+1)-1 end-of-band blocks) the baseline
# table never needs.  176 codes, all length 8 (max code 175 < 255, so
# the all-ones code stays unused per Annex C).
_AC_PROG_SYMBOLS = (
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_AC_PROG_BITS = [0] * 16
_AC_PROG_BITS[7] = len(_AC_PROG_SYMBOLS)
_AC_PROG_ENC = _canonical_codes(_AC_PROG_BITS, _AC_PROG_SYMBOLS)


# --------------------------------------------------------------------------
# Color transforms (JFIF / BT.601 full range)
# --------------------------------------------------------------------------

def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Bit IO (0xFF byte stuffing per F.1.2.3)
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # stuffing
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-fill

    def marker(self, byte: int) -> None:
        self.pad_to_byte()
        self.buf += bytes([0xFF, byte])


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                raise ValueError(
                    f"marker 0xFF{nxt:02X} inside entropy segment (truncated scan?)"
                )
            self.pos += 2  # consume the stuffed zero
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy segment")

    def receive_extend(self, size: int) -> int:
        v = self.bits(size)
        return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

    def sync_restart(self, expect_m: int) -> None:
        """Byte-align and consume the RSTm marker between restart runs."""
        self.acc = 0
        self.n = 0
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + expect_m:
            raise ValueError(
                f"expected RST{expect_m} at offset {self.pos}, found "
                f"{self.data[self.pos:self.pos + 2].hex()}"
            )
        self.pos += 2


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------

def _pad_replicate(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult_y
    pw = (-w) % mult_x
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _component_blocks(plane: np.ndarray, qzz: np.ndarray) -> np.ndarray:
    """Level-shift, 8x8 block, DCT, zigzag, quantize.  plane dims must be
    multiples of 8.  Returns (rows/8, cols/8, 64) int32 zigzag coeffs."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    coef = _DCT @ blocks @ _DCT.T
    zz = coef.reshape(h // 8, w // 8, 64)[..., ZIGZAG]
    q = np.rint(zz / qzz).astype(np.int32)
    # Baseline AC categories stop at size 10 (|v| <= 1023); DC diffs are
    # provably within size 11.  Clamp the (pathological-input-only) AC tail.
    q[..., 1:] = np.clip(q[..., 1:], -1023, 1023)
    return q


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int) -> int:
    dc = int(zz[0])
    diff = dc - pred
    size = abs(diff).bit_length()
    code, length = _DC_ENC[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    k = 1
    while k <= last:
        run = 0
        while int(zz[k]) == 0:
            run += 1
            k += 1
        while run >= 16:
            c, ln = _AC_ENC[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        v = int(zz[k])
        size = abs(v).bit_length()
        c, ln = _AC_ENC[(run << 4) | size]
        bw.write(c, ln)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        k += 1
    if last < 63:
        c, ln = _AC_ENC[0x00]  # EOB
        bw.write(c, ln)
    return dc


def _dht_segment(tc: int, th: int, bits: list[int], symbols: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, qzz: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(v) for v in qzz)
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB -- or (h, w) / (h, w, 1) grayscale --
    as a baseline sequential JPEG.

    subsampling: "444" (no chroma subsampling) or "420" (2x2 chroma
    average).  restart_interval > 0 emits DRI + RSTn markers every that
    many MCUs (exercises the decoder's restart path; required for
    error-resilient streams)."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2 or px.shape[2] == 1
    if gray:
        planes = [px.reshape(px.shape[0], px.shape[1]).astype(np.float64)]
        samplings = [(1, 1)]
        quants = [0]
    else:
        ycc = _rgb_to_ycbcr(px)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsampling == "444":
            planes = [y, cb, cr]
            samplings = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            y = _pad_replicate(y, 16, 16)
            cb = _pad_replicate(cb, 16, 16)
            cr = _pad_replicate(cr, 16, 16)
            cb = (cb[0::2, 0::2] + cb[1::2, 0::2] + cb[0::2, 1::2] + cb[1::2, 1::2]) / 4
            cr = (cr[0::2, 0::2] + cr[1::2, 0::2] + cr[0::2, 1::2] + cr[1::2, 1::2]) / 4
            planes = [y, cb, cr]
            samplings = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
        quants = [0, 1, 1]
    h, w = px.shape[0], px.shape[1]
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    qzz_tables = {
        0: _quality_table(_QUANT_LUMA, quality)[ZIGZAG].astype(np.float64),
    }
    if not gray:
        qzz_tables[1] = _quality_table(_QUANT_CHROMA, quality)[ZIGZAG].astype(np.float64)

    comp_blocks = []
    for plane, (sh, sv), tq in zip(planes, samplings, quants):
        padded = _pad_replicate(plane, mcuy * sv * 8, mcux * sh * 8)
        padded = padded[: mcuy * sv * 8, : mcux * sh * 8]
        comp_blocks.append(_component_blocks(padded, qzz_tables[tq]))

    out = bytearray(b"\xff\xd8")  # SOI
    out += (  # APP0 / JFIF 1.1
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    for tq, qzz in qzz_tables.items():
        out += _dqt_segment(tq, qzz)
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i, ((sh, sv), tq) in enumerate(zip(samplings, quants)):
        sof += bytes([i + 1, (sh << 4) | sv, tq])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_BITS, _DC_SYMBOLS)
    out += _dht_segment(1, 0, _AC_BITS, _AC_SYMBOLS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci, (sh, sv) in enumerate(samplings):
                for by in range(sv):
                    for bx in range(sh):
                        zz = comp_blocks[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(bw, zz, preds[ci])
            mcu_i += 1
    bw.pad_to_byte()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def _decode_block_seq(
    br: _BitReader,
    zz: np.ndarray,
    dc_table: dict[tuple[int, int], int],
    ac_table: dict[tuple[int, int], int],
    pred: int,
) -> int:
    """Sequential full-band block decode into `zz` (a 64-coef view);
    returns the new DC predictor."""
    size = br.huff(dc_table)
    diff = br.receive_extend(size) if size else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = br.huff(ac_table)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = br.receive_extend(size)
        k += 1
    return pred


class _ScanState:
    """Mutable per-scan entropy state: DC predictors and the shared
    AC end-of-band run counter (progressive scans)."""

    def __init__(self, ncomp: int) -> None:
        self.preds = [0] * ncomp
        self.eobrun = 0

    def reset(self) -> None:
        self.preds = [0] * len(self.preds)
        self.eobrun = 0


def _decode_block_prog(
    br: _BitReader,
    zz: np.ndarray,
    ci: int,
    dc_t,
    ac_t,
    ss: int,
    se: int,
    ah: int,
    al: int,
    st: _ScanState,
) -> None:
    """Progressive block decode (T.81 G.1.2): one of the four scan
    kinds -- DC first / DC refine / AC first / AC refine -- into the
    64-coef zigzag view `zz`."""
    if ss == 0:
        if ah == 0:  # DC first: diff-coded (value >> Al)
            size = br.huff(dc_t)
            diff = br.receive_extend(size) if size else 0
            st.preds[ci] += diff
            zz[0] = st.preds[ci] << al
        else:  # DC refine: one raw bit per block
            if br.bits(1):
                zz[0] |= 1 << al
        return
    if ah == 0:  # AC first pass (EOB-run coded)
        if st.eobrun > 0:
            st.eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = br.huff(ac_t)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    st.eobrun = (1 << r) - 1
                    if r:
                        st.eobrun += br.bits(r)
                    return  # current block ends here
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC run past end of band")
            zz[k] = br.receive_extend(s) << al
            k += 1
        return
    # AC refinement pass: append one magnitude bit to already-nonzero
    # coefficients, insert newly-nonzero +/-1 values (G.1.2.3)
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if st.eobrun == 0:
        while k <= se:
            rs = br.huff(ac_t)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s:
                if s != 1:
                    raise ValueError("AC refinement size must be 1")
                val = p1 if br.bits(1) else m1
            else:
                if r != 15:
                    st.eobrun = 1 << r
                    if r:
                        st.eobrun += br.bits(r)
                    break  # tail loop below handles this block's rest
                # r == 15: skip 16 zero-history coefficients
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    if br.bits(1) and not (c & p1):
                        zz[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if st.eobrun > 0:
        while k <= se:
            c = int(zz[k])
            if c != 0 and br.bits(1) and not (c & p1):
                zz[k] = c + (p1 if c >= 0 else m1)
            k += 1
        st.eobrun -= 1


def _decode_scan(
    payload: bytes,
    start: int,
    comps: list,
    grids: list,
    mcux: int,
    mcuy: int,
    scan_comps: list,
    ss: int,
    se: int,
    ah: int,
    al: int,
    coefs: list,
    htabs: dict,
    dri: int,
    progressive: bool,
) -> int:
    """Decode one scan's entropy segment; returns the payload offset of
    the next marker.  Handles interleaved (MCU-ordered) and
    non-interleaved (single-component block-raster) scans, restart
    markers, and both sequential and progressive block coding."""
    br = _BitReader(payload, start)
    st = _ScanState(len(comps))
    rst = 0
    needs_dc = ss == 0
    needs_ac = se > 0
    tables = []
    for ci, dc_id, ac_id in scan_comps:
        dc_t = htabs.get((0, dc_id))
        ac_t = htabs.get((1, ac_id))
        if (needs_dc and ah == 0 and dc_t is None) or (needs_ac and ac_t is None):
            raise ValueError("scan references undefined Huffman table")
        tables.append((ci, dc_t, ac_t))

    def decode_one(ci, dc_t, ac_t, zz):
        if progressive:
            _decode_block_prog(br, zz, ci, dc_t, ac_t, ss, se, ah, al, st)
        else:
            st.preds[ci] = _decode_block_seq(br, zz, dc_t, ac_t, st.preds[ci])

    if len(scan_comps) > 1:  # interleaved: MCU order
        n_units = mcux * mcuy
    else:  # non-interleaved: the component's own block grid
        ci0 = scan_comps[0][0]
        gh, gw = grids[ci0]
        n_units = gh * gw

    for unit in range(n_units):
        if dri and unit and unit % dri == 0:
            br.sync_restart(rst)
            rst = (rst + 1) % 8
            st.reset()
        if len(scan_comps) > 1:
            my, mx = divmod(unit, mcux)
            for (ci, dc_t, ac_t) in tables:
                _, sh, sv, _ = comps[ci]
                for by in range(sv):
                    for bx in range(sh):
                        decode_one(
                            ci, dc_t, ac_t, coefs[ci][my * sv + by, mx * sh + bx]
                        )
        else:
            ci, dc_t, ac_t = tables[0]
            gh, gw = grids[ci]
            by, bx = divmod(unit, gw)
            decode_one(ci, dc_t, ac_t, coefs[ci][by, bx])

    # advance to the next marker (skip pad bits / stuffed zeros)
    pos = br.pos
    while pos < len(payload) - 1 and not (
        payload[pos] == 0xFF and payload[pos + 1] != 0x00
    ):
        pos += 1
    return pos


def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a Huffman-coded JPEG -> (width, height, (h, w, 3) uint8
    RGB).  Baseline sequential (SOF0/SOF1, single- or multi-scan) and
    progressive (SOF2: spectral selection + successive approximation)
    are supported; grayscale replicates to 3 channels.  Arithmetic /
    12-bit / lossless / hierarchical streams raise NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    dri = 0
    frame = None  # (h, w, [(comp_id, sh, sv, tq), ...])
    progressive = False
    coefs = None
    grids = None
    hmax = vmax = mcux = mcuy = 0
    saw_scan = False

    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1  # tolerate fill bytes
            continue
        marker = payload[pos + 1]
        if marker in (0xFF, 0x00):
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST outside scan
            pos += 2
            continue
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        seg = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg, dtype=np.uint8, count=64, offset=p)
                    p += 64
                else:
                    vals = np.frombuffer(seg, dtype=">u2", count=64, offset=p)
                    p += 128
                qtabs[tq] = vals.astype(np.float64)  # zigzag order
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                p += 17
                nsym = sum(counts)
                symbols = list(seg[p : p + nsym])
                p += nsym
                table: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for li, cnt in enumerate(counts):
                    for _ in range(cnt):
                        table[(li + 1, code)] = symbols[k]
                        code += 1
                        k += 1
                    code <<= 1
                htabs[(tc, th)] = table
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision} unsupported")
            progressive = marker == 0xC2
            fh, fw, nc = struct.unpack_from(">HHB", seg, 1)
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF 0x{marker:02X} (arithmetic/lossless/hierarchical) "
                "unsupported: Huffman sequential + progressive only -- use PIL"
            )
        elif marker == 0xDD:  # DRI
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            fh, fw, comps = frame
            if coefs is None:
                # single-component frames ignore sampling factors
                if len(comps) == 1:
                    comps = [(comps[0][0], 1, 1, comps[0][3])]
                    frame = (fh, fw, comps)
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-fw // (8 * hmax))
                mcuy = -(-fh // (8 * vmax))
                coefs = [
                    np.zeros((mcuy * c[2], mcux * c[1], 64), dtype=np.int32)
                    for c in comps
                ]
                # non-interleaved scans cover the component's OWN grid
                # (ceil of its scaled size / 8), not the MCU-padded one
                grids = [
                    (
                        -(-(fh * c[2]) // (8 * vmax)),
                        -(-(fw * c[1]) // (8 * hmax)),
                    )
                    for c in comps
                ]
            ns = seg[0]
            comp_ids = [c[0] for c in comps]
            scan_comps = []
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((comp_ids.index(cid), tabs >> 4, tabs & 0x0F))
            ss, se, ahl = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahl >> 4, ahl & 0x0F
            if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError("sequential scan must cover the full band")
            if progressive:
                if ss == 0 and se != 0:
                    raise ValueError(
                        "progressive DC scan must have Se=0 (spectral "
                        "selection cannot mix DC and AC)"
                    )
                if ss > 0 and (len(scan_comps) > 1 or se < ss or se > 63):
                    raise ValueError("progressive AC scan must be a single "
                                     "component with Ss<=Se<=63")
            pos = _decode_scan(
                payload, pos + 2 + ln, comps, grids, mcux, mcuy,
                scan_comps, ss, se, ah, al, coefs, htabs, dri, progressive,
            )
            saw_scan = True
            continue
        pos += 2 + ln

    if frame is None or not saw_scan:
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps = frame

    planes = []
    for (cid, sh, sv, tq), cz in zip(comps, coefs):
        q = qtabs.get(tq)
        if q is None:
            raise ValueError(f"component {cid} references undefined quant table {tq}")
        deq = cz.astype(np.float64) * q  # still zigzag order
        raster = np.zeros_like(deq)
        raster[..., ZIGZAG] = deq
        blocks = raster.reshape(cz.shape[0], cz.shape[1], 8, 8)
        spatial = _DCT.T @ blocks @ _DCT + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(cz.shape[0] * 8, cz.shape[1] * 8)
        if vmax % sv or hmax % sh:
            raise NotImplementedError(
                f"non-integer chroma upsampling ratio ({hmax}/{sh}, {vmax}/{sv}) "
                "unsupported"
            )
        plane = np.repeat(np.repeat(plane, vmax // sv, axis=0), hmax // sh, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        g = np.clip(planes[0], 0, 255).astype(np.uint8)
        return fw, fh, np.repeat(g[:, :, None], 3, axis=2)
    rgb = _ycbcr_to_rgb(planes[0], planes[1], planes[2])
    return fw, fh, rgb


# --------------------------------------------------------------------------
# Progressive encoder (T.81 G.1: spectral selection + successive
# approximation) -- produces conforming SOF2 streams so the decoder's
# progressive path is testable without third-party imaging libs.
# --------------------------------------------------------------------------

class _ProgEncState:
    """Cross-block AC state: pending end-of-band run and the refinement
    correction bits buffered with it (emitted after the EOBn symbol)."""

    def __init__(self) -> None:
        self.eobrun = 0
        self.bits: list[int] = []


def _emit_eobrun(bw: _BitWriter, st: _ProgEncState) -> None:
    if st.eobrun > 0:
        nbits = st.eobrun.bit_length() - 1
        code, ln = _AC_PROG_ENC[nbits << 4]
        bw.write(code, ln)
        if nbits:
            bw.write(st.eobrun & ((1 << nbits) - 1), nbits)
        st.eobrun = 0
    for b in st.bits:
        bw.write(b, 1)
    st.bits = []


def _encode_dc_first(bw: _BitWriter, zz: np.ndarray, al: int, pred: int) -> int:
    d = int(zz[0]) >> al  # DC point transform: arithmetic shift
    diff = d - pred
    size = abs(diff).bit_length()
    code, ln = _DC_ENC[size]
    bw.write(code, ln)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    return d


def _encode_dc_refine(bw: _BitWriter, zz: np.ndarray, al: int) -> None:
    bw.write((int(zz[0]) >> al) & 1, 1)


def _encode_ac_first(
    bw: _BitWriter, zz: np.ndarray, ss: int, se: int, al: int, st: _ProgEncState
) -> None:
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        if v >= 0:
            t = v >> al  # AC point transform truncates toward zero
            t2 = t
        else:
            t = (-v) >> al
            t2 = ~t  # low `size` bits encode the negative value
        if t == 0:
            r += 1
            continue
        _emit_eobrun(bw, st)
        while r > 15:
            code, ln = _AC_PROG_ENC[0xF0]
            bw.write(code, ln)
            r -= 16
        size = t.bit_length()
        code, ln = _AC_PROG_ENC[(r << 4) | size]
        bw.write(code, ln)
        bw.write(t2 & ((1 << size) - 1), size)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            _emit_eobrun(bw, st)


def _encode_ac_refine(
    bw: _BitWriter, zz: np.ndarray, ss: int, se: int, al: int, st: _ProgEncState
) -> None:
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1  # position of the last newly-nonzero coefficient
    for i, k in enumerate(range(ss, se + 1)):
        if absv[i] == 1:
            eob = k
    r = 0
    br: list[int] = []  # correction bits pending within this block
    for i, k in enumerate(range(ss, se + 1)):
        t = absv[i]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _emit_eobrun(bw, st)
            code, ln = _AC_PROG_ENC[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in br:
                bw.write(b, 1)
            br = []
        if t > 1:  # already nonzero: one correction bit, rides along
            br.append(t & 1)
            continue
        # newly nonzero (+/-1 at this precision): run + sign
        _emit_eobrun(bw, st)
        code, ln = _AC_PROG_ENC[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(zz[k]) >= 0 else 0, 1)
        for b in br:
            bw.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.bits.extend(br)
        if st.eobrun == 0x7FFF:
            _emit_eobrun(bw, st)


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB -- or (h, w) / (h, w, 1) grayscale --
    as a progressive (SOF2) JPEG with a fixed scan script exercising
    every progressive coding mode the decoder speaks:

      1. DC first pass, all components interleaved, Al=1
      2. per-component AC first passes with spectral selection
         (luma split 1-5 / 6-63; chroma 1-63), Al=1
      3. DC refinement (Ah=1 -> Al=0), interleaved
      4. per-component AC refinement 1-63 (Ah=1 -> Al=0)

    Output decodes bit-exactly to the same coefficients a baseline
    encode of the same input produces (same quant tables, same DCT),
    which is what the round-trip pytest asserts."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2 or px.shape[2] == 1
    if gray:
        planes = [px.reshape(px.shape[0], px.shape[1]).astype(np.float64)]
        samplings = [(1, 1)]
        quants = [0]
    else:
        ycc = _rgb_to_ycbcr(px)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsampling == "444":
            planes = [y, cb, cr]
            samplings = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            y = _pad_replicate(y, 16, 16)
            cb = _pad_replicate(cb, 16, 16)
            cr = _pad_replicate(cr, 16, 16)
            cb = (cb[0::2, 0::2] + cb[1::2, 0::2] + cb[0::2, 1::2] + cb[1::2, 1::2]) / 4
            cr = (cr[0::2, 0::2] + cr[1::2, 0::2] + cr[0::2, 1::2] + cr[1::2, 1::2]) / 4
            planes = [y, cb, cr]
            samplings = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
        quants = [0, 1, 1]
    h, w = px.shape[0], px.shape[1]
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    qzz_tables = {0: _quality_table(_QUANT_LUMA, quality)[ZIGZAG].astype(np.float64)}
    if not gray:
        qzz_tables[1] = _quality_table(_QUANT_CHROMA, quality)[ZIGZAG].astype(np.float64)

    comp_blocks = []
    grids = []
    for plane, (sh, sv), tq in zip(planes, samplings, quants):
        padded = _pad_replicate(plane, mcuy * sv * 8, mcux * sh * 8)
        padded = padded[: mcuy * sv * 8, : mcux * sh * 8]
        comp_blocks.append(_component_blocks(padded, qzz_tables[tq]))
        # non-interleaved scans cover the component's own grid only
        grids.append((-(-(h * sv) // (8 * vmax)), -(-(w * sh) // (8 * hmax))))

    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    for tq, qzz in qzz_tables.items():
        out += _dqt_segment(tq, qzz)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i, ((sh, sv), tq) in enumerate(zip(samplings, quants)):
        sof += bytes([i + 1, (sh << 4) | sv, tq])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2
    out += _dht_segment(0, 0, _DC_BITS, _DC_SYMBOLS)
    out += _dht_segment(1, 0, _AC_PROG_BITS, _AC_PROG_SYMBOLS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def sos_header(comp_idxs, ss, se, ah, al):
        seg = bytes([len(comp_idxs)])
        for ci in comp_idxs:
            seg += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(seg) + 2) + seg

    def run_scan(comp_idxs, ss, se, ah, al):
        """Emit one scan's entropy data, inserting RSTn every
        `restart_interval` units (MCUs when interleaved, blocks when
        non-interleaved) with full entropy-state reset, exactly the
        boundaries the decoder resynchronizes on."""
        bw = _BitWriter()
        st = _ProgEncState()
        preds = [0] * ncomp
        rst = 0
        unit = 0

        def maybe_restart():
            nonlocal rst, preds, st
            if restart_interval and unit and unit % restart_interval == 0:
                _emit_eobrun(bw, st)
                bw.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0] * ncomp
                st = _ProgEncState()

        if len(comp_idxs) > 1:  # interleaved: MCU order (DC scans)
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    for ci in comp_idxs:
                        sh, sv = samplings[ci]
                        for by in range(sv):
                            for bx in range(sh):
                                zz = comp_blocks[ci][my * sv + by, mx * sh + bx]
                                if ah == 0:
                                    preds[ci] = _encode_dc_first(bw, zz, al, preds[ci])
                                else:
                                    _encode_dc_refine(bw, zz, al)
                    unit += 1
        else:
            ci = comp_idxs[0]
            gh, gw = grids[ci]
            for by in range(gh):
                for bx in range(gw):
                    maybe_restart()
                    zz = comp_blocks[ci][by, bx]
                    if ss == 0:
                        if ah == 0:
                            preds[ci] = _encode_dc_first(bw, zz, al, preds[ci])
                        else:
                            _encode_dc_refine(bw, zz, al)
                    elif ah == 0:
                        _encode_ac_first(bw, zz, ss, se, al, st)
                    else:
                        _encode_ac_refine(bw, zz, ss, se, al, st)
                    unit += 1
        _emit_eobrun(bw, st)
        bw.pad_to_byte()
        return sos_header(comp_idxs, ss, se, ah, al) + bw.buf

    # scan script: DC first (interleaved, Al=1); per-component AC first
    # passes with spectral selection; DC refine; per-component AC refine
    all_comps = list(range(ncomp))
    out += run_scan(all_comps if ncomp > 1 else [0], 0, 0, 0, 1)
    for ci in range(ncomp):
        if ci == 0 and not gray:
            out += run_scan([ci], 1, 5, 0, 1)
            out += run_scan([ci], 6, 63, 0, 1)
        else:
            out += run_scan([ci], 1, 63, 0, 1)
    out += run_scan(all_comps if ncomp > 1 else [0], 0, 0, 1, 0)
    for ci in range(ncomp):
        out += run_scan([ci], 1, 63, 1, 0)

    out += b"\xff\xd9"
    return bytes(out)
