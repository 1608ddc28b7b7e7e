"""Baseline JPEG decoder: roundtrip against a minimal in-test encoder
(T.81 Annex K standard Huffman tables, flat quant tables) — the decoder
must reproduce the encoder's input within quantization error. No codec
library exists in the container, so the encoder lives here."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from apitap_spark.operators.jpeg_baseline import ZIGZAG, _C, decode_jpeg

# T.81 Annex K.3 standard Huffman tables (public constants)
DC_LUM_COUNTS = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
DC_LUM_SYMS = bytes(range(12))
AC_LUM_COUNTS = bytes(
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
)
AC_LUM_SYMS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def _encode_table(counts: bytes, syms: bytes) -> dict[int, tuple[int, int]]:
    """{symbol: (code, length)} canonical assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[syms[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


DC_TBL = _encode_table(DC_LUM_COUNTS, DC_LUM_SYMS)
AC_TBL = _encode_table(AC_LUM_COUNTS, AC_LUM_SYMS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(0b1, 1)  # pad with 1s per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _encode_block(bw: _BitWriter, coeff: np.ndarray, pred: list, ci: int):
    zz = [int(coeff.flat[ZIGZAG[k]]) for k in range(64)]
    diff = zz[0] - pred[ci]
    pred[ci] = zz[0]
    s, bits = _magnitude(diff)
    code, ln = DC_TBL[s]
    bw.write(code, ln)
    if s:
        bw.write(bits, s)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = AC_TBL[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s, bits = _magnitude(zz[k])
        code, ln = AC_TBL[(run << 4) | s]
        bw.write(code, ln)
        bw.write(bits, s)
        run = 0
    if last_nz < 63:
        code, ln = AC_TBL[0x00]  # EOB
        bw.write(code, ln)


def encode_jpeg(
    planes: list[np.ndarray], q: int = 16, wide_dqt: bool = False,
    restart: int = 0, subsample420: bool = False,
) -> bytes:
    """Minimal baseline encoder: one flat quant table, Annex K luma
    Huffman tables for all components. planes: full-res float arrays,
    already level-shifted (pixel - 128); dimensions must be multiples
    of 8 (of 16 with subsample420). subsample420 emits luma h=v=2 and
    2x2-mean-downsampled chroma (4:2:0 MCU order: 4 Y, 1 Cb, 1 Cr)."""
    if subsample420:
        assert len(planes) == 3
        h, w = planes[0].shape
        assert h % 16 == 0 and w % 16 == 0
        return _encode_420(planes, q)
    h, w = planes[0].shape
    qtab = np.full((8, 8), q, dtype=np.int32)
    out = bytearray(b"\xff\xd8")
    # DQT
    if wide_dqt:
        body = bytes([0x10]) + struct.pack(">64H", *[q] * 64)
    else:
        body = bytes([0x00]) + bytes([q] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    # SOF0
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT (DC class 0 id 0, AC class 1 id 0)
    dht = bytes([0x00]) + DC_LUM_COUNTS + DC_LUM_SYMS
    dht += bytes([0x10]) + AC_LUM_COUNTS + AC_LUM_SYMS
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    # SOS
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    bw = _BitWriter()
    pred = [0] * ncomp
    rst = 0
    mcu = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            if restart and mcu and mcu % restart == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * ncomp
            for ci, p in enumerate(planes):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coeff = np.rint((_C @ blk @ _C.T) / qtab)
                _encode_block(bw, coeff, pred, ci)
            mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _encode_420(planes, q):
    y, cb, cr = planes
    h, w = y.shape
    cbd = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    crd = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    qtab = np.full((8, 8), q, dtype=np.int32)
    out = bytearray(b"\xff\xd8")
    body = bytes([0x00]) + bytes([q] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + DC_LUM_COUNTS + DC_LUM_SYMS
    dht += bytes([0x10]) + AC_LUM_COUNTS + AC_LUM_SYMS
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    bw = _BitWriter()
    pred = [0, 0, 0]

    def emit(plane, by, bx, ci):
        blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
        coeff = np.rint((_C @ blk @ _C.T) / qtab)
        _encode_block(bw, coeff, pred, ci)

    for my in range(h // 16):
        for mx in range(w // 16):
            for sy in range(2):
                for sx in range(2):
                    emit(y, my * 2 + sy, mx * 2 + sx, 0)
            emit(cbd, my, mx, 1)
            emit(crd, my, mx, 2)
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def _gradient(h, w, seed=3):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = 96 + 48 * np.sin(xx / 5.0) + 32 * np.cos(yy / 7.0)
    img += rng.randint(-8, 9, size=(h, w))
    return np.clip(img, 0, 255).astype(np.float64)


def test_grayscale_roundtrip_within_quant_error():
    img = _gradient(16, 24)
    payload = encode_jpeg([img - 128], q=8)
    w, h, c, px = decode_jpeg(payload)
    assert (w, h, c) == (24, 16, 1)
    got = np.frombuffer(px, dtype=np.uint8).reshape(16, 24).astype(np.float64)
    err = np.abs(got - img)
    assert err.max() <= 16 and err.mean() <= 4


def test_color_roundtrip_and_ycbcr_conversion():
    h, w = 16, 16
    y = _gradient(h, w, seed=1)
    cb = np.full((h, w), 160.0)
    cr = np.full((h, w), 100.0)
    payload = encode_jpeg([y - 128, cb - 128, cr - 128], q=4)
    ww, hh, c, px = decode_jpeg(payload)
    assert (ww, hh, c) == (w, h, 3)
    rgb = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(np.float64)
    exp_r = y + 1.402 * (cr - 128)
    exp_b = y + 1.772 * (cb - 128)
    assert np.abs(rgb[..., 0] - np.clip(exp_r, 0, 255)).mean() <= 4
    assert np.abs(rgb[..., 2] - np.clip(exp_b, 0, 255)).mean() <= 4


def test_420_subsampled_roundtrip():
    h, w = 32, 32
    y = _gradient(h, w, seed=2)
    # chroma varies SLOWLY so 2x2 downsample + nearest upsample is
    # near-lossless and the roundtrip bound stays tight
    yy, xx = np.mgrid[0:h, 0:w]
    cb = 128 + 20 * np.sin(xx / 16.0)
    cr = 128 - 15 * np.cos(yy / 16.0)
    payload = encode_jpeg(
        [y - 128, cb - 128, cr - 128], q=4, subsample420=True
    )
    ww, hh, c, px = decode_jpeg(payload)
    assert (ww, hh, c) == (w, h, 3)
    rgb = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(np.float64)
    exp_g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    assert np.abs(rgb[..., 1] - np.clip(exp_g, 0, 255)).mean() <= 5


def test_16bit_dqt_and_restart_markers():
    img = _gradient(24, 16, seed=9)
    payload = encode_jpeg([img - 128], q=8, wide_dqt=True, restart=2)
    w, h, c, px = decode_jpeg(payload)
    assert (w, h, c) == (16, 24, 1)
    got = np.frombuffer(px, dtype=np.uint8).reshape(24, 16).astype(np.float64)
    assert np.abs(got - img).mean() <= 4


def test_unsupported_and_garbage_raise_cleanly():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # a BASELINE stream mislabeled SOF2 is malformed progressive (its
    # SOS says Ss=0, Se=63 — a DC scan can't span AC bands): must
    # raise at scan-header validation, never mis-decode
    img = _gradient(8, 8)
    payload = bytearray(encode_jpeg([img - 128]))
    payload[payload.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))


def test_decode_image_dispatches_jpeg():
    from apitap_spark.operators.multimodal import decode_image

    img = _gradient(8, 8, seed=5)
    payload = encode_jpeg([img - 128], q=8)
    w, h, c, px = decode_image(payload)
    assert (w, h, c) == (8, 8, 1)
    assert len(px) == 64


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400), st.integers(min_value=2, max_value=120))
def test_decoder_raises_cleanly_on_corrupt_jpeg(tail, flip_at):
    """Corrupt input must raise (ValueError/IndexError/struct.error) —
    never hang, never allocate a decode bomb, never return garbage
    silently after a structural error."""
    base = bytearray(encode_jpeg([_gradient(8, 8) - 128]) + tail)
    if flip_at < len(base):
        base[flip_at] ^= 0xFF
    try:
        w, h, c, px = decode_jpeg(bytes(base))
        assert len(px) == w * h * c  # if it decodes, shape is consistent
    except Exception:
        pass  # clean raise = per-row fallback path


def test_decode_bomb_header_rejected():
    import struct as _s

    import pytest as _pt

    payload = bytearray(encode_jpeg([_gradient(8, 8) - 128]))
    i = payload.index(b"\xff\xc0")
    payload[i + 5 : i + 9] = _s.pack(">HH", 65535, 65535)
    with _pt.raises(ValueError, match="implausible"):
        decode_jpeg(bytes(payload))


def test_bitreader_rst_resyncs_at_current_marker_not_next():
    """When read_bit lands on an RST marker mid-read (nonconforming pad
    before the marker), recovery must resume just past THAT marker —
    round-6 ADVICE: consuming the 0xFF before raising made sync_restart
    skip to the FOLLOWING restart marker, silently dropping a whole
    restart interval of MCUs."""
    from apitap_spark.operators.jpeg_baseline import _BitReader, _RestartHit

    #        entropy   RST0        interval-1 bytes   RST1
    data = b"\xab" + b"\xff\xd0" + b"\x12\x34" + b"\xff\xd1" + b"\x56"
    br = _BitReader(data, 0)
    for _ in range(8):
        br.read_bit()  # consumes 0xab
    with pytest.raises(_RestartHit):
        br.read_bit()  # hits FF D0
    br.sync_restart()
    assert br.pos == 3  # just past RST0 — NOT past RST1 (pos 7)
    assert br.read_bit() == 0  # 0x12's MSB: decoding resumes in-interval


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2 optional 0xFF fill bytes before a marker must not
    desync the segment parser (round-6 ADVICE: the fill byte itself was
    read as the marker and entropy bytes became a bogus seglen)."""
    img = _gradient(16, 16, seed=4)
    payload = encode_jpeg([img - 128], q=8)
    # inject fill bytes before the DQT (FFDB) and SOS (FFDA) markers
    padded = payload.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1).replace(
        b"\xff\xda", b"\xff\xff\xff\xff\xda", 1
    )
    w, h, c, px = decode_jpeg(padded)
    w0, h0, c0, px0 = decode_jpeg(payload)
    assert (w, h, c, px) == (w0, h0, c0, px0)


# --- progressive (SOF2) encoder + roundtrips --------------------------------
#
# A custom AC table for progressive scans: Annex K's AC table lacks the
# EOBn (r<<4, r>0) symbols progressive EOB runs need, so build a flat
# canonical table (every symbol at code length 9) covering all RS bytes
# the encoder can emit. The decoder builds tables from counts/symbols
# generically, so this also exercises non-Annex-K table handling.
AC_PROG_SYMS = bytes(
    sorted(
        {(r << 4) | s for r in range(16) for s in range(1, 11)}
        | {r << 4 for r in range(15)}  # EOB0..EOB14
        | {0xF0}  # ZRL
    )
)
AC_PROG_COUNTS = bytes([0] * 8 + [len(AC_PROG_SYMS)] + [0] * 7)  # all len 9
AC_PROG_TBL = _encode_table(AC_PROG_COUNTS, AC_PROG_SYMS)


def _pt(v: int, al: int) -> int:
    """AC point transform: divide by 2^al truncating toward ZERO."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


class _ACFirstWriter:
    """AC first scan (Ah=0) entropy writer with cross-block EOB runs."""

    def __init__(self, bw):
        self.bw = bw
        self.eobrun = 0

    def flush_eob(self):
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = AC_PROG_TBL[r << 4]
            self.bw.write(code, ln)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0

    def block(self, zz, ss, se, al):
        vals = [_pt(zz[k], al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eob()
            return
        self.flush_eob()
        run = 0
        for i in range(nz[-1] + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = AC_PROG_TBL[0xF0]
                self.bw.write(code, ln)
                run -= 16
            s, bits = _magnitude(v)
            code, ln = AC_PROG_TBL[(run << 4) | s]
            self.bw.write(code, ln)
            self.bw.write(bits, s)
            run = 0
        if nz[-1] < len(vals) - 1:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eob()


class _ACRefineWriter:
    """AC refinement scan (Ah=Al+1) writer: correction bits ride with
    the symbol (or EOBn) that closes their run — T.81 G.1.2.3 /
    the classic two-buffer formulation."""

    def __init__(self, bw):
        self.bw = bw
        self.eobrun = 0
        self.pending = []  # correction bits buffered with the EOB run

    def _emit_eobrun(self):
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = AC_PROG_TBL[r << 4]
            self.bw.write(code, ln)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []

    def flush(self):
        self._emit_eobrun()

    def block(self, zz, ss, se, al):
        absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
        signs = [zz[k] >= 0 for k in range(ss, se + 1)]
        newly = [i for i, a in enumerate(absv) if a == 1]
        eob = newly[-1] if newly else -1
        run = 0
        local: list[int] = []  # bits since the last emitted symbol
        for i, a in enumerate(absv):
            if a == 0:
                run += 1
                continue
            while run > 15 and i <= eob:
                self._emit_eobrun()
                code, ln = AC_PROG_TBL[0xF0]
                self.bw.write(code, ln)
                run -= 16
                for b in local:
                    self.bw.write(b, 1)
                local = []
            if a > 1:
                local.append(a & 1)  # history coeff: correction bit
                continue
            # newly nonzero (magnitude exactly 1 at this precision)
            self._emit_eobrun()
            code, ln = AC_PROG_TBL[(run << 4) | 1]
            self.bw.write(code, ln)
            self.bw.write(1 if signs[i] else 0, 1)
            run = 0
            for b in local:
                self.bw.write(b, 1)
            local = []
        if run > 0 or local:
            self.eobrun += 1
            self.pending.extend(local)
            if self.eobrun == 0x7FFF:
                self._emit_eobrun()


def encode_progressive(
    planes: list[np.ndarray], q: int = 16, successive: bool = True
) -> bytes:
    """Minimal SOF2 encoder (1x1 sampling, shared flat quant table):
    either the spectral-selection-only script (DC; AC 1-5; AC 6-63) or
    the full successive-approximation script (DC Al=1; AC bands Al=1;
    DC refine; AC 1-63 refine Al=0) — the shape libjpeg-style encoders
    emit, exercising every progressive decode path."""
    h, w = planes[0].shape
    assert h % 8 == 0 and w % 8 == 0
    ncomp = len(planes)
    qtab = np.full((8, 8), q, dtype=np.int32)
    coeffs = []
    for p in planes:
        rows = []
        for by in range(h // 8):
            row = []
            for bx in range(w // 8):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                cf = np.rint((_C @ blk @ _C.T) / qtab)
                row.append([int(cf.flat[ZIGZAG[k]]) for k in range(64)])
            rows.append(row)
        coeffs.append(rows)
    out = bytearray(b"\xff\xd8")
    body = bytes([0x00]) + bytes([q] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + DC_LUM_COUNTS + DC_LUM_SYMS
    dht += bytes([0x10]) + AC_PROG_COUNTS + AC_PROG_SYMS
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht

    def sos_header(comp_ids, ss, se, ah, al):
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    nby, nbx = h // 8, w // 8
    al1 = 1 if successive else 0

    # scan 1: DC first, interleaved over all components
    out += sos_header(list(range(1, ncomp + 1)), 0, 0, 0, al1)
    bw = _BitWriter()
    pred = [0] * ncomp
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(ncomp):
                v = coeffs[ci][by][bx][0] >> al1  # arithmetic shift
                s, bits = _magnitude(v - pred[ci])
                pred[ci] = v
                code, ln = DC_TBL[s]
                bw.write(code, ln)
                if s:
                    bw.write(bits, s)
    bw.flush()
    out += bw.out

    # AC first scans: per component, two spectral bands
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            out += sos_header([ci + 1], ss, se, 0, al1)
            bw = _BitWriter()
            wr = _ACFirstWriter(bw)
            for by in range(nby):
                for bx in range(nbx):
                    wr.block(coeffs[ci][by][bx], ss, se, al1)
            wr.flush_eob()
            bw.flush()
            out += bw.out

    if successive:
        # DC refinement (Ah=1, Al=0): one raw bit per block
        out += sos_header(list(range(1, ncomp + 1)), 0, 0, 1, 0)
        bw = _BitWriter()
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(ncomp):
                    bw.write(coeffs[ci][by][bx][0] & 1, 1)
        bw.flush()
        out += bw.out
        # AC refinement (Ah=1, Al=0) over the full 1-63 band per comp
        for ci in range(ncomp):
            out += sos_header([ci + 1], 1, 63, 1, 0)
            bw = _BitWriter()
            wr = _ACRefineWriter(bw)
            for by in range(nby):
                for bx in range(nbx):
                    wr.block(coeffs[ci][by][bx], 1, 63, 0)
            wr.flush()
            bw.flush()
            out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_spectral_selection_matches_baseline_decode():
    """Spectral-selection-only SOF2 must reconstruct EXACTLY the pixels
    the (already-validated) baseline path produces from the same
    quantized coefficients."""
    img = _gradient(24, 16, seed=11)
    base = decode_jpeg(encode_jpeg([img - 128], q=8))
    prog = decode_jpeg(encode_progressive([img - 128], q=8, successive=False))
    assert prog == base


def test_progressive_successive_approximation_matches_baseline_decode():
    """The full successive-approximation script (DC+AC first at Al=1,
    then refinement scans) must converge to the SAME pixels as baseline
    — bit-identical, since the refined coefficients equal the originals."""
    img = _gradient(32, 24, seed=12)
    base = decode_jpeg(encode_jpeg([img - 128], q=8))
    prog = decode_jpeg(encode_progressive([img - 128], q=8, successive=True))
    assert prog == base


def test_progressive_three_component_color():
    rng = np.random.RandomState(7)
    y = _gradient(16, 16, seed=13)
    cb = np.clip(128 + 30 * np.sin(np.arange(256).reshape(16, 16) / 9.0)
                 + rng.randint(-4, 5, (16, 16)), 0, 255).astype(np.float64)
    cr = np.clip(128 - 25 * np.cos(np.arange(256).reshape(16, 16) / 7.0), 0,
                 255).astype(np.float64)
    planes = [y - 128, cb - 128, cr - 128]
    base = decode_jpeg(encode_jpeg(planes, q=8))
    prog = decode_jpeg(encode_progressive(planes, q=8, successive=True))
    assert prog == base
    w, h, c, _ = prog
    assert (w, h, c) == (16, 16, 3)


def test_progressive_truncated_stream_raises_cleanly():
    img = _gradient(16, 16, seed=14)
    payload = encode_progressive([img - 128], q=8)
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(payload[: len(payload) - 40])


def test_decode_image_dispatches_progressive_jpeg():
    from apitap_spark.operators.multimodal import decode_image

    img = _gradient(16, 16, seed=15)
    w, h, c, px = decode_image(encode_progressive([img - 128], q=8))
    assert (w, h, c) == (16, 16, 1)
    got = np.frombuffer(px, dtype=np.uint8).reshape(16, 16).astype(np.float64)
    assert np.abs(got - img).mean() <= 4
