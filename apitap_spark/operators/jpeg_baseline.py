"""Baseline JPEG (ITU-T T.81 sequential DCT, Huffman) decoder.

Pure stdlib + numpy (for the 8x8 IDCT and plane math) — no codec
libraries exist in this container, so this closes the decode_image
codec gap the same way the PNG decoder did (reference exposes no image
path at all; this backs the beyond-reference multimodal operators).

Supported: SOF0 baseline AND SOF2 progressive (spectral selection +
successive approximation per T.81 Annex G — DC first/refine, AC
first/refine with EOB runs), 8-bit samples, grayscale and 3-component
YCbCr with any 1/2 sampling factors (4:4:4, 4:2:2, 4:2:0), 8- and
16-bit DQT precision, multiple DQT/DHT per marker, restart intervals
(DRI/RSTn). Not supported (raises ValueError, callers treat it as the
usual per-row decode fallback): arithmetic coding, 12-bit precision,
CMYK/4-component scans, hierarchical (SOF5+).

Decode pipeline per MCU: Huffman DC-diff + AC run-length decode →
dezigzag → dequantize → IDCT-III (separable 8x8 matrix, numpy) →
level shift → per-component plane; then chroma upsample (nearest) and
the T.871 YCbCr→RGB integer-rounded conversion.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXELS = 64_000_000  # decode-bomb guard: reject implausible SOF dims

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# 8x8 DCT-III basis (orthonormal): block = C.T @ coeff @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; RST markers reset DC predictors via ``sync``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.acc = 0

    def read_bit(self) -> int:
        if self.bits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                elif 0xD0 <= nxt <= 0xD7:
                    # caller handles RST via sync_restart(); rewind onto
                    # the 0xFF so the scan matches THIS marker — without
                    # it, sync_restart (positioned on the Dx byte) would
                    # resync at the FOLLOWING restart marker, silently
                    # dropping a whole restart interval of MCUs
                    self.pos -= 1
                    raise _RestartHit()
                else:
                    raise ValueError(f"marker 0xFF{nxt:02x} inside scan")
            self.acc = b
            self.bits = 8
        self.bits -= 1
        return (self.acc >> self.bits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker, dropping pad bits."""
        self.bits = 0
        d = self.data
        while not (d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartHit(Exception):
    pass


def _build_huffman(counts: bytes, symbols: bytes) -> dict[tuple[int, int], int]:
    """{(length, code): symbol} canonical table per T.81 Annex C."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _receive_extend(br: _BitReader, n: int) -> int:
    if n == 0:
        return 0
    v = br.read_bits(n)
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG → (width, height, channels, pixel bytes).

    Grayscale returns 1 channel; YCbCr returns interleaved RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    progressive = False
    coeffs: list[np.ndarray] | None = None  # per-comp zigzag-space coeffs
    geom: dict | None = None
    saw_scan = False
    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes —
        # skip them, or the fill byte itself reads as marker 0xFF and
        # two entropy bytes get misparsed as a segment length
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # parameterless
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        if seglen < 2:
            raise ValueError("invalid zero-length marker segment")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if prec:
                    vals = struct.unpack(">64H", seg[i : i + 128])
                    i += 128
                else:
                    vals = seg[i : i + 64]
                    i += 64
                tbl = np.zeros(64, dtype=np.int32)
                for z, v in zip(ZIGZAG, vals):
                    tbl[z] = v
                qt[tid] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                counts = seg[i + 1 : i + 17]
                nsym = sum(counts)
                symbols = seg[i + 17 : i + 17 + nsym]
                (huff_ac if cls else huff_dc)[tid] = _build_huffman(
                    counts, symbols
                )
                i += 17 + nsym
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            height, width = struct.unpack(">HH", seg[1:5])
            if not height or not width or height * width > MAX_PIXELS:
                # a crafted 65535x65535 header would otherwise allocate
                # ~34 GB of planes before the entropy data runs out
                raise ValueError(f"implausible dimensions {width}x{height}")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError("only 1- or 3-component images supported")
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                h_f, v_f = hv >> 4, hv & 0xF
                if not (1 <= h_f <= 4 and 1 <= v_f <= 4):
                    # T.81 allows 1-4; anything else is corrupt and would
                    # multiply the plane allocations
                    raise ValueError(f"invalid sampling factors {h_f}x{v_f}")
                comps.append({"id": cid, "h": h_f, "v": v_f, "tq": tq})
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF type 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = seg[0]
            scan_ids = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c : 3 + 2 * c]
                idx = next(i for i, x in enumerate(comps) if x["id"] == cid)
                comps[idx]["td"], comps[idx]["ta"] = tabs >> 4, tabs & 0xF
                scan_ids.append(idx)
            pos += seglen
            if not progressive:
                return _decode_scan(
                    payload, pos, width, height, comps, qt,
                    huff_dc, huff_ac, restart_interval,
                )
            ss_, se_, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            if geom is None:
                geom = _frame_geometry(comps, width, height)
                coeffs = [
                    np.zeros(
                        (geom["mcuy"] * c["v"], geom["mcux"] * c["h"], 64),
                        dtype=np.int64,
                    )
                    for c in comps
                ]
            pos = _progressive_scan(
                payload, pos, comps, scan_ids, coeffs, geom,
                ss_, se_, ahal >> 4, ahal & 0xF,
                restart_interval, huff_dc, huff_ac,
            )
            saw_scan = True
            continue
        pos += seglen
    if progressive and saw_scan:
        planes = _reconstruct_progressive(coeffs, comps, qt)
        return _assemble_planes(planes, comps, width, height)
    raise ValueError("no SOS marker found")


def _decode_scan(
    data, pos, width, height, comps, qt, huff_dc, huff_ac, restart_interval
):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = _decode_block(
                                br, huff_dc[c["td"]], huff_ac[c["ta"]],
                                qt[c["tq"]], pred, ci,
                            )
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            except _RestartHit:
                # RST reached mid-read (padding bits before the marker)
                br.sync_restart()
                pred = [0] * len(comps)
                mcu_count += 1
                continue
            mcu_count += 1
    return _assemble_planes(planes, comps, width, height)


def _assemble_planes(planes, comps, width, height):
    """Chroma-upsample (nearest), crop, and color-convert the padded
    per-component planes — shared by the baseline and progressive paths."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        out_planes.append(p[:height, :width])
    if len(comps) == 1:
        pix = np.clip(np.rint(out_planes[0] + 128), 0, 255).astype(np.uint8)
        return width, height, 1, pix.tobytes()
    y, cb, cr = out_planes
    y = y + 128
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.rint(ch), 0, 255).astype(np.uint8) for ch in (r, g, b)],
        axis=-1,
    )
    return width, height, 3, rgb.tobytes()


# --- progressive (SOF2) scans: T.81 Annex G, Huffman coding ----------------
#
# Coefficients accumulate across scans in ZIGZAG-index space (coef[k] is
# zigzag position k) as integers; dequantize + IDCT happen once at EOI.


def _frame_geometry(comps, width, height) -> dict:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # non-interleaved (single-component scan) block grid per component:
    # ceil(comp resolution / 8), which may be smaller than the padded
    # mcux*h x mcuy*v interleaved grid (T.81 A.2.2 vs A.2.3)
    nb = []
    for c in comps:
        cw = (width * c["h"] + hmax - 1) // hmax
        ch = (height * c["v"] + vmax - 1) // vmax
        nb.append(((ch + 7) // 8, (cw + 7) // 8))
    return {"hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy, "nb": nb}


def _prog_dc_first(br, tbl, pred, si, coef, al):
    t = _huff_decode(br, tbl)
    pred[si] += _receive_extend(br, t)
    coef[0] = pred[si] << al  # arithmetic shift = the DC point transform


def _prog_dc_refine(br, coef, al):
    if br.read_bit():
        coef[0] |= 1 << al  # two's-complement bit append (works for <0)


def _prog_ac_first(br, tbl, coef, ss, se, al, eobrun):
    """One block of an AC first scan (Ah=0); returns the new EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(br, tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1  # this block is the run's first
                if r:
                    eobrun += br.read_bits(r)
                return eobrun
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC index out of spectral band")
        coef[k] = _receive_extend(br, s) << al
        k += 1
    return 0


def _prog_ac_refine(br, tbl, coef, ss, se, al, eobrun):
    """One block of an AC refinement scan (Ah>0); returns the new EOB
    run. Correction bits refine already-nonzero history coefficients by
    +-2^al; newly nonzero coefficients arrive as +-2^al (T.81 G.1.2.3)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, tbl)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break  # EOB-run tail handled below
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("invalid AC refinement magnitude")
                newval = p1 if br.read_bit() else m1
            # advance over r zero-history coeffs, emitting correction
            # bits for every nonzero-history coeff passed on the way
            while k <= se:
                c = int(coef[k])
                if c != 0:
                    if br.read_bit() and (c & p1) == 0:
                        coef[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        # inside an EOB run: only correction bits for nonzero history
        while k <= se:
            c = int(coef[k])
            if c != 0:
                if br.read_bit() and (c & p1) == 0:
                    coef[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(
    data, pos, comps, scan_ids, coeffs, geom,
    ss, se, ah, al, restart_interval, huff_dc, huff_ac,
):
    """Decode one SOS of a progressive frame into the coefficient
    arrays; returns the payload offset of the next marker."""
    # T.81 G.1: a DC scan has Ss=Se=0; an AC scan is single-component
    # with 1 <= Ss <= Se <= 63; successive approximation refines one
    # bit at a time (Ah = 0 first, then Ah = Al+1). A baseline stream
    # mislabeled SOF2 fails here instead of mis-decoding.
    if ss == 0 and se != 0:
        raise ValueError("invalid progressive scan: DC scan with Se > 0")
    if ss > 0 and (len(scan_ids) != 1 or se < ss or se > 63):
        raise ValueError("invalid progressive AC scan header")
    if ah and ah != al + 1:
        raise ValueError("invalid successive-approximation Ah/Al")
    br = _BitReader(data, pos)
    eobrun = 0
    pred = [0] * len(scan_ids)

    def unit(si, ci, by, bx):
        nonlocal eobrun
        coef = coeffs[ci][by, bx]
        if ss == 0:
            if ah == 0:
                _prog_dc_first(br, huff_dc[comps[ci]["td"]], pred, si, coef, al)
            else:
                _prog_dc_refine(br, coef, al)
        elif ah == 0:
            eobrun = _prog_ac_first(
                br, huff_ac[comps[ci]["ta"]], coef, ss, se, al, eobrun
            )
        else:
            eobrun = _prog_ac_refine(
                br, huff_ac[comps[ci]["ta"]], coef, ss, se, al, eobrun
            )

    def resync():
        nonlocal eobrun, pred
        br.sync_restart()
        pred = [0] * len(scan_ids)
        eobrun = 0

    count = 0
    if len(scan_ids) > 1:  # interleaved (DC scans only), MCU order
        for my in range(geom["mcuy"]):
            for mx in range(geom["mcux"]):
                if restart_interval and count and count % restart_interval == 0:
                    resync()
                try:
                    for si, ci in enumerate(scan_ids):
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                unit(si, ci, my * c["v"] + by, mx * c["h"] + bx)
                except _RestartHit:
                    resync()
                count += 1
    else:  # non-interleaved: raster over the component's own block grid
        ci = scan_ids[0]
        nbh, nbw = geom["nb"][ci]
        for by in range(nbh):
            for bx in range(nbw):
                if restart_interval and count and count % restart_interval == 0:
                    resync()
                try:
                    unit(0, ci, by, bx)
                except _RestartHit:
                    resync()
                count += 1
    # drop pad bits; land on the next real marker (skip stuffed FF00)
    p = br.pos
    n = len(data)
    while p + 1 < n and not (data[p] == 0xFF and data[p + 1] != 0x00):
        p += 1
    return p


def _reconstruct_progressive(coeffs, comps, qt):
    """Dequantize + IDCT every accumulated block once, after all scans."""
    zz = np.array(ZIGZAG)
    planes = []
    for ci, c in enumerate(comps):
        bh, bw = coeffs[ci].shape[:2]
        q = qt[c["tq"]]
        plane = np.zeros((bh * 8, bw * 8))
        for by in range(bh):
            for bx in range(bw):
                nat = np.zeros(64)
                nat[zz] = coeffs[ci][by, bx]
                block = nat.reshape(8, 8) * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _C.T @ block @ _C
                )
        planes.append(plane)
    return planes


def _decode_block(br, dc_table, ac_table, q, pred, ci):
    coeff = np.zeros(64, dtype=np.float64)
    t = _huff_decode(br, dc_table)
    pred[ci] += _receive_extend(br, t)
    coeff[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC index out of range")
        coeff[ZIGZAG[k]] = _receive_extend(br, s)
        k += 1
    block = coeff.reshape(8, 8) * q
    return _C.T @ block @ _C
