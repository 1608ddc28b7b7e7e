"""Baseline JPEG (ITU-T T.81 sequential DCT, Huffman) decoder.

Pure stdlib + numpy (for the 8x8 IDCT and plane math) — no codec
libraries exist in this container, so this closes the decode_image
codec gap the same way the PNG decoder did (reference exposes no image
path at all; this backs the beyond-reference multimodal operators).

Supported: SOF0 baseline, 8-bit samples, grayscale and 3-component
YCbCr with any 1/2 sampling factors (4:4:4, 4:2:2, 4:2:0), 8- and
16-bit DQT precision, multiple DQT/DHT per marker, restart intervals
(DRI/RSTn). Not supported (raises ValueError, callers treat it as the
usual per-row decode fallback): progressive (SOF2), arithmetic coding,
12-bit precision, CMYK/4-component scans.

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
                    # caller handles RST via sync(); treat as padding
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
    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
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
        elif marker == 0xC0:  # SOF0 baseline
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
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF type 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = seg[0]
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                comp["td"], comp["ta"] = tabs >> 4, tabs & 0xF
            pos += seglen
            return _decode_scan(
                payload, pos, width, height, comps, qt,
                huff_dc, huff_ac, restart_interval,
            )
        pos += seglen
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
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        # upsample to full resolution (nearest), crop to image size
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
