"""Baseline JPEG (ITU-T T.81 sequential DCT, SOF0) in pure numpy —
decoder + a minimal fixture encoder.

Round-4 VERDICT residual #2: the JPEG path of the multimodal kernel was
PIL-gated and had zero in-sandbox coverage. This module makes it real:
grayscale and YCbCr baseline JPEGs (4:4:4 and 4:2:0, optional restart
intervals) decode in numpy + stdlib, so the compressed-format feature
path is environment-independent and testable here, exactly like the PNG
decoder (``multimodal._decode_png``). Progressive (SOF2), arithmetic
coding, and 12-bit precision raise ValueError and take the documented
fake-feature fallback.

The per-symbol Python loops mirror the PNG unfilter rationale
(multimodal.py): payloads are thumbnail-sized fixture images inside a
mapInPandas batch; a production cluster would wire libjpeg-turbo into
the same one-function seam.

Reference parity note: the reference repo has no media pipeline at all
(SURVEY §2 — transcripts only); this is part of the training-data
extras suite.
"""

from __future__ import annotations

import struct

import numpy as np

# 8x8 zigzag order (T.81 Figure A.6): ZIGZAG[i] = raster index of the
# i-th zigzag position
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal 8-point DCT-II basis: M[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
# IDCT: block = M.T @ coef @ M ; FDCT: coef = M @ block @ M.T
_M = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# Standard Annex K tables (public spec constants)
STD_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
STD_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)
# (bits[1..16], huffval) — T.81 Annex K.3
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _build_huffman(bits: list[int], huffval: list[int]) -> dict:
    """Canonical Huffman (T.81 Annex C): {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_table(bits: list[int], huffval: list[int]) -> dict:
    """Inverse canonical table: {symbol: (length, code)}."""
    return {v: k for k, v in _build_huffman(bits, huffval).items()}


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 un-stuffing;
    stops at any non-RST marker. ``restart()`` skips an expected RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.bit = 0

    def _byte(self) -> int:
        return self.d[self.pos]

    def read_bit(self) -> int:
        if self.pos >= len(self.d):
            raise ValueError("truncated JPEG scan")
        b = self._byte()
        if b == 0xFF and self.bit == 0:
            nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) else None
            if nxt == 0x00:
                pass  # stuffed byte: the 0xFF is data
            else:
                raise ValueError("hit marker inside entropy data")
        bit = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
            if b == 0xFF:  # skip the stuffed 0x00
                self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Consume padding bits + an RSTn marker (T.81 F.2.1.3.1)."""
        if self.bit:
            # Flush the partially-consumed byte. If that byte is 0xFF
            # (its unread tail is 1-padding), the encoder emitted a
            # stuffed 0x00 after it (T.81 F.1.2.3) — skip BOTH, exactly
            # as read_bit does on byte completion; landing on the
            # stuffed 0x00 here misread it as a missing RST marker.
            b = self.d[self.pos]
            self.bit = 0
            self.pos += 1
            if b == 0xFF:
                self.pos += 1
        if (
            self.pos + 1 < len(self.d)
            and self.d[self.pos] == 0xFF
            and 0xD0 <= self.d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("expected JPEG restart marker")


def _huff_decode(r: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad JPEG huffman code")


def _extend(v: int, t: int) -> int:
    """DIFF/coefficient sign extension (T.81 F.12)."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes):
    """Baseline sequential JPEG -> uint8 (H, W) gray or (H, W, 3) RGB.

    Supports SOF0, 8-bit precision, 1 or 3 components, sampling factors
    up to 2x2 (4:4:4, 4:2:2, 4:2:0), DRI restart intervals. Raises
    ValueError on anything else (progressive, arithmetic, 12-bit) — the
    caller's fake-feature fallback handles those.
    """
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker sync at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — treating the fill as a length-prefixed segment read a
        # bogus seglen and desynced the parser (round-5 review)
        while b[pos + 1] == 0xFF and pos + 2 < len(b):
            pos += 1
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        seg = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                n = 64 * (2 if prec else 1)
                raw = seg[i : i + n]
                if len(raw) < n:
                    raise ValueError("truncated DQT")
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if prec
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = vals  # de-zigzag into raster order
                qt[tid] = tbl.reshape(8, 8)
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                huffval = list(seg[i + 17 : i + 17 + n])
                if len(huffval) < n:
                    raise ValueError("truncated DHT")
                huff[(cls, tid)] = _build_huffman(bits, huffval)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nc}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} "
                "(baseline SOF0 only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append({"id": cs, "td": tables >> 4, "ta": tables & 0xF})
            data_pos = pos + 2 + seglen
            return _decode_scan(
                b, data_pos, frame, scan, qt, huff, restart_interval
            )
        pos += 2 + seglen
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(b, data_pos, frame, scan, qt, huff, restart_interval):
    if frame is None:
        raise ValueError("JPEG SOS before SOF0")
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if w <= 0 or h <= 0:
        raise ValueError(f"bad JPEG dims {(w, h)}")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(
        1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps
    ):
        raise ValueError("unsupported JPEG sampling factors")
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        if s["id"] not in by_id:
            raise ValueError("JPEG scan references unknown component")
        by_id[s["id"]].update(td=s["td"], ta=s["ta"])
    if len(scan) != len(comps):
        raise ValueError("JPEG multi-scan files unsupported (baseline only)")
    if len(comps) == 1:
        # Single-component scans are NON-interleaved (T.81 A.2.3): the
        # MCU is ONE 8x8 data unit in raster order, padded per 8 —
        # whatever sampling factors the SOF declared (they only shape
        # interleaved multi-component scans, but e.g. `jpegtran
        # -grayscale` keeps the color image's 2x2 luma factors).
        # Decoding such a frame as interleaved 2x2 MCUs silently
        # scrambles block placement (round-5 review; reproduced by
        # patching a gray fixture's SOF sampling byte 0x11 -> 0x22).
        comps = [dict(comps[0], h=1, v=1)]
        hmax = vmax = 1
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    pred = [0] * len(comps)
    r = _BitReader(b, data_pos)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                r.align_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tbl = huff.get((0, c["td"]))
                ac_tbl = huff.get((1, c["ta"]))
                q = qt.get(c["tq"])
                if dc_tbl is None or ac_tbl is None or q is None:
                    raise ValueError("JPEG missing huffman/quant table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(r, dc_tbl)
                        diff = _extend(r.read_bits(t), t) if t else 0
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_tbl)
                            run, size = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            coef[k] = _extend(r.read_bits(size), size)
                            k += 1
                        block = np.zeros((8, 8), dtype=np.float64)
                        block.flat[ZIGZAG] = coef
                        block *= q
                        px = _M.T @ block @ _M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            n_mcu += 1
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:  # nearest-neighbor chroma upsample
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    cb, cr = cb - 128.0, cr - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- minimal fixture encoder -----------------------------------------------


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
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(
    wtr: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int,
    dc_tbl: dict, ac_tbl: dict,
) -> int:
    coef = np.round((_M @ (block - 128.0) @ _M.T) / q).astype(np.int64)
    zz = coef.flat[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    ln, code = dc_tbl[t]
    wtr.write(code, ln)
    if t:
        wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_tbl[0xF0]
            wtr.write(code, ln)
            run -= 16
        size = _category(v)
        ln, code = ac_tbl[(run << 4) | size]
        wtr.write(code, ln)
        wtr.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        ln, code = ac_tbl[0x00]
        wtr.write(code, ln)
    return dc


def encode_jpeg(
    px: np.ndarray,
    quant_luma: np.ndarray | None = None,
    quant_chroma: np.ndarray | None = None,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 (H, W) gray or (H, W, 3) RGB as a baseline JPEG
    (test fixtures — deterministic, standard Annex K huffman tables).

    ``quant_*``: 64 raster-order values (default all-ones = near-lossless
    roundtrip, so decoder tests can bound pixel error tightly; pass
    ``STD_QUANT_*`` for realistic files). ``subsample`` uses 4:2:0 chroma
    (2x2 block-average), exercising the decoder's MCU interleave +
    upsample path. ``restart_interval`` emits RSTn every N MCUs.
    """
    px = np.ascontiguousarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    ql = (
        np.ones((8, 8), dtype=np.int64)
        if quant_luma is None
        else np.asarray(quant_luma, dtype=np.int64).reshape(8, 8)
    )
    qc = (
        np.ones((8, 8), dtype=np.int64)
        if quant_chroma is None
        else np.asarray(quant_chroma, dtype=np.int64).reshape(8, 8)
    )

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    def dqt_body(tid: int, q: np.ndarray) -> bytes:
        return bytes([tid]) + bytes(int(v) for v in q.flat[ZIGZAG])

    seg(0xDB, dqt_body(0, ql))
    if not gray:
        seg(0xDB, dqt_body(1, qc))

    if gray:
        comps = [(1, 1, 1, 0)]
    elif subsample:
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, tq in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    seg(0xC0, sof)

    def dht_body(cls: int, tid: int, spec) -> bytes:
        bits, huffval = spec
        return bytes([(cls << 4) | tid]) + bytes(bits) + bytes(huffval)

    seg(0xC4, dht_body(0, 0, STD_DC_LUMA))
    seg(0xC4, dht_body(1, 0, STD_AC_LUMA))
    if not gray:
        seg(0xC4, dht_body(0, 1, STD_DC_CHROMA))
        seg(0xC4, dht_body(1, 1, STD_AC_CHROMA))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    sos = bytes([len(comps)])
    for cid, _, _, tq in comps:
        # luma uses DC/AC tables 0, chroma tables 1 (same id as its DQT)
        sos += bytes([cid, (tq << 4) | tq])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    # component planes (YCbCr via the JFIF forward transform)
    if gray:
        planes = [px.astype(np.float64)]
    else:
        r, g, bl = (px[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
        if subsample:
            # pad to even dims, 2x2 block-average chroma
            He, We = -(-h // 2) * 2, -(-w // 2) * 2
            def pad(p):
                return np.pad(p, ((0, He - h), (0, We - w)), mode="edge")
            cb = pad(cb).reshape(He // 2, 2, We // 2, 2).mean(axis=(1, 3))
            cr = pad(cr).reshape(He // 2, 2, We // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    padded = []
    for (cid, ch, cv, tq), p in zip(comps, planes):
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        padded.append(
            np.pad(
                p,
                ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                mode="edge",
            )
        )

    dc_luma = _encode_table(*STD_DC_LUMA)
    ac_luma = _encode_table(*STD_AC_LUMA)
    dc_chroma = _encode_table(*STD_DC_CHROMA)
    ac_chroma = _encode_table(*STD_AC_CHROMA)

    wtr = _BitWriter()
    pred = [0] * len(comps)
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                wtr.flush()
                wtr.out.extend(b"\xff" + bytes([0xD0 + (rst & 7)]))
                rst += 1
                pred = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                q = ql if tq == 0 else qc
                dt = dc_luma if tq == 0 else dc_chroma
                at = ac_luma if tq == 0 else ac_chroma
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(
                            wtr, block, q, pred[ci], dt, at
                        )
            n_mcu += 1
    wtr.flush()
    out.extend(wtr.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
