"""Pure-stdlib + numpy baseline-sequential JPEG codec (ITU-T T.81).

Closes the last real-decode gap in :mod:`mr_python_spark.multimodal`:
with no imaging library in the container, BMP/netpbm/PNG were already
really parsed and JPEG raised ``NotImplementedError``.  This module
implements the baseline sequential process from the public spec
(ITU-T T.81 / ISO 10918-1) with numpy for the 8×8 DCT math:

* :func:`decode_jpeg_pixels` — marker walk (DQT/DHT/SOF0/SOS/DRI),
  canonical Huffman decode of the entropy-coded segment (byte
  unstuffing + restart markers), dequantize → 2-D IDCT (orthonormal
  DCT-III as two matrix products), nearest-neighbor chroma upsample
  for subsampled scans, JFIF YCbCr→RGB.  Scope: baseline DCT (SOF0),
  8-bit samples, 1 or 3 components, sampling factors ≤ 2 — the
  overwhelmingly common shape; progressive (SOF2) and arithmetic
  coding return None and fall through to the library-gated path.
* :func:`encode_jpeg` — the reverse, used by fixtures/tests: 4:4:4,
  Annex K quantization + Huffman tables, FDCT, run-length + canonical
  Huffman entropy coding with 0xFF byte stuffing.

Everything is deterministic (no dithering, fixed tables).  Safety: the
same total-pixel cap as the PNG parser (2²⁴) bounds raster memory, and
every truncation/invalid-code path returns None instead of raising.

Reference parity note: tinymr (the reference engine) has no multimodal
surface at all — this belongs to the training-data-pipeline extension
tier, where image decode must be a REAL parse so a corrupted payload
fails the gate.
"""

from __future__ import annotations

import struct

# --- shared tables (ITU-T T.81 Annex K) --------------------------------

#: zigzag scan order: zigzag index -> natural (row-major) index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K.1 luminance / K.2 chrominance quantization tables (zigzag order)
QT_LUMA = [
    16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101, 103, 99,
]
QT_CHROMA = [
    17, 18, 18, 24, 21, 24, 47, 26, 26, 47, 99, 66, 56, 66, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

#: Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
#: HUFFVAL symbols) — luminance/chrominance × DC/AC
HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
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
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
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

#: same raster-memory bound as the PNG parser
MAX_PIXELS = 1 << 24


def _dct_matrix():
    """Orthonormal 8×8 DCT-II basis: row k = c(k)·cos((2j+1)kπ/16)/2."""
    import math

    import numpy as np

    T = np.zeros((8, 8))
    for k in range(8):
        c = math.sqrt(0.125) if k == 0 else 0.5
        for j in range(8):
            T[k, j] = c * math.cos((2 * j + 1) * k * math.pi / 16)
    return T


def _build_huffman_decode(bits, huffval):
    """Canonical Huffman: (code, length) -> symbol lookup dict."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huffman_encode(bits, huffval):
    """Canonical Huffman: symbol -> (code, length)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; restart markers terminate the current run (the MCU loop
    resets DC predictors and calls :meth:`restart`)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # pending marker (0xD0..0xD7 restart, or terminator)

    def _fill(self) -> bool:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                return self.nbits > 0
            b = self.data[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(self.data):
                    return self.nbits > 0
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:  # stuffed literal 0xFF
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker
                    self.marker = nxt
                    self.pos += 2
                    return self.nbits > 0
                else:  # real marker (EOI etc.) ends the scan
                    self.marker = nxt
                    return self.nbits > 0
            else:
                self.pos += 1
            if self.marker is None:
                self.acc = (self.acc << 8) | b
                self.nbits += 8
        return True

    def read_bit(self):
        if self.nbits == 0 and not self._fill():
            return None
        if self.nbits == 0:
            return None
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int):
        v = 0
        for _ in range(n):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def restart(self) -> bool:
        """Consume a pending restart marker and byte-align.

        The marker may not have been prefetched: :meth:`_fill` stops
        once nbits > 24, so an interval whose entropy data drains at a
        refill boundary leaves the 0xFFDx bytes unread in ``data``
        (e.g. a 4-byte tail fills 32 bits and returns before seeing
        the marker).  In that case discard the < 8 one-padding bits
        still in the accumulator and scan the marker here — otherwise
        most real multi-interval DRI JPEGs fail to decode."""
        if self.marker is None:
            self.acc = 0
            self.nbits = 0
            # T.81 B.1.1.2: optional 0xFF fill bytes may precede any
            # marker — skip them, then expect 0xFF 0xD0..0xD7
            while (
                self.pos + 1 < len(self.data)
                and self.data[self.pos] == 0xFF
                and self.data[self.pos + 1] == 0xFF
            ):
                self.pos += 1
            if (
                self.pos + 1 < len(self.data)
                and self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.marker = self.data[self.pos + 1]
                self.pos += 2
        if self.marker is None or not (0xD0 <= self.marker <= 0xD7):
            return False
        self.marker = None
        self.acc = 0
        self.nbits = 0
        return True


def _decode_huff_symbol(br: _BitReader, table):
    code = 0
    for length in range(1, 17):
        b = br.read_bit()
        if b is None:
            return None
        code = (code << 1) | b
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to the signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_pixels(payload: bytes):
    """Baseline-sequential JPEG → (width, height, channels, raster) or
    None for anything malformed or out of scope (progressive,
    arithmetic, 12-bit, >3 components, sampling factors > 2)."""
    import numpy as np

    if payload[:2] != b"\xff\xd8" or len(payload) < 20:
        return None
    try:
        qt: dict[int, "np.ndarray"] = {}
        huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
        frame = None
        restart_interval = 0
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:  # EOI before SOS
                return None
            (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
            seg = payload[pos + 4 : pos + 2 + seg_len]
            if len(seg) != seg_len - 2:
                return None
            if marker == 0xDB:  # DQT: possibly several tables
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0x0F
                    i += 1
                    n = 64 * (2 if pq == 1 else 1)
                    if pq > 1 or tq > 3 or i + n > len(seg):
                        return None
                    raw = (
                        np.frombuffer(seg[i : i + n], dtype=">u2")
                        if pq
                        else np.frombuffer(seg[i : i + n], dtype=np.uint8)
                    ).astype(np.int32)
                    tbl = np.zeros(64, dtype=np.int32)
                    tbl[ZIGZAG] = raw  # zigzag -> natural order
                    qt[tq] = tbl.reshape(8, 8)
                    i += n
            elif marker == 0xC4:  # DHT: possibly several tables
                i = 0
                while i + 17 <= len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0x0F
                    bits = list(seg[i + 1 : i + 17])
                    nsym = sum(bits)
                    if tc > 1 or th > 3 or i + 17 + nsym > len(seg):
                        return None
                    huffval = list(seg[i + 17 : i + 17 + nsym])
                    huff[(tc, th)] = _build_huffman_decode(bits, huffval)
                    i += 17 + nsym
                if i != len(seg):
                    return None
            elif marker == 0xC0:  # SOF0 baseline
                prec, h, w, nf = struct.unpack_from(">BHHB", seg, 0)
                if prec != 8 or nf not in (1, 3) or w == 0 or h == 0:
                    return None
                if w * h > MAX_PIXELS:
                    return None
                comps = []
                for c in range(nf):
                    cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                    hi, vi = hv >> 4, hv & 0x0F
                    if not (1 <= hi <= 2 and 1 <= vi <= 2):
                        return None
                    comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
                frame = {"w": w, "h": h, "comps": comps}
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline process: out of scope
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack_from(">H", seg, 0)
            elif marker == 0xDA:  # SOS: entropy-coded data follows
                if frame is None:
                    return None
                ns = seg[0]
                if ns != len(frame["comps"]):
                    return None
                scan = {}
                for c in range(ns):
                    cs, td_ta = struct.unpack_from(">BB", seg, 1 + 2 * c)
                    scan[cs] = (td_ta >> 4, td_ta & 0x0F)
                return _decode_scan(
                    payload, pos + 2 + seg_len, frame, scan, qt, huff,
                    restart_interval, np,
                )
            pos += 2 + seg_len
        return None
    except (struct.error, IndexError, KeyError, ValueError):
        return None


def _decode_scan(payload, pos, frame, scan, qt, huff, restart_interval, np):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    T = _dct_matrix()
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            return None
        td, ta = scan.get(c["id"], (None, None))
        if td is None or (0, td) not in huff or (1, ta) not in huff:
            return None
        c["dc_tab"], c["ac_tab"] = huff[(0, td)], huff[(1, ta)]
        c["q"] = qt[c["tq"]].astype(np.float64)
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    br = _BitReader(payload, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if not br.restart():
                    return None
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.float64)
                        s = _decode_huff_symbol(br, c["dc_tab"])
                        if s is None or s > 11:
                            return None
                        if s:
                            bitsv = br.read_bits(s)
                            if bitsv is None:
                                return None
                            pred[ci] += _extend(bitsv, s)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff_symbol(br, c["ac_tab"])
                            if rs is None:
                                return None
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:  # ZRL: skip 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            bitsv = br.read_bits(size)
                            if bitsv is None:
                                return None
                            coef[ZIGZAG[k]] = _extend(bitsv, size)
                            k += 1
                        block = coef.reshape(8, 8) * c["q"]
                        pix = T.T @ block @ T + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
    # upsample to full resolution (nearest) and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        raster = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return (w, h, 1, raster.tobytes())
    Y, Cb, Cr = full
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b = Y + 1.772 * (Cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    raster = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return (w, h, 3, raster.tobytes())


# --- encoder (fixtures/tests) ------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def encode_jpeg(
    w: int,
    h: int,
    rgb: "bytes | None" = None,
    seed: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """Baseline 4:4:4 JPEG of a (w, h) RGB raster (row-major bytes); a
    deterministic seeded gradient raster is synthesized when ``rgb`` is
    None.  Annex K tables, no subsampling; ``restart_interval`` > 0
    emits a DRI segment and byte-aligned RSTn markers every that many
    MCUs (DC predictors reset), exercising the decoder's restart
    path."""
    import numpy as np

    if rgb is None:
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [
                (xx * 3 + yy * 5 + seed * 11) % 256,
                (xx * 7 + yy * 2 + seed * 23) % 256,
                (xx + yy * 13 + seed * 31) % 256,
            ],
            axis=-1,
        ).astype(np.float64)
    else:
        img = (
            np.frombuffer(rgb, dtype=np.uint8)
            .reshape(h, w, 3)
            .astype(np.float64)
        )
    R, G, B = img[..., 0], img[..., 1], img[..., 2]
    Y = 0.299 * R + 0.587 * G + 0.114 * B
    Cb = -0.168736 * R - 0.331264 * G + 0.5 * B + 128.0
    Cr = 0.5 * R - 0.418688 * G - 0.081312 * B + 128.0
    comps = [Y, Cb, Cr]

    qt_nat = []
    for zz in (QT_LUMA, QT_CHROMA):
        t = np.zeros(64, dtype=np.float64)
        t[ZIGZAG] = np.array(zz, dtype=np.float64)
        qt_nat.append(t.reshape(8, 8))
    T = _dct_matrix()
    enc = [
        (_build_huffman_encode(*HT_DC_LUMA), _build_huffman_encode(*HT_AC_LUMA)),
        (_build_huffman_encode(*HT_DC_CHROMA), _build_huffman_encode(*HT_AC_CHROMA)),
    ]

    bw = _BitWriter()
    pred = [0, 0, 0]
    by_count = -(-h // 8)
    bx_count = -(-w // 8)
    # pad to block multiples by edge replication
    padded = []
    for plane in comps:
        p = np.pad(
            plane,
            ((0, by_count * 8 - h), (0, bx_count * 8 - w)),
            mode="edge",
        )
        padded.append(p)
    mcu_idx = 0
    rst_idx = 0
    for by in range(by_count):
        for bx in range(bx_count):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                # byte-align with 1-padding, emit RSTn raw (markers are
                # never stuffed), reset DC predictors — T.81 E.1.4
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst_idx % 8)])
                rst_idx += 1
                pred = [0, 0, 0]
            mcu_idx += 1
            for ci in range(3):
                ti = 0 if ci == 0 else 1
                dc_t, ac_t = enc[ti]
                block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = T @ block @ T.T
                q = np.rint(coef / qt_nat[ti]).astype(np.int64)
                zz = q.reshape(-1)[ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s = _category(diff)
                code, length = dc_t[s]
                bw.write(code, length)
                if s:
                    v = diff if diff >= 0 else diff + (1 << s) - 1
                    bw.write(v, s)
                run = 0
                last_nz = 0
                for k in range(1, 64):
                    if zz[k]:
                        last_nz = k
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_t[0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    s = _category(v)
                    code, length = ac_t[(run << 4) | s]
                    bw.write(code, length)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    code, length = ac_t[0x00]  # EOB
                    bw.write(code, length)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + bytes(QT_LUMA)) + seg(0xDB, b"\x01" + bytes(QT_CHROMA))
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + struct.pack(">BBB", 1, 0x11, 0)
        + struct.pack(">BBB", 2, 0x11, 1)
        + struct.pack(">BBB", 3, 0x11, 1),
    )

    def dht(tc: int, th: int, table) -> bytes:
        bits, huffval = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval))

    dhts = (
        dht(0, 0, HT_DC_LUMA)
        + dht(1, 0, HT_AC_LUMA)
        + dht(0, 1, HT_DC_CHROMA)
        + dht(1, 1, HT_AC_CHROMA)
    )
    sos = seg(
        0xDA,
        b"\x03" + struct.pack(">BB", 1, 0x00) + struct.pack(">BB", 2, 0x11)
        + struct.pack(">BB", 3, 0x11) + b"\x00\x3f\x00",
    )
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8" + dqt + sof + dhts + dri + sos + bytes(bw.out) + b"\xff\xd9"
    )
