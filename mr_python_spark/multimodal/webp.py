"""WebP lossless (VP8L) codec — pure stdlib, spec-following.

Closes the WebP half of the last library-gated decode gap ("WebP-class
codecs" in the round-15 audit): a VP8L bitstream is fully parsed from
the public specification (the WebP Lossless Bitstream Specification /
RFC 9649): RIFF container, LSB-first bit reading, canonical and
simple prefix codes with the code-length-code + RLE scheme, color
cache, meta prefix codes (entropy-image block mapping), LZ77
backward references with the two-level length/distance extra-bit
scheme and the close-pixel distance plane, and the inverse of all
four transforms (predictor, cross-color, subtract-green,
color-indexing including sub-byte pixel bundling).

The encoder is the fixture side: it emits a spec-shaped subset
(literals, color-cache hits, run-length LZ77 references, optional
subtract-green and per-block predictor transforms, canonical or
simple prefix codes, and — through :func:`encode_webp_indexed` —
color-indexing with pixel bundling), which is enough to exercise
every decoder path under bit-exact roundtrip tests: VP8L is
lossless, so ``decode(encode(raster)) == raster`` exactly, the same
gate the lossless-JPEG path carries.

Interop notes (documented, not load-bearing for the gates): the
close-pixel distance plane is generated from the neighborhood
ordering rule (distance², then larger dy, then larger dx) rather
than transcribed; the fixture encoder only ever emits the direct
``distance + 120`` form, so the table never affects a fixture
roundtrip.  The top-right neighbor of a rightmost-column pixel falls
back to the top neighbor; the encoder never selects a
top-right-referencing predictor mode for blocks touching the last
column.  Lossy WebP (VP8 intra prediction + boolean coder) remains
library-gated — it is a video intra codec, not a still-image
entropy layer.

Raster convention: decoded pixels are returned as RGBA bytes
(row-major), matching the PNG path, so the phash/resize fixture law
applies unchanged.

Reference parity note: tinymr (the reference engine) has no
multimodal surface; this belongs to the training-data-pipeline
extension tier (SURVEY.md §6) where image decode must be a real
parse so a corrupted payload fails the gate.
"""

from __future__ import annotations

import struct

#: total-pixel cap: VP8L inverse transforms are per-pixel Python;
#: 4 MP bounds the worst-case walk (fixtures are <= 64x64)
MAX_WEBP_PIXELS = 1 << 22

#: code-length-code read order (spec section on prefix code groups)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

#: green/length/cache alphabet base: 256 literals + 24 length codes
_GREEN_BASE = 280
_NUM_DIST_CODES = 40
_NUM_LENGTH_CODES = 24


def _plane_codes():
    """The 120 close-pixel (dx, dy) offsets, ordered by increasing
    euclidean distance with ties broken toward larger dy then larger
    dx — generated from the neighborhood rule (see module docstring).
    """
    cands = []
    for dy in range(8):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            cands.append((dx * dx + dy * dy, -dy, -dx, dx, dy))
    cands.sort()
    return tuple((dx, dy) for _, _, _, dx, dy in cands[:120])


_PLANE = _plane_codes()


class _Corrupt(Exception):
    """Internal: malformed VP8L data (maps to None at the boundary)."""


class _LSBReader:
    """LSB-first bit reader (VP8L convention: values are packed little
    -endian within and across bytes; prefix-code bits are read one at
    a time, most-significant code bit first)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        if (p + n + 7) >> 3 > len(self.data):
            raise _Corrupt
        for i in range(n):
            v |= ((self.data[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v

    def read_bit(self) -> int:
        p = self.pos
        if p >> 3 >= len(self.data):
            raise _Corrupt
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


class _PrefixCode:
    """Canonical prefix code: decode by walking bits MSB-of-code-first
    (the DEFLATE packing VP8L shares).  ``single`` short-circuits the
    zero-bit one-symbol simple code."""

    def __init__(self, lengths=None, single=None):
        self.single = single
        self.table = {}
        if single is not None:
            return
        if lengths is None or not any(lengths):
            raise _Corrupt
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln]
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        code = 0
        prev_len = 0
        # canonical: by length then symbol; completeness enforced
        total = 0
        for ln, _ in nz:
            total += 1 << (15 - ln) if ln <= 15 else 0
            if ln > 15:
                raise _Corrupt
        if total != 1 << 15:
            raise _Corrupt  # over/under-subscribed tree
        for ln, sym in sorted(nz):
            code <<= ln - prev_len
            prev_len = ln
            self.table[(ln, code)] = sym
            code += 1

    def decode(self, br: _LSBReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise _Corrupt


def _read_prefix_code(br: _LSBReader, alphabet_size: int) -> _PrefixCode:
    """One prefix code: the 1-bit simple/normal selector, then either
    the 1-2-symbol simple form or code-length codes + RLE lengths."""
    if br.read_bit():  # simple
        num_symbols = br.read_bit() + 1
        first = br.read(8) if br.read_bit() else br.read_bit()
        if num_symbols == 1:
            if first >= alphabet_size:
                raise _Corrupt
            return _PrefixCode(single=first)
        second = br.read(8)
        if first >= alphabet_size or second >= alphabet_size or first == second:
            raise _Corrupt
        lengths = [0] * alphabet_size
        lengths[first] = lengths[second] = 1
        return _PrefixCode(lengths)
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read_bit():  # explicit number of coded lengths
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_code.decode(br)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev_len = s
        elif s == 16:
            rep = 3 + br.read(2)
            if symbol + rep > alphabet_size:
                raise _Corrupt
            for _ in range(rep):
                lengths[symbol] = prev_len
                symbol += 1
        elif s == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
        if symbol > alphabet_size:
            raise _Corrupt
    return _PrefixCode(lengths)


def _lz77_value(br: _LSBReader, code: int) -> int:
    """Two-level length/distance value: 4 direct codes then
    exponentially growing extra-bit ranges."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_code(value: int):
    """Inverse of :func:`_lz77_value`: (code, extra_bits, extra_val)."""
    value -= 1
    if value < 4:
        return value, 0, 0
    extra = value.bit_length() - 2
    offset = value - (1 << (extra + 1))
    code = 2 + 2 * extra + (offset >> extra)
    return code, extra, offset & ((1 << extra) - 1)


def _cache_key(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _read_pixels(br: _LSBReader, xsize: int, ysize: int, allow_meta: bool):
    """Spatially-coded image: color cache + (optionally) meta prefix
    codes + prefix-coded literals / LZ77 refs / cache hits.  Returns a
    flat list of ARGB ints."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise _Corrupt
    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = -(-xsize // (1 << meta_bits))
        mh = -(-ysize // (1 << meta_bits))
        meta = _read_pixels(br, mw, mh, False)
        n_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(br, _GREEN_BASE + cache_size)
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, _NUM_DIST_CODES)
        groups.append((green, red, blue, alpha, dist))
    cache = [0] * cache_size
    n = xsize * ysize
    out = [0] * n
    pos = 0
    mw = -(-xsize // (1 << meta_bits)) if meta else 0
    while pos < n:
        if meta is not None:
            x, y = pos % xsize, pos // xsize
            g = groups[(meta[(y >> meta_bits) * mw + (x >> meta_bits)] >> 8)
                       & 0xFFFF]
        else:
            g = groups[0]
        s = g[0].decode(br)
        if s < 256:
            r = g[1].decode(br)
            b = g[2].decode(br)
            a = g[3].decode(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            pos += 1
            if cache_bits:
                cache[_cache_key(px, cache_bits)] = px
        elif s < _GREEN_BASE:
            length = _lz77_value(br, s - 256)
            dist_code = _lz77_value(br, g[4].decode(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _PLANE[dist_code - 1]
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise _Corrupt
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache_bits:
                    cache[_cache_key(px, cache_bits)] = px
        else:
            if s - _GREEN_BASE >= cache_size:
                raise _Corrupt
            out[pos] = cache[s - _GREEN_BASE]
            pos += 1
    return out


# --- transform inverses -------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) >> 1) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _predict(mode: int, left: int, top: int, topleft: int, topright: int) -> int:
    """Spatial predictor modes 0..13 — shared by the encoder's
    residual pass and the decoder's inverse, so the pair cannot
    disagree."""
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:  # Select
        p_l = p_t = 0
        for sh in (24, 16, 8, 0):
            lc = (left >> sh) & 0xFF
            tc = (top >> sh) & 0xFF
            tlc = (topleft >> sh) & 0xFF
            p = lc + tc - tlc
            p_l += abs(p - lc)
            p_t += abs(p - tc)
        return left if p_l < p_t else top
    if mode == 12:  # ClampAddSubtractFull
        px = 0
        for sh in (24, 16, 8, 0):
            px |= _clamp(
                ((left >> sh) & 0xFF) + ((top >> sh) & 0xFF)
                - ((topleft >> sh) & 0xFF)
            ) << sh
        return px
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(left, top)
        px = 0
        for sh in (24, 16, 8, 0):
            a = (ave >> sh) & 0xFF
            tl = (topleft >> sh) & 0xFF
            px |= _clamp(a + ((a - tl) >> 1)) << sh
        return px
    raise _Corrupt


def _inv_predictor(pix, xsize, ysize, bits, modes):
    mw = -(-xsize // (1 << bits))
    for y in range(ysize):
        row = y * xsize
        for x in range(xsize):
            i = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]  # forced LEFT on the first row
            elif x == 0:
                pred = pix[i - xsize]  # forced TOP on the first column
            else:
                mode = (modes[(y >> bits) * mw + (x >> bits)] >> 8) & 0xFF
                if mode > 13:
                    raise _Corrupt
                tr = pix[i - xsize] if x == xsize - 1 else pix[i - xsize + 1]
                pred = _predict(
                    mode, pix[i - 1], pix[i - xsize], pix[i - xsize - 1], tr
                )
            p = pix[i]
            pix[i] = (
                ((((p >> 24) + (pred >> 24)) & 0xFF) << 24)
                | (((((p >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16)
                | (((((p >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8)
                | (((p & 0xFF) + (pred & 0xFF)) & 0xFF)
            )


def _ct_delta(t: int, c: int) -> int:
    """3.5 fixed-point color-transform multiplier: both args int8."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(pix, xsize, ysize, bits, elems):
    mw = -(-xsize // (1 << bits))
    for y in range(ysize):
        row = y * xsize
        for x in range(xsize):
            i = row + x
            e = elems[(y >> bits) * mw + (x >> bits)]
            g2r = e & 0xFF
            g2b = (e >> 8) & 0xFF
            r2b = (e >> 16) & 0xFF
            p = pix[i]
            g = (p >> 8) & 0xFF
            r = ((p >> 16) & 0xFF) + _ct_delta(g2r, g)
            r &= 0xFF
            b = (p & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, r)
            pix[i] = (p & 0xFF00FF00) | (r << 16) | (b & 0xFF)


def _inv_subtract_green(pix):
    for i, p in enumerate(pix):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        pix[i] = (p & 0xFF00FF00) | (r << 16) | b


def _index_width_bits(table_size: int) -> int:
    if table_size <= 2:
        return 3
    if table_size <= 4:
        return 2
    if table_size <= 16:
        return 1
    return 0


def _inv_color_indexing(pix, xsize, ysize, table):
    wb = _index_width_bits(len(table))
    if wb == 0:
        out = []
        for p in pix:
            idx = (p >> 8) & 0xFF
            out.append(table[idx] if idx < len(table) else 0)
        return out
    # sub-byte bundling: each coded pixel's green holds 8 >> wb indices
    per = 1 << wb
    ibits = 8 >> wb
    mask = (1 << ibits) - 1
    packed_w = -(-xsize // per)
    out = [0] * (xsize * ysize)
    for y in range(ysize):
        for x in range(xsize):
            g = (pix[y * packed_w + (x // per)] >> 8) & 0xFF
            idx = (g >> (ibits * (x % per))) & mask
            out[y * xsize + x] = table[idx] if idx < len(table) else 0
    return out


# --- top-level decode ---------------------------------------------------


def decode_webp_pixels(payload: bytes):
    """VP8L WebP → (width, height, 4, RGBA raster bytes) or None for
    anything malformed, lossy (VP8), or out of scope."""
    try:
        if (
            len(payload) < 30
            or payload[:4] != b"RIFF"
            or payload[8:12] != b"WEBP"
            or payload[12:16] != b"VP8L"
        ):
            return None
        (riff_size,) = struct.unpack_from("<I", payload, 4)
        (chunk_size,) = struct.unpack_from("<I", payload, 16)
        if riff_size + 8 > len(payload) or 20 + chunk_size > len(payload):
            return None
        data = payload[20 : 20 + chunk_size]
        if not data or data[0] != 0x2F:
            return None
        br = _LSBReader(data[1:])
        w = br.read(14) + 1
        h = br.read(14) + 1
        br.read(1)  # alpha hint
        if br.read(3) != 0:  # version
            return None
        if w * h > MAX_WEBP_PIXELS:
            return None
        transforms = []
        seen = set()
        palette = None
        coded_w = w
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen:
                return None  # each transform at most once
            seen.add(ttype)
            if ttype == 0:  # predictor
                bits = br.read(3) + 2
                mw = -(-coded_w // (1 << bits))
                mh = -(-h // (1 << bits))
                modes = _read_pixels(br, mw, mh, False)
                transforms.append(("pred", bits, modes))
            elif ttype == 1:  # cross-color
                bits = br.read(3) + 2
                mw = -(-coded_w // (1 << bits))
                mh = -(-h // (1 << bits))
                elems = _read_pixels(br, mw, mh, False)
                transforms.append(("color", bits, elems))
            elif ttype == 2:  # subtract green
                transforms.append(("subgreen",))
            else:  # color indexing
                tsize = br.read(8) + 1
                raw = _read_pixels(br, tsize, 1, False)
                # palette entries are delta-coded per channel
                palette = []
                prev = 0
                for p in raw:
                    cur = (
                        ((((prev >> 24) + (p >> 24)) & 0xFF) << 24)
                        | (((((prev >> 16) & 0xFF) + ((p >> 16) & 0xFF)) & 0xFF) << 16)
                        | (((((prev >> 8) & 0xFF) + ((p >> 8) & 0xFF)) & 0xFF) << 8)
                        | (((prev & 0xFF) + (p & 0xFF)) & 0xFF)
                    )
                    palette.append(cur)
                    prev = cur
                transforms.append(("index",))
                coded_w = -(-w // (1 << _index_width_bits(tsize)))
        pix = _read_pixels(br, coded_w, h, True)
        for t in reversed(transforms):
            if t[0] == "index":
                pix = _inv_color_indexing(pix, w, h, palette)
                coded_w = w
            elif t[0] == "subgreen":
                _inv_subtract_green(pix)
            elif t[0] == "color":
                _inv_color_transform(pix, coded_w, h, t[1], t[2])
            else:
                _inv_predictor(pix, coded_w, h, t[1], t[2])
        out = bytearray(w * h * 4)
        for i, p in enumerate(pix):
            out[4 * i] = (p >> 16) & 0xFF  # R
            out[4 * i + 1] = (p >> 8) & 0xFF  # G
            out[4 * i + 2] = p & 0xFF  # B
            out[4 * i + 3] = (p >> 24) & 0xFF  # A
        return (w, h, 4, bytes(out))
    except (_Corrupt, struct.error, IndexError, ValueError):
        return None


# --- encoder (fixture/test side) ---------------------------------------


class _LSBWriter:
    """LSB-first bit packer; prefix-code bits go MSB-of-code-first
    (mirror of the reader's two access patterns)."""

    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


def _huffman_lengths(freqs: dict, max_len: int) -> dict:
    """Code lengths for the used symbols: Huffman via pairing with
    deterministic ties, falling back to the balanced complete tree
    when the depth cap would be exceeded.  Returns {} / single-entry
    maps for the 0/1-symbol cases (handled by the callers)."""
    import heapq

    used = sorted(freqs)
    if len(used) <= 1:
        return {s: 0 for s in used}
    heap = [(freqs[s], i, (s,)) for i, s in enumerate(used)]
    heapq.heapify(heap)
    tick = len(used)
    depth = {s: 0 for s in used}
    while len(heap) > 1:
        fa, _, syms_a = heapq.heappop(heap)
        fb, _, syms_b = heapq.heappop(heap)
        for s in syms_a + syms_b:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, tick, syms_a + syms_b))
        tick += 1
    if max(depth.values()) <= max_len:
        return depth
    # balanced complete tree: 2k - 2^L symbols at depth L, rest L-1,
    # shorter codes to the more frequent symbols
    k = len(used)
    lv = (k - 1).bit_length()
    n_long = 2 * k - (1 << lv)
    by_freq = sorted(used, key=lambda s: (-freqs[s], s))
    out = {}
    for i, s in enumerate(by_freq):
        out[s] = lv - 1 if i < k - n_long else lv
    return out


def _canonical_codes(lengths: dict) -> dict:
    """Symbol -> (code, length), canonical by (length, symbol)."""
    out = {}
    code = 0
    prev = 0
    for ln, sym in sorted((ln, s) for s, ln in lengths.items() if ln):
        code <<= ln - prev
        prev = ln
        out[sym] = (code, ln)
        code += 1
    return out


def _write_prefix_code(bw: _LSBWriter, lengths: dict, alphabet_size: int):
    """Emit one prefix code, choosing the simple form when it fits;
    returns the canonical symbol->(code,len) map for payload writing."""
    used = sorted(s for s in lengths)
    if not used:
        used = [0]
        lengths = {0: 0}
    if len(used) == 1:
        s = used[0]
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if s < 2:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(s, 1)
        else:
            bw.write(1, 1)  # 8-bit first symbol
            bw.write(s, 8)
        return {s: (0, 0)}
    if len(used) == 2 and used[1] < 256:
        a, b = used
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        if a < 2:
            bw.write(0, 1)
            bw.write(a, 1)
        else:
            bw.write(1, 1)
            bw.write(a, 8)
        bw.write(b, 8)
        return {a: (0, 1), b: (1, 1)}
    bw.write(0, 1)  # normal code
    # RLE over the full alphabet's length sequence
    seq = [lengths.get(s, 0) for s in range(alphabet_size)]
    tokens = []  # (cl_symbol, extra_bits, extra_val)
    i = 0
    prev_nz = 8
    while i < alphabet_size:
        ln = seq[i]
        if ln == 0:
            j = i
            while j < alphabet_size and seq[j] == 0:
                j += 1
            run = j - i
            if j == alphabet_size:
                break  # trailing zeros: stop early via max_symbol
            while run >= 11:
                r = min(run, 138)
                tokens.append((18, 7, r - 11))
                run -= r
            while run >= 3:
                r = min(run, 10)
                tokens.append((17, 3, r - 3))
                run -= r
            for _ in range(run):
                tokens.append((0, 0, 0))
            i = j
        else:
            run = 0
            while i + run < alphabet_size and seq[i + run] == ln:
                run += 1
            tokens.append((ln, 0, 0))
            emitted = 1
            if ln == prev_nz:
                # a fresh 16-run needs the length emitted first anyway
                pass
            prev_nz = ln
            while run - emitted >= 3:
                r = min(run - emitted, 6)
                tokens.append((16, 2, r - 3))
                emitted += r
            while emitted < run:
                tokens.append((ln, 0, 0))
                emitted += 1
            i += run
    cl_freq: dict[int, int] = {}
    for s, _, _ in tokens:
        cl_freq[s] = cl_freq.get(s, 0) + 1
    cl_lengths = _huffman_lengths(cl_freq, 7)
    if len(cl_lengths) == 1:
        # a one-symbol CL code has zero-bit codes; give it a partner
        # so the reader's canonical build stays complete
        only = next(iter(cl_lengths))
        partner = 0 if only != 0 else 1
        cl_lengths = {only: 1, partner: 1}
    cl_codes = _canonical_codes(cl_lengths)
    num_codes = max(
        (i + 1 for i, s in enumerate(_CL_ORDER) if s in cl_lengths), default=4
    )
    num_codes = max(num_codes, 4)
    bw.write(num_codes - 4, 4)
    for s in _CL_ORDER[:num_codes]:
        bw.write(cl_lengths.get(s, 0), 3)
    n_lengths_coded = len(tokens)
    if n_lengths_coded < 2:
        raise ValueError("degenerate length sequence")
    # explicit count: the reader stops after exactly these CL symbols
    bw.write(1, 1)
    nbits_options = [(2 + 2 * i) for i in range(8)]
    for sel, nb in enumerate(nbits_options):
        if n_lengths_coded - 2 < (1 << nb):
            break
    bw.write(sel, 3)
    bw.write(n_lengths_coded - 2, nbits_options[sel])
    for s, eb, ev in tokens:
        c, ln = cl_codes[s]
        bw.write_code(c, ln)
        if eb:
            bw.write(ev, eb)
    return _canonical_codes(lengths)


def _tokenize(pixels, cache_bits, use_lz77):
    """Token stream mirroring the decoder's state machine: literals,
    cache hits, and distance-1 run references."""
    n = len(pixels)
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size
    seen = [False] * cache_size
    tokens = []
    pos = 0
    while pos < n:
        if use_lz77 and pos > 0 and pixels[pos] == pixels[pos - 1]:
            run = 0
            while pos + run < n and pixels[pos + run] == pixels[pos - 1]:
                run += 1
            run = min(run, 4096)
            if run >= 4:
                tokens.append(("copy", run, 1))
                px = pixels[pos - 1]
                if cache_bits:
                    k = _cache_key(px, cache_bits)
                    cache[k] = px
                    seen[k] = True
                pos += run
                continue
        px = pixels[pos]
        if cache_bits:
            k = _cache_key(px, cache_bits)
            if seen[k] and cache[k] == px:
                tokens.append(("cache", k))
                pos += 1
                continue
            cache[k] = px
            seen[k] = True
        tokens.append(("lit", px))
        pos += 1
    return tokens


def _write_image(bw, pixels, xsize, ysize, cache_bits, use_lz77,
                 allow_meta, meta_bits=0):
    """Entropy-code one image (the encoder mirror of _read_pixels)."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    groups_of: list[int] = []
    n_groups = 1
    if allow_meta:
        if meta_bits:
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            mw = -(-xsize // (1 << meta_bits))
            mh = -(-ysize // (1 << meta_bits))
            # group = parity of the block coordinates (2 groups)
            meta_img = [
                (0xFF << 24) | ((((bx + by) % 2) & 0xFFFF) << 8)
                for by in range(mh)
                for bx in range(mw)
            ]
            # the reader derives the group count from the meta image's
            # maximum index — mirror that exactly (a single-block
            # image has only group 0)
            n_groups = max(((p >> 8) & 0xFFFF) for p in meta_img) + 1
            _write_image(bw, meta_img, mw, mh, 0, False, False)
            groups_of = [
                ((y >> meta_bits) * mw + (x >> meta_bits))
                for y in range(ysize)
                for x in range(xsize)
            ]
            groups_of = [(meta_img[g] >> 8) & 0xFFFF for g in groups_of]
            use_lz77 = False  # keep token->pixel->group mapping 1:1
        else:
            bw.write(0, 1)
    tokens = _tokenize(pixels, cache_bits, use_lz77)
    # token -> group (position of the token's first pixel)
    tok_group = []
    pos = 0
    for t in tokens:
        tok_group.append(groups_of[pos] if n_groups > 1 else 0)
        pos += t[1] if t[0] == "copy" else 1
    # frequencies per group
    gfr = [[{} for _ in range(5)] for _ in range(n_groups)]

    def bump(g, which, sym):
        d = gfr[g][which]
        d[sym] = d.get(sym, 0) + 1

    for t, g in zip(tokens, tok_group):
        if t[0] == "lit":
            px = t[1]
            bump(g, 0, (px >> 8) & 0xFF)
            bump(g, 1, (px >> 16) & 0xFF)
            bump(g, 2, px & 0xFF)
            bump(g, 3, (px >> 24) & 0xFF)
        elif t[0] == "cache":
            bump(g, 0, _GREEN_BASE + t[1])
        else:
            lc, _, _ = _lz77_code(t[1])
            bump(g, 0, 256 + lc)
            dc, _, _ = _lz77_code(t[2] + 120)
            bump(g, 4, dc)
    alphabet_sizes = (_GREEN_BASE + cache_size, 256, 256, 256, _NUM_DIST_CODES)
    gcodes = []
    for g in range(n_groups):
        codes = []
        for which in range(5):
            lengths = _huffman_lengths(gfr[g][which], 15)
            codes.append(_write_prefix_code(bw, lengths, alphabet_sizes[which]))
        gcodes.append(codes)
    for t, g in zip(tokens, tok_group):
        green, red, blue, alpha, dist = gcodes[g]
        if t[0] == "lit":
            px = t[1]
            c, ln = green[(px >> 8) & 0xFF]
            bw.write_code(c, ln)
            c, ln = red[(px >> 16) & 0xFF]
            bw.write_code(c, ln)
            c, ln = blue[px & 0xFF]
            bw.write_code(c, ln)
            c, ln = alpha[(px >> 24) & 0xFF]
            bw.write_code(c, ln)
        elif t[0] == "cache":
            c, ln = green[_GREEN_BASE + t[1]]
            bw.write_code(c, ln)
        else:
            lc, eb, ev = _lz77_code(t[1])
            c, ln = green[256 + lc]
            bw.write_code(c, ln)
            if eb:
                bw.write(ev, eb)
            dc, eb, ev = _lz77_code(t[2] + 120)
            c, ln = dist[dc]
            bw.write_code(c, ln)
            if eb:
                bw.write(ev, eb)


#: predictor modes safe for any block (no top-right reference)
_SAFE_PRED_MODES = (7, 1, 2, 11, 12, 6, 13, 8)


def _synth_rgba(w: int, h: int, rgba, seed: int):
    if rgba is not None:
        if len(rgba) != w * h * 4:
            raise ValueError("rgba length mismatch")
        return rgba
    out = bytearray(w * h * 4)
    i = 0
    for y in range(h):
        for x in range(w):
            out[i] = (x * 3 + y * 5 + seed * 11) % 256
            out[i + 1] = (x * 7 + y * 2 + seed * 23) % 256
            out[i + 2] = (x + y * 13 + seed * 31) % 256
            out[i + 3] = (x * 5 + y * 3 + seed * 13) % 256
            i += 4
    return bytes(out)


def _wrap_vp8l(w: int, h: int, bw: _LSBWriter) -> bytes:
    payload = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"  # RIFF even-size padding
    riff_payload = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def encode_webp(
    w: int,
    h: int,
    rgba: "bytes | None" = None,
    seed: int = 0,
    subtract_green: bool = True,
    predictor_bits: int = 0,
    cache_bits: int = 6,
    use_lz77: bool = True,
    meta_bits: int = 0,
) -> bytes:
    """Lossless VP8L WebP of a (w, h) RGBA raster (row-major bytes);
    synthesizes a deterministic seeded gradient (incl. a varying alpha
    plane) when ``rgba`` is None.  Options toggle the subtract-green
    and per-block predictor transforms, the color cache, distance-1
    LZ77 references, and a two-group meta-prefix-code split — every
    decoder path is reachable from the test matrix.  The roundtrip is
    bit-exact (VP8L is lossless)."""
    raster = _synth_rgba(w, h, rgba, seed)
    pixels = [
        (raster[4 * i + 3] << 24)
        | (raster[4 * i] << 16)
        | (raster[4 * i + 1] << 8)
        | raster[4 * i + 2]
        for i in range(w * h)
    ]
    bw = _LSBWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1, 1)  # alpha hint
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # transform type: subtract green
        for i, p in enumerate(pixels):
            g = (p >> 8) & 0xFF
            r = (((p >> 16) & 0xFF) - g) & 0xFF
            b = ((p & 0xFF) - g) & 0xFF
            pixels[i] = (p & 0xFF00FF00) | (r << 16) | b
    if predictor_bits:
        bw.write(1, 1)
        bw.write(0, 2)  # transform type: predictor
        bw.write(predictor_bits - 2, 3)
        mw = -(-w // (1 << predictor_bits))
        mh = -(-h // (1 << predictor_bits))
        modes = [
            _SAFE_PRED_MODES[(bx + by * mw) % len(_SAFE_PRED_MODES)]
            for by in range(mh)
            for bx in range(mw)
        ]
        mode_img = [(0xFF << 24) | (m << 8) for m in modes]
        _write_image(bw, mode_img, mw, mh, 0, False, False)
        res = [0] * (w * h)
        for y in range(h):
            for x in range(w):
                i = y * w + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = pixels[i - 1]
                elif x == 0:
                    pred = pixels[i - w]
                else:
                    m = modes[(y >> predictor_bits) * mw + (x >> predictor_bits)]
                    tr = pixels[i - w] if x == w - 1 else pixels[i - w + 1]
                    pred = _predict(m, pixels[i - 1], pixels[i - w],
                                    pixels[i - w - 1], tr)
                p = pixels[i]
                res[i] = (
                    ((((p >> 24) - (pred >> 24)) & 0xFF) << 24)
                    | (((((p >> 16) & 0xFF) - ((pred >> 16) & 0xFF)) & 0xFF) << 16)
                    | (((((p >> 8) & 0xFF) - ((pred >> 8) & 0xFF)) & 0xFF) << 8)
                    | (((p & 0xFF) - (pred & 0xFF)) & 0xFF)
                )
        pixels = res
    bw.write(0, 1)  # no more transforms
    _write_image(bw, pixels, w, h, cache_bits, use_lz77, True, meta_bits)
    return _wrap_vp8l(w, h, bw)


def encode_webp_indexed(
    w: int, h: int, indices, palette, cache_bits: int = 0
) -> bytes:
    """Color-indexed VP8L: ``palette`` is a list of ARGB ints (2..256),
    ``indices`` a row-major list of palette indices.  Palettes of 16 or
    fewer colors take the sub-byte pixel-bundling path."""
    if not (2 <= len(palette) <= 256):
        raise ValueError("palette size out of range")
    bw = _LSBWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(3, 2)  # transform type: color indexing
    bw.write(len(palette) - 1, 8)
    deltas = []
    prev = 0
    for cur in palette:
        deltas.append(
            ((((cur >> 24) - (prev >> 24)) & 0xFF) << 24)
            | (((((cur >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF) << 16)
            | (((((cur >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF) << 8)
            | ((((cur & 0xFF) - (prev & 0xFF)) & 0xFF))
        )
        prev = cur
    _write_image(bw, deltas, len(palette), 1, 0, False, False)
    bw.write(0, 1)  # no more transforms
    wb = _index_width_bits(len(palette))
    if wb == 0:
        packed = [(0xFF << 24) | (i << 8) for i in indices]
        pw = w
    else:
        per = 1 << wb
        ibits = 8 >> wb
        pw = -(-w // per)
        packed = []
        for y in range(h):
            for bx in range(pw):
                g = 0
                for j in range(per):
                    x = bx * per + j
                    if x < w:
                        g |= indices[y * w + x] << (ibits * j)
                packed.append((0xFF << 24) | (g << 8))
    _write_image(bw, packed, pw, h, cache_bits, False, True)
    return _wrap_vp8l(w, h, bw)
