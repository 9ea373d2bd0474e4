"""WebP lossless (VP8L) codec: pure-Python decode + fixture encoder.

Public-spec work (the "WebP Lossless Bitstream Specification" and the
RIFF-based WebP container spec, both public Google documents). Decode
implements the full VP8L pipeline:

- RIFF walk to the ``VP8L`` chunk, signature + 14-bit geometry header;
- all four transforms, applied inverse in reverse read order:
  PREDICTOR (all 14 modes incl. Select and the ClampAddSubtract pair,
  libwebp's contiguous-buffer top-right semantics at the right border),
  COLOR (signed 3.5 fixed-point cross-channel deltas, transformed red
  feeding the blue delta), SUBTRACT_GREEN, COLOR_INDEXING (delta-coded
  palette + sub-byte pixel bundling, per-transform effective width);
- entropy-coded images: canonical prefix codes (simple 1/2-symbol form
  and the full code-length-code form with 16/17/18 repeats and the
  max-symbol short path), DEFLATE bit order (code bits MSB-first into an
  LSB-first byte stream), optional meta-prefix image selecting a code
  group per tile, optional color cache (``0x1e35a7bd`` multiplier hash),
  LZ77 backward references with the 120-entry 2D distance neighborhood
  map and overlapping copies.

The encoder exists so fixtures are self-contained (the
:func:`matchbox_spark.operators.multimodal.encode_png` pattern): real
per-channel Huffman codes emitted through the full code-length-code
form (or the simple form where it fits), optional SUBTRACT_GREEN,
optional color cache (cache codes on hits), optional distance-1 LZ77
runs (exercising overlapping copies) — every path round-trips bit-exactly
through :func:`decode_webp_pixels`, so the decoder's cache/LZ77/transform
machinery is exercised by construction, not only by hand-built streams.

Like the other codecs this runs inside Arrow-batched ``mapInPandas``;
every malformed-payload path raises ``ValueError`` (fail-closed; fuzzed
in tests/test_webp.py). MP3 / H.264 remain the registry's honest stubs —
lossless WebP is the one remaining still-image format a web corpus hits.
"""

from __future__ import annotations

import heapq
import itertools
import struct

# decode-side cap on DECLARED geometry — same rationale as the GIF/TIFF
# caps: honouring a hostile 16383x16383 declaration from a tiny payload
# would balloon mid-decode; ~33.5M pixels bounds the allocation.
_MAX_PIXELS = 1 << 25

_SIGNATURE = 0x2F

# code-length-code symbol order (spec: prefix-code groups)
_CODE_LENGTH_ORDER = (
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
)

# 2D neighborhood for distance codes 1..120: (dx, dy), spec order
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


# ---------------------------------------------------------------------------
# bit I/O — LSB-first within each byte (the VP8L stream order)
# ---------------------------------------------------------------------------


class _LsbBitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("VP8L: bitstream truncated")
        v = 0
        data = self.data
        pos = self.pos
        for i in range(n):
            v |= ((data[(pos + i) >> 3] >> ((pos + i) & 7)) & 1) << i
        self.pos = end
        return v


class _LsbBitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.bitpos = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            if self.bitpos == 0:
                self.bytes.append(0)
            if (value >> i) & 1:
                self.bytes[-1] |= 1 << self.bitpos
            self.bitpos = (self.bitpos + 1) & 7

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits go most-significant bit first (DEFLATE
        order), each into the LSB-first byte stream."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


class _PrefixCode:
    """Canonical prefix decoder: codes assigned per (length asc, symbol
    asc), read one bit at a time (``acc = acc<<1 | bit`` — first bit read
    is the code's MSB)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("VP8L: prefix code with no symbols")
        if len(nz) == 1:
            self.single = nz[0][1]  # degenerate: one symbol, zero bits
            self.table = None
            return
        self.single = None
        kraft = sum(1 / (1 << ln) for ln, _ in nz)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("VP8L: prefix code lengths not complete")
        nz.sort()
        self.table = {}
        code = 0
        prev_len = nz[0][0]
        for ln, sym in nz:
            code <<= ln - prev_len
            prev_len = ln
            self.table[(ln, code)] = sym
            code += 1

    def read(self, br: _LsbBitReader) -> int:
        if self.single is not None:
            return self.single
        acc = 0
        ln = 0
        table = self.table
        for _ in range(16):
            acc = (acc << 1) | br.read(1)
            ln += 1
            sym = table.get((ln, acc))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code in stream")


def _single(sym: int) -> _PrefixCode:
    pc = _PrefixCode.__new__(_PrefixCode)
    pc.single = sym
    pc.table = None
    return pc


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) under the same canonical assignment.

    A lone zero-length symbol maps to a zero-bit code (the degenerate
    single-symbol form — the decoder's ``_single`` twin)."""
    if len(lengths) == 1 and next(iter(lengths.values())) == 0:
        return {next(iter(lengths)): (0, 0)}
    nz = sorted((ln, s) for s, ln in lengths.items() if ln > 0)
    out = {}
    code = 0
    prev = nz[0][0] if nz else 0
    for ln, sym in nz:
        code <<= ln - prev
        prev = ln
        out[sym] = (code, ln)
        code += 1
    return out


def _read_prefix_code(br: _LsbBitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple form
        num_symbols = br.read(1) + 1
        sym0 = br.read(8 if br.read(1) else 1)
        if sym0 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of range")
        if num_symbols == 1:
            return _single(sym0)
        sym1 = br.read(8)
        if sym1 >= alphabet_size or sym1 == sym0:
            raise ValueError("VP8L: bad simple-code symbol pair")
        # spec assigns codes POSITIONALLY: first symbol read ↔ bit 0,
        # second ↔ bit 1 — not by canonical (symbol-ascending) order
        pc = _PrefixCode.__new__(_PrefixCode)
        pc.single = None
        pc.table = {(1, 0): sym0, (1, 1): sym1}
        return pc
    # full form: code-length code first
    num_code_lengths = 4 + br.read(4)
    if num_code_lengths > 19:
        raise ValueError("VP8L: too many code-length codes")
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):  # max-symbol short path
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        sym = cl_code.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            if i + rep > alphabet_size:
                raise ValueError("VP8L: code-length repeat overflow")
            for _ in range(rep):
                lengths[i] = prev_len
                i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
        if i > alphabet_size:
            raise ValueError("VP8L: code-length run overflow")
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# entropy-coded image (shared by the main image and every sub-image)
# ---------------------------------------------------------------------------


def _prefix_value(br: _LsbBitReader, code: int) -> int:
    """LZ77 length/distance prefix decode (4 direct codes, then pairs
    with growing extra bits)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """Inverse of :func:`_prefix_value`: value → (code, extra_bits,
    extra_value)."""
    val = value - 1
    if val < 4:
        return val, 0, 0
    hb = val.bit_length() - 1
    odd = 1 if val >= (3 << (hb - 1)) else 0
    code = 2 * hb + odd
    extra = hb - 1
    base = (2 + odd) << extra
    return code, extra, val - base


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _cache_key(px: int, cache_bits: int) -> int:
    return (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)


def _decode_entropy_image(
    br: _LsbBitReader, width: int, height: int, allow_meta: bool
) -> list[int]:
    """Decode one entropy-coded ARGB image to a flat row-major list of
    uint32 pixels (0xAARRGGBB)."""
    if width * height > _MAX_PIXELS:
        raise ValueError("VP8L: declared geometry exceeds decoder cap")
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L: invalid color-cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta_codes = None
    meta_bits = 0
    mw = 0
    num_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = _subsample(width, meta_bits)
        mh = _subsample(height, meta_bits)
        meta_img = _decode_entropy_image(br, mw, mh, False)
        meta_codes = [(p >> 8) & 0xFFFF for p in meta_img]  # red<<8 | green
        num_groups = (max(meta_codes) + 1) if meta_codes else 1

    green_alpha = 256 + 24 + cache_size
    groups = [
        (
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, 256),  # red
            _read_prefix_code(br, 256),  # blue
            _read_prefix_code(br, 256),  # alpha
            _read_prefix_code(br, 40),  # distance
        )
        for _ in range(num_groups)
    ]

    cache = [0] * cache_size
    out: list[int] = []
    npix = width * height
    g = groups[0]
    while len(out) < npix:
        if meta_codes is not None:
            pos = len(out)
            g = groups[
                meta_codes[
                    ((pos // width) >> meta_bits) * mw
                    + ((pos % width) >> meta_bits)
                ]
            ]
        green_c, red_c, blue_c, alpha_c, dist_c = g
        s = green_c.read(br)
        if s < 256:
            r = red_c.read(br)
            b = blue_c.read(br)
            a = alpha_c.read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out.append(px)
            if cache_size:
                cache[_cache_key(px, cache_bits)] = px
        elif s < 280:
            length = _prefix_value(br, s - 256)
            dist_code = _prefix_value(br, dist_c.read(br))
            if dist_code <= 120:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * width + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > len(out):
                raise ValueError("VP8L: backward reference before start")
            if len(out) + length > npix:
                raise ValueError("VP8L: backward reference past end")
            for _ in range(length):  # overlapping copies are legal
                px = out[-dist]
                out.append(px)
                if cache_size:
                    cache[_cache_key(px, cache_bits)] = px
        else:
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("VP8L: color-cache index out of range")
            out.append(cache[idx])
    return out


# ---------------------------------------------------------------------------
# inverse transforms (decode side)
# ---------------------------------------------------------------------------


def _add_px(a: int, b: int) -> int:
    """Per-channel modular add of two ARGB uint32."""
    return (
        ((((a >> 24) + (b >> 24)) & 0xFF) << 24)
        | ((((a >> 16 & 0xFF) + (b >> 16 & 0xFF)) & 0xFF) << 16)
        | ((((a >> 8 & 0xFF) + (b >> 8 & 0xFF)) & 0xFF) << 8)
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _avg_px(a: int, b: int) -> int:
    return (
        (((a >> 24) + (b >> 24)) >> 1 << 24)
        | (((a >> 16 & 0xFF) + (b >> 16 & 0xFF)) >> 1 << 16)
        | (((a >> 8 & 0xFF) + (b >> 8 & 0xFF)) >> 1 << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _select(left: int, top: int, topleft: int) -> int:
    p = (
        abs((top >> 24) - (topleft >> 24))
        + abs((top >> 16 & 0xFF) - (topleft >> 16 & 0xFF))
        + abs((top >> 8 & 0xFF) - (topleft >> 8 & 0xFF))
        + abs((top & 0xFF) - (topleft & 0xFF))
    )
    q = (
        abs((left >> 24) - (topleft >> 24))
        + abs((left >> 16 & 0xFF) - (topleft >> 16 & 0xFF))
        + abs((left >> 8 & 0xFF) - (topleft >> 8 & 0xFF))
        + abs((left & 0xFF) - (topleft & 0xFF))
    )
    return left if p < q else top


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _cas_full(l: int, t: int, tl: int) -> int:  # noqa: E741
    return (
        (_clamp((l >> 24) + (t >> 24) - (tl >> 24)) << 24)
        | (
            _clamp((l >> 16 & 0xFF) + (t >> 16 & 0xFF) - (tl >> 16 & 0xFF))
            << 16
        )
        | (_clamp((l >> 8 & 0xFF) + (t >> 8 & 0xFF) - (tl >> 8 & 0xFF)) << 8)
        | _clamp((l & 0xFF) + (t & 0xFF) - (tl & 0xFF))
    )


def _cas_half(l: int, t: int, tl: int) -> int:  # noqa: E741
    def one(lc, tc, tlc):
        ave = (lc + tc) >> 1
        # C integer division truncates toward zero ((a-b)/2 in libwebp),
        # unlike >>1 which floors — differs when ave < tlc by an odd delta
        delta = ave - tlc
        half = abs(delta) >> 1
        return _clamp(ave + (half if delta >= 0 else -half))

    return (
        (one(l >> 24, t >> 24, tl >> 24) << 24)
        | (one(l >> 16 & 0xFF, t >> 16 & 0xFF, tl >> 16 & 0xFF) << 16)
        | (one(l >> 8 & 0xFF, t >> 8 & 0xFF, tl >> 8 & 0xFF) << 8)
        | one(l & 0xFF, t & 0xFF, tl & 0xFF)
    )


def _inv_predictor(
    pix: list[int], width: int, height: int, size_bits: int, modes: list[int]
) -> None:
    mw = _subsample(width, size_bits)
    black = 0xFF000000
    for y in range(height):
        base = y * width
        for x in range(width):
            i = base + x
            if x == 0 and y == 0:
                pred = black
            elif y == 0:
                pred = pix[i - 1]  # top row: left
            elif x == 0:
                pred = pix[i - width]  # first column: top
            else:
                mode = modes[(y >> size_bits) * mw + (x >> size_bits)]
                left = pix[i - 1]
                top = pix[i - width]
                tl = pix[i - width - 1]
                # libwebp's contiguous-buffer semantics: at the right
                # border, top-right wraps to the CURRENT row's first
                # pixel (i - width + 1 == base), which is already decoded
                tr = pix[i - width + 1]
                if mode == 0:
                    pred = black
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg_px(_avg_px(left, tr), top)
                elif mode == 6:
                    pred = _avg_px(left, tl)
                elif mode == 7:
                    pred = _avg_px(left, top)
                elif mode == 8:
                    pred = _avg_px(tl, top)
                elif mode == 9:
                    pred = _avg_px(top, tr)
                elif mode == 10:
                    pred = _avg_px(_avg_px(left, tl), _avg_px(top, tr))
                elif mode == 11:
                    pred = _select(left, top, tl)
                elif mode == 12:
                    pred = _cas_full(left, top, tl)
                elif mode == 13:
                    pred = _cas_half(left, top, tl)
                else:
                    raise ValueError(f"VP8L: invalid predictor mode {mode}")
            pix[i] = _add_px(pix[i], pred)


def _sgn(v: int) -> int:
    return v - 256 if v >= 128 else v


def _inv_color_transform(
    pix: list[int], width: int, height: int, size_bits: int, elems: list[int]
) -> None:
    mw = _subsample(width, size_bits)
    for y in range(height):
        for x in range(width):
            e = elems[(y >> size_bits) * mw + (x >> size_bits)]
            # spec / libwebp ColorCodeToMultipliers: green_to_red lives in
            # the BLUE channel (bits 0-7), green_to_blue in GREEN (8-15),
            # red_to_blue in RED (16-23)
            g2r = _sgn(e & 0xFF)
            g2b = _sgn(e >> 8 & 0xFF)
            r2b = _sgn(e >> 16 & 0xFF)
            i = y * width + x
            px = pix[i]
            g = px >> 8 & 0xFF
            r = ((px >> 16 & 0xFF) + ((g2r * _sgn(g)) >> 5)) & 0xFF
            b = (px & 0xFF) + ((g2b * _sgn(g)) >> 5)
            b = (b + ((r2b * _sgn(r)) >> 5)) & 0xFF
            pix[i] = (px & 0xFF000000) | (r << 16) | (g << 8) | b


def _inv_subtract_green(pix: list[int]) -> None:
    for i, px in enumerate(pix):
        g = px >> 8 & 0xFF
        r = ((px >> 16 & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pix[i] = (px & 0xFF00FF00) | (r << 16) | b


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _vp8l_chunk(payload: bytes) -> bytes:
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload (RIFF/WEBP header missing)")
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("WebP: chunk truncated")
        if tag == b"VP8L":
            return body
        if tag in (b"VP8 ", b"VP8X"):
            raise ValueError(
                "WebP: lossy/extended variants unsupported (VP8L only)"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("WebP: no VP8L chunk found")


def decode_webp_pixels(payload: bytes):
    """Decode a lossless WebP (VP8L) to an (H, W, 3) uint8 RGB array.

    Full transform + entropy pipeline (module docstring); alpha drops
    like the PNG decoder. Raises ``ValueError`` on every malformed or
    non-lossless payload."""
    import numpy as np

    data = _vp8l_chunk(payload)
    if not data or data[0] != _SIGNATURE:
        raise ValueError("VP8L: bad signature byte")
    br = _LsbBitReader(data)
    br.pos = 8
    width = br.read(14) + 1
    height = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    if width * height > _MAX_PIXELS:
        raise ValueError("VP8L: declared geometry exceeds decoder cap")

    # transforms, in read order; each at most once. Every transform
    # records the EFFECTIVE width it applies to (color-indexing may
    # shrink it for transforms read after it).
    transforms: list[tuple] = []
    seen = set()
    eff_width = width
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / color share the layout
            size_bits = br.read(3) + 2
            sub = _decode_entropy_image(
                br,
                _subsample(eff_width, size_bits),
                _subsample(height, size_bits),
                False,
            )
            if ttype == 0:
                transforms.append(
                    (
                        "predictor",
                        eff_width,
                        size_bits,
                        [p >> 8 & 0xFF for p in sub],
                    )
                )
            else:
                transforms.append(("color", eff_width, size_bits, sub))
        elif ttype == 2:
            transforms.append(("subtract_green",))
        else:  # color indexing
            palette_size = br.read(8) + 1
            pal_img = _decode_entropy_image(br, palette_size, 1, False)
            palette = []
            prev = 0
            for p in pal_img:
                prev = _add_px(prev, p)
                palette.append(prev)
            if palette_size <= 2:
                pack_bits = 3
            elif palette_size <= 4:
                pack_bits = 2
            elif palette_size <= 16:
                pack_bits = 1
            else:
                pack_bits = 0
            transforms.append(("indexing", eff_width, pack_bits, palette))
            eff_width = _subsample(eff_width, pack_bits)

    pix = _decode_entropy_image(br, eff_width, height, True)

    for t in reversed(transforms):
        if t[0] == "indexing":
            full_width, pack_bits, palette = t[1], t[2], t[3]
            if pack_bits:
                per = 1 << pack_bits  # pixels per packed unit
                ibits = 8 >> pack_bits  # index width in bits
                mask = (1 << ibits) - 1
                packed_w = _subsample(full_width, pack_bits)
                idx = []
                for y in range(height):
                    row = []
                    for xp in range(packed_w):
                        v = pix[y * packed_w + xp] >> 8 & 0xFF
                        for k in range(per):
                            row.append((v >> (k * ibits)) & mask)
                    idx.extend(row[:full_width])
            else:
                idx = [p >> 8 & 0xFF for p in pix]
            out = []
            for i in idx:
                if i >= len(palette):
                    raise ValueError("VP8L: palette index out of range")
                out.append(palette[i])
            pix = out
        elif t[0] == "subtract_green":
            _inv_subtract_green(pix)
        elif t[0] == "predictor":
            _inv_predictor(pix, t[1], height, t[2], t[3])
        elif t[0] == "color":
            _inv_color_transform(pix, t[1], height, t[2], t[3])

    if len(pix) != width * height:
        raise ValueError("VP8L: pixel count mismatch after transforms")
    arr = np.array(pix, dtype=np.uint32).reshape(height, width)
    rgb = np.empty((height, width, 3), dtype=np.uint8)
    rgb[..., 0] = (arr >> 16) & 0xFF
    rgb[..., 1] = (arr >> 8) & 0xFF
    rgb[..., 2] = arr & 0xFF
    return rgb


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Code lengths from symbol frequencies (heap Huffman). Fixtures stay
    far below the 15-bit cap; assert rather than length-limit."""
    if not freqs:
        raise ValueError("no symbols")
    if len(freqs) == 1:
        return {next(iter(freqs)): 0}  # single symbol: zero-bit code
    counter = itertools.count()
    heap = [(f, next(counter), {s: 0}) for s, f in freqs.items()]
    heapq.heapify(heap)
    while len(heap) > 1:
        f1, _, m1 = heapq.heappop(heap)
        f2, _, m2 = heapq.heappop(heap)
        merged = {s: ln + 1 for s, ln in m1.items()}
        merged.update({s: ln + 1 for s, ln in m2.items()})
        heapq.heappush(heap, (f1 + f2, next(counter), merged))
    lengths = heap[0][2]
    if max(lengths.values()) > max_len:
        raise ValueError("fixture Huffman exceeded 15 bits")
    return lengths


def _emit_prefix_code(
    bw: _LsbBitWriter, lengths: dict[int, int], alphabet_size: int
) -> None:
    """Emit a prefix code: simple form when it fits (≤2 symbols, all
    < 256), else the full code-length-code form."""
    syms = sorted(lengths)
    if len(syms) == 1 and syms[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if syms[0] < 2:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        else:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        return
    if len(syms) == 2 and syms[1] < 256:
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        if syms[0] < 2:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        else:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        bw.write(syms[1], 8)
        return
    # full form: RLE the dense length array into code-length symbols
    dense = [lengths.get(s, 0) for s in range(alphabet_size)]
    # single-symbol codes have length 0 in our dict; the full form cannot
    # express "the only symbol" that way — promote to length 1? A lone
    # symbol ≥256 cannot occur for any stream our encoder produces
    # (green always holds at least one literal < 256).
    stream: list[tuple[int, int, int]] = []  # (cl_symbol, extra_bits, extra)
    i = 0
    n = alphabet_size
    while i < n:
        ln = dense[i]
        run = 1
        while i + run < n and dense[i + run] == ln:
            run += 1
        if ln == 0:
            left = run
            while left >= 11:
                take = min(left, 11 + 127)
                stream.append((18, 7, take - 11))
                left -= take
            while left >= 3:
                take = min(left, 3 + 7)
                stream.append((17, 3, take - 3))
                left -= take
            for _ in range(left):
                stream.append((0, 0, 0))
        else:
            stream.append((ln, 0, 0))
            left = run - 1
            while left >= 3:
                take = min(left, 3 + 3)
                stream.append((16, 2, take - 3))
                left -= take
            for _ in range(left):
                stream.append((ln, 0, 0))
        i += run
    cl_freqs: dict[int, int] = {}
    for s, _, _ in stream:
        cl_freqs[s] = cl_freqs.get(s, 0) + 1
    cl_lengths = _huffman_lengths(cl_freqs, max_len=7)
    if len(cl_lengths) == 1:
        # a zero-bit cl code reads forever; give the lone symbol length 1
        # alongside an unused partner to keep the code complete
        lone = next(iter(cl_lengths))
        partner = 0 if lone != 0 else 1
        cl_lengths = {lone: 1, partner: 1}
    order_pos = {s: i for i, s in enumerate(_CODE_LENGTH_ORDER)}
    num_code_lengths = max(
        max(order_pos[s] for s in cl_lengths) + 1, 4
    )
    bw.write(0, 1)  # full form
    bw.write(num_code_lengths - 4, 4)
    for i in range(num_code_lengths):
        bw.write(cl_lengths.get(_CODE_LENGTH_ORDER[i], 0), 3)
    bw.write(0, 1)  # no max-symbol shortcut
    cl_codes = _canonical_codes(cl_lengths)
    for s, extra_bits, extra in stream:
        code, ln = cl_codes[s]
        bw.write_code(code, ln)
        if extra_bits:
            bw.write(extra, extra_bits)


def encode_webp_lossless(
    img,
    subtract_green: bool = False,
    cache_bits: int = 0,
    use_lz77_runs: bool = False,
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a lossless WebP (VP8L).

    Real per-channel Huffman codes; optional SUBTRACT_GREEN transform,
    optional color cache, optional distance-1 LZ77 runs — every path
    round-trips bit-exactly through :func:`decode_webp_pixels`."""
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_webp_lossless expects (H, W, 3) uint8")
    h, w = int(img.shape[0]), int(img.shape[1])
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("dimensions out of VP8L range")
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError("cache_bits out of range")

    argb = (
        (np.uint32(0xFF) << 24)
        | (img[..., 0].astype(np.uint32) << 16)
        | (img[..., 1].astype(np.uint32) << 8)
        | img[..., 2].astype(np.uint32)
    ).reshape(-1)
    if subtract_green:
        g = (argb >> 8) & 0xFF
        r = ((argb >> 16) - g) & 0xFF
        b = (argb - g) & 0xFF
        argb = (argb & np.uint32(0xFF00FF00)) | (r << 16) | b
    pix = [int(p) for p in argb]

    cache_size = (1 << cache_bits) if cache_bits else 0

    # pass 1: tokenize (literal / run / cache-hit) and count symbols
    tokens: list[tuple] = []  # ("lit", px) | ("run", length) | ("cache", key)
    cache: list = [None] * cache_size
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    i = 0
    n = len(pix)
    while i < n:
        px = pix[i]
        if use_lz77_runs and i > 0 and pix[i - 1] == px:
            run = 1
            while i + run < n and pix[i + run] == px and run < 4096:
                run += 1
            if run >= 3:
                tokens.append(("run", run))
                code, _, _ = _prefix_encode(run)
                gf[256 + code] = gf.get(256 + code, 0) + 1
                df[1] = df.get(1, 0) + 1  # prefix value 2 → map (1,0) → dist 1
                if cache_size:
                    cache[_cache_key(px, cache_bits)] = px
                i += run
                continue
        if cache_size:
            key = _cache_key(px, cache_bits)
            if cache[key] == px:
                tokens.append(("cache", key))
                gf[280 + key] = gf.get(280 + key, 0) + 1
                i += 1
                continue
            cache[key] = px
        tokens.append(("lit", px))
        gf[px >> 8 & 0xFF] = gf.get(px >> 8 & 0xFF, 0) + 1
        rf[px >> 16 & 0xFF] = rf.get(px >> 16 & 0xFF, 0) + 1
        bf[px & 0xFF] = bf.get(px & 0xFF, 0) + 1
        af[px >> 24] = af.get(px >> 24, 0) + 1
        i += 1
    if not df:
        df[0] = 1  # unused distance code still needs a well-formed table

    bw = _LsbBitWriter()
    bw.write(_SIGNATURE, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha unused
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    bw.write(0, 1)  # no meta-prefix

    green_alpha = 256 + 24 + cache_size
    codes = []
    for freqs, alphabet in (
        (gf, green_alpha),
        (rf, 256),
        (bf, 256),
        (af, 256),
        (df, 40),
    ):
        lengths = _huffman_lengths(freqs)
        _emit_prefix_code(bw, lengths, alphabet)
        codes.append(_canonical_codes(lengths))
    gc, rc, bc, ac, dc = codes

    def put(codemap, sym):
        code, ln = codemap[sym]
        bw.write_code(code, ln)

    for kind, val in tokens:
        if kind == "lit":
            put(gc, val >> 8 & 0xFF)
            put(rc, val >> 16 & 0xFF)
            put(bc, val & 0xFF)
            put(ac, val >> 24)
        elif kind == "run":
            code, extra_bits, extra = _prefix_encode(val)
            put(gc, 256 + code)
            if extra_bits:
                bw.write(extra, extra_bits)
            put(dc, 1)  # prefix value 2 → neighborhood (1, 0) → distance 1
        else:  # cache
            put(gc, 280 + val)

    vp8l = bytes(bw.bytes)
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    riff_body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
