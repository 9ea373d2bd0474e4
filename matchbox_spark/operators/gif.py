"""GIF (LZW) codec: pure-Python decode + encode of the last common legacy
web image format (round 10).

Public-spec work (GIF87a/GIF89a, CompuServe specification; the LZW
variable-width coding is the one documented in the GIF89a appendix):
header + logical screen descriptor, global/local color tables, extension
skip, first-frame image descriptor, sub-block reassembly, LSB-first
variable-width LZW decompression (clear/EOI codes, 12-bit cap, the
cScSc ``code == next`` special case), 4-pass interlace, palette lookup.
The encoder exists so fixtures are self-contained like
:func:`matchbox_spark.operators.multimodal.encode_png` — palette build,
LZW compression with width growth mirrored against the decoder, optional
interlace — and round-trips bit-exactly through the decoder.

Like the JPEG/PNG codecs this runs inside Arrow-batched ``mapInPandas``
(deliberate: no JVM-side codec exists), with every malformed-payload path
raising ``ValueError`` so the scan-level status taxonomy absorbs it
(fail-closed; fuzzed in tests/test_gif.py).
"""

from __future__ import annotations

import struct

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

# decode-side cap on DECLARED geometry (screen or frame): LZW expands up
# to 4096x per code, so honouring a 65535x65535 declaration from a
# kilobyte-sized hostile payload would balloon to gigabytes mid-decode
# and kill the Arrow worker with OOM instead of the contractual
# ValueError. 2^25 pixels (~33.5M, e.g. 8192x4096) is far beyond any
# stats-corpus poster raster while keeping the worst allocation ~100 MB.
_MAX_PIXELS = 1 << 25


# ---------------------------------------------------------------------------
# bit I/O (LSB-first, unlike JPEG's MSB-first streams)
# ---------------------------------------------------------------------------


class _LsbBitReader:
    """LSB-first bit reader over a byte string (the GIF LZW order)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("GIF LZW stream truncated")
        out = 0
        got = 0
        while got < n:
            byte = self.data[(self.pos + got) >> 3]
            bit_off = (self.pos + got) & 7
            take = min(n - got, 8 - bit_off)
            out |= ((byte >> bit_off) & ((1 << take) - 1)) << got
            got += take
        self.pos = end
        return out


class _LsbBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable width, clear/EOI, 12-bit cap)
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """Decompress a GIF LZW stream to exactly ``n_pixels`` palette indices."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    rd = _LsbBitReader(data)
    out = bytearray()

    def reset():
        return (
            [bytes((i,)) for i in range(clear)] + [b"", b""],
            min_code_size + 1,
        )

    table, width = reset()
    prev: int | None = None
    while len(out) < n_pixels:
        code = rd.read(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW stream starts with invalid code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = table[prev] + table[prev][:1]  # cScSc case
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(table[prev] + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = code
    if len(out) < n_pixels:
        raise ValueError("GIF LZW stream ended before the frame was full")
    return out[:n_pixels]


def lzw_encode(indices, min_code_size: int) -> bytes:
    """Compress palette indices with GIF LZW (mirror of :func:`lzw_decode`:
    the encoder's width bump fires one table entry later — next ==
    2^width + 1 — so both sides read/write every code at the same width)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    wr = _LsbBitWriter()
    width = min_code_size + 1
    table: dict = {}
    next_code = eoi + 1
    wr.write(clear, width)
    prefix = -1
    for k in indices:
        k = int(k)
        if prefix < 0:
            prefix = k
            continue
        key = (prefix, k)
        found = table.get(key)
        if found is not None:
            prefix = found
            continue
        wr.write(prefix, width)
        table[key] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            wr.write(clear, width)
            table.clear()
            width = min_code_size + 1
            next_code = eoi + 1
        prefix = k
    if prefix >= 0:
        wr.write(prefix, width)
    wr.write(eoi, width)
    return wr.flush()


# ---------------------------------------------------------------------------
# container walk
# ---------------------------------------------------------------------------


def _read_color_table(payload: bytes, pos: int, packed: int):
    if not packed & 0x80:
        return None, pos
    n = 2 << (packed & 0x07)
    end = pos + 3 * n
    if end > len(payload):
        raise ValueError("GIF color table truncated")
    return payload[pos:end], end


def _skip_sub_blocks(payload: bytes, pos: int) -> int:
    while True:
        if pos >= len(payload):
            raise ValueError("GIF sub-blocks truncated")
        n = payload[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n
        if pos > len(payload):
            raise ValueError("GIF sub-blocks truncated")


def _collect_sub_blocks(payload: bytes, pos: int):
    parts = []
    while True:
        if pos >= len(payload):
            raise ValueError("GIF sub-blocks truncated")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        if pos + n > len(payload):
            raise ValueError("GIF sub-blocks truncated")
        parts.append(payload[pos : pos + n])
        pos += n


def gif_screen_info(payload: bytes):
    """(width, height) of the logical screen — the metadata-probe surface."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", payload, 6)
    if w < 1 or h < 1:
        raise ValueError("GIF declares empty logical screen")
    return w, h


def decode_gif_pixels(payload: bytes):
    """Decode the FIRST frame of a GIF to an (H, W, 3) uint8 RGB array
    sized to the LOGICAL SCREEN, with the frame composited at its declared
    (left, top) placement over the background color — so the raster's
    geometry always agrees with the :func:`gif_screen_info` metadata probe
    for the same payload (real-world GIFs often carry a first frame that
    is a sub-rectangle of the screen).

    Full container walk: signature, logical screen descriptor, global
    color table, extension blocks skipped (animation control is metadata,
    not raster), image descriptor with optional local color table and
    interlace flag, LZW decompression, 4-pass deinterlace, palette
    lookup. Transparency is ignored (the palette color is reported as-is
    — stats pipelines want the stored raster). Later animation frames are
    out of scope for the stats surface; the first frame IS the poster
    raster corpora index by.

    Declared geometry is capped at ``_MAX_PIXELS``: LZW expands up to
    4096× per code, so a kilobyte-sized hostile payload can declare a
    65535×65535 frame and balloon to gigabytes mid-decode — the cap keeps
    the fail-closed contract (ValueError, absorbed by the scan-level
    status taxonomy) instead of an executor OOM."""
    import numpy as np

    sw, sh = gif_screen_info(payload)  # validates signature + screen
    if sw * sh > _MAX_PIXELS:
        raise ValueError("GIF logical screen exceeds the decode pixel cap")
    packed = payload[10]
    bg_index = payload[11]
    gct, pos = _read_color_table(payload, 13, packed)

    while True:
        if pos >= len(payload):
            raise ValueError("GIF ended before an image descriptor")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF has no image frame")
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(payload):
                raise ValueError("GIF extension truncated")
            pos = _skip_sub_blocks(payload, pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        break

    if pos + 9 > len(payload):
        raise ValueError("GIF image descriptor truncated")
    left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos)
    fpacked = payload[pos + 8]
    pos += 9
    if fw < 1 or fh < 1:
        raise ValueError("GIF frame declares empty geometry")
    if fw * fh > _MAX_PIXELS:
        raise ValueError("GIF frame exceeds the decode pixel cap")
    if left >= sw or top >= sh:
        raise ValueError("GIF frame placed entirely outside the screen")
    interlaced = bool(fpacked & 0x40)
    lct, pos = _read_color_table(payload, pos, fpacked)
    palette_bytes = lct if lct is not None else gct
    if palette_bytes is None:
        raise ValueError("GIF frame has no color table")
    palette = np.frombuffer(palette_bytes, np.uint8).reshape(-1, 3)

    if pos >= len(payload):
        raise ValueError("GIF LZW header truncated")
    mcs = payload[pos]
    data, pos = _collect_sub_blocks(payload, pos + 1)
    idx = np.frombuffer(
        bytes(lzw_decode(data, mcs, fw * fh)), np.uint8
    ).reshape(fh, fw)
    if interlaced:
        ordered = np.empty_like(idx)
        r = 0
        for start, step in _INTERLACE_PASSES:
            rows = range(start, fh, step)
            ordered[list(rows)] = idx[r : r + len(rows)]
            r += len(rows)
        idx = ordered
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("GIF palette index out of range")
    frame = palette[idx]
    if left == 0 and top == 0 and fw == sw and fh == sh:
        return frame  # frame covers the screen exactly (the common case)
    # composite onto the screen canvas: background color per the logical
    # screen descriptor (the bg index refers to the GLOBAL table; black
    # when there is none or the index is out of range), frame clipped to
    # the screen bounds
    canvas = np.zeros((sh, sw, 3), np.uint8)
    if gct is not None and bg_index * 3 + 3 <= len(gct):
        canvas[:, :] = np.frombuffer(
            gct[bg_index * 3 : bg_index * 3 + 3], np.uint8
        )
    ch = min(fh, sh - top)
    cw = min(fw, sw - left)
    canvas[top : top + ch, left : left + cw] = frame[:ch, :cw]
    return canvas


def encode_gif(pixels, interlace: bool = False) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a single-frame GIF89a.

    Builds an exact palette from the distinct colors (≤ 256 — GIF is a
    palette format; quantisation is the caller's business), optionally
    interlaces, LZW-compresses, and packages 255-byte sub-blocks. Exists
    for self-contained fixtures and the resize/re-encode surface;
    round-trips bit-exactly through :func:`decode_gif_pixels`."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_gif expects an (H, W, 3) uint8 array")
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    # palette size must be a power of two ≥ 2 (field stores 2^(n+1))
    size_exp = max(1, int(len(colors) - 1).bit_length())
    n_pal = 1 << size_exp
    palette = np.zeros((n_pal, 3), np.uint8)
    palette[: len(colors)] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = []
        for start, step in _INTERLACE_PASSES:
            rows.extend(range(start, h, step))
        idx = idx[rows]

    mcs = max(2, size_exp)
    compressed = lzw_encode(idx.reshape(-1), mcs)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes((0x80 | ((size_exp - 1) & 0x07), 0, 0))  # GCT flag + size
    out += palette.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes(((0x40 if interlace else 0),))
    out += bytes((mcs,))
    for i in range(0, len(compressed), 255):
        chunk = compressed[i : i + 255]
        out += bytes((len(chunk),)) + chunk
    out += b"\x00\x3b"
    return bytes(out)
