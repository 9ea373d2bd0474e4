"""Baseline TIFF codec — pure Python/NumPy, strip-based.

Covers the TIFF 6.0 baseline a real web/scan corpus overwhelmingly holds:
8-bit RGB (PhotometricInterpretation 2) and greyscale (1), chunky planar
layout, uncompressed (Compression 1) or PackBits (32773), little- OR
big-endian containers, multi-strip files (``RowsPerStrip`` < height).
Anything else — tiled layout, LZW/JPEG-in-TIFF, planar=2, non-8-bit
samples — raises ``ValueError`` so the multimodal scan classifies the
object as a capability gap or corruption instead of a task failure
(the m5/m6/m7 status contract).

The reference repo has no media codecs at all; this module exists for the
multimodal-column extension (SURVEY §2.12) so ``decode_image_stats`` /
``extract_media_metadata`` handle the last common raster format for real.

Hostile-input posture matches gif.py/jpeg.py: declared geometry capped at
``_MAX_PIXELS`` before any allocation, every header/offset read bounds-
checked, and all failures are ``ValueError``.
"""

from __future__ import annotations

import struct

_MAX_PIXELS = 1 << 25

# baseline tag ids
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284

_TYPE_SIZE = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG


def _read_ifd(payload: bytes) -> tuple[dict[int, list[int]], str]:
    """Parse header + first IFD → {tag: [values]} and the endian prefix."""
    if len(payload) < 8:
        raise ValueError("TIFF payload shorter than the 8-byte header")
    order = payload[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF payload (bad byte-order mark)")
    magic, ifd_off = struct.unpack_from(e + "HI", payload, 2)
    if magic != 42:
        raise ValueError("not a TIFF payload (magic != 42)")
    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF IFD offset beyond payload")
    (n_entries,) = struct.unpack_from(e + "H", payload, ifd_off)
    end = ifd_off + 2 + 12 * n_entries
    if end + 4 > len(payload):
        raise ValueError("TIFF IFD truncated")
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(e + "HHI", payload, off)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # rational/ascii metadata tags — not needed here
        total = size * count
        if total <= 4:
            voff = off + 8
        else:
            (voff,) = struct.unpack_from(e + "I", payload, off + 8)
            if voff + total > len(payload):
                raise ValueError(f"TIFF tag {tag} value area beyond payload")
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(
            struct.unpack_from(e + fmt * count, payload, voff)
        )
    return tags, e


def _unpackbits(data: bytes, expected: int) -> bytes:
    """Decode a PackBits stream to exactly ``expected`` bytes."""
    out = bytearray()
    i, n = 0, len(data)
    while len(out) < expected:
        if i >= n:
            raise ValueError("TIFF PackBits stream truncated")
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1 bytes
            j = i + c + 1
            if j > n:
                raise ValueError("TIFF PackBits literal overruns strip")
            out += data[i:j]
            i = j
        elif c > 128:  # repeat next byte 257-c times
            if i >= n:
                raise ValueError("TIFF PackBits repeat overruns strip")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op
    if len(out) != expected:
        raise ValueError("TIFF PackBits output exceeds the expected rows")
    return bytes(out)


def tiff_frame_info(payload: bytes) -> tuple[int, int]:
    """(width, height) from the first IFD — the metadata probe."""
    tags, _ = _read_ifd(payload)
    try:
        w, h = tags[_T_WIDTH][0], tags[_T_HEIGHT][0]
    except (KeyError, IndexError):
        raise ValueError("TIFF missing ImageWidth/ImageLength") from None
    if w <= 0 or h <= 0:
        raise ValueError("TIFF declares a degenerate geometry")
    if w * h > _MAX_PIXELS:
        raise ValueError("TIFF geometry exceeds the decode pixel cap")
    return w, h


def decode_tiff_pixels(payload: bytes):
    """Decode a baseline TIFF to an (H, W, 3) uint8 RGB array."""
    import numpy as np

    tags, _ = _read_ifd(payload)
    w, h = tiff_frame_info(payload)
    spp = tags.get(_T_SPP, [1])[0]
    photometric = tags.get(_T_PHOTOMETRIC, [1])[0]
    compression = tags.get(_T_COMPRESSION, [1])[0]
    planar = tags.get(_T_PLANAR, [1])[0]
    bits = tags.get(_T_BITS, [8])
    if photometric not in (1, 2):
        raise ValueError(f"unsupported TIFF photometric {photometric}")
    if (photometric == 2) != (spp == 3) or spp not in (1, 3):
        raise ValueError(f"TIFF photometric {photometric} with {spp} samples")
    if compression not in (1, 32773):
        raise ValueError(f"unsupported TIFF compression {compression}")
    if planar != 1:
        raise ValueError("planar TIFF (PlanarConfiguration=2) not supported")
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bit depth {bits}")
    offsets = tags.get(_T_STRIP_OFFSETS)
    counts = tags.get(_T_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/byte-counts missing or unpaired")
    rows_per_strip = tags.get(_T_ROWS_PER_STRIP, [h])[0]
    if rows_per_strip <= 0:
        raise ValueError("TIFF RowsPerStrip must be positive")
    if len(offsets) != -(-h // rows_per_strip):
        raise ValueError("TIFF strip count inconsistent with RowsPerStrip")

    row_bytes = w * spp
    parts = []
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(payload):
            raise ValueError("TIFF strip beyond payload")
        nrows = min(rows_per_strip, h - s * rows_per_strip)
        expected = nrows * row_bytes
        raw = payload[off : off + cnt]
        if compression == 32773:
            raw = _unpackbits(raw, expected)
        elif len(raw) != expected:
            raise ValueError("TIFF strip byte count mismatch")
        parts.append(raw)
    px = np.frombuffer(b"".join(parts), np.uint8).reshape(h, w, spp)
    if spp == 1:
        return np.repeat(px[..., None] if px.ndim == 2 else px, 3, axis=2)
    return px


def _packbits_row(row: bytes) -> bytes:
    """PackBits-encode one row (TIFF 6.0: rows compress independently)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 2:  # replicate run
            out += bytes([257 - (j - i), row[i]])
            i = j
        else:  # literal run: until next replicate of >=3 or 128 bytes
            j = i + 1
            while (
                j < n
                and j - i < 128
                and not (
                    j + 2 < n and row[j] == row[j + 1] == row[j + 2]
                )
            ):
                j += 1
            out += bytes([j - i - 1]) + row[i:j]
            i = j
    return bytes(out)


def encode_tiff(
    pixels,
    packbits: bool = False,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a baseline TIFF.

    ``rows_per_strip`` defaults to ceil(h/3) so even tiny images exercise
    the multi-strip walk; ``packbits`` selects Compression 32773 (rows
    compressed independently per TIFF 6.0); ``big_endian`` writes an MM
    container."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, spp = px.shape
    e = ">" if big_endian else "<"
    if rows_per_strip is None:
        rows_per_strip = max(1, -(-h // 3))
    strips = []
    for s in range(-(-h // rows_per_strip)):
        rows = px[s * rows_per_strip : (s + 1) * rows_per_strip]
        raw = rows.tobytes()
        if packbits:
            rb = w * spp
            raw = b"".join(
                _packbits_row(raw[r * rb : (r + 1) * rb])
                for r in range(len(rows))
            )
        strips.append(raw)

    n_tags = 9
    ifd_off = 8
    ifd_size = 2 + 12 * n_tags + 4
    aux_off = ifd_off + ifd_size  # external value area (BitsPerSample, arrays)
    aux = bytearray()

    def ext(fmt: str, values: list[int]) -> int:
        off = aux_off + len(aux)
        aux.extend(struct.pack(e + fmt * len(values), *values))
        return off

    bits_off = ext("H", [8] * spp)
    n_strips = len(strips)
    # strip data begins after the aux area — lay out sequentially
    counts = [len(s) for s in strips]
    # reserve space for the offset/count arrays if they spill out of line
    offsets_slot = ext("I", [0] * n_strips) if n_strips > 1 else None
    counts_slot = ext("I", [0] * n_strips) if n_strips > 1 else None
    data_start = aux_off + len(aux)
    offsets = []
    pos = data_start
    for c in counts:
        offsets.append(pos)
        pos += c
    if n_strips > 1:
        struct.pack_into(
            e + "I" * n_strips, aux, offsets_slot - aux_off, *offsets
        )
        struct.pack_into(
            e + "I" * n_strips, aux, counts_slot - aux_off, *counts
        )

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        head = struct.pack(e + "HHI", tag, typ, count)
        if typ == 3 and count == 1:
            return head + struct.pack(e + "HH", value, 0)
        return head + struct.pack(e + "I", value)

    entries = [
        entry(_T_WIDTH, 4, 1, w),
        entry(_T_HEIGHT, 4, 1, h),
        entry(_T_BITS, 3, spp, bits_off if spp > 2 else 8),
        entry(_T_COMPRESSION, 3, 1, 32773 if packbits else 1),
        entry(_T_PHOTOMETRIC, 3, 1, 2 if spp == 3 else 1),
        entry(
            _T_STRIP_OFFSETS,
            4,
            n_strips,
            offsets[0] if n_strips == 1 else offsets_slot,
        ),
        entry(_T_SPP, 3, 1, spp),
        entry(_T_ROWS_PER_STRIP, 4, 1, rows_per_strip),
        entry(
            _T_STRIP_COUNTS,
            4,
            n_strips,
            counts[0] if n_strips == 1 else counts_slot,
        ),
    ]
    ifd = struct.pack(e + "H", n_tags) + b"".join(entries) + struct.pack(
        e + "I", 0
    )
    header = (b"MM" if big_endian else b"II") + struct.pack(e + "HI", 42, 8)
    return header + ifd + bytes(aux) + b"".join(strips)
