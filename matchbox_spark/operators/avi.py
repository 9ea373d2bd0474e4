"""MJPEG-in-AVI (RIFF) container walker — pure Python.

The round-10 frame sampler synthesised durations from a payload checksum;
this module makes ``m2_frame_sampling`` operate on REAL media bytes end to
end (the same honesty upgrade m5/m9 got): ``encode_avi_mjpeg`` writes a
standard AVI — RIFF header, ``hdrl`` list (``avih`` + video ``strl`` with
an MJPG ``strh``/``strf``), ``movi`` list of one ``00dc`` chunk per JPEG
frame, ``idx1`` index — and ``demux_mjpeg_frames`` walks it back to
per-frame JPEG payloads with timestamps, reusing the round-8 T.81 decoder
for pixels. The reference repo has no media layer at all (SURVEY §2.12
extension surface).

Hostile-input posture matches tiff.py/gif.py: every chunk read is
bounds-checked, declared counts are capped, and all failures raise
``ValueError`` so a corrupt object classifies instead of killing a task.
"""

from __future__ import annotations

import struct

_MAX_FRAMES = 1 << 16


def _u32(b: bytes, off: int) -> int:
    if off + 4 > len(b):
        raise ValueError("AVI chunk header beyond payload")
    return struct.unpack_from("<I", b, off)[0]


def encode_avi_mjpeg(frames: list[bytes], fps: int = 4,
                     width: int | None = None,
                     height: int | None = None) -> bytes:
    """Write an MJPEG AVI holding ``frames`` (each a complete JPEG).

    Geometry defaults to the first frame's SOF header so the container
    and codec agree without the caller repeating itself."""
    if not frames:
        raise ValueError("an AVI needs at least one frame")
    if width is None or height is None:
        from matchbox_spark.operators.jpeg import jpeg_frame_info

        _, width, height = jpeg_frame_info(frames[0])
    usec_per_frame = 1_000_000 // fps
    max_bytes = max(len(f) for f in frames)

    avih = b"avih" + struct.pack(
        "<IIIIIIIIIIIIII",
        56,
        usec_per_frame,
        max_bytes * fps,
        0,
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,
        1,
        max_bytes,
        width,
        height,
        0, 0, 0,
    ) + b"\x00\x00\x00\x00"
    strh = b"strh" + struct.pack(
        "<I4s4sIHHIIIIIIIiHHHH",
        56,
        b"vids",
        b"MJPG",
        0, 0, 0, 0,
        1,            # dwScale
        fps,          # dwRate
        0,
        len(frames),  # dwLength (frames)
        max_bytes,
        10000,  # dwQuality
        0,
        0, 0, width, height,
    )
    strf = b"strf" + struct.pack(
        "<IIiiHH4sIiiII",
        40, 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) + b"hdrl" + avih + strl

    movi_body = bytearray(b"movi")
    offsets = []  # offset of each 00dc chunk relative to 'movi' fourcc
    for f in frames:
        offsets.append(len(movi_body))
        movi_body += b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) % 2:
            movi_body += b"\x00"  # RIFF chunks are word-aligned
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + bytes(movi_body)

    idx = bytearray()
    for off, f in zip(offsets, frames):
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
    idx1 = b"idx1" + struct.pack("<I", len(idx)) + bytes(idx)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_info(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_frames, usec_per_frame) from the ``avih`` header."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (RIFF/AVI signature)")
    pos, end = 12, min(len(payload), 8 + _u32(payload, 4))
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = _u32(payload, pos + 4)
        if fourcc == b"LIST" and payload[pos + 8 : pos + 12] == b"hdrl":
            hpos = pos + 12
            hend = min(pos + 8 + size, end)
            while hpos + 8 <= hend:
                cc = payload[hpos : hpos + 4]
                csz = _u32(payload, hpos + 4)
                if cc == b"avih":
                    if hpos + 8 + 40 > len(payload):
                        raise ValueError("AVI avih header truncated")
                    (upf, _, _, _, n_frames) = struct.unpack_from(
                        "<IIIII", payload, hpos + 8
                    )
                    w, h = struct.unpack_from("<II", payload, hpos + 8 + 32)
                    if n_frames <= 0 or n_frames > _MAX_FRAMES:
                        raise ValueError("AVI frame count out of range")
                    if upf <= 0:
                        raise ValueError("AVI frame interval must be positive")
                    if w <= 0 or h <= 0:
                        raise ValueError("AVI declares a degenerate geometry")
                    return w, h, n_frames, upf
                hpos += 8 + csz + (csz % 2)
            break
        pos += 8 + size + (size % 2)
    raise ValueError("AVI missing the avih header")


def demux_mjpeg_frames(payload: bytes) -> list[tuple[int, bytes]]:
    """Walk the ``movi`` list → ``[(ts_ms, jpeg_bytes), ...]`` in order."""
    w, h, n_frames, upf = avi_info(payload)
    pos, end = 12, min(len(payload), 8 + _u32(payload, 4))
    frames: list[tuple[int, bytes]] = []
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = _u32(payload, pos + 4)
        if fourcc == b"LIST" and payload[pos + 8 : pos + 12] == b"movi":
            mpos = pos + 12
            mend = min(pos + 8 + size, end)
            while mpos + 8 <= mend:
                cc = payload[mpos : mpos + 4]
                csz = _u32(payload, mpos + 4)
                if mpos + 8 + csz > len(payload):
                    raise ValueError("AVI movi chunk beyond payload")
                if cc in (b"00dc", b"00db"):
                    if len(frames) >= _MAX_FRAMES:
                        raise ValueError("AVI movi chunk count exceeds cap")
                    ts_ms = len(frames) * upf // 1000
                    frames.append((ts_ms, payload[mpos + 8 : mpos + 8 + csz]))
                mpos += 8 + csz + (csz % 2)
            break
        pos += 8 + size + (size % 2)
    if len(frames) != n_frames:
        raise ValueError(
            f"AVI header declares {n_frames} frames, movi holds {len(frames)}"
        )
    return frames
