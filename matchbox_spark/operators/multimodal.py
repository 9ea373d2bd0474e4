"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video ride as opaque ``binary`` columns with a metadata struct.
Decode / feature-extraction / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.

Formats that need no external library decode FOR REAL, pure Python/NumPy:
uncompressed 24-bit **BMP** and binary **PPM (P6)** images (header probe +
full pixel decode via :func:`decode_image_stats`), compressed **PNG**
(zlib IDAT, all five scanline filters) and baseline sequential **JPEG**
(Huffman entropy decode, dequant, IDCT, chroma upsampling — see
:mod:`matchbox_spark.operators.jpeg`), PCM **WAV** audio (header
probe → duration), and MPEG-1 **Layer I/II audio** (frame walk,
requantization, polyphase synthesis — see
:mod:`matchbox_spark.operators.mp3`). Matching encoders
(:func:`encode_bmp`, :func:`encode_ppm`, :func:`encode_png`,
:func:`encode_wav`, :func:`~matchbox_spark.operators.jpeg.encode_jpeg`,
:func:`~matchbox_spark.operators.mp3.encode_mp3`) generate real
payloads for tests and fixtures. Codecs still out of pure-Python scope
(MP3 Layer III / H.264) stay behind the ``DECODERS`` registry for
production to fill with torchaudio / pyav — signature unchanged; the
deterministic ``*/stub`` entries remain for plumbing tests.
"""

from __future__ import annotations

import hashlib
import math
import struct
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)

# media_type → decoder(payload: bytes) -> dict of metadata fields.
# Production replaces these with real codec probes; the deterministic stub
# derives pseudo-dimensions from the checksum so tests exercise the full path.
DECODERS: dict[str, Callable[[bytes], dict]] = {}


def register_decoder(media_type: str):
    def deco(fn):
        DECODERS[media_type] = fn
        return fn

    return deco


@register_decoder("image/stub")
def _stub_image_decoder(payload: bytes) -> dict:
    h = hashlib.sha256(payload).digest()
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "duration_ms": None,
    }


@register_decoder("audio/stub")
def _stub_audio_decoder(payload: bytes) -> dict:
    h = hashlib.sha256(payload).digest()
    return {"width": None, "height": None, "duration_ms": 1000 + h[2] * 37}


# ---------------------------------------------------------------------------
# real pure-Python codecs (no external libraries required)
# ---------------------------------------------------------------------------


@register_decoder("image/bmp")
def _bmp_decoder(payload: bytes) -> dict:
    """Real BMP header probe (BITMAPINFOHEADER family; CORE fallback)."""
    if len(payload) < 22 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size >= 40:
        w, h = struct.unpack_from("<ii", payload, 18)
    else:  # BITMAPCOREHEADER: 16-bit unsigned dimensions
        w, h = struct.unpack_from("<HH", payload, 18)
    return {"width": abs(w), "height": abs(h), "duration_ms": None}


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a P6 header → (width, height, maxval, pixel_data_offset)."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    fields, pos = [], 2
    while len(fields) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        ch = payload[pos:pos + 1]
        if ch == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
        elif ch.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
    return fields[0], fields[1], fields[2], pos + 1  # single ws after maxval


@register_decoder("image/x-portable-pixmap")
def _ppm_decoder(payload: bytes) -> dict:
    w, h, _, _ = _ppm_header(payload)
    return {"width": w, "height": h, "duration_ms": None}


@register_decoder("audio/wav")
def _wav_decoder(payload: bytes) -> dict:
    """Real RIFF/WAVE probe: walk chunks, duration = data bytes / byte rate."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, byte_rate, data_size = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt " and pos + 24 <= len(payload):
            byte_rate = struct.unpack_from("<I", payload, pos + 16)[0]
        elif cid == b"data":
            data_size = sz
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if not byte_rate or data_size is None:
        raise ValueError("WAV missing fmt/data chunk")
    return {
        "width": None,
        "height": None,
        "duration_ms": round(data_size * 1000 / byte_rate),
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes) -> "Iterator[tuple[bytes, bytes]]":
    """Walk PNG chunks, verifying each CRC (crc32 over type+data).

    Raises ``ValueError`` on truncation or CRC mismatch — corrupt objects
    must fail the probe loudly so the scan-level null contract applies.
    """
    import zlib

    pos = len(_PNG_SIG)
    while pos + 8 <= len(payload):
        length = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4 : pos + 8]
        data_end = pos + 8 + length
        if data_end + 4 > len(payload):
            raise ValueError("truncated PNG chunk")
        data = payload[pos + 8 : data_end]
        crc = struct.unpack_from(">I", payload, data_end)[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos = data_end + 4
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _png_ihdr(payload: bytes) -> tuple[int, int, int, int, int]:
    """Signature + IHDR parse (CRC-checked) → (w, h, depth, ctype, interlace)."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    ctype, data = next(iter(_png_chunks(payload)))
    if ctype != b"IHDR" or len(data) != 13:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", data
    )
    return w, h, depth, color, interlace


@register_decoder("image/png")
def _png_decoder(payload: bytes) -> dict:
    """Real PNG header probe: signature + CRC-verified IHDR."""
    w, h, _, _, _ = _png_ihdr(payload)
    return {"width": w, "height": h, "duration_ms": None}


def encode_bmp(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (bottom-up rows, 4-byte row padding, BGR byte order — the on-disk
    format real viewers read)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    pad = (-(w * 3)) % 4
    data = b"".join(
        px[r, :, ::-1].tobytes() + b"\x00" * pad for r in range(h - 1, -1, -1)
    )
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
        )
    )
    return header + data


def encode_ppm(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a binary PPM (P6)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + px.tobytes()


def encode_wav(
    samples, sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Encode 16-bit PCM samples (iterable of ints) as a minimal WAV."""
    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def _png_filter_rows(rows2d, nch: int, filter_type: int) -> bytes:
    """Apply one scanline filter to a (n_rows, stride) uint8 array; the
    per-pixel byte distance is ``nch``. Returns filtered bytes with the
    per-row filter tag."""
    import numpy as np

    out = []
    stride = rows2d.shape[1] if rows2d.size else 0
    prev = np.zeros(stride, dtype=np.uint8)
    z = np.zeros(nch, np.uint8)
    for cur in rows2d:
        left = np.concatenate([z, cur[:-nch]]) if stride > nch else np.zeros(
            stride, np.uint8
        )
        ul = np.concatenate([z, prev[:-nch]]) if stride > nch else np.zeros(
            stride, np.uint8
        )
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - ((left.astype(np.uint16) + prev) // 2).astype(np.uint8)
        elif filter_type == 4:
            a = left.astype(np.int16)
            b = prev.astype(np.int16)
            c = ul.astype(np.int16)
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
            ).astype(np.uint8)
            filt = cur - pred
        else:
            raise ValueError(f"unknown PNG filter {filter_type}")
        out.append(bytes([filter_type]) + filt.tobytes())
        prev = cur
    return b"".join(out)


def encode_png(
    pixels,
    filter_type: int = 0,
    compress_level: int = 6,
    interlace: bool = False,
    palette: bool = False,
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a real 8-bit PNG (zlib
    IDAT, CRC'd chunks). ``filter_type`` applies one of the five scanline
    filters (0=None 1=Sub 2=Up 3=Average 4=Paeth) to every row — fixtures
    use the non-trivial ones to exercise un-filtering. ``compress_level=0``
    emits STORED deflate blocks, making the DEFAULT truecolour layout's
    byte length a closed-form function of geometry (what the m6 oracle
    needs): ``57 + 2 + 5·ceil(raw/65535) + raw + 4`` with
    ``raw = h·(1+3w)``.

    ``interlace=True`` writes Adam7 (seven independently filtered
    sub-images); ``palette=True`` writes an indexed-colour (type 3) PNG
    with a PLTE chunk — raises if the image has more than 256 distinct
    colours. Both compose, and both roundtrip bit-exactly through
    :func:`decode_png_pixels`.
    """
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape

    plte = b""
    if palette:
        flat = px.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError(
                f"palette PNG supports <= 256 colours, image has {len(colors)}"
            )
        plane = inverse.astype(np.uint8).reshape(h, w, 1)
        nch, color_type = 1, 3
        plte = colors.astype(np.uint8).tobytes()
    else:
        plane = px
        nch, color_type = 3, 2

    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = plane[y0::dy, x0::dx]
            hp, wp = sub.shape[:2]
            if hp == 0 or wp == 0:
                continue
            parts.append(
                _png_filter_rows(
                    sub.reshape(hp, wp * nch), nch, filter_type
                )
            )
        raw = b"".join(parts)
    else:
        raw = _png_filter_rows(plane.reshape(h, w * nch), nch, filter_type)
    idat = zlib.compress(raw, compress_level)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + (chunk(b"PLTE", plte) if palette else b"")
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


# Adam7 interlace pass grid: (x_start, y_start, x_step, y_step) — the
# seven passes partition the pixel grid exactly (PNG spec §8.2)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, pos: int, n_rows: int, stride: int, nch: int):
    """Un-filter ``n_rows`` scanlines of ``stride`` bytes starting at
    ``pos`` in the inflated stream (all five filter types; the per-pixel
    recurrence uses ``nch`` as the filter byte distance). Returns
    (rows array, new position)."""
    import numpy as np

    out = np.zeros((n_rows, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(n_rows):
        if pos + 1 + stride > len(raw):
            raise ValueError("PNG pixel data length mismatch")
        ft = raw[pos]
        line = np.frombuffer(raw, np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = line + prev
        elif ft in (1, 3, 4):
            cur = line
            for i in range(stride):
                a = int(cur[i - nch]) if i >= nch else 0
                b = int(prev[i])
                c = int(prev[i - nch]) if i >= nch else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[r] = cur
        prev = cur
    return out, pos


def decode_png_pixels(payload: bytes):
    """Decode an 8-bit PNG — grey / RGB / PALETTE / RGBA, non-interlaced
    OR Adam7-interlaced (round 9) — to an (H, W, 3) uint8 RGB array:
    signature + CRC-verified chunk walk, IDAT concat + inflate, per-
    scanline UN-filtering (all five filter types), per-pass deinterlace
    for Adam7, PLTE lookup for palette images. Greyscale replicates to
    three channels; RGBA drops alpha. 16-bit stays out of scope (raises)
    — rare in web corpora, unlike PNG8 palettes and Adam7."""
    import zlib

    import numpy as np

    w, h, depth, color, interlace = _png_ihdr(payload)
    if depth != 8 or interlace not in (0, 1) or color not in (0, 2, 3, 6):
        raise ValueError(
            f"unsupported PNG variant: depth={depth} color={color} "
            f"interlace={interlace}"
        )
    nch = {0: 1, 2: 3, 3: 1, 6: 4}[color]
    palette = None
    idat_parts = []
    for t, d in _png_chunks(payload):
        if t == b"IDAT":
            idat_parts.append(d)
        elif t == b"PLTE":
            if len(d) % 3:
                raise ValueError("PNG PLTE length not a multiple of 3")
            palette = np.frombuffer(d, np.uint8).reshape(-1, 3)
    if color == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE chunk")
    raw = zlib.decompress(b"".join(idat_parts))

    if interlace == 0:
        lines, pos = _png_unfilter(raw, 0, h, w * nch, nch)
        if pos != len(raw):
            raise ValueError("PNG pixel data length mismatch")
        px = lines.reshape(h, w, nch)
    else:  # Adam7: seven sub-images, each filtered independently
        px = np.zeros((h, w, nch), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue  # pass empty at this geometry
            lines, pos = _png_unfilter(raw, pos, hp, wp * nch, nch)
            px[y0::dy, x0::dx] = lines.reshape(hp, wp, nch)
        if pos != len(raw):
            raise ValueError("PNG pixel data length mismatch")

    if color == 3:
        idx = px[..., 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("PNG palette index out of range")
        return palette[idx]
    if color == 0:
        return np.repeat(px, 3, axis=2)
    return px[..., :3]


def decode_bmp_pixels(payload: bytes):
    """Decode an uncompressed 24-bit BMP to an (H, W, 3) uint8 RGB array.

    Handles bottom-up and top-down row order and 4-byte row padding."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: {bpp}bpp compression={compression}")
    top_down, hh = h < 0, abs(h)
    row_bytes = (w * 3 + 3) // 4 * 4
    px = (
        np.frombuffer(payload, np.uint8, count=row_bytes * hh, offset=data_offset)
        .reshape(hh, row_bytes)[:, : w * 3]
        .reshape(hh, w, 3)
    )
    if not top_down:
        px = px[::-1]
    return px[..., ::-1]  # BGR → RGB


def decode_ppm_pixels(payload: bytes):
    """Decode a binary PPM (P6, maxval ≤ 255) to an (H, W, 3) uint8 array."""
    import numpy as np

    w, h, maxval, off = _ppm_header(payload)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    return np.frombuffer(payload, np.uint8, count=w * h * 3, offset=off).reshape(
        h, w, 3
    )


@register_decoder("image/jpeg")
def _jpeg_decoder(payload: bytes) -> dict:
    """Real JPEG probe: marker walk to ANY SOFn frame header.

    All SOFn headers share the T.81 geometry layout, so even a frame type
    the entropy decoder declines (lossless, arithmetic-coded) reports its
    true size — a capability gap, not a broken file. The ``status`` key
    splits "needs a fuller codec" from "corrupt" in corpus reports.
    Baseline (SOF0/1) AND progressive (SOF2) are fully decodable here
    since round 9, so both probe as plain ok."""
    from matchbox_spark.operators.jpeg import jpeg_frame_info

    sof, w, h = jpeg_frame_info(payload)
    meta = {"width": w, "height": h, "duration_ms": None}
    if sof not in (0, 1, 2):
        meta["status"] = "unsupported_frame"
    return meta


def decode_jpeg_pixels(payload: bytes):
    """Baseline sequential JPEG → (H, W, 3) uint8 RGB (full entropy decode).

    Thin re-export of :func:`matchbox_spark.operators.jpeg.decode_jpeg_pixels`
    so the pixel-decoder registry lives in one place."""
    from matchbox_spark.operators.jpeg import decode_jpeg_pixels as _dec

    return _dec(payload)


@register_decoder("image/gif")
def _gif_decoder(payload: bytes) -> dict:
    """Real GIF probe: signature + logical screen descriptor (round 10)."""
    from matchbox_spark.operators.gif import gif_screen_info

    w, h = gif_screen_info(payload)
    return {"width": w, "height": h, "duration_ms": None}


def decode_gif_pixels(payload: bytes):
    """First GIF frame → (H, W, 3) uint8 RGB (full LZW decode, round 10).

    Thin re-export of :func:`matchbox_spark.operators.gif.decode_gif_pixels`
    so the pixel-decoder registry lives in one place."""
    from matchbox_spark.operators.gif import decode_gif_pixels as _dec

    return _dec(payload)


@register_decoder("video/x-msvideo")
def _avi_decoder(payload: bytes) -> dict:
    """Real AVI probe: RIFF walk to the avih header (round 11) — geometry
    plus a true duration from frame count × frame interval."""
    from matchbox_spark.operators.avi import avi_info

    w, h, n_frames, upf = avi_info(payload)
    return {"width": w, "height": h, "duration_ms": n_frames * upf // 1000}


@register_decoder("image/tiff")
def _tiff_decoder(payload: bytes) -> dict:
    """Real TIFF probe: byte-order mark + first-IFD geometry (round 11)."""
    from matchbox_spark.operators.tiff import tiff_frame_info

    w, h = tiff_frame_info(payload)
    return {"width": w, "height": h, "duration_ms": None}


def decode_tiff_pixels(payload: bytes):
    """Baseline TIFF → (H, W, 3) uint8 RGB (uncompressed + PackBits,
    strip-based, both endiannesses; round 11).

    Thin re-export of :func:`matchbox_spark.operators.tiff.decode_tiff_pixels`
    so the pixel-decoder registry lives in one place."""
    from matchbox_spark.operators.tiff import decode_tiff_pixels as _dec

    return _dec(payload)


@register_decoder("image/webp")
def _webp_decoder(payload: bytes) -> dict:
    """Real WebP (VP8L) probe: RIFF walk + 14-bit geometry header
    (round 12)."""
    from matchbox_spark.operators.webp import _LsbBitReader, _vp8l_chunk

    data = _vp8l_chunk(payload)
    if not data or data[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _LsbBitReader(data)
    br.pos = 8
    w = br.read(14) + 1
    h = br.read(14) + 1
    return {"width": w, "height": h, "duration_ms": None}


@register_decoder("audio/mpeg")
def _mp3_decoder(payload: bytes) -> dict:
    """Real MPEG-1 audio probe (round 13): frame-sync walk, duration =
    n_frames × samples-per-frame / rate. Layer I/II only; Layer III
    raises UnsupportedMpegLayer → 'unsupported' status."""
    from matchbox_spark.operators.mp3 import mp3_metadata

    md = mp3_metadata(payload)
    return {
        "width": None,
        "height": None,
        "duration_ms": md["duration_ms"],
    }


def decode_webp_pixels(payload: bytes):
    """Lossless WebP (VP8L) → (H, W, 3) uint8 RGB: full transform +
    entropy pipeline (round 12).

    Thin re-export of :func:`matchbox_spark.operators.webp.decode_webp_pixels`
    so the pixel-decoder registry lives in one place."""
    from matchbox_spark.operators.webp import decode_webp_pixels as _dec

    return _dec(payload)


_PIXEL_DECODERS = {
    "image/bmp": decode_bmp_pixels,
    "image/x-portable-pixmap": decode_ppm_pixels,
    "image/png": decode_png_pixels,
    "image/jpeg": decode_jpeg_pixels,
    "image/gif": decode_gif_pixels,
    "image/tiff": decode_tiff_pixels,
    "image/webp": decode_webp_pixels,
}


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)


def decode_image_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
) -> DataFrame:
    """REAL image decode through the Arrow stage: pixels → per-channel stats.

    One ``mapInPandas`` pass; per payload the registered pixel decoder (BMP
    or PPM — pure NumPy) materialises the raster and reports geometry plus
    per-channel means. Malformed/unsupported payloads yield null stats,
    never task failures. The shape is the template for any per-item media
    transform: opaque binary in, typed columns out, decode parallelism =
    input partitioning, no driver involvement.
    """

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from matchbox_spark.operators.jpeg import UnsupportedJpegError

        for pdf in batches:
            n = len(pdf)
            width = [None] * n
            height = [None] * n
            means: list[list] = [[None] * n for _ in range(3)]
            status: list = [None] * n
            for i, (mt, p) in enumerate(zip(pdf[type_col], pdf[payload_col])):
                decoder = _PIXEL_DECODERS.get(mt)
                if p is None:
                    status[i] = "missing"
                    continue
                if decoder is None:
                    status[i] = "no_decoder"
                    continue
                try:
                    px = decoder(bytes(p))
                except UnsupportedJpegError:
                    # header parsed, entropy decode declined: a capability
                    # gap (lossless/arithmetic frame types — baseline AND
                    # progressive decode for real), distinct from corrupt
                    status[i] = "unsupported_frame"
                    continue
                except (ValueError, struct.error):
                    status[i] = "corrupt"
                    continue
                height[i], width[i] = int(px.shape[0]), int(px.shape[1])
                ch_mean = px.reshape(-1, 3).mean(axis=0)
                for c in range(3):
                    means[c][i] = float(ch_mean[c])
                status[i] = "ok"
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").to_numpy(),
                    "width": pd.array(width, dtype="Int32"),
                    "height": pd.array(height, dtype="Int32"),
                    "mean_r": pd.array(means[0], dtype="float64"),
                    "mean_g": pd.array(means[1], dtype="float64"),
                    "mean_b": pd.array(means[2], dtype="float64"),
                    "status": pd.array(status, dtype="object"),
                }
            )

    return df.select(id_col, payload_col, type_col).mapInPandas(
        _stats, IMAGE_STATS_SCHEMA
    )


def extract_media_metadata(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
) -> DataFrame:
    """Arrow-batched metadata extraction over a binary payload column.

    One ``mapInPandas`` pass: per batch, decode each payload with the decoder
    registered for its media type (unknown types yield nulls, never errors).
    The expensive generic fields (size, checksum) are computed here too so a
    single scan suffices.
    """
    id_c, pay_c, typ_c = id_col, payload_col, type_col

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Generic fields vectorised over the whole Arrow batch; only the
            # codec dispatch (inherently a per-payload library call) loops.
            payloads = pdf[pay_c].map(
                lambda p: bytes(p) if p is not None else b""
            )
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_c].astype("int64").to_numpy(),
                    "media_type": pdf[typ_c].to_numpy(),
                    "n_bytes": payloads.map(len).astype("int64").to_numpy(),
                    "checksum": payloads.map(
                        lambda p: hashlib.sha256(p).hexdigest()
                    ).to_numpy(),
                }
            )
            from matchbox_spark.operators.jpeg import UnsupportedJpegError
            from matchbox_spark.operators.mp3 import UnsupportedMpegLayer

            n = len(pdf)
            width = [None] * n
            height = [None] * n
            duration = [None] * n
            status: list = [None] * n
            types = pdf[typ_c].tolist()
            raw = pdf[pay_c].tolist()
            for i, (media_type, payload) in enumerate(zip(types, payloads)):
                decoder = DECODERS.get(media_type)
                if raw[i] is None:
                    status[i] = "missing"
                    continue
                if decoder is None:
                    status[i] = "no_decoder"
                    continue
                try:
                    meta = decoder(payload)
                except UnsupportedJpegError:
                    # a decoder that raises (rather than reporting) the
                    # capability gap still classifies distinctly; since the
                    # round-9 progressive decoder, only lossless/arithmetic
                    # frame types land here
                    status[i] = "unsupported_frame"
                    continue
                except NotImplementedError:
                    # honest codec stubs (H.264): the format is known,
                    # the probe is not implemented in this environment
                    status[i] = "unsupported"
                    continue
                except UnsupportedMpegLayer:
                    # valid MPEG audio, but Layer III (the one remaining
                    # honest audio stub — bit reservoir + Huffman + IMDCT)
                    status[i] = "unsupported"
                    continue
                except (ValueError, struct.error):
                    # malformed payload → null fields, not a task failure
                    # (a corrupt object must not kill the scan)
                    status[i] = "corrupt"
                    continue
                width[i] = meta.get("width")
                height[i] = meta.get("height")
                duration[i] = meta.get("duration_ms")
                status[i] = meta.get("status", "ok")
            out["width"] = pd.array(width, dtype="Int32")
            out["height"] = pd.array(height, dtype="Int32")
            out["duration_ms"] = pd.array(duration, dtype="Int64")
            out["status"] = pd.array(status, dtype="object")
            yield out[[f.name for f in MEDIA_META_SCHEMA.fields]]

    cols = df.select(id_c, pay_c, typ_c)
    return cols.mapInPandas(_extract, MEDIA_META_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame timestamp.

    The decode step is a stub (no codecs in-container): frames are synthesised
    deterministically from the payload checksum (duration from digest byte 2,
    per-frame checksum over ``payload + ascii(ts)``); production swaps the
    inner function for a real demuxer while keeping schema and batch shape.
    """
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame_checksum", T.StringType(), False),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col].map(
                lambda p: bytes(p) if p is not None else b""
            )
            durations = payloads.map(
                lambda p: 1000 + hashlib.sha256(p).digest()[2] * 37
            ).to_numpy()
            n_frames = -(-durations // every_ms)  # ceil-div per doc
            doc_ids = np.repeat(
                pdf[id_col].astype("int64").to_numpy(), n_frames
            )
            frame_ts = np.concatenate(
                [np.arange(0, d, every_ms, dtype="int64") for d in durations]
            ) if len(durations) else np.array([], dtype="int64")
            rep_payloads = np.repeat(payloads.to_numpy(), n_frames)
            checksums = [
                hashlib.sha256(p + str(int(ts)).encode("ascii")).hexdigest()
                for p, ts in zip(rep_payloads, frame_ts)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "frame_ts_ms": frame_ts,
                    "frame_checksum": checksums,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_sample, schema)


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_ts_ms", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 500,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL frame sampling over MJPEG-in-AVI payloads (round 11).

    Walks the RIFF container (``operators.avi``), samples one frame per
    ``every_ms`` tick across the stream duration (the frame whose display
    interval contains the tick), and fully decodes each sampled JPEG for
    per-frame channel means — the m5 honesty bar applied to video. A
    corrupt container or frame yields ONE status row with null fields,
    never a task failure (the 100 TB heterogeneous-scan contract)."""
    # caller-argument validation happens HERE, outside the per-row
    # try/except — a bad every_ms must fail fast, not silently mark every
    # document corrupt (ADVICE r11; mirrors bpe_train's n_merges guard)
    if not isinstance(every_ms, int) or every_ms <= 0:
        raise ValueError(f"every_ms must be a positive int, got {every_ms!r}")
    from matchbox_spark.operators.avi import avi_info, demux_mjpeg_frames
    from matchbox_spark.operators.jpeg import (
        UnsupportedJpegError,
        decode_jpeg_pixels,
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                doc_id = int(doc_id)
                if payload is None:
                    rows.append((doc_id,) + (None,) * 6 + ("missing",))
                    continue
                payload = bytes(payload)
                try:
                    w, h, n_frames, upf = avi_info(payload)
                    frames = demux_mjpeg_frames(payload)
                    duration_ms = n_frames * upf // 1000
                    frame_ms = upf / 1000.0
                    for ts in range(0, duration_ms, every_ms):
                        k = min(int(ts / frame_ms), n_frames - 1)
                        px = decode_jpeg_pixels(frames[k][1])
                        if px.shape[:2] != (h, w):
                            raise ValueError(
                                "AVI frame geometry disagrees with avih"
                            )
                        rows.append(
                            (
                                doc_id,
                                ts,
                                w,
                                h,
                                float(px[..., 0].mean()),
                                float(px[..., 1].mean()),
                                float(px[..., 2].mean()),
                                "ok",
                            )
                        )
                except (ValueError, struct.error, UnsupportedJpegError):
                    rows.append((doc_id,) + (None,) * 6 + ("corrupt",))
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FRAME_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(
        _sample, VIDEO_FRAME_SCHEMA
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize plumbing: binary-in → binary-out at a target geometry.

    Real Spark surface (schema, Arrow batching, binary-in/binary-out
    signature); the pixel transform is a deterministic stub — the "resized"
    payload is the SHA-256 digest of ``payload || "|WxH"`` (no image
    libraries in-container). Production swaps the inner lambda for
    PIL/libvips; everything around it is unchanged.
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )
    tag = f"|{width}x{height}".encode("ascii")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col].map(
                lambda p: bytes(p) if p is not None else b""
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").to_numpy(),
                    "payload": payloads.map(
                        lambda p: hashlib.sha256(p + tag).digest()
                    ).to_numpy(),
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_resize, schema)


def decode_wav_samples(payload: bytes):
    """Real PCM decode: RIFF walk → (int16 sample array, rate, channels).

    16-bit PCM only (audio_format 1); anything else raises ValueError —
    the loud-probe contract. Returns the interleaved sample stream."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + sz > len(payload):
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt " and sz >= 16:
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError("only 16-bit PCM WAV supported")
    # channels/rate are load-bearing divisors downstream (resample_audio
    # divides by channels; stats report rate) — a crafted fmt chunk with
    # channels=0 must surface as the scan-level "corrupt" status, not a
    # ZeroDivisionError that kills the whole task (ADVICE r9)
    if channels < 1 or rate < 1:
        raise ValueError("WAV fmt declares non-positive channels/rate")
    samples = np.frombuffer(data[: len(data) - (len(data) % 2)], "<i2")
    return samples, rate, channels


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("peak", T.IntegerType(), True),
        T.StructField("mean", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)


def decode_audio_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
) -> DataFrame:
    """REAL audio decode through the Arrow stage: PCM samples → stats.

    Decodes 16-bit PCM WAV payloads for real (RIFF chunk walk +
    ``np.frombuffer``) and reports per-object sample count, rate,
    channels, peak |amplitude|, mean, and RMS — the signal-level facts an
    audio curation pipeline filters on (silence, clipping, level
    normalisation). Same shape and status taxonomy as
    :func:`decode_image_stats`: corrupt/missing/no_decoder objects null
    out, never kill the task. mean and RMS are ieee_round6-rounded so a
    relational oracle can replay them bit-exactly."""
    from matchbox_spark.functions.numeric import IEEE_ROUND6_PY

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from matchbox_spark.operators.mp3 import (
            UnsupportedMpegLayer,
            decode_mp3_samples,
        )

        for pdf in batches:
            n = len(pdf)
            cols: dict = {
                k: [None] * n
                for k in ("n_samples", "rate", "ch", "peak", "mean", "rms")
            }
            status: list = [None] * n
            for i, (mt, p) in enumerate(zip(pdf[type_col], pdf[payload_col])):
                if p is None:
                    status[i] = "missing"
                    continue
                if mt == "audio/wav":
                    decode = decode_wav_samples
                elif mt == "audio/mpeg":  # real Layer I/II decode (round 13)
                    decode = decode_mp3_samples
                else:
                    status[i] = "no_decoder"
                    continue
                try:
                    samples, rate, ch = decode(bytes(p))
                except UnsupportedMpegLayer:
                    status[i] = "no_decoder"  # valid stream, Layer III stub
                    continue
                except (ValueError, struct.error):
                    status[i] = "corrupt"
                    continue
                cols["n_samples"][i] = int(samples.size)
                cols["rate"][i] = int(rate)
                cols["ch"][i] = int(ch)
                if samples.size:
                    # exact integer sums, ONE double divide — matching the
                    # oracle's SUM(v)/COUNT operation order at any length.
                    # np.mean's pairwise float64 summation drifts from the
                    # exact-integer path once sum(v*v) exceeds 2^53
                    # (~3 min of 44.1 kHz stereo) — ADVICE r9. int64 holds
                    # sum(v*v) exactly to ~2^33 samples (v*v ≤ 2^30).
                    s64 = samples.astype(np.int64)
                    tot = int(s64.sum())
                    sq = int(np.sum(s64 * s64, dtype=np.int64))
                    ns = int(samples.size)
                    cols["peak"][i] = int(np.abs(s64).max())
                    # float(tot)/float(ns), not tot/ns: SQL converts the
                    # exact integer SUM to double BEFORE dividing; Python's
                    # int/int would round the exact rational instead
                    cols["mean"][i] = IEEE_ROUND6_PY(float(tot) / float(ns))
                    cols["rms"][i] = IEEE_ROUND6_PY(
                        math.sqrt(float(sq) / float(ns))
                    )
                else:
                    cols["peak"][i] = 0
                status[i] = "ok"
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").to_numpy(),
                    "n_samples": pd.array(cols["n_samples"], dtype="Int64"),
                    "sample_rate": pd.array(cols["rate"], dtype="Int32"),
                    "channels": pd.array(cols["ch"], dtype="Int32"),
                    "peak": pd.array(cols["peak"], dtype="Int32"),
                    "mean": pd.array(cols["mean"], dtype="float64"),
                    "rms": pd.array(cols["rms"], dtype="float64"),
                    "status": pd.array(status, dtype="object"),
                }
            )

    return df.select(id_col, payload_col, type_col).mapInPandas(
        _stats, AUDIO_STATS_SCHEMA
    )


def resample_audio(
    df: DataFrame,
    factor: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Integer-factor audio decimation: keep every ``factor``-th FRAME
    (all channels of a sample instant move together), re-encode as WAV at
    ``rate / factor``. Honest scope: plain decimation (no anti-alias
    filter — production swaps in a polyphase resampler); the plumbing
    (binary→binary Arrow stage, real PCM decode/encode) is real and the
    output decodes back exactly to ``frames[::factor]``."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("status", T.StringType(), True),
        ]
    )

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            payload: list = [None] * n
            rate_out: list = [None] * n
            ns_out: list = [None] * n
            status: list = [None] * n
            for i, p in enumerate(pdf[payload_col]):
                if p is None:
                    status[i] = "missing"
                    continue
                try:
                    samples, rate, ch = decode_wav_samples(bytes(p))
                except (ValueError, struct.error):
                    status[i] = "corrupt"
                    continue
                # frame-wise decimation: interleaved channels stay aligned
                frames = samples[: (samples.size // ch) * ch].reshape(-1, ch)
                out = frames[::factor].reshape(-1)
                new_rate = max(1, rate // factor)
                payload[i] = encode_wav(
                    out, sample_rate=new_rate, channels=ch
                )
                rate_out[i] = new_rate
                ns_out[i] = int(out.size)
                status[i] = "ok"
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").to_numpy(),
                    "payload": pd.array(payload, dtype="object"),
                    "sample_rate": pd.array(rate_out, dtype="Int32"),
                    "n_samples": pd.array(ns_out, dtype="Int64"),
                    "status": pd.array(status, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_resample, schema)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)


def resize_decoded_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
) -> DataFrame:
    """REAL image resize: decode → nearest-neighbour resample → re-encode.

    Unlike :func:`resize_images` (binary-in/binary-out plumbing with a
    digest stub), this runs the registered pixel decoders (BMP/PPM/PNG/
    JPEG incl. progressive — all pure NumPy/stdlib), resamples with the
    floor-index nearest-neighbour rule ``src = floor(dst * S / D)`` (exact
    integer arithmetic, so an oracle can replay it), and re-encodes the
    raster as a lossless 24-bit BMP. Output carries the resized payload,
    geometry, per-channel means of the RESIZED raster, and the same
    status taxonomy as :func:`decode_image_stats`. One Arrow-batched
    ``mapInPandas`` pass; decode parallelism = input partitioning.
    """
    if width < 1 or height < 1:
        raise ValueError("resize target dimensions must be >= 1")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from matchbox_spark.operators.jpeg import UnsupportedJpegError

        for pdf in batches:
            n = len(pdf)
            payload = [None] * n
            w_out: list = [None] * n
            h_out: list = [None] * n
            means: list[list] = [[None] * n for _ in range(3)]
            status: list = [None] * n
            for i, (mt, p) in enumerate(zip(pdf[type_col], pdf[payload_col])):
                decoder = _PIXEL_DECODERS.get(mt)
                if p is None:
                    status[i] = "missing"
                    continue
                if decoder is None:
                    status[i] = "no_decoder"
                    continue
                try:
                    px = decoder(bytes(p))
                except UnsupportedJpegError:
                    status[i] = "unsupported_frame"
                    continue
                except (ValueError, struct.error):
                    status[i] = "corrupt"
                    continue
                sh, sw = px.shape[:2]
                ys = (np.arange(height) * sh) // height
                xs = (np.arange(width) * sw) // width
                out = px[ys][:, xs]
                payload[i] = encode_bmp(out)
                h_out[i], w_out[i] = height, width
                ch_mean = out.reshape(-1, 3).mean(axis=0)
                for c in range(3):
                    means[c][i] = float(ch_mean[c])
                status[i] = "ok"
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").to_numpy(),
                    "payload": pd.array(payload, dtype="object"),
                    "width": pd.array(w_out, dtype="Int32"),
                    "height": pd.array(h_out, dtype="Int32"),
                    "mean_r": pd.array(means[0], dtype="float64"),
                    "mean_g": pd.array(means[1], dtype="float64"),
                    "mean_b": pd.array(means[2], dtype="float64"),
                    "status": pd.array(status, dtype="object"),
                }
            )

    return df.select(id_col, payload_col, type_col).mapInPandas(
        _resize, RESIZED_SCHEMA
    )


def extract_features(
    df: DataFrame,
    dim: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Feature-extraction plumbing: binary payload → ``array<float>``.

    The output shape is exactly what the similarity operators consume
    (cosine_topk / ann_topk / embedding near-dup), so stub features flow
    through the real downstream plans. The stub embedding is deterministic:
    dimension *i* is byte *i* of SHA-256(payload) scaled to [-1, 1] —
    reproducible in ANSI SQL, which is what lets an oracle pin the plumbing.
    Production swaps the digest for a model forward pass (CLIP, wav2vec, …)
    batched over the same Arrow stream.
    """
    if not 1 <= dim <= 32:
        raise ValueError(f"dim must be in [1, 32] (one sha256 digest): {dim}")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col].map(
                lambda p: bytes(p) if p is not None else b""
            )
            feats = payloads.map(
                lambda p: [
                    round((hashlib.sha256(p).digest()[i] - 127.5) / 127.5, 6)
                    for i in range(dim)
                ]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").to_numpy(),
                    "features": feats.to_numpy(),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_extract, schema)
