"""Baseline TIFF codec pins (round 11).

Same posture as test_gif/test_jpeg: exact roundtrips across the supported
variant grid, fail-closed corruption fuzz (every truncation and single-byte
mutation raises ValueError or still decodes — nothing else escapes), a
hostile-geometry pixel cap, and the registry integration that makes
``image/tiff`` a real decoder for decode_image_stats / the metadata probe.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from matchbox_spark.operators.tiff import (
    decode_tiff_pixels,
    encode_tiff,
    tiff_frame_info,
)


def test_roundtrip_variant_grid():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (5, 7), (16, 16), (13, 3)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for packbits in (False, True):
            for big_endian in (False, True):
                for rps in (None, 1, h):
                    payload = encode_tiff(
                        img,
                        packbits=packbits,
                        rows_per_strip=rps,
                        big_endian=big_endian,
                    )
                    assert tiff_frame_info(payload) == (w, h)
                    assert np.array_equal(decode_tiff_pixels(payload), img)


def test_packbits_compresses_runs():
    # byte-level runs (equal channels) actually shrink under PackBits
    img = np.full((8, 32, 3), 77, np.uint8)
    assert len(encode_tiff(img, packbits=True)) < len(encode_tiff(img))


def test_multi_strip_layout_is_real():
    # default rows_per_strip forces >= 3 strips; the strip walk must
    # reassemble rows in order (a shuffled-strip bug would mismatch)
    img = np.arange(9 * 4 * 3, dtype=np.uint8).reshape(9, 4, 3)
    payload = encode_tiff(img)
    assert np.array_equal(decode_tiff_pixels(payload), img)


def test_corruption_fuzz_fails_closed():
    """Every truncation and single-byte mutation either still decodes or
    raises ValueError — never IndexError/struct.error/MemoryError (the
    m6/m7 status contract for 100 TB heterogeneous scans)."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    for packbits in (False, True):
        payload = bytearray(encode_tiff(img, packbits=packbits))
        for cut in range(len(payload)):
            try:
                decode_tiff_pixels(bytes(payload[:cut]))
            except ValueError:
                pass
        for pos in range(len(payload)):
            for delta in (1, 0x7F):
                mutated = bytearray(payload)
                mutated[pos] = (mutated[pos] + delta) & 0xFF
                try:
                    decode_tiff_pixels(bytes(mutated))
                except ValueError:
                    pass


def test_pixel_cap_fails_closed():
    # a hostile header declaring a gigapixel geometry raises before any
    # allocation — width/height live in the first two IFD entries
    img = np.full((2, 2, 3), 5, np.uint8)
    bomb = bytearray(encode_tiff(img))
    struct.pack_into("<I", bomb, 8 + 2 + 8, 60000)  # ImageWidth value
    struct.pack_into("<I", bomb, 8 + 2 + 12 + 8, 60000)  # ImageLength value
    with pytest.raises(ValueError, match="pixel cap"):
        decode_tiff_pixels(bytes(bomb))


def test_unsupported_variants_raise_cleanly():
    img = np.full((4, 4, 3), 9, np.uint8)
    payload = bytearray(encode_tiff(img))
    # Compression tag is the 4th IFD entry; set LZW (5)
    off = 8 + 2 + 3 * 12 + 8
    struct.pack_into("<H", payload, off, 5)
    with pytest.raises(ValueError, match="compression"):
        decode_tiff_pixels(bytes(payload))
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff_pixels(b"XX" + bytes(payload[2:]))


def test_registry_integration(spark):
    """image/tiff flows through the real Arrow mapInPandas stats stage —
    solid-colour means equal the fill bytes exactly, and the metadata
    probe reports the IFD geometry."""
    import pandas as pd

    from matchbox_spark.operators.multimodal import (
        decode_image_stats,
        extract_media_metadata,
    )

    img = np.full((6, 11, 3), (40, 90, 200), np.uint8)
    rows = [
        (0, encode_tiff(img), "image/tiff"),
        (1, encode_tiff(img, packbits=True, big_endian=True), "image/tiff"),
        (2, encode_tiff(img)[:9], "image/tiff"),  # truncated → corrupt
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload", "media_type"])
    )
    stats = {
        r["doc_id"]: r for r in decode_image_stats(df).collect()
    }
    for i in (0, 1):
        assert (stats[i]["width"], stats[i]["height"]) == (11, 6)
        assert (
            stats[i]["mean_r"],
            stats[i]["mean_g"],
            stats[i]["mean_b"],
        ) == (40.0, 90.0, 200.0)
        assert stats[i]["status"] == "ok"
    assert stats[2]["status"] == "corrupt" and stats[2]["width"] is None

    meta = {r["doc_id"]: r for r in extract_media_metadata(df).collect()}
    assert (meta[0]["width"], meta[0]["height"]) == (11, 6)
    assert meta[0]["status"] == "ok" and meta[2]["status"] == "corrupt"
