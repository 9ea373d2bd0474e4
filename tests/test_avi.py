"""MJPEG-in-AVI walker pins (round 11).

Same posture as test_tiff/test_gif: exact demux roundtrip, fail-closed
corruption fuzz over the container bytes, and the Spark-side video frame
sampler (real demux + full JPEG decode of each sampled frame) including
the corrupt/missing status taxonomy.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from matchbox_spark.operators.avi import (
    avi_info,
    demux_mjpeg_frames,
    encode_avi_mjpeg,
)
from matchbox_spark.operators.jpeg import decode_jpeg_pixels, encode_jpeg


def _frames(n, w=12, h=8):
    return [
        encode_jpeg(
            np.full((h, w, 3), ((10 + 11 * k) % 256, (20 + 23 * k) % 256,
                                (30 + 31 * k) % 256), np.uint8),
            quality=100,
            subsampling="4:4:4",
        )
        for k in range(n)
    ]


def test_roundtrip_exact_frames_and_timestamps():
    frames = _frames(5)
    payload = encode_avi_mjpeg(frames, fps=4)
    assert avi_info(payload) == (12, 8, 5, 250_000)
    out = demux_mjpeg_frames(payload)
    assert [ts for ts, _ in out] == [0, 250, 500, 750, 1000]
    for k, (_, jpeg) in enumerate(out):
        assert jpeg == frames[k]  # byte-exact chunk walk (incl. odd sizes)
        px = decode_jpeg_pixels(jpeg)
        assert tuple(px[0, 0]) == (
            (10 + 11 * k) % 256, (20 + 23 * k) % 256, (30 + 31 * k) % 256,
        )


def test_header_movi_disagreement_raises():
    payload = bytearray(encode_avi_mjpeg(_frames(3), fps=2))
    # inflate the declared frame count: avih dwTotalFrames is the 5th dword
    # after the 'avih'+size header
    off = payload.index(b"avih") + 8 + 16
    struct.pack_into("<I", payload, off, 7)
    with pytest.raises(ValueError, match="declares 7 frames"):
        demux_mjpeg_frames(bytes(payload))


def test_corruption_fuzz_fails_closed():
    """Truncations and single-byte mutations either demux to SOME frame
    list or raise ValueError — the sampler's status contract."""
    payload = bytearray(encode_avi_mjpeg(_frames(2, w=6, h=5), fps=3))
    for cut in range(len(payload)):
        try:
            demux_mjpeg_frames(bytes(payload[:cut]))
        except ValueError:
            pass
    for pos in range(len(payload)):
        for delta in (1, 0x7F):
            mutated = bytearray(payload)
            mutated[pos] = (mutated[pos] + delta) & 0xFF
            try:
                demux_mjpeg_frames(bytes(mutated))
            except ValueError:
                pass


def test_frame_count_cap_fails_closed():
    payload = bytearray(encode_avi_mjpeg(_frames(2), fps=2))
    off = payload.index(b"avih") + 8 + 16
    struct.pack_into("<I", payload, off, 1 << 20)
    with pytest.raises(ValueError, match="frame count out of range"):
        avi_info(bytes(payload))


def test_sample_video_frames_spark(spark):
    """Real demux + decode through the Arrow mapInPandas stage: frame
    selection per 500 ms tick, exact solid-colour means, and one corrupt /
    missing status row each with null fields."""
    import pandas as pd

    from matchbox_spark.operators.multimodal import sample_video_frames

    good = encode_avi_mjpeg(_frames(4), fps=4)  # 1000 ms → ticks 0/500
    rows = [
        (0, good),
        (1, good[:20]),  # truncated container
        (2, None),       # missing payload
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"])
    )
    got = sample_video_frames(df, every_ms=500).collect()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    ok = sorted(by_doc[0], key=lambda r: r["frame_ts_ms"])
    assert [r["frame_ts_ms"] for r in ok] == [0, 500]
    # tick 500 falls in frame 2's interval (250 ms/frame)
    assert (ok[1]["mean_r"], ok[1]["mean_g"], ok[1]["mean_b"]) == (
        (10 + 22) % 256, (20 + 46) % 256, (30 + 62) % 256,
    )
    assert all(r["width"] == 12 and r["height"] == 8 for r in ok)
    assert by_doc[1][0]["status"] == "corrupt"
    assert by_doc[1][0]["width"] is None
    assert by_doc[2][0]["status"] == "missing"


def test_metadata_probe_registered(spark):
    import pandas as pd

    from matchbox_spark.operators.multimodal import extract_media_metadata

    payload = encode_avi_mjpeg(_frames(6), fps=3)
    df = spark.createDataFrame(
        pd.DataFrame(
            [(0, payload, "video/x-msvideo")],
            columns=["doc_id", "payload", "media_type"],
        )
    )
    row = extract_media_metadata(df).collect()[0]
    assert (row["width"], row["height"]) == (12, 8)
    assert row["duration_ms"] == 6 * 333_333 // 1000
    assert row["status"] == "ok"
