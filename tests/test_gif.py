"""GIF (LZW) codec tests (round 10): bit-exact round-trips, interlace,
LZW width growth and dictionary reset, the Arrow stats stage, and a
corruption fuzz proving every malformed payload fails CLOSED (ValueError
→ scan-level 'corrupt' status, never a task-killing exception)."""

from __future__ import annotations

import numpy as np
import pytest

from matchbox_spark.operators.gif import (
    decode_gif_pixels,
    encode_gif,
    gif_screen_info,
    lzw_decode,
    lzw_encode,
)


def test_lzw_roundtrip_widths():
    rng = np.random.default_rng(5)
    for mcs in (2, 4, 8):
        for n in (1, 7, 300, 5000):
            idx = rng.integers(0, 1 << mcs, n, dtype=np.uint8)
            assert (
                bytes(lzw_decode(lzw_encode(idx, mcs), mcs, n)) == idx.tobytes()
            )


def test_lzw_dictionary_reset():
    # > 4096 distinct phrases forces the encoder's mid-stream clear code
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 256, 120_000, dtype=np.uint8)
    assert bytes(lzw_decode(lzw_encode(idx, 8), 8, len(idx))) == idx.tobytes()


def test_lzw_cscsc_case():
    # the decoder's code == next special case: aba ab abab… patterns
    idx = np.array([1, 2, 1, 1, 2, 1, 1, 2, 1, 2], dtype=np.uint8)
    assert bytes(lzw_decode(lzw_encode(idx, 2), 2, len(idx))) == idx.tobytes()


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip_exact(interlace):
    rng = np.random.default_rng(11)
    for h, w, ncol in ((1, 1, 1), (5, 7, 2), (9, 12, 5), (33, 41, 200), (64, 64, 256)):
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = pal[rng.integers(0, ncol, (h, w))]
        payload = encode_gif(img, interlace=interlace)
        assert gif_screen_info(payload) == (w, h)
        assert np.array_equal(decode_gif_pixels(payload), img)


def test_gif_rejects_too_many_colors():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)  # ~1600 colors
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)


def test_gif_extension_blocks_are_skipped():
    # inject a GIF89a graphic-control extension before the image descriptor
    img = np.full((3, 4, 3), (9, 80, 200), np.uint8)
    payload = bytearray(encode_gif(img))
    desc = payload.index(0x2C, 13)
    gce = bytes((0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00))
    patched = bytes(payload[:desc]) + gce + bytes(payload[desc:])
    assert np.array_equal(decode_gif_pixels(patched), img)


def test_gif_through_decode_image_stats(spark):
    from matchbox_spark.operators.multimodal import (
        decode_image_stats,
        extract_media_metadata,
    )

    img = np.full((6, 4, 3), (10, 20, 30), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_gif(img)), "image/gif"),
        (2, bytearray(encode_gif(img, interlace=True)), "image/gif"),
        (3, bytearray(b"GIF89a junk"), "image/gif"),     # corrupt
        (4, bytearray(encode_gif(img)), "audio/mpeg"),   # no decoder (r12: webp decodes)
        (5, None, "image/gif"),                           # missing
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    )
    out = {r["doc_id"]: r for r in decode_image_stats(df).collect()}
    for d in (1, 2):
        assert out[d]["status"] == "ok"
        assert (out[d]["width"], out[d]["height"]) == (4, 6)
        assert (out[d]["mean_r"], out[d]["mean_g"], out[d]["mean_b"]) == (
            10.0, 20.0, 30.0,
        )
    assert out[3]["status"] == "corrupt"
    assert out[4]["status"] == "no_decoder"
    assert out[5]["status"] == "missing"
    # metadata probe reports the logical screen
    meta = {r["doc_id"]: r for r in extract_media_metadata(df).collect()}
    assert (meta[1]["width"], meta[1]["height"]) == (4, 6)
    assert meta[3]["width"] is None


def test_gif_corruption_fuzz_fails_closed():
    """Every single-byte mutation and truncation either still decodes to
    SOME raster or raises ValueError — never IndexError/struct.error/
    OverflowError escaping to kill a task (the m6/m7 status contract)."""
    rng = np.random.default_rng(23)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 16, (9, 7))]
    for interlace in (False, True):
        payload = bytearray(encode_gif(img, interlace=interlace))
        # truncations at every prefix length
        for cut in range(len(payload)):
            try:
                decode_gif_pixels(bytes(payload[:cut]))
            except ValueError:
                pass
        # single-byte corruptions across the whole container
        for pos in range(len(payload)):
            for delta in (1, 0x7F):
                mutated = bytearray(payload)
                mutated[pos] = (mutated[pos] + delta) & 0xFF
                try:
                    decode_gif_pixels(bytes(mutated))
                except ValueError:
                    pass


def test_gif_decode_pixel_cap_fails_closed():
    # a kilobyte-sized hostile payload declaring a gigapixel geometry must
    # raise (scan-level 'corrupt'), not balloon to gigabytes mid-decode
    img = np.full((2, 2, 3), (1, 2, 3), np.uint8)
    bomb_screen = bytearray(encode_gif(img))
    bomb_screen[6:10] = (60000).to_bytes(2, "little") * 2  # screen 60000^2
    with pytest.raises(ValueError, match="pixel cap"):
        decode_gif_pixels(bytes(bomb_screen))

    bomb_frame = bytearray(encode_gif(img))
    desc = bomb_frame.index(0x2C, 13)
    bomb_frame[desc + 5 : desc + 9] = (60000).to_bytes(2, "little") * 2
    with pytest.raises(ValueError, match="pixel cap"):
        decode_gif_pixels(bytes(bomb_frame))


def test_gif_subrectangle_frame_composites_onto_screen():
    # real-world GIFs place the first frame inside a larger logical
    # screen: the decoded raster must match gif_screen_info's geometry,
    # frame at (left, top), background color elsewhere
    img = np.zeros((3, 4, 3), np.uint8)
    img[:, :] = (10, 20, 30)
    img[0, 0] = (200, 100, 50)
    payload = bytearray(encode_gif(img))
    payload[6:8] = (9).to_bytes(2, "little")  # screen 9 wide
    payload[8:10] = (7).to_bytes(2, "little")  # screen 7 tall
    desc = payload.index(0x2C, 13)
    payload[desc + 1 : desc + 3] = (2).to_bytes(2, "little")  # left
    payload[desc + 3 : desc + 5] = (1).to_bytes(2, "little")  # top
    out = decode_gif_pixels(bytes(payload))
    assert out.shape == (7, 9, 3)
    assert gif_screen_info(bytes(payload)) == (9, 7)
    bg = np.frombuffer(
        bytes(payload[13 + 3 * payload[11] : 16 + 3 * payload[11]]), np.uint8
    )
    assert np.array_equal(out[1:4, 2:6], img)
    assert np.array_equal(out[0, :], np.tile(bg, (9, 1)))
    assert np.array_equal(out[:, 0], np.tile(bg, (7, 1)))

    # frame straddling the right/bottom edge is clipped, not an error
    payload[desc + 1 : desc + 3] = (7).to_bytes(2, "little")
    payload[desc + 3 : desc + 5] = (5).to_bytes(2, "little")
    out = decode_gif_pixels(bytes(payload))
    assert out.shape == (7, 9, 3)
    assert np.array_equal(out[5:7, 7:9], img[:2, :2])

    # frame placed entirely outside the screen fails closed
    payload[desc + 1 : desc + 3] = (9).to_bytes(2, "little")
    with pytest.raises(ValueError, match="outside"):
        decode_gif_pixels(bytes(payload))
