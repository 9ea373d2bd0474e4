"""VP8L (lossless WebP) codec tests: round-trips through every encoder
path, hand-built streams for the decode-only machinery (predictor /
color / palette transforms, meta-prefix), and corruption fuzz.

No Spark session needed — the codec is pure Python/NumPy (the Arrow
integration is covered by test_multimodal's registry tests).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from matchbox_spark.operators.webp import (
    _DIST_MAP,
    _LsbBitWriter,
    _add_px,
    _canonical_codes,
    _emit_prefix_code,
    _huffman_lengths,
    _prefix_encode,
    decode_webp_pixels,
    encode_webp_lossless,
)


def _rand_img(h, w, seed=0, palette=None):
    rs = np.random.RandomState(seed)
    if palette is None:
        return rs.randint(0, 256, (h, w, 3), dtype=np.uint8)
    pal = np.array(palette, dtype=np.uint8)
    return pal[rs.randint(0, len(pal), (h, w))]


# ---------------------------------------------------------------------------
# encoder round-trips (each optional path)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (16, 16), (7, 31)])
def test_roundtrip_literals(h, w):
    img = _rand_img(h, w, seed=h * 100 + w)
    out = decode_webp_pixels(encode_webp_lossless(img))
    np.testing.assert_array_equal(out, img)


def test_roundtrip_subtract_green():
    img = _rand_img(9, 13, seed=7)
    out = decode_webp_pixels(encode_webp_lossless(img, subtract_green=True))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("cache_bits", [1, 4, 8])
def test_roundtrip_color_cache(cache_bits):
    # few distinct colors → rich cache-hit stream
    img = _rand_img(20, 20, seed=3, palette=[(250, 10, 10), (10, 250, 10), (10, 10, 250), (0, 0, 0)])
    out = decode_webp_pixels(
        encode_webp_lossless(img, cache_bits=cache_bits)
    )
    np.testing.assert_array_equal(out, img)


def test_roundtrip_lz77_runs_overlapping_copy():
    img = np.zeros((8, 32, 3), dtype=np.uint8)
    img[:, :, 0] = 77  # long constant runs → distance-1 overlapping copies
    img[3, 10] = (1, 2, 3)
    out = decode_webp_pixels(encode_webp_lossless(img, use_lz77_runs=True))
    np.testing.assert_array_equal(out, img)


def test_roundtrip_all_options_together():
    img = _rand_img(
        17, 23, seed=11, palette=[(9, 9, 9), (200, 100, 0), (0, 200, 100)]
    )
    img[5:9, :] = (9, 9, 9)
    out = decode_webp_pixels(
        encode_webp_lossless(
            img, subtract_green=True, cache_bits=5, use_lz77_runs=True
        )
    )
    np.testing.assert_array_equal(out, img)


def test_prefix_encode_matches_decode_ranges():
    from matchbox_spark.operators.webp import _LsbBitReader, _prefix_value

    for value in list(range(1, 50)) + [77, 120, 121, 500, 4096]:
        code, extra_bits, extra = _prefix_encode(value)
        bw = _LsbBitWriter()
        bw.write(extra, extra_bits)
        br = _LsbBitReader(bytes(bw.bytes) or b"\x00")
        assert _prefix_value(br, code) == value


# ---------------------------------------------------------------------------
# hand-built streams: decode-only machinery
# ---------------------------------------------------------------------------


def _wrap_riff(vp8l: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _emit_argb_literals(bw, pixels):
    """One entropy-coded image of raw ARGB literals: no cache, no meta,
    per-channel Huffman from the pixel set."""
    gf, rf, bf, af = {}, {}, {}, {}
    for px in pixels:
        gf[px >> 8 & 0xFF] = gf.get(px >> 8 & 0xFF, 0) + 1
        rf[px >> 16 & 0xFF] = rf.get(px >> 16 & 0xFF, 0) + 1
        bf[px & 0xFF] = bf.get(px & 0xFF, 0) + 1
        af[px >> 24] = af.get(px >> 24, 0) + 1
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta (ignored for sub-images, harmless for main)
    codes = []
    for freqs, alphabet in ((gf, 280), (rf, 256), (bf, 256), (af, 256)):
        lengths = _huffman_lengths(freqs)
        _emit_prefix_code(bw, lengths, alphabet)
        codes.append(_canonical_codes(lengths))
    _emit_prefix_code(bw, {0: 0}, 40)  # unused distance
    gc, rc, bc, ac = codes
    for px in pixels:
        for cm, sym in (
            (gc, px >> 8 & 0xFF),
            (rc, px >> 16 & 0xFF),
            (bc, px & 0xFF),
            (ac, px >> 24),
        ):
            code, ln = cm[sym]
            bw.write_code(code, ln)


def _emit_sub_image(bw, pixels):
    """Entropy-coded SUB-image (transform data): cache bit + codes, no
    meta bit (sub-images never read one)."""
    gf, rf, bf, af = {}, {}, {}, {}
    for px in pixels:
        gf[px >> 8 & 0xFF] = gf.get(px >> 8 & 0xFF, 0) + 1
        rf[px >> 16 & 0xFF] = rf.get(px >> 16 & 0xFF, 0) + 1
        bf[px & 0xFF] = bf.get(px & 0xFF, 0) + 1
        af[px >> 24] = af.get(px >> 24, 0) + 1
    bw.write(0, 1)  # no cache
    codes = []
    for freqs, alphabet in ((gf, 280), (rf, 256), (bf, 256), (af, 256)):
        lengths = _huffman_lengths(freqs)
        _emit_prefix_code(bw, lengths, alphabet)
        codes.append(_canonical_codes(lengths))
    _emit_prefix_code(bw, {0: 0}, 40)
    gc, rc, bc, ac = codes
    for px in pixels:
        for cm, sym in (
            (gc, px >> 8 & 0xFF),
            (rc, px >> 16 & 0xFF),
            (bc, px & 0xFF),
            (ac, px >> 24),
        ):
            code, ln = cm[sym]
            bw.write_code(code, ln)


def _argb(r, g, b, a=0xFF):
    return (a << 24) | (r << 16) | (g << 8) | b


def test_predictor_transform_left_mode():
    """4x2 image, predictor mode 1 (left) in one block: residuals add
    cumulatively along each row; row starts follow the spec edge rules."""
    w, h = 4, 2
    bw = _LsbBitWriter()
    _header(bw, w, h)
    bw.write(1, 1)  # a transform follows
    bw.write(0, 2)  # PREDICTOR
    bw.write(2, 3)  # size_bits = 4 → one 16x16 block covers the image
    _emit_sub_image(bw, [_argb(0, 1, 0, 0)])  # mode 1 in green
    bw.write(0, 1)  # no more transforms
    residuals = [
        _argb(10, 20, 30),  # (0,0): pred black → A=255+255?  A residual 0xFF
        _argb(5, 5, 5, 0),
        _argb(1, 1, 1, 0),
        _argb(2, 2, 2, 0),
        _argb(7, 8, 9),  # (0,1): first column predicts TOP
        _argb(1, 0, 0, 0),
        _argb(0, 1, 0, 0),
        _argb(0, 0, 1, 0),
    ]
    # fix (0,0): prediction is 0xff000000, so alpha residual must be 0
    residuals[0] = _argb(10, 20, 30, 0)
    # (0,1) predicts top (= decoded (0,0)); residual alpha 0 keeps A=255
    residuals[4] = _argb(7, 8, 9, 0)
    _emit_argb_literals(bw, residuals)
    out = decode_webp_pixels(_wrap_riff(bytes(bw.bytes)))
    expect = np.array(
        [
            [[10, 20, 30], [15, 25, 35], [16, 26, 36], [18, 28, 38]],
            [[17, 28, 39], [18, 28, 39], [18, 29, 39], [18, 29, 40]],
        ],
        dtype=np.uint8,
    )
    # row 1: (0,1) = top + residual; then left-mode accumulation
    np.testing.assert_array_equal(out, expect)


def test_color_indexing_palette_with_bundling():
    """3-color palette → 2-bit indices, 4 pixels per packed byte."""
    w, h = 6, 2
    palette = [_argb(200, 0, 0), _argb(0, 200, 0), _argb(0, 0, 200)]
    idx_rows = [[0, 1, 2, 2, 1, 0], [2, 2, 0, 0, 1, 1]]
    bw = _LsbBitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(len(palette) - 1, 8)
    # palette image is DELTA coded: first entry raw, then diffs
    deltas = [palette[0]]
    for i in range(1, len(palette)):
        d = tuple(
            (a - b) & 0xFF
            for a, b in zip(
                [(palette[i] >> s) & 0xFF for s in (24, 16, 8, 0)],
                [(palette[i - 1] >> s) & 0xFF for s in (24, 16, 8, 0)],
            )
        )
        deltas.append((d[0] << 24) | (d[1] << 16) | (d[2] << 8) | d[3])
    _emit_sub_image(bw, deltas)
    bw.write(0, 1)  # no more transforms
    # packed width = ceil(6/4) = 2 per row; indices at bits k*2
    packed = []
    for row in idx_rows:
        for xp in range(2):
            v = 0
            for k in range(4):
                x = xp * 4 + k
                if x < w:
                    v |= row[x] << (k * 2)
            packed.append(_argb(0, v, 0, 0))
    _emit_argb_literals(bw, packed)
    out = decode_webp_pixels(_wrap_riff(bytes(bw.bytes)))
    pal_rgb = np.array(
        [[200, 0, 0], [0, 200, 0], [0, 0, 200]], dtype=np.uint8
    )
    expect = pal_rgb[np.array(idx_rows)]
    np.testing.assert_array_equal(out, expect)


def test_color_transform_roundtrip_via_forward_sim():
    """Apply the spec's forward color transform to known pixels, emit the
    residual image + element sub-image, and check the decoder restores
    the originals."""

    def sgn(v):
        return v - 256 if v >= 128 else v

    g2r, g2b, r2b = 40, 250, 17  # element bytes (signed 3.5 fixed point)
    orig = [
        _argb(12, 34, 56),
        _argb(200, 100, 50),
        _argb(255, 0, 255),
        _argb(1, 2, 3),
    ]
    fwd = []
    for px in orig:
        a, r, g, b = px >> 24, px >> 16 & 0xFF, px >> 8 & 0xFF, px & 0xFF
        # forward = subtract the deltas the decoder will add back
        new_b = (b - ((sgn(r2b) * sgn(r)) >> 5)) & 0xFF
        new_b = (new_b - ((sgn(g2b) * sgn(g)) >> 5)) & 0xFF
        new_r = (r - ((sgn(g2r) * sgn(g)) >> 5)) & 0xFF
        fwd.append((a << 24) | (new_r << 16) | (g << 8) | new_b)
    w, h = 2, 2

    def decode_with_element(elem_px):
        bw = _LsbBitWriter()
        _header(bw, w, h)
        bw.write(1, 1)
        bw.write(1, 2)  # COLOR transform
        bw.write(2, 3)  # size_bits 4 → one block
        _emit_sub_image(bw, [elem_px])
        bw.write(0, 1)
        _emit_argb_literals(bw, fwd)
        return decode_webp_pixels(_wrap_riff(bytes(bw.bytes)))

    # spec element layout: red channel = red_to_blue, green = green_to_blue,
    # blue = green_to_red (libwebp ColorCodeToMultipliers)
    out = decode_with_element(_argb(r2b, g2b, g2r, 0))
    expect = np.array(
        [
            [
                [px >> 16 & 0xFF, px >> 8 & 0xFF, px & 0xFF]
                for px in orig[:2]
            ],
            [
                [px >> 16 & 0xFF, px >> 8 & 0xFF, px & 0xFF]
                for px in orig[2:]
            ],
        ],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(out, expect)
    # discrimination: the pre-r13 swapped layout (g2r in red, r2b in blue)
    # must NOT restore the originals — the channel positions are load-bearing
    swapped = decode_with_element(_argb(g2r, g2b, r2b, 0))
    assert not np.array_equal(swapped, expect)


def test_predictor_mode13_truncates_toward_zero():
    """ClampAddSubtractHalf uses C division (truncate toward zero), not
    a floor shift: left=10, top=20, tl=18 → ave=15, delta=-3 → pred 14
    (floor semantics would give 13). Spec §predictor mode 13 / libwebp
    ClampedAddSubtractHalf."""
    w, h = 2, 2
    bw = _LsbBitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR
    bw.write(2, 3)  # size_bits 4 → one block
    _emit_sub_image(bw, [_argb(0, 13, 0, 0)])  # mode 13 in green
    bw.write(0, 1)
    residuals = [
        _argb(18, 18, 18, 0),  # (0,0): pred black → 18
        _argb(2, 2, 2, 0),  # (1,0): left → 20
        _argb(248, 248, 248, 0),  # (0,1): top → 10
        _argb(1, 1, 1, 0),  # (1,1): mode13 pred 14 → 15
    ]
    _emit_argb_literals(bw, residuals)
    out = decode_webp_pixels(_wrap_riff(bytes(bw.bytes)))
    expect = np.array(
        [[[18] * 3, [20] * 3], [[10] * 3, [15] * 3]], dtype=np.uint8
    )
    np.testing.assert_array_equal(out, expect)


def test_two_symbol_simple_code_positional():
    """A simple prefix code listing the LARGER symbol first assigns bit 0
    to that first-listed symbol (positional, per spec) — not to the
    numerically smaller one (canonical order)."""
    bw = _LsbBitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta-prefix
    # green: simple, two symbols, listed 7 then 3 → bit0=7, bit1=3
    bw.write(1, 1)  # simple form
    bw.write(1, 1)  # num_symbols = 2
    bw.write(1, 1)  # sym0 in 8 bits
    bw.write(7, 8)
    bw.write(3, 8)  # sym1 (always 8 bits)
    # red, blue: single-symbol 0; alpha: single-symbol 255
    for val, wide in ((0, False), (0, False), (255, True)):
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # num_symbols = 1
        bw.write(1 if wide else 0, 1)
        bw.write(val, 8 if wide else 1)
    # distance: single-symbol 0
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # pixel data: greens only (other channels are zero-bit codes)
    bw.write(0, 1)  # pixel 0: green bit 0 → symbol 7
    bw.write(1, 1)  # pixel 1: green bit 1 → symbol 3
    out = decode_webp_pixels(_wrap_riff(bytes(bw.bytes)))
    expect = np.array([[[0, 7, 0], [0, 3, 0]]], dtype=np.uint8)
    np.testing.assert_array_equal(out, expect)


def test_meta_prefix_groups():
    """Two tiles, two code groups: tile 0 decodes greens under group 0,
    tile 1 under group 1 — different Huffman tables per tile."""
    w, h = 8, 4  # meta_bits=2 → 4x4 tiles → 2 tiles horizontally
    bw = _LsbBitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta-prefix present
    bw.write(0, 3)  # meta_bits = 2
    # entropy image 2x1: meta codes 0 and 1 in (red<<8|green)
    _emit_sub_image(bw, [_argb(0, 0, 0, 0), _argb(0, 1, 0, 0)])
    # group 0: all pixels (10,20,30); group 1: all (40,50,60)
    for g, r, b in ((20, 10, 30), (50, 40, 60)):
        _emit_prefix_code(bw, {g: 0}, 280)
        _emit_prefix_code(bw, {r: 0}, 256)
        _emit_prefix_code(bw, {b: 0}, 256)
        _emit_prefix_code(bw, {0xFF: 0}, 256)
        _emit_prefix_code(bw, {0: 0}, 40)
    # all symbols are zero-bit codes → no data bits at all
    out = decode_webp_pixels(_wrap_riff(bytes(bw.bytes)))
    assert out.shape == (4, 8, 3)
    np.testing.assert_array_equal(out[:, :4], np.full((4, 4, 3), [10, 20, 30], np.uint8))
    np.testing.assert_array_equal(out[:, 4:], np.full((4, 4, 3), [40, 50, 60], np.uint8))


# ---------------------------------------------------------------------------
# corruption fuzz — fail closed
# ---------------------------------------------------------------------------


def test_malformed_payloads_raise():
    good = encode_webp_lossless(_rand_img(6, 6, seed=1))
    cases = [
        b"",
        b"RIFF",
        b"RIFX" + good[4:],
        good[:12],  # no VP8L chunk
        good[:30],  # truncated bitstream
        good[:20] + b"\x00" * 4,  # corrupt interior
    ]
    for payload in cases:
        with pytest.raises(ValueError):
            decode_webp_pixels(payload)


def test_bad_signature_and_version():
    good = encode_webp_lossless(_rand_img(4, 4, seed=2))
    sig_pos = good.index(b"VP8L") + 8
    bad_sig = bytearray(good)
    bad_sig[sig_pos] = 0x30
    with pytest.raises(ValueError, match="signature"):
        decode_webp_pixels(bytes(bad_sig))
    bad_ver = bytearray(good)
    bad_ver[sig_pos + 4] |= 0xE0  # version bits live at bits 29-31
    with pytest.raises(ValueError):
        decode_webp_pixels(bytes(bad_ver))


def test_lossy_webp_rejected():
    body = b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="lossy"):
        decode_webp_pixels(payload)


def test_geometry_cap():
    bw = _LsbBitWriter()
    _header(bw, 16384, 16384)
    with pytest.raises(ValueError, match="cap"):
        decode_webp_pixels(_wrap_riff(bytes(bw.bytes)))


def test_dist_map_has_120_entries():
    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[0] == (0, 1) and _DIST_MAP[1] == (1, 0)
    assert _DIST_MAP[119] == (8, 7)


def test_add_px_wraps_per_channel():
    assert _add_px(0xFF010203, 0x01FF01FF) == 0x00000302
