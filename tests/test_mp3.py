"""MPEG-1 audio (Layer I/II) codec tests: spec-table pins, header walk,
filterbank properties, encode/decode roundtrips, and corruption fuzz.

Reference parity: uktrade/matchbox ships no media codecs — this family
extends the multimodal-column toolkit (SURVEY.md §2 extensions), same
pattern as the JPEG/GIF/TIFF/WebP rounds.
"""

from __future__ import annotations

import numpy as np
import pytest

from matchbox_spark.operators.mp3 import (
    FILTERBANK_DELAY,
    _MsbBitWriter,
    _SCALEFACTORS,
    _alloc_table,
    _header_bytes,
    _l2_table_name,
    _quant_cd,
    _requant_fraction,
    analyze_pcm,
    decode_mp3_samples,
    encode_mp3,
    iter_frames,
    mp3_metadata,
    parse_frame_header,
    synthesize_subbands,
)


# ---------------------------------------------------------------------------
# spec tables — the closed forms must reproduce the published values
# ---------------------------------------------------------------------------


def test_quant_cd_reproduces_spec_table_3_c3():
    # (steps, C, D) rows from ISO/IEC 11172-3 Table 3-C.3
    rows = [
        (3, 1.33333333333, 0.5, True),
        (5, 1.60000000000, 0.5, True),
        (7, 1.14285714285, 0.25, False),
        (9, 1.77777777777, 0.5, True),
        (15, 1.06666666666, 0.125, False),
        (31, 1.03225806451, 0.0625, False),
        (63, 1.01587301587, 0.03125, False),
        (127, 1.00787401574, 0.015625, False),
        (255, 1.00392156862, 0.0078125, False),
        (511, 1.00195694716, 0.00390625, False),
        (1023, 1.00097751710, 0.001953125, False),
        (2047, 1.00048851978, 0.0009765625, False),
        (4095, 1.00024420024, 0.00048828125, False),
        (8191, 1.00012208522, 0.000244140625, False),
        (16383, 1.00006103888, 0.0001220703125, False),
        (32767, 1.00003051850, 0.00006103515625, False),
        (65535, 1.00001525902, 0.000030517578125, False),
    ]
    for steps, c_want, d_want, grouped_want in rows:
        c, d, nb, grouped = _quant_cd(steps)
        assert abs(c - c_want) < 1e-10, steps
        assert d == d_want, steps
        assert grouped is grouped_want, steps
        # ungrouped quantizers hold steps = 2^nb - 1
        if not grouped:
            assert steps == (1 << nb) - 1


def test_scalefactor_table_3_b1():
    # first rows of Table 3-B.1: 2, 2^(2/3), 2^(1/3), 1, ...
    assert _SCALEFACTORS[0] == 2.0
    assert abs(_SCALEFACTORS[1] - 1.58740105196820) < 1e-12
    assert abs(_SCALEFACTORS[2] - 1.25992104989487) < 1e-12
    assert abs(_SCALEFACTORS[3] - 1.0) < 1e-12
    assert len(_SCALEFACTORS) == 63  # index 63 is forbidden
    # strictly decreasing by 2^(-1/3)
    for a, b in zip(_SCALEFACTORS, _SCALEFACTORS[1:]):
        assert abs(b / a - 2.0 ** (-1 / 3.0)) < 1e-12


def test_requant_fraction_msb_inversion():
    # spec C.1.5.3.3: invert MSB, read as signed fraction
    assert _requant_fraction(0b10, 2) == 0.0
    assert _requant_fraction(0b11, 2) == 0.5
    assert _requant_fraction(0b01, 2) == -0.5
    assert _requant_fraction(0b00, 2) == -1.0
    assert _requant_fraction(0, 16) == -1.0
    assert _requant_fraction((1 << 15) + 1, 16) == 1.0 / (1 << 15)


def test_alloc_tables_codeable():
    """Every steps list must fit its nbal: codes 1..len need nbal bits.
    (Round-13 regression pin: B.2a's nbal-3 rows skip 63 — an 8-entry
    list silently truncated allocation code 8 to 0b000.)"""
    for name in "abcd":
        for nbal, steps_list in _alloc_table(name):
            assert len(steps_list) <= (1 << nbal) - 1, (name, nbal)
            assert all(b > a for a, b in zip(steps_list, steps_list[1:]))


def test_alloc_tables_shapes():
    assert len(_alloc_table("a")) == 27
    assert len(_alloc_table("b")) == 30
    assert len(_alloc_table("c")) == 8
    assert len(_alloc_table("d")) == 12
    with pytest.raises(ValueError):
        _alloc_table("z")
    # selection rule, spec 2.4.2.5
    assert _l2_table_name(48000, 384, 2) == "a"
    assert _l2_table_name(44100, 384, 2) == "b"
    assert _l2_table_name(44100, 192, 1) == "b"
    assert _l2_table_name(48000, 64, 1) == "a"
    assert _l2_table_name(44100, 48, 1) == "c"
    assert _l2_table_name(32000, 48, 1) == "d"


# ---------------------------------------------------------------------------
# frame headers
# ---------------------------------------------------------------------------


def test_header_roundtrip_and_frame_sizes():
    for layer, bitrate, rate, mode in [
        (1, 448, 44100, 3),
        (1, 32, 32000, 0),
        (2, 384, 48000, 3),
        (2, 192, 44100, 0),
        (2, 64, 32000, 3),
    ]:
        hdr = parse_frame_header(_header_bytes(layer, bitrate, rate, mode), 0)
        assert hdr is not None
        assert hdr["layer"] == layer
        assert hdr["bitrate_kbps"] == bitrate
        assert hdr["sample_rate"] == rate
        assert hdr["mode"] == mode
        assert hdr["nch"] == (1 if mode == 3 else 2)
        assert hdr["samples"] == (384 if layer == 1 else 1152)
        if layer == 1:
            assert hdr["frame_bytes"] == (12 * bitrate * 1000 // rate) * 4
        else:
            assert hdr["frame_bytes"] == 144 * bitrate * 1000 // rate
    # spot values: L2 384 kbps @48 kHz = 1152 B; L1 448 kbps @44.1 = 484 B
    assert parse_frame_header(_header_bytes(2, 384, 48000, 3), 0)[
        "frame_bytes"] == 1152
    assert parse_frame_header(_header_bytes(1, 448, 44100, 3), 0)[
        "frame_bytes"] == 484


def test_header_rejects_non_mpeg1():
    assert parse_frame_header(b"\x00\x00\x00\x00", 0) is None
    assert parse_frame_header(b"\xff\xe2\x90\x00", 0) is None  # MPEG-2
    assert parse_frame_header(b"\xff\xf6\x00\x00", 0) is None  # bitrate 0
    assert parse_frame_header(b"\xff\xf6\xf0\x00", 0) is None  # bitrate 15
    assert parse_frame_header(b"\xff\xf6\x9c\x00", 0) is None  # rate idx 3


# ---------------------------------------------------------------------------
# filterbank
# ---------------------------------------------------------------------------


def test_filterbank_zero_in_zero_out():
    out = synthesize_subbands(np.zeros((24, 32)))
    assert out.shape == (768,)
    assert not out.any()


def test_filterbank_roundtrip_snr_and_delay():
    rng = np.random.default_rng(7)
    x = rng.standard_normal(4096) * 0.3
    S = analyze_pcm(np.pad(x, (0, 1024)))
    y = synthesize_subbands(S)
    d = FILTERBANK_DELAY
    n = len(x) - d
    err = y[d:d + n] - x[:n]
    snr = 10 * np.log10(np.mean(x[:n] ** 2) / np.mean(err ** 2))
    assert snr > 55.0  # stand-in prototype reaches ~59 dB
    # the delay really is 481: shifting by ±8 samples must be much worse
    for off in (-8, 8):
        err2 = y[d + off:d + off + n] - x[:n]
        snr2 = 10 * np.log10(np.mean(x[:n] ** 2) / np.mean(err2 ** 2))
        assert snr2 < snr - 20


# ---------------------------------------------------------------------------
# encode → decode roundtrips
# ---------------------------------------------------------------------------


def test_silence_decodes_to_exact_zero_both_layers():
    sil = np.zeros(2304, np.int16)
    for layer in (1, 2):
        bs = encode_mp3(sil, rate=48000, layer=layer)
        pcm, rate, nch = decode_mp3_samples(bs)
        assert rate == 48000 and nch == 1
        assert len(pcm) % (384 if layer == 1 else 1152) == 0
        assert pcm.dtype == np.int16
        assert not pcm.any()  # allocation 0 everywhere → bit-exact silence


def _tone(n: int, rate: int) -> np.ndarray:
    t = np.arange(n)
    return (
        8000 * np.sin(2 * np.pi * 440 * t / rate)
        + 3000 * np.sin(2 * np.pi * 3000 * t / rate)
    ).astype(np.int16)


@pytest.mark.parametrize(
    "layer,rate", [(2, 48000), (2, 44100), (2, 32000), (1, 48000), (1, 44100)]
)
def test_tone_roundtrip_snr(layer, rate):
    n = (1152 if layer == 2 else 384) * 6
    sig = _tone(n, rate)
    bs = encode_mp3(sig, rate=rate, layer=layer)
    pcm, r, nch = decode_mp3_samples(bs)
    assert (r, nch) == (rate, 1)
    assert len(pcm) == n  # header-predictable length, nothing trimmed
    d = FILTERBANK_DELAY
    ref = sig[:n - d].astype(np.float64)
    out = pcm[d:n].astype(np.float64)
    snr = 10 * np.log10((ref ** 2).mean() / ((out - ref) ** 2).mean())
    assert snr > 45.0


def test_stereo_roundtrip_channels_independent():
    n = 1152 * 4
    left = (9000 * np.sin(2 * np.pi * 500 * np.arange(n) / 48000)).astype(
        np.int16)
    right = (6000 * np.sin(2 * np.pi * 1500 * np.arange(n) / 48000)).astype(
        np.int16)
    inter = np.empty(n * 2, np.int16)
    inter[0::2], inter[1::2] = left, right
    bs = encode_mp3(inter, rate=48000, layer=2, stereo=True)
    pcm, rate, nch = decode_mp3_samples(bs)
    assert (rate, nch) == (48000, 2)
    assert len(pcm) == 2 * n
    d = FILTERBANK_DELAY
    for ch, ref_full in ((0, left), (1, right)):
        ref = ref_full[:n - d].astype(np.float64)
        out = pcm[ch::2][d:n].astype(np.float64)
        snr = 10 * np.log10((ref ** 2).mean() / ((out - ref) ** 2).mean())
        assert snr > 45.0


def test_low_bitrate_drops_top_subbands_not_crashes():
    rng = np.random.default_rng(3)
    noise = (rng.standard_normal(1152 * 2) * 6000).clip(
        -32768, 32767).astype(np.int16)
    bs = encode_mp3(noise, rate=48000, layer=2, bitrate_kbps=32)
    pcm, rate, nch = decode_mp3_samples(bs)
    assert len(pcm) == 1152 * 2
    # lowest subbands survive: output correlates positively with input
    ref = noise[: len(noise) - FILTERBANK_DELAY].astype(np.float64)
    out = pcm[FILTERBANK_DELAY:].astype(np.float64)
    assert np.corrcoef(ref, out)[0, 1] > 0.3


def test_partial_frame_padded_with_silence():
    sig = _tone(1152 + 100, 48000)  # 1.09 frames → padded to 2
    bs = encode_mp3(sig, rate=48000, layer=2)
    pcm, rate, nch = decode_mp3_samples(bs)
    assert len(pcm) == 1152 * 2


# ---------------------------------------------------------------------------
# stream walk / metadata
# ---------------------------------------------------------------------------


def test_metadata_probe_and_duration():
    sig = _tone(1152 * 5, 44100)
    bs = encode_mp3(sig, rate=44100, layer=2, bitrate_kbps=192)
    md = mp3_metadata(bs)
    assert md["width"] is None and md["height"] is None
    assert md["n_frames"] == 5
    assert md["layer"] == 2
    assert md["sample_rate"] == 44100
    assert md["bitrate_kbps"] == 192
    assert md["duration_ms"] == round(5 * 1152 * 1000 / 44100)


def test_id3v2_tag_skipped():
    sig = _tone(1152 * 2, 48000)
    bs = encode_mp3(sig, rate=48000, layer=2)
    tag_body = b"junk" * 10
    sz = len(tag_body)
    tag = (b"ID3\x04\x00\x00"
           + bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                    (sz >> 7) & 0x7F, sz & 0x7F])
           + tag_body)
    pcm0, *_ = decode_mp3_samples(bs)
    pcm1, *_ = decode_mp3_samples(tag + bs)
    assert np.array_equal(pcm0, pcm1)
    assert mp3_metadata(tag + bs)["n_frames"] == 2


def test_trailing_zero_padding_tolerated():
    bs = encode_mp3(_tone(1152, 48000), rate=48000, layer=2)
    assert mp3_metadata(bs + b"\x00" * 17)["n_frames"] == 1


def test_scfsi_variants_decode_shared_scalefactors():
    """Hand-built Layer II frames: SCFSI 1/2/3 reuse transmitted
    scalefactors across the three 12-granule parts per spec 2.4.2.7."""
    rate, bitrate = 48000, 384
    tbl = _alloc_table(_l2_table_name(rate, bitrate, 1))
    sblimit = len(tbl)
    frame_bytes = 144 * bitrate * 1000 // rate
    # allocation code 2 in subband 0 → steps list entry [1] = 7 (ungrouped)
    steps = tbl[0][1][1]
    c, d, nb, grouped = _quant_cd(steps)
    assert steps == 7 and not grouped
    code_half = 0b110  # MSB-inverted +0.5 fraction

    def build(scfsi: int, sf_indices: list[int]) -> bytes:
        w = _MsbBitWriter()
        w.write(int.from_bytes(_header_bytes(2, bitrate, rate, 3), "big"), 32)
        w.write(2, tbl[0][0])  # subband 0: allocation code 2
        for sb in range(1, sblimit):
            w.write(0, tbl[sb][0])
        w.write(scfsi, 2)
        for idx in sf_indices:
            w.write(idx, 6)
        for _gr in range(12):
            for _s in range(3):
                w.write(code_half, nb)
        payload = bytes(w.bytes)
        return payload + b"\x00" * (frame_bytes - len(payload))

    # scfsi 0: three explicit scalefactors (indices 0, 3, 6 → 2.0, 1.0, 0.5)
    pcm0 = decode_mp3_samples(build(0, [0, 3, 6]))[0]
    # scfsi 1: two transmitted; parts 0-1 share the first
    pcm1 = decode_mp3_samples(build(1, [0, 6]))[0]
    # scfsi 2: one transmitted, all parts
    pcm2 = decode_mp3_samples(build(2, [0]))[0]
    # scfsi 3: two transmitted; parts 1-2 share the second
    pcm3 = decode_mp3_samples(build(3, [0, 3]))[0]
    # equivalent fully-explicit streams must decode identically
    assert np.array_equal(pcm1, decode_mp3_samples(build(0, [0, 0, 6]))[0])
    assert np.array_equal(pcm2, decode_mp3_samples(build(0, [0, 0, 0]))[0])
    assert np.array_equal(pcm3, decode_mp3_samples(build(0, [0, 3, 3]))[0])
    # and the variants are genuinely distinct signals
    assert not np.array_equal(pcm0, pcm2)


# ---------------------------------------------------------------------------
# corruption fuzz — fail closed
# ---------------------------------------------------------------------------


def test_malformed_payloads_raise():
    good = encode_mp3(_tone(1152 * 2, 48000), rate=48000, layer=2)
    bad = [
        b"",
        b"\x00" * 64,                      # zero pad, no sync
        good[:30],                          # truncated first frame
        good[: len(good) - 7],              # truncated final frame
        b"garbage" + good,                  # no sync at start
        good + b"\x01garbage",              # non-zero trailing junk
        b"\xff\xfd\x40\x00" + b"\x00" * 4,  # Layer III header
    ]
    for payload in bad:
        with pytest.raises(ValueError):
            decode_mp3_samples(payload)


def test_forbidden_field_values_raise():
    rate, bitrate = 48000, 384
    frame_bytes = 144 * bitrate * 1000 // rate

    def frame_with(alloc_code: int, sf_idx: int) -> bytes:
        tbl = _alloc_table("a")
        w = _MsbBitWriter()
        w.write(int.from_bytes(_header_bytes(2, bitrate, rate, 3), "big"), 32)
        w.write(alloc_code, tbl[0][0])
        for sb in range(1, len(tbl)):
            w.write(0, tbl[sb][0])
        if alloc_code:
            w.write(0, 2)  # scfsi
            for _ in range(3):
                w.write(sf_idx, 6)
        payload = bytes(w.bytes)
        return payload + b"\x00" * (frame_bytes - len(payload))

    with pytest.raises(ValueError):  # scalefactor 63 forbidden
        decode_mp3_samples(frame_with(2, 63))
    # Layer I forbidden allocation 15
    l1_bytes = (12 * 448 * 1000 // 48000) * 4
    w = _MsbBitWriter()
    w.write(int.from_bytes(_header_bytes(1, 448, 48000, 3), "big"), 32)
    w.write(15, 4)
    with pytest.raises(ValueError):
        decode_mp3_samples(
            bytes(w.bytes) + b"\x00" * (l1_bytes - len(w.bytes)))


def test_byte_flip_fuzz_never_hangs_or_segfaults():
    """Deterministic mutation sweep: every outcome is either a clean
    decode or a ValueError — no other exception type escapes."""
    good = bytearray(encode_mp3(_tone(1152 * 2, 48000), rate=48000, layer=2))
    rng = np.random.default_rng(11)
    for _ in range(120):
        mutated = bytearray(good)
        kind = rng.integers(0, 3)
        if kind == 0:  # flip a byte
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos] ^= int(rng.integers(1, 256))
        elif kind == 1:  # truncate
            mutated = mutated[: int(rng.integers(0, len(mutated)))]
        else:  # splice garbage
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos:pos] = bytes(rng.integers(0, 256, 9, dtype=np.uint8))
        try:
            pcm, rate, nch = decode_mp3_samples(bytes(mutated))
            assert rate in (32000, 44100, 48000) and nch in (1, 2)
        except ValueError:
            pass


def test_parameter_change_midstream_rejected():
    a = encode_mp3(_tone(1152, 48000), rate=48000, layer=2)
    b = encode_mp3(_tone(1152, 44100), rate=44100, layer=2)
    with pytest.raises(ValueError):
        decode_mp3_samples(a + b)


def test_intensity_stereo_bound_sharing():
    """Joint stereo (mode 1): subbands below ``bound`` carry per-channel
    allocation and samples; subbands at/above it share ONE allocation and
    ONE sample stream but keep per-channel scalefactors (spec 2.4.1.6 /
    A.3). Hand-built frame, parsed directly by _decode_layer2."""
    from matchbox_spark.operators.mp3 import _decode_layer2

    rate, bitrate = 48000, 384
    tbl = _alloc_table(_l2_table_name(rate, bitrate, 2))
    sblimit = len(tbl)
    hdr = parse_frame_header(_header_bytes(2, bitrate, rate, 1), 0)
    assert hdr["mode"] == 1 and hdr["nch"] == 2
    bound = (hdr["mode_ext"] + 1) * 4
    assert bound == 4

    steps = tbl[0][1][1]  # allocation code 2 → 7 steps, ungrouped
    c, d, nb, grouped = _quant_cd(steps)
    assert not grouped
    code_half = 0b110  # +0.5 fraction after MSB inversion

    w = _MsbBitWriter()
    # allocation: below bound per channel — sb0: ch0 code 2, ch1 none
    w.write(2, tbl[0][0])
    w.write(0, tbl[0][0])
    for sb in range(1, bound):
        w.write(0, tbl[sb][0])
        w.write(0, tbl[sb][0])
    # at/above bound: ONE allocation read per subband. sb4 sits in the
    # B.2a nbal-4 *second* step family ([3,5,7,9,...]) where code 2 is
    # the GROUPED 5-step quantizer — use code 3 (7 steps, ungrouped,
    # same quantizer as sb0's code 2) so both streams share one shape.
    assert tbl[bound][1][2] == steps
    w.write(3, tbl[bound][0])
    for sb in range(bound + 1, sblimit):
        w.write(0, tbl[sb][0])
    # scfsi then scalefactors, per (sb, ch) with nonzero allocation:
    # sb0/ch0, then sb4/ch0 and sb4/ch1 (shared alloc applies to both)
    for _ in range(3):
        w.write(2, 2)  # scfsi 2: one scalefactor for all parts
    w.write(3, 6)  # sb0 ch0 → scalefactor 1.0
    w.write(3, 6)  # sb4 ch0 → 1.0
    w.write(0, 6)  # sb4 ch1 → 2.0
    for _gr in range(12):
        for _s in range(3):
            w.write(code_half, nb)  # sb0, ch0 only
        for _s in range(3):
            w.write(code_half, nb)  # sb4, shared single stream
    payload = bytes(w.bytes)

    from matchbox_spark.operators.mp3 import _MsbBitReader

    out = _decode_layer2(_MsbBitReader(payload, 0), hdr)
    v = c * (0.5 + d)
    import numpy as np

    # sb0: left-only
    assert np.allclose(out[0][:, 0], v)
    assert not out[1][:, 0].any()
    # sb4: shared samples, per-channel scalefactors (right = 2× left)
    assert np.allclose(out[0][:, 4], v)
    assert np.allclose(out[1][:, 4], 2.0 * v)
    # everything else silent
    for sb in range(sblimit):
        if sb not in (0, 4):
            assert not out[0][:, sb].any() and not out[1][:, sb].any()


def test_iter_frames_walk_is_contiguous():
    bs = encode_mp3(_tone(1152 * 3, 48000), rate=48000, layer=2)
    positions = [pos for pos, _ in iter_frames(bs)]
    assert positions == [0, 1152, 2304]
