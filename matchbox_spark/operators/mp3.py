"""MPEG-1 audio (Layer I/II) codec — pure Python/NumPy (round 13).

Decoder pipeline, per ISO/IEC 11172-3: frame-sync walk → header parse →
CRC skip → Layer I/II bit allocation → SCFSI/scalefactors →
requantization → polyphase synthesis filterbank. Everything up to the
filterbank is implemented exactly per the standard:

- dequantization constants C/D are derived in closed form instead of
  transcribing spec Table 3-C.3: for a quantizer with ``steps`` levels
  held in ``nb = steps.bit_length()`` bits, ``C = 2^nb / steps`` and
  ``D = 0.5`` for the grouped quantizers (3/5/9 steps) or ``D =
  2^(1-nb)`` for the ungrouped ``steps = 2^nb - 1`` ones — reproducing
  every published table value (pinned in tests/test_mp3.py).
- scalefactors: index i → ``2 * 2^(-i/3)`` (spec Table 3-B.1).
- Layer II allocation tables B.2a-d and their (sampling-rate, bitrate
  per channel) selection rule are transcribed below.

The synthesis filterbank implements the ISO flowchart structure exactly
(64-point matrixing ``N(i,k) = cos((16+i)(2k+1)π/64)``, 1024-sample V
FIFO, 512-tap windowed fold-down, 32 PCM samples per block; decode
delay 481 samples, same as the committee filterbank). HONEST DIVERGENCE:
the 512 window coefficients of spec Table 3-B.3 are a committee-designed
constant table this repo does not bundle; ``_PROTOTYPE`` is a
Kaiser-windowed-sinc stand-in (cutoff 1/56.5, beta 9.0, the same
alternating-sign layout) that reconstructs at ~59 dB SNR against this
module's matched analysis filterbank (the committee window reaches
~96 dB against libmad/ffmpeg). ``decode_mp3_samples(..., window=)``
accepts the published table verbatim for bit-faithful behaviour. Layer
III is NOT implemented (bit reservoir + Huffman + IMDCT + aliasing
butterflies — ffmpeg territory) and stays an honest ``no_decoder`` stub
in the multimodal registry.

The fixture encoder (``encode_mp3``) is the codec's test twin: matched
analysis filterbank, the same allocation tables, scalefactor selection
from spec Table 3-B.1, and the exact inverse of the requantizer. An
all-zero input emits allocation 0 everywhere, which the decoder
reconstructs as EXACTLY zero PCM (no window leakage) — the property the
SQL oracle pins (m-family entries in __spark_entry__.py).

Reference parity note: uktrade/matchbox has no media codecs at all —
this extends the multimodal-column toolkit (SURVEY.md §2 extensions),
mirroring the JPEG/GIF/TIFF/WebP rounds.
"""

from __future__ import annotations

import math
import struct

import numpy as np


class UnsupportedMpegLayer(ValueError):
    """Valid MPEG audio stream using a layer this codec does not decode
    (Layer III). Distinct from plain ValueError so the multimodal stats
    stage can report status 'no_decoder' instead of 'corrupt'."""

# ---------------------------------------------------------------------------
# tables (ISO/IEC 11172-3)
# ---------------------------------------------------------------------------

_BITRATES = {
    1: [None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [None, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
}
_SAMPLE_RATES = [44100, 48000, 32000, None]

# Table 3-B.1: scalefactors, index 0..62 (63 is forbidden)
_SCALEFACTORS = [2.0 * 2.0 ** (-i / 3.0) for i in range(63)]

# Layer II allocation step-lists (Tables 3-B.2a-d). Index 0 = no bits;
# entry k-1 = number of quantizer steps for allocation code k.
_STEPS_HI_0 = [3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
               16383, 32767, 65535]                     # nbal 4, sb 0-2
_STEPS_HI_1 = [3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
               8191, 65535]                             # nbal 4, sb 3-10
_STEPS_HI_2 = [3, 5, 7, 9, 15, 31, 65535]               # nbal 3, sb 11-22
_STEPS_HI_3 = [3, 5, 65535]                             # nbal 2, sb 23+
_STEPS_LO_0 = [3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
               16383, 32767]                            # nbal 4, sb 0-1
_STEPS_LO_1 = [3, 5, 9, 15, 31, 63, 127]                # nbal 3, sb 2+


def _alloc_table(name: str) -> list[tuple[int, list[int]]]:
    """Per-subband (nbal, step-list) rows for tables B.2a-d."""
    if name == "a":  # sblimit 27
        return ([(4, _STEPS_HI_0)] * 3 + [(4, _STEPS_HI_1)] * 8
                + [(3, _STEPS_HI_2)] * 12 + [(2, _STEPS_HI_3)] * 4)
    if name == "b":  # sblimit 30
        return ([(4, _STEPS_HI_0)] * 3 + [(4, _STEPS_HI_1)] * 8
                + [(3, _STEPS_HI_2)] * 12 + [(2, _STEPS_HI_3)] * 7)
    if name == "c":  # sblimit 8
        return [(4, _STEPS_LO_0)] * 2 + [(3, _STEPS_LO_1)] * 6
    if name == "d":  # sblimit 12
        return [(4, _STEPS_LO_0)] * 2 + [(3, _STEPS_LO_1)] * 10
    raise ValueError(f"unknown allocation table {name!r}")


def _l2_table_name(sample_rate: int, bitrate_kbps: int, nch: int) -> str:
    """Table B.2 selection by (sampling rate, bitrate per channel).

    Spec 2.4.2.5 selection rule: ≤48 kbps/ch → the low-rate tables
    (B.2d at 32 kHz, B.2c otherwise); 56-80 → B.2a everywhere;
    ≥96 → B.2a at 48 kHz, B.2b at 44.1/32 kHz."""
    per_ch = bitrate_kbps // nch
    if per_ch <= 48:
        return "d" if sample_rate == 32000 else "c"
    if per_ch <= 80:
        return "a"
    return "a" if sample_rate == 48000 else "b"


def _quant_cd(steps: int) -> tuple[float, float, int, bool]:
    """(C, D, nbits, grouped) for a quantizer with ``steps`` levels.

    Closed form for spec Table 3-C.3: grouped quantizers (3/5/9 steps,
    three samples share one base-``steps`` code word) have D=0.5 and
    C=2^nb/steps; ungrouped ones (steps = 2^nb - 1) have D=2^(1-nb) and
    the same C expression."""
    nb = steps.bit_length()
    grouped = steps in (3, 5, 9)
    c = float(1 << nb) / steps
    d = 0.5 if grouped else 2.0 ** (1 - nb)
    return c, d, nb, grouped


def _requant_fraction(code: int, nb: int) -> float:
    """MSB-inversion fraction s''' ∈ [-1, 1): invert the code's MSB and
    read the result as a signed nb-bit fraction (spec C.1.5.3.3)."""
    x = code ^ (1 << (nb - 1))
    if x >= 1 << (nb - 1):
        x -= 1 << nb
    return x / float(1 << (nb - 1))


# ---------------------------------------------------------------------------
# bit I/O (MSB-first — MPEG audio bit order)
# ---------------------------------------------------------------------------


class _MsbBitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bit_pos: int = 0):
        self.data = data
        self.pos = bit_pos

    def read(self, n: int) -> int:
        v = 0
        data, pos = self.data, self.pos
        if pos + n > len(data) * 8:
            raise ValueError("MP3: bitstream truncated")
        for _ in range(n):
            v = (v << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return v


class _MsbBitWriter:
    __slots__ = ("bytes", "bitpos")

    def __init__(self):
        self.bytes = bytearray()
        self.bitpos = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            if self.bitpos == 0:
                self.bytes.append(0)
            if (value >> i) & 1:
                self.bytes[-1] |= 1 << (7 - self.bitpos)
            self.bitpos = (self.bitpos + 1) & 7


# ---------------------------------------------------------------------------
# frame header
# ---------------------------------------------------------------------------


def parse_frame_header(data: bytes, pos: int) -> dict | None:
    """Parse a 32-bit MPEG audio frame header at byte ``pos``.

    Returns None when no valid MPEG-1 Layer I/II header starts there.
    ``frame_bytes`` includes header, CRC, payload and padding."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[pos:pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 3
    if version != 3:  # MPEG-1 only (2/2.5 use different tables)
        return None
    layer = {3: 1, 2: 2, 1: 3}.get((b1 >> 1) & 3)
    if layer is None:
        return None
    protection = b1 & 1  # 0 → 16-bit CRC follows the header
    bitrate_idx = b2 >> 4
    sr_idx = (b2 >> 2) & 3
    padding = (b2 >> 1) & 1
    mode = b3 >> 6  # 0 stereo, 1 joint, 2 dual, 3 mono
    mode_ext = (b3 >> 4) & 3
    rate = _SAMPLE_RATES[sr_idx]
    if rate is None or bitrate_idx in (0, 15):  # free format unsupported
        return None
    if layer == 3:
        return {"layer": 3, "sample_rate": rate, "mode": mode}
    bitrate = _BITRATES[layer][bitrate_idx]
    if layer == 1:
        frame_bytes = (12 * bitrate * 1000 // rate + padding) * 4
    else:
        frame_bytes = 144 * bitrate * 1000 // rate + padding
    return {
        "layer": layer,
        "bitrate_kbps": bitrate,
        "sample_rate": rate,
        "padding": padding,
        "protection": protection,
        "mode": mode,
        "mode_ext": mode_ext,
        "nch": 1 if mode == 3 else 2,
        "frame_bytes": frame_bytes,
        "samples": 384 if layer == 1 else 1152,
    }


# ---------------------------------------------------------------------------
# synthesis / analysis filterbanks
# ---------------------------------------------------------------------------


def _make_prototype() -> np.ndarray:
    """Stand-in 512-tap prototype in the spec's alternating-sign layout.

    Kaiser(9.0)-windowed sinc, cutoff 1/56.5 of fs — parameters grid-
    searched for max reconstruction SNR through the matched ISO
    analysis/synthesis pair (~59 dB; decode delay 481 samples, identical
    to the committee window's). Spec Table 3-B.3 can be substituted via
    the ``window=`` argument of decode_mp3_samples."""
    n = np.arange(512)
    h = np.sinc((n - 256) / 56.5) / 64.0
    h = h * np.kaiser(512, 9.0)
    h = h / h.sum()
    sign = np.where((n // 64) % 2 == 1, -1.0, 1.0)
    return h * sign


_PROTOTYPE = _make_prototype()
# measured passband gain of the analysis+synthesis chain with _PROTOTYPE
# (least-squares fit on white noise, deterministic); folded into the
# synthesis window so the chain has unit gain
_CHAIN_GAIN = 0.2501895
_SYNTH_MATRIX = np.cos(
    (16 + np.arange(64)[:, None]) * (2 * np.arange(32)[None, :] + 1)
    * np.pi / 64.0
)
_ANALYSIS_MATRIX = np.cos(
    (2 * np.arange(32)[:, None] + 1) * (np.arange(64)[None, :] - 16)
    * np.pi / 64.0
)


def synthesize_subbands(S: np.ndarray, window: np.ndarray | None = None) -> np.ndarray:
    """ISO synthesis flowchart: (nblk, 32) subband samples → float PCM.

    Matrixing into a 1024-sample V FIFO, U gather, 512-tap windowing,
    16-way fold-down to 32 output samples per block. All-zero subband
    input produces exactly-zero output (linear pipeline, no bias)."""
    if window is None:
        D = 32.0 * _PROTOTYPE / _CHAIN_GAIN
    else:
        D = np.asarray(window, dtype=np.float64)
    V = np.zeros(1024)
    nblk = S.shape[0]
    out = np.empty(nblk * 32)
    gather = np.empty(512)
    for m in range(nblk):
        V[64:] = V[:-64]
        V[:64] = _SYNTH_MATRIX @ S[m]
        for i in range(8):
            gather[64 * i: 64 * i + 32] = V[128 * i: 128 * i + 32]
            gather[64 * i + 32: 64 * i + 64] = V[128 * i + 96: 128 * i + 128]
        out[m * 32: (m + 1) * 32] = (gather * D).reshape(16, 32).sum(axis=0)
    return out


def analyze_pcm(x: np.ndarray, window: np.ndarray | None = None) -> np.ndarray:
    """Matched ISO analysis flowchart: float PCM → (nblk, 32) subbands.

    X FIFO holds the newest sample at index 0 (the orientation that
    reconstructs; pinned by the roundtrip tests)."""
    C = _PROTOTYPE if window is None else np.asarray(window, dtype=np.float64)
    nblk = len(x) // 32
    X = np.zeros(512)
    S = np.empty((nblk, 32))
    for m in range(nblk):
        X[32:] = X[:-32]
        X[:32] = x[m * 32: (m + 1) * 32][::-1]
        Y = (C * X).reshape(8, 64).sum(axis=0)
        S[m] = _ANALYSIS_MATRIX @ Y
    return S


#: filterbank decode delay in samples (analysis+synthesis group delay);
#: identical for the committee window — pinned in tests
FILTERBANK_DELAY = 481


# ---------------------------------------------------------------------------
# Layer I / II frame decode → subband samples
# ---------------------------------------------------------------------------


def _decode_layer1(br: _MsbBitReader, hdr: dict) -> list[np.ndarray]:
    nch = hdr["nch"]
    bound = (hdr["mode_ext"] + 1) * 4 if hdr["mode"] == 1 else 32
    alloc = [[0] * 32 for _ in range(nch)]
    for sb in range(bound):
        for ch in range(nch):
            a = br.read(4)
            if a == 15:
                raise ValueError("MP3 L1: forbidden allocation 15")
            alloc[ch][sb] = a
    for sb in range(bound, 32):
        a = br.read(4)
        if a == 15:
            raise ValueError("MP3 L1: forbidden allocation 15")
        for ch in range(nch):
            alloc[ch][sb] = a
    sf = [[0.0] * 32 for _ in range(nch)]
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch][sb]:
                idx = br.read(6)
                if idx > 62:
                    raise ValueError("MP3: forbidden scalefactor 63")
                sf[ch][sb] = _SCALEFACTORS[idx]
    out = [np.zeros((12, 32)) for _ in range(nch)]
    for s in range(12):
        for sb in range(32):
            if sb < bound:
                for ch in range(nch):
                    a = alloc[ch][sb]
                    if a:
                        nb = a + 1
                        c, d, _, _ = _quant_cd((1 << nb) - 1)
                        code = br.read(nb)
                        out[ch][s, sb] = sf[ch][sb] * c * (
                            _requant_fraction(code, nb) + d)
            else:
                a = alloc[0][sb]
                if a:
                    nb = a + 1
                    c, d, _, _ = _quant_cd((1 << nb) - 1)
                    code = br.read(nb)
                    f = _requant_fraction(code, nb)
                    for ch in range(nch):
                        out[ch][s, sb] = sf[ch][sb] * c * (f + d)
    return out


def _read_scalefactors(br: _MsbBitReader, scfsi: int) -> tuple[int, int, int]:
    """Scalefactor indices for the three 12-sample parts, per SCFSI."""

    def one() -> int:
        idx = br.read(6)
        if idx > 62:
            raise ValueError("MP3: forbidden scalefactor 63")
        return idx

    if scfsi == 0:
        a, b, c = one(), one(), one()
    elif scfsi == 1:
        a = one()
        c = one()
        b = a
    elif scfsi == 2:
        a = one()
        b = c = a
    else:  # scfsi 3: part 0 = first, parts 1-2 share the second
        a = one()
        b = c = one()
    return a, b, c


def _decode_layer2(br: _MsbBitReader, hdr: dict) -> list[np.ndarray]:
    nch = hdr["nch"]
    tbl = _alloc_table(
        _l2_table_name(hdr["sample_rate"], hdr["bitrate_kbps"], nch))
    sblimit = len(tbl)
    bound = sblimit
    if hdr["mode"] == 1:
        bound = min((hdr["mode_ext"] + 1) * 4, sblimit)
    alloc = [[0] * sblimit for _ in range(nch)]
    for sb in range(bound):
        nbal = tbl[sb][0]
        for ch in range(nch):
            a = br.read(nbal)
            if a > len(tbl[sb][1]):
                raise ValueError("MP3 L2: allocation out of table range")
            alloc[ch][sb] = a
    for sb in range(bound, sblimit):
        nbal = tbl[sb][0]
        a = br.read(nbal)
        if a > len(tbl[sb][1]):
            raise ValueError("MP3 L2: allocation out of table range")
        for ch in range(nch):
            alloc[ch][sb] = a
    scfsi = [[0] * sblimit for _ in range(nch)]
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch][sb]:
                scfsi[ch][sb] = br.read(2)
    sf = [[(0.0, 0.0, 0.0)] * sblimit for _ in range(nch)]
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch][sb]:
                a, b, c = _read_scalefactors(br, scfsi[ch][sb])
                sf[ch][sb] = (
                    _SCALEFACTORS[a], _SCALEFACTORS[b], _SCALEFACTORS[c])
    out = [np.zeros((36, 32)) for _ in range(nch)]

    def _emit(ch: int, sb: int, gr: int, vals: tuple[float, float, float]):
        part = gr // 4
        factor = sf[ch][sb][part]
        base = gr * 3
        out[ch][base, sb] = factor * vals[0]
        out[ch][base + 1, sb] = factor * vals[1]
        out[ch][base + 2, sb] = factor * vals[2]

    for gr in range(12):
        for sb in range(sblimit):
            shared = sb >= bound
            chans = (0,) if shared else tuple(range(nch))
            for ch in chans:
                a = alloc[ch][sb]
                if not a:
                    continue
                steps = tbl[sb][1][a - 1]
                c, d, nb, grouped = _quant_cd(steps)
                if grouped:
                    gbits = {3: 5, 5: 7, 9: 10}[steps]
                    code = br.read(gbits)
                    if code >= steps ** 3:
                        raise ValueError("MP3 L2: grouped code overflow")
                    digs = (code % steps, (code // steps) % steps,
                            code // (steps * steps))
                    vals = tuple(
                        c * (_requant_fraction(dg, nb) + d) for dg in digs)
                else:
                    vals = tuple(
                        c * (_requant_fraction(br.read(nb), nb) + d)
                        for _ in range(3))
                if shared:
                    for cc in range(nch):
                        if alloc[cc][sb]:
                            _emit(cc, sb, gr, vals)
                else:
                    _emit(ch, sb, gr, vals)
    return out


# ---------------------------------------------------------------------------
# public decode
# ---------------------------------------------------------------------------


def iter_frames(payload: bytes):
    """Yield (pos, header) for each frame; strict contiguous walk.

    An ID3v2 tag at the start is skipped (size is syncsafe). Trailing
    bytes that are not a valid header terminate with ValueError unless
    they are all zero padding."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        sz = ((payload[6] & 0x7F) << 21 | (payload[7] & 0x7F) << 14
              | (payload[8] & 0x7F) << 7 | (payload[9] & 0x7F))
        pos = 10 + sz
    got = False
    while pos < len(payload):
        if not got and payload[pos] == 0:  # leading zero pad: invalid
            raise ValueError("MP3: no frame sync at stream start")
        if got and all(b == 0 for b in payload[pos:]):
            return  # trailing zero padding
        hdr = parse_frame_header(payload, pos)
        if hdr is None:
            raise ValueError(f"MP3: bad frame header at byte {pos}")
        if hdr["layer"] == 3:
            raise UnsupportedMpegLayer(
                "MP3: Layer III not supported (no_decoder)")
        if pos + hdr["frame_bytes"] > len(payload):
            raise ValueError("MP3: truncated final frame")
        yield pos, hdr
        got = True
        pos += hdr["frame_bytes"]
    if not got:
        raise ValueError("MP3: empty stream")


def decode_mp3_samples(
    payload: bytes, window: np.ndarray | None = None
) -> tuple[np.ndarray, int, int]:
    """Decode MPEG-1 Layer I/II → (interleaved int16 samples, rate, nch).

    Same return contract as decode_wav_samples. Output length is exactly
    n_frames × (384|1152) per channel (the 481-sample filterbank delay
    stays inside the stream; nothing is trimmed, so sample counts are
    header-predictable — the property the SQL oracle checks)."""
    per_ch: list[list[np.ndarray]] = []
    rate = nch = None
    layer = None
    for pos, hdr in iter_frames(payload):
        if rate is None:
            rate, nch, layer = hdr["sample_rate"], hdr["nch"], hdr["layer"]
        elif (hdr["sample_rate"], hdr["nch"], hdr["layer"]) != (rate, nch, layer):
            raise ValueError("MP3: parameter change mid-stream")
        bit_pos = (pos + 4) * 8
        if hdr["protection"] == 0:
            bit_pos += 16  # CRC16 — skipped, not verified
        br = _MsbBitReader(payload, bit_pos)
        sbs = (_decode_layer1 if hdr["layer"] == 1 else _decode_layer2)(br, hdr)
        if (br.pos + 7) // 8 > pos + hdr["frame_bytes"]:
            raise ValueError("MP3: frame payload overrun")
        if not per_ch:
            per_ch = [[] for _ in range(nch)]
        for ch in range(nch):
            per_ch[ch].append(sbs[ch])
    pcm = [synthesize_subbands(np.vstack(blocks), window=window)
           for blocks in per_ch]
    n = len(pcm[0])
    inter = np.empty(n * nch)
    for ch in range(nch):
        inter[ch::nch] = pcm[ch]
    samples = np.clip(np.rint(inter * 32767.0), -32768, 32767).astype(np.int16)
    return samples, rate, nch


def mp3_metadata(payload: bytes) -> dict:
    """Header-level probe (multimodal registry contract): duration from
    the frame walk, no PCM decode."""
    frames = 0
    rate = layer = bitrate = mode = None
    samples_per_frame = 0
    for _, hdr in iter_frames(payload):
        if rate is None:
            rate, layer = hdr["sample_rate"], hdr["layer"]
            bitrate, mode = hdr["bitrate_kbps"], hdr["mode"]
            samples_per_frame = hdr["samples"]
        frames += 1
    return {
        "width": None,
        "height": None,
        "duration_ms": round(frames * samples_per_frame * 1000 / rate),
        "layer": layer,
        "sample_rate": rate,
        "bitrate_kbps": bitrate,
        "mode": mode,
        "n_frames": frames,
    }


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def _quantize(val: float, steps: int, c: float, d: float, nb: int) -> int:
    """Exact inverse of the requantizer: value (already divided by the
    scalefactor) → code/digit in [0, steps-1]."""
    f = val / c - d
    x = int(round(f * (1 << (nb - 1))))
    code = x + (1 << (nb - 1))
    return 0 if code < 0 else steps - 1 if code > steps - 1 else code


def _pick_scalefactor(maxabs: float) -> int:
    """Smallest scalefactor (largest index) that still covers maxabs."""
    if maxabs <= 0.0:
        return 62
    idx = int(math.floor(-3.0 * math.log2(maxabs / 2.0)))
    idx = max(0, min(62, idx))
    while idx > 0 and _SCALEFACTORS[idx] < maxabs:
        idx -= 1
    return idx


def _header_bytes(layer: int, bitrate: int, rate: int, mode: int) -> bytes:
    b0 = 0xFF
    layer_code = {1: 3, 2: 2}[layer]
    b1 = 0xE0 | (3 << 3) | (layer_code << 1) | 1  # MPEG-1, no CRC
    bidx = _BITRATES[layer].index(bitrate)
    sridx = _SAMPLE_RATES.index(rate)
    b2 = (bidx << 4) | (sridx << 2)  # no padding
    b3 = mode << 6
    return bytes([b0, b1, b2, b3])


def encode_mp3(
    samples: np.ndarray,
    rate: int = 48000,
    layer: int = 2,
    bitrate_kbps: int | None = None,
    stereo: bool = False,
) -> bytes:
    """Encode int16 PCM as MPEG-1 Layer I/II (fixture twin of the decoder).

    ``samples``: int16, interleaved when stereo. The stream is padded
    with zero samples to a whole number of frames. Allocation policy is
    uniform-per-region, dropped a notch until the frame budget fits; an
    all-zero subband gets allocation 0 (so silence encodes to exactly
    zero and decodes to exactly zero)."""
    samples = np.asarray(samples, dtype=np.int64)
    nch = 2 if stereo else 1
    mode = 0 if stereo else 3
    if bitrate_kbps is None:
        bitrate_kbps = 384 if layer == 2 else 448
    if rate not in (32000, 44100, 48000):
        raise ValueError("MPEG-1 sampling rate required")
    frame_samples = 384 if layer == 1 else 1152
    chans = [samples[c::nch].astype(np.float64) / 32768.0 for c in range(nch)]
    n = len(chans[0])
    n_frames = max(1, -(-n // frame_samples))
    total = n_frames * frame_samples
    chans = [np.pad(c, (0, total - len(c))) for c in chans]
    subs = [analyze_pcm(c) for c in chans]  # (total/32, 32) each

    if layer == 1:
        frame_bytes = (12 * bitrate_kbps * 1000 // rate) * 4
    else:
        frame_bytes = 144 * bitrate_kbps * 1000 // rate
    out = bytearray()
    blocks_per_frame = frame_samples // 32
    for fr in range(n_frames):
        w = _MsbBitWriter()
        w.write(int.from_bytes(_header_bytes(layer, bitrate_kbps, rate, mode),
                               "big"), 32)
        lo = fr * blocks_per_frame
        S = [s[lo: lo + blocks_per_frame] for s in subs]  # per channel
        if layer == 1:
            _encode_l1_frame(w, S, nch, frame_bytes)
        else:
            _encode_l2_frame(w, S, nch, rate, bitrate_kbps, frame_bytes)
        if len(w.bytes) > frame_bytes:
            raise ValueError("MP3 encoder: frame budget exceeded")
        w.bytes.extend(b"\x00" * (frame_bytes - len(w.bytes)))
        out += w.bytes
    return bytes(out)


def _active_mask(S: list, nch: int, sblimit: int) -> list[list[bool]]:
    """Subband activity: peak above -50 dB of the frame's global peak.

    Plain ``np.any`` would mark every subband active on any non-silent
    frame — the analysis prototype's stopband leakage (~-70 dB) is
    nonzero everywhere — starving the uniform allocator down to coarse
    quantizers. The relative cutoff keeps the adjacent bands that carry
    the pseudo-QMF alias-cancellation terms and drops far-band leakage;
    exact-zero subbands stay inactive, preserving the silence→zero
    contract."""
    peaks = [[float(np.max(np.abs(S[ch][:, sb]))) for sb in range(sblimit)]
             for ch in range(nch)]
    p_max = max(max(row) for row in peaks)
    thresh = p_max * 3e-3  # -50 dB: empirically the SNR-max cutoff
    return [[p > thresh for p in row] for row in peaks]


def _encode_l1_frame(w: _MsbBitWriter, S: list, nch: int, frame_bytes: int):
    active = _active_mask(S, nch, 32)
    n_active = sum(sum(a) for a in active)
    budget = frame_bytes * 8 - 32 - 32 * nch * 4 - n_active * 6
    nb = 2
    if n_active:
        nb = max(2, min(15, budget // (12 * n_active)))
    allocs = [[(nb - 1) if active[ch][sb] else 0 for sb in range(32)]
              for ch in range(nch)]
    for sb in range(32):
        for ch in range(nch):
            w.write(allocs[ch][sb], 4)
    sfidx = [[0] * 32 for _ in range(nch)]
    for sb in range(32):
        for ch in range(nch):
            if allocs[ch][sb]:
                sfidx[ch][sb] = _pick_scalefactor(
                    float(np.max(np.abs(S[ch][:, sb]))))
                w.write(sfidx[ch][sb], 6)
    steps = (1 << nb) - 1
    c, d, _, _ = _quant_cd(steps)
    for s in range(12):
        for sb in range(32):
            for ch in range(nch):
                if allocs[ch][sb]:
                    sf = _SCALEFACTORS[sfidx[ch][sb]]
                    w.write(_quantize(S[ch][s, sb] / sf, steps, c, d, nb), nb)


def _encode_l2_frame(w: _MsbBitWriter, S: list, nch: int, rate: int,
                     bitrate: int, frame_bytes: int):
    tbl = _alloc_table(_l2_table_name(rate, bitrate, nch))
    sblimit = len(tbl)
    active = _active_mask(S, nch, sblimit)

    def plan_cost(targets: dict[int, int]) -> tuple[list, int]:
        allocs = [[0] * sblimit for _ in range(nch)]
        bits = 32
        for sb in range(sblimit):
            nbal, steps_list = tbl[sb]
            bits += nbal * nch
            want = targets[nbal]
            aidx = 0
            for k, st in enumerate(steps_list):
                if st <= want:
                    aidx = k + 1
            for ch in range(nch):
                if active[ch][sb]:
                    allocs[ch][sb] = aidx
                    bits += 2 + 3 * 6  # scfsi + worst-case scalefactors
                    st = steps_list[aidx - 1]
                    c_, d_, nb_, grouped_ = _quant_cd(st)
                    bits += 12 * ({3: 5, 5: 7, 9: 10}[st] if grouped_
                                  else 3 * nb_)
        return allocs, bits

    budget = frame_bytes * 8
    while True:
        for quality in (65535, 8191, 1023, 255, 63, 15, 9, 5, 3):
            targets = {4: quality, 3: quality, 2: min(quality, 5)}
            allocs, bits = plan_cost(targets)
            if bits <= budget:
                break
        else:
            # even the coarsest uniform allocation overflows the frame:
            # deactivate the highest active subband (all channels) and
            # retry — mirroring a real encoder's psychoacoustic zeroing,
            # highest frequencies first. An all-zero plan always fits.
            top = max(
                (sb for ch in range(nch) for sb in range(sblimit)
                 if active[ch][sb]),
                default=None,
            )
            if top is None:
                raise ValueError("MP3 encoder: no allocation fits the bitrate")
            for ch in range(nch):
                active[ch][top] = False
            continue
        break
    for sb in range(sblimit):
        for ch in range(nch):
            w.write(allocs[ch][sb], tbl[sb][0])
    for sb in range(sblimit):
        for ch in range(nch):
            if allocs[ch][sb]:
                w.write(0, 2)  # scfsi 0: three explicit scalefactors
    sfidx = [[(0, 0, 0)] * sblimit for _ in range(nch)]
    for sb in range(sblimit):
        for ch in range(nch):
            if allocs[ch][sb]:
                parts = tuple(
                    _pick_scalefactor(
                        float(np.max(np.abs(S[ch][p * 12:(p + 1) * 12, sb]))))
                    for p in range(3))
                sfidx[ch][sb] = parts
                for p in parts:
                    w.write(p, 6)
    for gr in range(12):
        for sb in range(sblimit):
            for ch in range(nch):
                a = allocs[ch][sb]
                if not a:
                    continue
                steps = tbl[sb][1][a - 1]
                c, d, nb, grouped = _quant_cd(steps)
                sf = _SCALEFACTORS[sfidx[ch][sb][gr // 4]]
                digs = [
                    _quantize(S[ch][gr * 3 + j, sb] / sf, steps, c, d, nb)
                    for j in range(3)]
                if grouped:
                    w.write(digs[0] + steps * digs[1] + steps * steps * digs[2],
                            {3: 5, 5: 7, 9: 10}[steps])
                else:
                    for dg in digs:
                        w.write(dg, nb)
