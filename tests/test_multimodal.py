"""Multimodal plumbing tests: Arrow batch shape + deterministic stub recipe.

Pins the byte-level contract of the stubbed decoders so the m2 oracle
(`__spark_entry__.py`) and the Python implementation can never drift apart:
duration = 1000 + sha256(payload)[2] * 37 ms, frame checksum =
sha256(payload + ascii(ts)).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from matchbox_spark.operators.multimodal import (
    extract_media_metadata,
    sample_frames,
)


def _payload_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    )


def test_extract_media_metadata_vectorised_fields(spark):
    rows = [
        (1, b"hello world", "image/stub"),
        (2, b"audio bytes here", "audio/stub"),
        (3, b"", "video/unknown"),
        (4, None, "image/stub"),
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in extract_media_metadata(_payload_df(spark, rows)).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # Generic fields: exact bytes.
    assert out[1]["n_bytes"] == 11
    assert out[1]["checksum"] == hashlib.sha256(b"hello world").hexdigest()
    h1 = hashlib.sha256(b"hello world").digest()
    assert out[1]["width"] == 16 + h1[0] % 64
    assert out[1]["height"] == 16 + h1[1] % 64
    assert out[1]["duration_ms"] is None
    # Audio decoder fills duration, not dimensions.
    h2 = hashlib.sha256(b"audio bytes here").digest()
    assert out[2]["duration_ms"] == 1000 + h2[2] * 37
    assert out[2]["width"] is None
    # Unknown media type: generic fields still populated, decoder fields null.
    assert out[3]["n_bytes"] == 0
    assert out[3]["width"] is None
    # Null payload treated as empty bytes, never an error.
    assert out[4]["checksum"] == hashlib.sha256(b"").hexdigest()


def test_sample_frames_deterministic_schedule(spark):
    payload = b"some video payload"
    df = spark.createDataFrame([(7, payload)], "doc_id long, payload binary")
    frames = sorted(
        (r["frame_ts_ms"], r["frame_checksum"])
        for r in sample_frames(df, every_ms=500).collect()
    )
    duration = 1000 + hashlib.sha256(payload).digest()[2] * 37
    expected_ts = list(range(0, duration, 500))
    assert [ts for ts, _ in frames] == expected_ts
    for ts, ck in frames:
        assert ck == hashlib.sha256(
            payload + str(ts).encode("ascii")
        ).hexdigest()


def test_sample_frames_empty_batch_schema(spark):
    df = spark.createDataFrame([], "doc_id long, payload binary")
    out = sample_frames(df, every_ms=1000)
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "frame_ts_ms",
        "frame_checksum",
    ]
    assert out.count() == 0


def test_extract_media_metadata_column_pruning(spark):
    """The mapInPandas input projects only (id, payload, type) — extra
    columns must not reach the Python worker."""
    df = _payload_df(spark, [(1, b"x", "image/stub")]).withColumn(
        "extra", F.lit("wide-column-not-needed")
    )
    out = extract_media_metadata(df)
    assert "extra" not in out.columns
    assert out.count() == 1


def test_resize_images_deterministic_shape(spark):
    import hashlib

    from pyspark.sql import functions as F

    from matchbox_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, b"imgbytes-a"), (2, b"imgbytes-b")], "doc_id long, payload binary"
    )
    out = {r["doc_id"]: r for r in resize_images(df, 32, 8).collect()}
    assert out[1]["width"] == 32 and out[1]["height"] == 8
    expect = hashlib.sha256(b"imgbytes-a|32x8").digest()
    assert bytes(out[1]["payload"]) == expect
    # determinism across runs
    again = {r["doc_id"]: bytes(r["payload"]) for r in resize_images(df, 32, 8).collect()}
    assert again == {k: bytes(v["payload"]) for k, v in out.items()}


def test_extract_features_feed_similarity(spark):
    # stub features flow through the REAL similarity operator unchanged —
    # the downstream-compat contract of the plumbing
    from pyspark.sql import functions as F

    from matchbox_spark.operators.multimodal import extract_features
    from matchbox_spark.operators.similarity import cosine_topk

    df = spark.createDataFrame(
        [(i, f"payload-{i}".encode()) for i in range(20)],
        "doc_id long, payload binary",
    )
    feats = extract_features(df, dim=8)
    assert dict(feats.dtypes)["features"] == "array<float>"
    corpus = feats.withColumnRenamed("doc_id", "vec_id").withColumnRenamed(
        "features", "embedding"
    )
    queries = corpus.limit(2)
    top = cosine_topk(corpus, queries, k=3, exclude_self=False)
    per_q = top.groupBy("query").count().collect()
    assert all(r["count"] == 3 for r in per_q)
    # self-similarity wins: each query's best hit is itself
    best = top.where(F.col("rank") == 1).collect()
    assert all(r["query"] == r["neighbor"] for r in best)


def test_real_bmp_roundtrip_through_arrow_stage(spark):
    """Encode a REAL 24-bit BMP, decode it through the mapInPandas stage:
    geometry from the header probe, channel means from the pixel decode."""
    import numpy as np

    from matchbox_spark.operators.multimodal import (
        decode_bmp_pixels,
        decode_image_stats,
        encode_bmp,
        extract_media_metadata,
    )

    rng = np.random.default_rng(7)
    img_a = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)   # padded rows
    img_b = np.full((3, 4, 3), (10, 200, 30), dtype=np.uint8)  # solid
    # pixel decode is exact, including row order and padding
    assert (decode_bmp_pixels(encode_bmp(img_a)) == img_a).all()

    df = spark.createDataFrame(
        [
            (1, bytearray(encode_bmp(img_a)), "image/bmp"),
            (2, bytearray(encode_bmp(img_b)), "image/bmp"),
            (3, bytearray(b"BM corrupt"), "image/bmp"),
        ],
        "doc_id long, payload binary, media_type string",
    )
    meta = {r["doc_id"]: r for r in extract_media_metadata(df).collect()}
    assert (meta[1]["width"], meta[1]["height"]) == (7, 5)
    assert (meta[2]["width"], meta[2]["height"]) == (4, 3)
    assert meta[3]["width"] is None  # corrupt → nulls, not a task failure

    stats = {r["doc_id"]: r for r in decode_image_stats(df).collect()}
    assert (stats[2]["mean_r"], stats[2]["mean_g"], stats[2]["mean_b"]) == (
        10.0, 200.0, 30.0,
    )
    exp = img_a.reshape(-1, 3).mean(axis=0)
    assert abs(stats[1]["mean_r"] - exp[0]) < 1e-9
    assert abs(stats[1]["mean_g"] - exp[1]) < 1e-9
    assert abs(stats[1]["mean_b"] - exp[2]) < 1e-9
    assert stats[3]["width"] is None


def test_real_ppm_and_wav_decode(spark):
    import numpy as np

    from matchbox_spark.operators.multimodal import (
        decode_ppm_pixels,
        encode_ppm,
        encode_wav,
        extract_media_metadata,
    )

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_ppm_pixels(encode_ppm(img)) == img).all()
    # comments + arbitrary whitespace in the header parse too
    with_comment = b"P6 # wide\n# another\n 3\t2\n255\n" + img.tobytes()
    assert (decode_ppm_pixels(with_comment) == img).all()

    wav = encode_wav([0] * 8000, sample_rate=8000)  # exactly 1 s mono 16-bit
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_ppm(img)), "image/x-portable-pixmap"),
            (2, bytearray(wav), "audio/wav"),
            (3, bytearray(b"RIFFxxxx"), "audio/wav"),
        ],
        "doc_id long, payload binary, media_type string",
    )
    meta = {r["doc_id"]: r for r in extract_media_metadata(df).collect()}
    assert (meta[1]["width"], meta[1]["height"]) == (3, 2)
    assert meta[2]["duration_ms"] == 1000
    assert meta[3]["duration_ms"] is None


class TestPngCodec:
    """Pure-Python PNG (zlib IDAT, CRC'd chunks, 5 scanline filters)."""

    def _img(self, h=11, w=7, seed=3):
        import numpy as np

        return np.random.default_rng(seed).integers(
            0, 256, (h, w, 3), dtype=np.uint8
        )

    def test_round_trip_every_filter(self):
        from matchbox_spark.operators.multimodal import (
            decode_png_pixels,
            encode_png,
        )

        img = self._img()
        for ft in range(5):
            for lvl in (0, 6, 9):
                back = decode_png_pixels(encode_png(img, ft, lvl))
                assert (back == img).all(), (ft, lvl)

    def test_stored_deflate_size_closed_form(self):
        from matchbox_spark.operators.multimodal import encode_png

        img = self._img(h=16, w=16)
        raw = 16 * (1 + 3 * 16)
        assert len(encode_png(img, compress_level=0)) == 68 + raw

    def test_header_probe_and_crc(self):
        import pytest as _pt

        from matchbox_spark.operators.multimodal import (
            DECODERS,
            decode_png_pixels,
            encode_png,
        )

        img = self._img(h=5, w=9)
        p = encode_png(img)
        meta = DECODERS["image/png"](p)
        assert (meta["width"], meta["height"]) == (9, 5)
        with _pt.raises(ValueError):
            DECODERS["image/png"](p[:16])  # truncated mid-chunk
        bad = bytearray(p)
        bad[20] ^= 0xFF  # IHDR data
        with _pt.raises(ValueError):
            DECODERS["image/png"](bytes(bad))
        bad2 = bytearray(p)
        bad2[50] ^= 0xFF  # inside IDAT
        with _pt.raises(ValueError):
            decode_png_pixels(bytes(bad2))

    def test_gray_and_rgba_variants(self):
        import struct
        import zlib

        import numpy as np

        from matchbox_spark.operators.multimodal import decode_png_pixels

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        sig = b"\x89PNG\r\n\x1a\n"
        g = np.array([[3, 200], [99, 0]], dtype=np.uint8)
        raw = b"".join(b"\x00" + g[r].tobytes() for r in range(2))
        pg = (
            sig
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        out = decode_png_pixels(pg)
        assert out.shape == (2, 2, 3) and (out[..., 1] == g).all()

        rgba = self._img(h=3, w=2, seed=9)
        rgba4 = np.dstack([rgba, np.full((3, 2), 128, np.uint8)])
        rawa = b"".join(b"\x00" + rgba4[r].tobytes() for r in range(3))
        pa = (
            sig
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 3, 8, 6, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(rawa))
            + chunk(b"IEND", b"")
        )
        assert (decode_png_pixels(pa) == rgba).all()

    def test_unsupported_variants_raise(self):
        import struct
        import zlib

        import pytest as _pt

        from matchbox_spark.operators.multimodal import decode_png_pixels

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        sig = b"\x89PNG\r\n\x1a\n"
        for depth, color, interlace in ((16, 2, 0), (8, 3, 0), (8, 2, 1)):
            p = (
                sig
                + chunk(
                    b"IHDR",
                    struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace),
                )
                + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
                + chunk(b"IEND", b"")
            )
            with _pt.raises(ValueError):
                decode_png_pixels(p)

    def test_png_through_decode_image_stats(self, spark):
        import numpy as np

        from matchbox_spark.operators.multimodal import (
            decode_image_stats,
            encode_png,
        )

        img = np.full((6, 4, 3), (10, 20, 30), dtype=np.uint8)
        rows = [(1, encode_png(img, filter_type=4), "image/png")]
        df = spark.createDataFrame(
            rows, "doc_id long, payload binary, media_type string"
        )
        out = decode_image_stats(df).collect()[0]
        assert (out["width"], out["height"]) == (4, 6)
        assert (out["mean_r"], out["mean_g"], out["mean_b"]) == (10.0, 20.0, 30.0)


def test_resize_decoded_images_real(spark):
    """Round-9 REAL resize: decode -> floor-rule nearest-neighbour ->
    re-encode. The resized BMP payload must decode back to exactly the
    raster the floor rule predicts (down- AND up-scaling), and the error
    taxonomy matches decode_image_stats."""
    import numpy as np

    from matchbox_spark.operators.jpeg import encode_jpeg
    from matchbox_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp,
        resize_decoded_images,
    )

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (11, 17, 3), dtype=np.uint8)
    solid = np.full((5, 6, 3), (9, 80, 200), np.uint8)
    rows = [
        (1, bytearray(encode_bmp(img)), "image/bmp"),
        (2, bytearray(encode_jpeg(solid, quality=100)), "image/jpeg"),
        (3, bytearray(b"XX"), "image/bmp"),       # corrupt
        # audio/mpeg, not webp: WebP grew a real decoder in round 12
        (4, bytearray(encode_bmp(img)), "audio/mpeg"),  # no decoder
        (5, None, "image/bmp"),                    # missing
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    )
    for tw, th in ((8, 8), (23, 4)):  # down- and up-scale
        got = {
            r["doc_id"]: r
            for r in resize_decoded_images(df, tw, th).collect()
        }
        ys = (np.arange(th) * img.shape[0]) // th
        xs = (np.arange(tw) * img.shape[1]) // tw
        want = img[ys][:, xs]
        assert got[1]["status"] == "ok"
        assert got[1]["width"] == tw and got[1]["height"] == th
        assert np.array_equal(
            decode_bmp_pixels(bytes(got[1]["payload"])), want
        )
        assert got[1]["mean_r"] == float(want[..., 0].mean())
        # q100 solid JPEG decodes exactly; resize of solid stays solid
        assert got[2]["status"] == "ok"
        assert (got[2]["mean_r"], got[2]["mean_g"], got[2]["mean_b"]) == (
            9.0, 80.0, 200.0,
        )
        assert got[3]["status"] == "corrupt" and got[3]["payload"] is None
        assert got[4]["status"] == "no_decoder"
        assert got[5]["status"] == "missing"


def test_audio_decode_and_resample_real(spark):
    """Round-9 real PCM path: decode_audio_stats reports exact
    peak/mean/RMS of a known waveform; resample_audio's output WAV
    decodes back to samples[::factor] at rate/factor."""
    import math

    import numpy as np

    from matchbox_spark.operators.multimodal import (
        decode_audio_stats,
        decode_wav_samples,
        encode_wav,
        resample_audio,
    )

    from matchbox_spark.operators.mp3 import encode_mp3

    samples = np.array([0, 1000, -2000, 32767, -32768, 5, -5, 12], "<i2")
    wav = encode_wav(samples, sample_rate=16000)
    # real MPEG-1 Layer II stream: silence decodes to EXACT zero PCM
    mp3 = encode_mp3(np.zeros(1152 * 2, np.int16), rate=48000, layer=2)
    rows = [
        (1, bytearray(wav), "audio/wav"),
        (2, bytearray(b"RIFFxxxx"), "audio/wav"),   # corrupt
        (3, bytearray(wav), "audio/mpeg"),           # wrong container → corrupt
        (4, None, "audio/wav"),                      # missing
        (5, bytearray(mp3), "audio/mpeg"),           # real L2 decode (r13)
        (6, bytearray(wav), "audio/flac"),           # genuinely no decoder
        # valid MPEG frame header, Layer III → honest no_decoder stub
        (7, bytearray(b"\xff\xfb\x90\x00" + b"\x00" * 16), "audio/mpeg"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    )
    got = {r["doc_id"]: r for r in decode_audio_stats(df).collect()}
    s64 = samples.astype(np.float64)
    assert got[1]["status"] == "ok"
    assert got[1]["n_samples"] == 8 and got[1]["sample_rate"] == 16000
    assert got[1]["peak"] == 32768
    assert got[1]["mean"] == math.floor(s64.mean() * 1e6 + 0.5) / 1e6
    assert got[1]["rms"] == math.floor(
        math.sqrt((s64 * s64).mean()) * 1e6 + 0.5
    ) / 1e6
    assert got[2]["status"] == "corrupt"
    assert got[3]["status"] == "corrupt"
    assert got[4]["status"] == "missing"
    assert got[5]["status"] == "ok"
    assert got[5]["n_samples"] == 1152 * 2
    assert got[5]["sample_rate"] == 48000 and got[5]["channels"] == 1
    assert (got[5]["peak"], got[5]["mean"], got[5]["rms"]) == (0, 0.0, 0.0)
    assert got[6]["status"] == "no_decoder"
    assert got[7]["status"] == "no_decoder"

    out = {r["doc_id"]: r for r in resample_audio(df, 2).collect()}
    assert out[1]["status"] == "ok"
    assert out[1]["sample_rate"] == 8000 and out[1]["n_samples"] == 4
    back, rate, ch = decode_wav_samples(bytes(out[1]["payload"]))
    assert rate == 8000 and ch == 1
    assert np.array_equal(back, samples[::2])
    assert out[2]["status"] == "corrupt" and out[4]["status"] == "missing"


def test_resample_audio_stereo_framewise(spark):
    """Stereo decimation keeps channel pairs aligned (frame-wise) — a
    valid stereo WAV must NOT classify corrupt (review fix, round 9)."""
    import numpy as np

    from matchbox_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav,
        resample_audio,
    )

    # interleaved L/R: L = 100,200,300,400 ; R = -1,-2,-3,-4
    inter = np.array([100, -1, 200, -2, 300, -3, 400, -4], "<i2")
    wav = encode_wav(inter, sample_rate=8000, channels=2)
    df = spark.createDataFrame(
        [(1, bytearray(wav), "audio/wav")],
        "doc_id long, payload binary, media_type string",
    )
    row = resample_audio(df, 2).collect()[0]
    assert row["status"] == "ok"
    back, rate, ch = decode_wav_samples(bytes(row["payload"]))
    assert (rate, ch) == (4000, 2)
    # frames 0 and 2 survive: (100,-1) and (300,-3)
    assert back.tolist() == [100, -1, 300, -3]


def test_wav_zero_channels_classifies_corrupt(spark):
    """A crafted fmt chunk declaring channels=0 (or rate=0) must surface
    as the scan-level 'corrupt' status — resample_audio divides by the
    channel count, and before the r10 guard a ZeroDivisionError escaped
    the (ValueError, struct.error) handlers and killed the task
    (ADVICE r9, medium)."""
    import struct as _struct

    import pytest as _pytest

    from matchbox_spark.operators.multimodal import (
        decode_audio_stats,
        decode_wav_samples,
        resample_audio,
    )

    def _wav(channels, rate):
        data = _struct.pack("<4h", 1, -2, 3, -4)
        fmt = _struct.pack("<HHIIHH", 1, channels, rate, rate * 2, 2, 16)
        body = (
            b"WAVE"
            + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
            + b"data" + _struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + _struct.pack("<I", len(body)) + body

    for bad in (_wav(0, 8000), _wav(1, 0)):
        with _pytest.raises(ValueError, match="non-positive"):
            decode_wav_samples(bad)

    df = spark.createDataFrame(
        [
            (1, bytearray(_wav(0, 8000)), "audio/wav"),
            (2, bytearray(_wav(1, 0)), "audio/wav"),
            (3, bytearray(_wav(1, 8000)), "audio/wav"),
        ],
        "doc_id long, payload binary, media_type string",
    )
    stats = {r["doc_id"]: r for r in decode_audio_stats(df).collect()}
    assert stats[1]["status"] == "corrupt"
    assert stats[2]["status"] == "corrupt"
    assert stats[3]["status"] == "ok" and stats[3]["peak"] == 4
    res = {r["doc_id"]: r for r in resample_audio(df, 2).collect()}
    assert res[1]["status"] == "corrupt"
    assert res[2]["status"] == "corrupt"
    assert res[3]["status"] == "ok"


def test_audio_stats_exact_integer_accumulation(spark):
    """mean/RMS come from exact integer sums with ONE double divide —
    the oracle's SUM(v)/COUNT operation order — not np.mean's pairwise
    float path (ADVICE r9, low). Pinned against the Python-int oracle
    formula on a full-range waveform."""
    import math

    import numpy as np

    from matchbox_spark.operators.multimodal import (
        decode_audio_stats,
        encode_wav,
    )

    rng = np.random.default_rng(11)
    samples = rng.integers(-32768, 32768, size=4097, dtype=np.int64).astype(
        "<i2"
    )
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(samples, sample_rate=44100)), "audio/wav")],
        "doc_id long, payload binary, media_type string",
    )
    row = decode_audio_stats(df).collect()[0]
    tot = int(samples.astype(np.int64).sum())
    sq = int((samples.astype(np.int64) ** 2).sum())
    n = samples.size
    want_mean = math.floor(float(tot) / float(n) * 1e6 + 0.5) / 1e6
    want_rms = (
        math.floor(math.sqrt(float(sq) / float(n)) * 1e6 + 0.5) / 1e6
    )
    assert row["mean"] == want_mean
    assert row["rms"] == want_rms


def test_resize_rejects_bad_dimensions(spark):
    import pytest as _pytest

    from matchbox_spark.operators.multimodal import resize_decoded_images

    df = spark.createDataFrame(
        [(1, bytearray(b"x"), "image/bmp")],
        "doc_id long, payload binary, media_type string",
    )
    with _pytest.raises(ValueError, match=">= 1"):
        resize_decoded_images(df, 0, 8)
    with _pytest.raises(ValueError, match=">= 1"):
        resize_decoded_images(df, 8, -1)


def test_png_palette_and_adam7_roundtrip():
    """Round-9: PNG8 palette and Adam7 interlace decode for real — every
    (filter, interlace, palette) combination roundtrips bit-exactly, and
    the pass grid is the spec's exact partition (the initial wrong grid
    failed roundtrip, which this matrix would catch again)."""
    import numpy as np

    from matchbox_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    rng = np.random.default_rng(5)
    for (h, w) in [(13, 21), (8, 8), (1, 1), (3, 17), (2, 2), (9, 1)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        pal_img = (img // 64) * 64  # <= 64 distinct colours
        for ft in (0, 1, 2, 3, 4):
            for inter in (False, True):
                p = encode_png(img, filter_type=ft, interlace=inter)
                assert np.array_equal(decode_png_pixels(p), img), (h, w, ft, inter)
                p2 = encode_png(
                    pal_img, filter_type=ft, interlace=inter, palette=True
                )
                assert np.array_equal(decode_png_pixels(p2), pal_img)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="256"):
        encode_png(
            rng.integers(0, 256, (32, 32, 3), dtype=np.uint8), palette=True
        )


def test_webp_through_arrow_registry(spark):
    """VP8L decode through the real mapInPandas stage: ok / corrupt /
    missing rows, geometry + solid-colour means exact (round 12)."""
    import numpy as np

    from matchbox_spark.operators.multimodal import decode_image_stats
    from matchbox_spark.operators.webp import encode_webp_lossless

    img = np.full((6, 9, 3), (11, 22, 33), np.uint8)
    good = encode_webp_lossless(
        img, subtract_green=True, cache_bits=3, use_lz77_runs=True
    )
    rows = [
        (1, bytearray(good), "image/webp"),
        (2, bytearray(good[:16]), "image/webp"),  # truncated
        (3, None, "image/webp"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    )
    out = {r["doc_id"]: r for r in decode_image_stats(df).collect()}
    assert out[1]["status"] == "ok"
    assert (out[1]["width"], out[1]["height"]) == (9, 6)
    assert (out[1]["mean_r"], out[1]["mean_g"], out[1]["mean_b"]) == (
        11.0,
        22.0,
        33.0,
    )
    assert out[2]["status"] == "corrupt"
    assert out[3]["status"] == "missing"
