"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video ride as opaque ``binary`` columns with a metadata struct.
Decode / feature-extraction / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages — the Spark-side plumbing (schemas, batch shape,
partitioning) is real and tested; the actual codec calls are stubbed behind
``DECODERS`` because media libraries aren't in this container (swap in PIL /
torchaudio / pyav entries in production — signature unchanged).
"""

from __future__ import annotations

import hashlib
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
            n = len(pdf)
            width = [None] * n
            height = [None] * n
            duration = [None] * n
            types = pdf[typ_c].tolist()
            for i, (media_type, payload) in enumerate(zip(types, payloads)):
                decoder = DECODERS.get(media_type)
                if decoder is None:
                    continue
                try:
                    meta = decoder(payload)
                except NotImplementedError:
                    continue
                width[i] = meta.get("width")
                height[i] = meta.get("height")
                duration[i] = meta.get("duration_ms")
            out["width"] = pd.array(width, dtype="Int32")
            out["height"] = pd.array(height, dtype="Int32")
            out["duration_ms"] = pd.array(duration, dtype="Int64")
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
