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
            out = []
            for _, row in pdf.iterrows():
                payload = row[pay_c]
                payload = bytes(payload) if payload is not None else b""
                media_type = row[typ_c]
                meta = {
                    "doc_id": int(row[id_c]),
                    "media_type": media_type,
                    "n_bytes": len(payload),
                    "checksum": hashlib.sha256(payload).hexdigest(),
                    "width": None,
                    "height": None,
                    "duration_ms": None,
                }
                decoder = DECODERS.get(media_type)
                if decoder is not None:
                    try:
                        meta.update(decoder(payload))
                    except NotImplementedError:
                        pass
                out.append(meta)
            yield pd.DataFrame(
                out, columns=[f.name for f in MEDIA_META_SCHEMA.fields]
            )

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
    deterministically from the payload checksum; production swaps the inner
    function for a real demuxer while keeping schema and batch shape.
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame_checksum", T.StringType(), False),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col]) if row[payload_col] is not None else b""
                h = hashlib.sha256(payload).digest()
                duration = 1000 + h[2] * 37
                for ts in range(0, duration, every_ms):
                    fh = hashlib.sha256(payload + ts.to_bytes(8, "big")).hexdigest()
                    rows.append(
                        {
                            "doc_id": int(row[id_col]),
                            "frame_ts_ms": ts,
                            "frame_checksum": fh,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col, payload_col).mapInPandas(_sample, schema)
