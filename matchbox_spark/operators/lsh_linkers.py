"""Similarity-based linkers and dedupers: MinHash-LSH (text) and
cosine-LSH (embeddings).

North-star extensions (SURVEY §7 item 11): the dedup-family operators
packaged as ``Linker``/``Deduper`` model classes so similarity joins slot
into the same DAG → resolver → query pipeline as deterministic rules. All
emit SCHEMA_MODEL_EDGES with a genuine similarity as the score.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from matchbox_spark.functions.text import word_shingles_expr
from matchbox_spark.functions.vectors import cosine_expr, sign_bucket_expr
from matchbox_spark.operators.dedup import (
    auto_embedding_bucket_dims,
    auto_simhash_bits,
)
from matchbox_spark.operators.dedupers import Deduper, DeduperSettings
from matchbox_spark.operators.linkers import Linker, LinkerSettings
from matchbox_spark.operators.registry import add_model_class
from matchbox_spark.schemas import SCHEMA_MODEL_EDGES, conform

logger = logging.getLogger(__name__)

#: sentinel for corpus-derived parameter sizing (round 10): the shipped
#: defaults must be the scale-safe path, not the fixture demo values —
#: both LSH families' demo parameters were measured super-linear at scale
#: (SimHash bits=16 quadratic by ~50k docs; 64 embedding buckets 2.13×
#: super-linear at 36k vectors) while the derived sizes hold flat.
AUTO = "auto"


@dataclass
class MinHashDeduperSettings(DeduperSettings):
    text_field: str = "text"
    num_perm: int = 32
    bands: int = 8
    shingle_n: int = 3
    threshold: float = 0.7  # exact Jaccard verification floor
    max_verify_shingles: int | None = None


@add_model_class
class MinHashDeduper(Deduper):
    """Intra-source near-duplicate pairs via banded MinHash + exact Jaccard.

    The d3-family plan (``dedup.minhash_dedupe_pairs``) behind the model
    surface, so LSH near-dup linking runs in the same DAG → resolver →
    query pipeline as ``NaiveDeduper``. Edges carry the verified Jaccard
    as score.

    Streaming block-locality: an edge exists only between docs sharing an
    LSH band key, and a doc's band keys depend solely on its own text —
    so the model declares :meth:`delta_block_keys` and
    ``incremental_resolve_stream`` streams it O(touched) per micro-batch
    (the catalog persists each leaf's band keys; a batch semi-joins that
    index instead of re-hashing accumulated state).
    """

    settings_class = MinHashDeduperSettings

    def dedupe(self, data: DataFrame) -> DataFrame:
        from matchbox_spark.operators.dedup import minhash_dedupe_pairs

        s = self.settings
        pairs = minhash_dedupe_pairs(
            data,
            s.id,
            s.text_field,
            num_perm=s.num_perm,
            bands=s.bands,
            shingle_n=s.shingle_n,
            threshold=s.threshold,
            max_verify_shingles=s.max_verify_shingles,
        )
        id_type = data.schema[s.id].dataType
        return conform(
            pairs.select(
                F.col("doc_a").cast(id_type).alias("left_id"),
                F.col("doc_b").cast(id_type).alias("right_id"),
                F.col("jaccard").alias("score"),
            ),
            SCHEMA_MODEL_EDGES,
        )

    def delta_block_keys(self, data: DataFrame) -> DataFrame:
        """``(id, block_key)`` — every LSH band key of every row.

        The streaming delta-link contract for computed blocking: two rows
        can ever pair iff they share a ``block_key`` (band index + band
        signature slice, folded to one long), and a row's key set is a
        pure function of its own text — so per-batch work needs only the
        batch's keys plus a semi-join against the persisted key index.
        Uses the exact banding recipe ``dedupe`` candidates join on; 64-bit
        fold collisions only add spurious block co-residents, which the
        downstream LSH + Jaccard verify discards.
        """
        from matchbox_spark.operators.dedup import minhash_signatures

        s = self.settings
        if s.num_perm % s.bands != 0:
            raise ValueError("num_perm must be divisible by bands")
        rpb = s.num_perm // s.bands
        sigs = minhash_signatures(
            data, s.id, s.text_field, s.num_perm, s.shingle_n
        )
        return sigs.select(
            F.col("doc").alias(s.id),
            F.explode(F.sequence(F.lit(0), F.lit(s.bands - 1))).alias("band"),
            "sig",
        ).select(
            s.id,
            F.xxhash64(
                F.col("band"),
                F.expr(f"slice(sig, band * {rpb} + 1, {rpb})"),
            ).alias("block_key"),
        )


@dataclass
class MinHashLinkerSettings(LinkerSettings):
    left_field: str = "text"
    right_field: str = "text"
    num_perm: int = 32
    bands: int = 8
    shingle_n: int = 3
    threshold: float = 0.5  # exact Jaccard verification floor


@add_model_class
class MinHashLinker(Linker):
    """Cross-source near-duplicate linking via banded MinHash signatures.

    Left and right rows hash into one signature space; candidates form where
    a band collides *across* sides, then exact shingle Jaccard ≥ threshold
    verifies. Shuffle keys are (band, band_key) — sub-quadratic like the
    intra-source MinHash dedupe.
    """

    settings_class = MinHashLinkerSettings

    def link(self, left: DataFrame, right: DataFrame) -> DataFrame:
        from matchbox_spark.operators.dedup import minhash_signatures

        s = self.settings
        if s.num_perm % s.bands != 0:
            raise ValueError("num_perm must be divisible by bands")
        rpb = s.num_perm // s.bands

        # numeric composite doc key (rid·2 + side bit) keeps sides separate
        # through the shared signature pipeline without string surgery
        tagged = left.select(
            (F.col(s.left_id).cast("long") * 2).alias("doc_key"),
            F.col(s.left_field).alias("text"),
        ).unionByName(
            right.select(
                (F.col(s.right_id).cast("long") * 2 + 1).alias("doc_key"),
                F.col(s.right_field).alias("text"),
            )
        )

        # signatures via the shared one-md5-per-shingle affine recipe
        # (dedup.minhash_signatures): one shuffle, no per-permutation row
        # explosion — the previous inline pipeline hashed every shingle
        # once PER permutation (num_perm× the crypto work) and paid an
        # extra (doc, shingle) dedup exchange
        sigs = minhash_signatures(
            tagged, "doc_key", "text", s.num_perm, s.shingle_n
        )
        banded = sigs.select(
            "doc",
            F.explode(F.sequence(F.lit(0), F.lit(s.bands - 1))).alias("band"),
            "sig",
        ).select(
            "doc",
            "band",
            # 8-byte band key (same rationale as minhash_lsh_candidates):
            # slice equality ⇔ key equality modulo negligible collisions,
            # and candidates are exact-Jaccard-verified downstream
            F.xxhash64(
                F.expr(f"slice(sig, band * {rpb} + 1, {rpb})")
            ).alias("band_key"),
        )
        a = banded.where(F.col("doc") % 2 == 0).select(
            (F.col("doc") / 2).cast("long").alias("left_id"),
            "band",
            "band_key",
        )
        b = banded.where(F.col("doc") % 2 == 1).select(
            ((F.col("doc") - 1) / 2).cast("long").alias("right_id"),
            "band",
            "band_key",
        )
        cands = (
            a.join(b, ["band", "band_key"])
            .select("left_id", "right_id")
            .dropDuplicates()
        )

        sets = tagged.select(
            "doc_key",
            F.array_distinct(word_shingles_expr("text", s.shingle_n)).alias(
                "shset"
            ),
        )
        set_l = sets.where(F.col("doc_key") % 2 == 0).select(
            (F.col("doc_key") / 2).cast("long").alias("left_id"),
            F.col("shset").alias("set_l"),
        )
        set_r = sets.where(F.col("doc_key") % 2 == 1).select(
            ((F.col("doc_key") - 1) / 2).cast("long").alias("right_id"),
            F.col("shset").alias("set_r"),
        )
        verified = (
            cands.join(set_l, "left_id")
            .join(set_r, "right_id")
            .withColumn(
                "score",
                F.size(F.array_intersect("set_l", "set_r"))
                / F.size(F.array_union("set_l", "set_r")).cast("double"),
            )
            .where(F.col("score") >= F.lit(float(s.threshold)))
        )
        return conform(
            verified.select("left_id", "right_id", "score"), SCHEMA_MODEL_EDGES
        )


@dataclass
class EmbeddingLinkerSettings(LinkerSettings):
    left_field: str = "embedding"
    right_field: str = "embedding"
    threshold: float = 0.9
    # "auto" (the default) derives the bucket space from the two sides'
    # combined row count at link() time (same measured occupancy rule as
    # EmbeddingDeduper); pin a list for reproducibility
    bucket_dims: list | str = AUTO


@add_model_class
class EmbeddingLinker(Linker):
    """Cross-source linking by embedding cosine ≥ threshold.

    Sign-bit LSH buckets with one-bit multi-probe on the left side block the
    join; exact cosine verifies within buckets.
    """

    settings_class = EmbeddingLinkerSettings

    def link(self, left: DataFrame, right: DataFrame) -> DataFrame:
        s = self.settings
        if isinstance(s.bucket_dims, (list, tuple)):
            if not s.bucket_dims:
                raise ValueError("EmbeddingLinker requires bucket_dims")
            dims = list(s.bucket_dims)
        elif s.bucket_dims == AUTO:
            n = left.count() + right.count()
            # probe BOTH sides' dimensionality: bucket dims index into both
            # vectors, so the usable width is the smaller of the two — and
            # a left side with all-null embeddings must not collapse the
            # bucket space for an arbitrarily large right side
            probed = []
            for df, field in ((left, s.left_field), (right, s.right_field)):
                row = (
                    df.where(F.col(field).isNotNull())
                    .select(F.size(field).alias("d"))
                    .first()
                )
                if row is not None:
                    probed.append(int(row["d"]))
            vdim = min(probed) if probed else 1
            dims = auto_embedding_bucket_dims(n, vdim)
            logger.info(
                "EmbeddingLinker auto-sized bucket_dims=%s (%d buckets "
                "for %d rows)",
                dims,
                1 << len(dims),
                n,
            )
        else:
            raise ValueError(
                f"bucket_dims must be a list or 'auto', got {s.bucket_dims!r}"
            )
        lv = left.select(
            F.col(s.left_id).cast("long").alias("left_id"),
            F.col(s.left_field).alias("_lv"),
        )
        rv = right.select(
            F.col(s.right_id).cast("long").alias("right_id"),
            F.col(s.right_field).alias("_rv"),
        ).withColumn("bkt", sign_bucket_expr("_rv", dims))
        # bind home once (codegen blow-up at wide dims — see dedup.py)
        lh = lv.withColumn("bkt", sign_bucket_expr("_lv", dims))
        probes = F.array(
            *([F.col("bkt")]
              + [F.col("bkt").bitwiseXOR(F.lit(1 << i))
                 for i in range(len(dims))])
        )
        lx = lh.select("left_id", "_lv", F.explode(probes).alias("bkt"))
        out = (
            lx.join(rv, "bkt")
            .select(
                "left_id",
                "right_id",
                F.round(cosine_expr(F.col("_lv"), F.col("_rv")), 6).alias("score"),
            )
            .dropDuplicates(["left_id", "right_id"])
            .where(F.col("score") >= F.lit(float(s.threshold)))
        )
        return conform(out, SCHEMA_MODEL_EDGES)


@dataclass
class SimHashDeduperSettings(DeduperSettings):
    text_field: str = "text"
    # "auto" (the default) derives the signature width from the corpus
    # count at dedupe() time via auto_simhash_bits and freezes it on the
    # model instance; pin an int for reproducible pair sets across
    # differently-sized corpora and for streaming delta-link
    bits: int | str = AUTO
    max_hamming: int = 3


@add_model_class
class SimHashDeduper(Deduper):
    """Intra-source near-duplicate pairs via SimHash + pigeonhole blocking.

    The d4-family plan (``dedup.simhash_near_duplicates``) behind the model
    surface; edges carry ``1 − hamming/bits`` as a similarity score.
    Blocking keys on ``max_hamming + 1`` contiguous signature chunks, so by
    pigeonhole every pair within the distance budget shares an identical
    chunk — recall is exact. Requires ``max_hamming + 1 <= bits`` (each
    chunk spans at least one bit).

    Streaming block-locality: an edge needs a shared (chunk index, chunk
    value) key, and a doc's chunks are a pure function of its own text —
    so :meth:`delta_block_keys` lets ``incremental_resolve_stream`` stream
    SimHash dedupe O(touched) per micro-batch like MinHash. Block keys
    must be stable across batches, and a micro-batch is no proxy for the
    corpus, so ``bits='auto'`` raises there — pin bits explicitly (size
    with :func:`matchbox_spark.operators.dedup.auto_simhash_bits` against
    the expected corpus) for ``incremental_resolve_stream``.
    """

    settings_class = SimHashDeduperSettings

    def _resolved_bits(self, data: DataFrame | None = None) -> int:
        """The signature width to run at: the pinned int, or the
        corpus-derived width frozen on first resolution (one count job —
        noise next to the dedupe itself)."""
        s = self.settings
        if isinstance(s.bits, int):
            return s.bits
        if s.bits != AUTO:
            raise ValueError(f"bits must be an int or 'auto', got {s.bits!r}")
        if getattr(self, "_auto_bits", None) is None:
            if data is None:
                raise ValueError(
                    "SimHashDeduper(bits='auto') sizes the signature from "
                    "the full corpus at dedupe() time; streaming delta-link "
                    "sees only per-batch slices, so pin bits explicitly "
                    "(e.g. bits=auto_simhash_bits(expected_corpus_size)) "
                    "for incremental_resolve_stream"
                )
            self._auto_bits = auto_simhash_bits(data.count(), s.max_hamming)
            logger.info(
                "SimHashDeduper auto-sized bits=%d (max_hamming=%d)",
                self._auto_bits,
                s.max_hamming,
            )
        return self._auto_bits

    def _validate(self, bits: int | None = None) -> None:
        s = self.settings
        if bits is None:
            bits = s.bits if isinstance(s.bits, int) else None
        if bits is None:
            return  # auto mode: validated after corpus-derived sizing
        if s.max_hamming + 1 > bits:
            raise ValueError(
                f"max_hamming={s.max_hamming} needs {s.max_hamming + 1} "
                f"pigeonhole chunks but bits={bits}: raise bits or lower "
                "max_hamming"
            )
        if bits // (s.max_hamming + 1) < 3:
            # ADVICE r9: chunks this narrow (< 8 distinct values) block
            # almost nothing — the candidate join degenerates toward a
            # cross join. Legal (recall stays exact) but a scale trap.
            logger.warning(
                "SimHashDeduper: bits=%d / %d pigeonhole chunks leaves "
                "%d-bit chunk keys — blocking is nearly a cross join; "
                "raise bits (see auto_simhash_bits) or lower max_hamming",
                bits,
                s.max_hamming + 1,
                bits // (s.max_hamming + 1),
            )

    def dedupe(self, data: DataFrame) -> DataFrame:
        from matchbox_spark.operators.dedup import simhash_near_duplicates

        s = self.settings
        bits = self._resolved_bits(data)
        self._validate(bits)
        pairs = simhash_near_duplicates(
            data, s.id, s.text_field, bits=bits, max_hamming=s.max_hamming
        )
        id_type = data.schema[s.id].dataType
        return conform(
            pairs.select(
                F.col("doc_a").cast(id_type).alias("left_id"),
                F.col("doc_b").cast(id_type).alias("right_id"),
                (
                    F.lit(1.0)
                    - F.col("hamming") / F.lit(float(bits))
                ).alias("score"),
            ),
            SCHEMA_MODEL_EDGES,
        )

    def delta_block_keys(self, data: DataFrame) -> DataFrame:
        """``(id, block_key)`` — every pigeonhole-chunk key of every row,
        folded to one long exactly like the candidate join keys.

        Keys must be identical across micro-batches, so auto bits are NOT
        resolved from ``data`` here (a batch slice is no corpus proxy):
        unresolved ``bits='auto'`` raises with pinning guidance.
        """
        from matchbox_spark.operators.dedup import (
            _simhash_chunk_parts,
            simhash_chunks,
            simhash_values,
        )

        s = self.settings
        bits = self._resolved_bits()
        self._validate(bits)
        chunks = simhash_chunks(bits, s.max_hamming)
        sims = simhash_values(data, s.id, s.text_field, bits)
        return sims.select(
            F.col("doc").alias(s.id),
            F.explode(_simhash_chunk_parts(chunks)).alias("h"),
        ).select(
            s.id,
            F.xxhash64(F.col("h.hi"), F.col("h.hv")).alias("block_key"),
        )


@dataclass
class EmbeddingDeduperSettings(DeduperSettings):
    vector_field: str = "embedding"
    threshold: float = 0.95
    # "auto" (the default) derives the bucket space from the corpus count
    # and vector dimensionality at dedupe() time via
    # auto_embedding_bucket_dims and freezes it on the model instance;
    # pin a list for reproducibility and for streaming delta-link
    bucket_dims: list | str = AUTO


@add_model_class
class EmbeddingDeduper(Deduper):
    """Intra-source near-duplicate pairs by embedding cosine ≥ threshold.

    The d5-family plan (``dedup.embedding_near_duplicates``): sign-bit LSH
    buckets with one-bit multi-probe block the self-join; exact cosine
    verifies. Edges carry the round-6 cosine as score.

    Streaming block-locality: an edge between x and y requires one side's
    HOME bucket to sit in the other's probe set, and both rows' probe sets
    contain that bucket — so every edge shares a probe-set key, keys are a
    pure function of the row's own vector, and :meth:`delta_block_keys`
    streams it O(touched) like the other LSH dedupers.

    **Size the bucket space to the corpus**: there are only
    ``2^len(bucket_dims)`` buckets, and both the candidate self-join and
    the streaming touched-set scale with bucket OCCUPANCY
    (corpus / 2^bits). The default ``bucket_dims='auto'`` derives
    ``len(bucket_dims) ≈ log2(N)`` from a corpus count at dedupe() time
    (measured in ``tools/stress_streaming_resolve.py --embedding``: 6
    dims over a few thousand vectors degenerates delta streaming to a
    super-linear recompute, 2.13× ramp, while 16 dims holds it flat at
    1.05×). Streaming delta-link needs batch-stable keys, so auto raises
    there — pin ``bucket_dims`` explicitly (size with
    :func:`matchbox_spark.operators.dedup.auto_embedding_bucket_dims`
    against the expected corpus) for ``incremental_resolve_stream``.
    """

    settings_class = EmbeddingDeduperSettings

    def _resolved_dims(self, data: DataFrame | None = None) -> list[int]:
        """The bucket dims to run at: the pinned list, or corpus-derived
        dims frozen on first resolution (one count + one first-row probe
        for the vector dimensionality)."""
        s = self.settings
        if isinstance(s.bucket_dims, (list, tuple)):
            if not s.bucket_dims:
                raise ValueError(
                    "EmbeddingDeduper requires bucket_dims (the unblocked "
                    "quadratic baseline is evaluation-only)"
                )
            return list(s.bucket_dims)
        if s.bucket_dims != AUTO:
            raise ValueError(
                f"bucket_dims must be a list or 'auto', got "
                f"{s.bucket_dims!r}"
            )
        if getattr(self, "_auto_dims", None) is None:
            if data is None:
                raise ValueError(
                    "EmbeddingDeduper(bucket_dims='auto') sizes the bucket "
                    "space from the full corpus at dedupe() time; streaming "
                    "delta-link sees only per-batch slices, so pin "
                    "bucket_dims explicitly (e.g. "
                    "auto_embedding_bucket_dims(expected_corpus_size, dim)) "
                    "for incremental_resolve_stream"
                )
            n = data.count()
            probe = (
                data.where(F.col(s.vector_field).isNotNull())
                .select(F.size(s.vector_field).alias("d"))
                .first()
            )
            vdim = int(probe["d"]) if probe is not None else 1
            self._auto_dims = auto_embedding_bucket_dims(n, vdim)
            logger.info(
                "EmbeddingDeduper auto-sized bucket_dims=%s (%d buckets "
                "for %d rows)",
                self._auto_dims,
                1 << len(self._auto_dims),
                n,
            )
        return self._auto_dims

    def dedupe(self, data: DataFrame) -> DataFrame:
        from matchbox_spark.operators.dedup import embedding_near_duplicates

        s = self.settings
        pairs = embedding_near_duplicates(
            data, s.id, s.vector_field, s.threshold, self._resolved_dims(data)
        )
        id_type = data.schema[s.id].dataType
        return conform(
            pairs.select(
                F.col("doc_a").cast(id_type).alias("left_id"),
                F.col("doc_b").cast(id_type).alias("right_id"),
                F.col("cosine").alias("score"),
            ),
            SCHEMA_MODEL_EDGES,
        )

    def delta_block_keys(self, data: DataFrame) -> DataFrame:
        """``(id, block_key)`` — the row's full probe set (home bucket plus
        every one-bit flip), exactly the keys the candidate join can meet
        on. The bucket value is already a small long, so it IS the key.

        Keys must be identical across micro-batches, so auto dims are NOT
        resolved from ``data`` here (a batch slice is no corpus proxy):
        unresolved ``bucket_dims='auto'`` raises with pinning guidance.
        """
        s = self.settings
        dims = self._resolved_dims()
        # bind home once (codegen blow-up at wide dims — see dedup.py)
        homed = data.select(
            F.col(s.id).alias(s.id),
            sign_bucket_expr(s.vector_field, dims).alias("_home"),
        )
        probes = F.array(
            *([F.col("_home")]
              + [F.col("_home").bitwiseXOR(F.lit(1 << i))
                 for i in range(len(dims))])
        )
        return (
            homed.select(
                s.id,
                F.explode(probes).alias("block_key"),
            )
            .select(s.id, F.col("block_key").cast("long").alias("block_key"))
            # duplicate-content leaves reach the stream as several queried
            # rows with one id; signature-based dedupers collapse them via
            # their groupBy, this explode does not — dedupe so the key
            # index stays one row per (leaf, key)
            .dropDuplicates()
        )
