"""Similarity-based linkers and dedupers: MinHash-LSH (text) and
cosine-LSH (embeddings).

North-star extensions (SURVEY §7 item 11): the dedup-family operators
packaged as ``Linker``/``Deduper`` model classes so similarity joins slot
into the same DAG → resolver → query pipeline as deterministic rules. All
emit SCHEMA_MODEL_EDGES with a genuine similarity as the score.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from matchbox_spark.functions.text import word_shingles_expr
from matchbox_spark.functions.vectors import cosine_expr, sign_bucket_expr
from matchbox_spark.operators.dedupers import Deduper, DeduperSettings
from matchbox_spark.operators.linkers import Linker, LinkerSettings
from matchbox_spark.operators.registry import add_model_class
from matchbox_spark.schemas import SCHEMA_MODEL_EDGES, conform


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
    bucket_dims: list = dc_field(default_factory=lambda: [0, 1, 2, 3, 4, 5])


@add_model_class
class EmbeddingLinker(Linker):
    """Cross-source linking by embedding cosine ≥ threshold.

    Sign-bit LSH buckets with one-bit multi-probe on the left side block the
    join; exact cosine verifies within buckets.
    """

    settings_class = EmbeddingLinkerSettings

    def link(self, left: DataFrame, right: DataFrame) -> DataFrame:
        s = self.settings
        dims = list(s.bucket_dims)
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
    bits: int = 16
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
    SimHash dedupe O(touched) per micro-batch like MinHash.
    """

    settings_class = SimHashDeduperSettings

    def _validate(self) -> None:
        s = self.settings
        if s.max_hamming + 1 > s.bits:
            raise ValueError(
                f"max_hamming={s.max_hamming} needs {s.max_hamming + 1} "
                f"pigeonhole chunks but bits={s.bits}: raise bits or lower "
                "max_hamming"
            )

    def dedupe(self, data: DataFrame) -> DataFrame:
        from matchbox_spark.operators.dedup import simhash_near_duplicates

        self._validate()
        s = self.settings
        pairs = simhash_near_duplicates(
            data, s.id, s.text_field, bits=s.bits, max_hamming=s.max_hamming
        )
        id_type = data.schema[s.id].dataType
        return conform(
            pairs.select(
                F.col("doc_a").cast(id_type).alias("left_id"),
                F.col("doc_b").cast(id_type).alias("right_id"),
                (
                    F.lit(1.0)
                    - F.col("hamming") / F.lit(float(s.bits))
                ).alias("score"),
            ),
            SCHEMA_MODEL_EDGES,
        )

    def delta_block_keys(self, data: DataFrame) -> DataFrame:
        """``(id, block_key)`` — every pigeonhole-chunk key of every row,
        folded to one long exactly like the candidate join keys."""
        from matchbox_spark.operators.dedup import (
            _simhash_chunk_parts,
            simhash_chunks,
            simhash_values,
        )

        self._validate()
        s = self.settings
        chunks = simhash_chunks(s.bits, s.max_hamming)
        sims = simhash_values(data, s.id, s.text_field, s.bits)
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
    bucket_dims: list = dc_field(default_factory=lambda: [0, 1, 2, 3, 4, 5])


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
    (corpus / 2^bits). The 6-dim default suits small fixtures; at N rows
    pick ``len(bucket_dims) ≈ log2(N / target_occupancy)`` — measured in
    ``tools/stress_streaming_resolve.py --embedding``, 6 dims over a few
    thousand vectors degenerates delta streaming to a super-linear
    recompute (2.13× ramp) while 16 dims holds it flat (1.05×).
    """

    settings_class = EmbeddingDeduperSettings

    def dedupe(self, data: DataFrame) -> DataFrame:
        from matchbox_spark.operators.dedup import embedding_near_duplicates

        s = self.settings
        if not s.bucket_dims:
            raise ValueError(
                "EmbeddingDeduper requires bucket_dims (the unblocked "
                "quadratic baseline is evaluation-only)"
            )
        pairs = embedding_near_duplicates(
            data, s.id, s.vector_field, s.threshold, list(s.bucket_dims)
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
        on. The bucket value is already a small long, so it IS the key."""
        s = self.settings
        if not s.bucket_dims:
            raise ValueError("EmbeddingDeduper requires bucket_dims")
        dims = list(s.bucket_dims)
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
