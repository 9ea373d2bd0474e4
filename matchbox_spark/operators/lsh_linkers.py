"""Similarity-based linkers: MinHash-LSH (text) and cosine-LSH (embeddings).

North-star extensions (SURVEY §7 item 11): the dedup-family operators
packaged as ``Linker`` model classes so similarity joins slot into the same
DAG → resolver → query pipeline as deterministic rules. Both emit
SCHEMA_MODEL_EDGES with a genuine similarity as the score.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from matchbox_spark.functions.text import word_shingles_expr
from matchbox_spark.functions.vectors import cosine_expr, sign_bucket_expr
from matchbox_spark.operators.linkers import Linker, LinkerSettings
from matchbox_spark.operators.registry import add_model_class
from matchbox_spark.schemas import SCHEMA_MODEL_EDGES, conform


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
        s = self.settings
        if s.num_perm % s.bands != 0:
            raise ValueError("num_perm must be divisible by bands")
        rpb = s.num_perm // s.bands

        tagged = left.select(
            F.lit("l").alias("side"),
            F.col(s.left_id).cast("long").alias("rid"),
            F.col(s.left_field).alias("text"),
        ).unionByName(
            right.select(
                F.lit("r").alias("side"),
                F.col(s.right_id).cast("long").alias("rid"),
                F.col(s.right_field).alias("text"),
            )
        )
        # composite doc key keeps sides separate through the shared pipeline
        docs = tagged.withColumn(
            "doc_key", F.concat("side", F.lit(":"), F.col("rid").cast("string"))
        )

        sh = (
            docs.select(
                "doc_key",
                F.explode(word_shingles_expr("text", s.shingle_n)).alias("sh"),
            )
            .dropDuplicates()
        )
        hashed = sh.select(
            "doc_key",
            F.explode(F.sequence(F.lit(0), F.lit(s.num_perm - 1))).alias("perm"),
            "sh",
        ).select(
            "doc_key",
            "perm",
            F.substring(
                F.sha2(
                    F.concat(F.col("perm").cast("string"), F.lit("|"), F.col("sh")),
                    256,
                ),
                1,
                16,
            ).alias("h"),
        )
        sigs = (
            hashed.groupBy("doc_key", "perm")
            .agg(F.min("h").alias("mh"))
            .groupBy("doc_key")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("perm", "mh"))),
                    lambda x: x["mh"],
                ).alias("sig")
            )
        )
        banded = sigs.select(
            "doc_key",
            "sig",
            F.explode(F.sequence(F.lit(0), F.lit(s.bands - 1))).alias("band"),
        ).select(
            "doc_key",
            "band",
            F.expr(f"array_join(slice(sig, band * {rpb} + 1, {rpb}), '|')").alias(
                "band_key"
            ),
        )
        a = banded.where(F.col("doc_key").startswith("l:")).select(
            F.col("doc_key").alias("dk_l"), "band", "band_key"
        )
        b = banded.where(F.col("doc_key").startswith("r:")).select(
            F.col("doc_key").alias("dk_r"), "band", "band_key"
        )
        cands = (
            a.join(b, ["band", "band_key"]).select("dk_l", "dk_r").dropDuplicates()
        )

        sets = sh.groupBy("doc_key").agg(F.collect_set("sh").alias("shset"))
        verified = (
            cands.join(sets.withColumnsRenamed({"doc_key": "dk_l", "shset": "set_l"}), "dk_l")
            .join(sets.withColumnsRenamed({"doc_key": "dk_r", "shset": "set_r"}), "dk_r")
            .withColumn(
                "score",
                F.size(F.array_intersect("set_l", "set_r"))
                / F.size(F.array_union("set_l", "set_r")).cast("double"),
            )
            .where(F.col("score") >= F.lit(float(s.threshold)))
        )
        out = verified.select(
            F.split("dk_l", ":")[1].cast("long").alias("left_id"),
            F.split("dk_r", ":")[1].cast("long").alias("right_id"),
            "score",
        )
        return conform(out, SCHEMA_MODEL_EDGES)


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
        home = sign_bucket_expr("_lv", dims)
        probes = F.array(
            *([home] + [home.bitwiseXOR(F.lit(1 << i)) for i in range(len(dims))])
        )
        lx = lv.select("left_id", "_lv", F.explode(probes).alias("bkt"))
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
