"""MLlib-backed LSH linkers (SURVEY §7 item 11: MLlib MinHashLSH /
BucketedRandomProjectionLSH as additional Linkers).

These wrap Spark MLlib's built-in LSH estimators behind the same ``Linker``
surface as the hand-rolled ``lsh_linkers`` variants, giving users the stock
MLlib path (approxSimilarityJoin) when they prefer it: MinHashLSH over
token-set vectors for Jaccard distance, BucketedRandomProjectionLSH over
dense embeddings for Euclidean distance. Scores are similarities in [0,1]
(1 − distance for Jaccard; 1/(1+d) for Euclidean).

MLlib's hash families are seeded and deterministic for a fixed seed; results
are reproducible but not expressible in ANSI SQL, so these carry no oracle
entry (the hand-rolled variants are the cross-checked path).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from matchbox_spark.operators.linkers import Linker, LinkerSettings, finalise_edges
from matchbox_spark.operators.registry import add_model_class


@dataclass
class MLlibMinHashSettings(LinkerSettings):
    left_field: str = "text"
    right_field: str = "text"
    num_hash_tables: int = 8
    shingle_n: int = 2
    jaccard_threshold: float = 0.5
    vocab_size: int = 1 << 18
    seed: int = 42


@add_model_class
class MLlibMinHashLinker(Linker):
    """MinHashLSH approxSimilarityJoin over hashed shingle-set vectors."""

    settings_class = MLlibMinHashSettings

    def link(self, left: DataFrame, right: DataFrame) -> DataFrame:
        from pyspark.ml.feature import HashingTF, MinHashLSH

        from matchbox_spark.functions.text import word_shingles_expr

        s = self.settings

        def featurize(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
            shingled = df.select(
                F.col(id_col).cast("long").alias("rid"),
                word_shingles_expr(text_col, s.shingle_n).alias("shingles"),
            ).where(F.size("shingles") > 0)
            tf = HashingTF(
                inputCol="shingles",
                outputCol="features",
                numFeatures=s.vocab_size,
                binary=True,
            )
            return tf.transform(shingled).select("rid", "features")

        lf = featurize(left, s.left_id, s.left_field)
        rf = featurize(right, s.right_id, s.right_field)

        lsh = MinHashLSH(
            inputCol="features",
            outputCol="hashes",
            numHashTables=s.num_hash_tables,
            seed=s.seed,
        )
        model = lsh.fit(lf)
        joined = model.approxSimilarityJoin(
            lf, rf, 1.0 - s.jaccard_threshold, distCol="jaccard_dist"
        )
        out = joined.select(
            F.col("datasetA.rid").alias("left_id"),
            F.col("datasetB.rid").alias("right_id"),
            (1.0 - F.col("jaccard_dist")).alias("score"),
        )
        return finalise_edges(out, left, right, s.left_id, s.right_id)


@dataclass
class MLlibRandomProjectionSettings(LinkerSettings):
    left_field: str = "embedding"
    right_field: str = "embedding"
    bucket_length: float = 1.0
    num_hash_tables: int = 4
    max_l2_distance: float = 1.0
    seed: int = 42


@add_model_class
class MLlibRandomProjectionLinker(Linker):
    """BucketedRandomProjectionLSH approxSimilarityJoin over embeddings."""

    settings_class = MLlibRandomProjectionSettings

    def link(self, left: DataFrame, right: DataFrame) -> DataFrame:
        from pyspark.ml.feature import BucketedRandomProjectionLSH
        from pyspark.ml.functions import array_to_vector

        s = self.settings
        lf = left.select(
            F.col(s.left_id).cast("long").alias("rid"),
            array_to_vector(F.col(s.left_field).cast("array<double>")).alias(
                "features"
            ),
        )
        rf = right.select(
            F.col(s.right_id).cast("long").alias("rid"),
            array_to_vector(F.col(s.right_field).cast("array<double>")).alias(
                "features"
            ),
        )
        lsh = BucketedRandomProjectionLSH(
            inputCol="features",
            outputCol="hashes",
            bucketLength=s.bucket_length,
            numHashTables=s.num_hash_tables,
            seed=s.seed,
        )
        model = lsh.fit(lf)
        joined = model.approxSimilarityJoin(
            lf, rf, s.max_l2_distance, distCol="l2"
        )
        out = joined.select(
            F.col("datasetA.rid").alias("left_id"),
            F.col("datasetB.rid").alias("right_id"),
            (1.0 / (1.0 + F.col("l2"))).alias("score"),
        )
        return finalise_edges(out, left, right, s.left_id, s.right_id)
