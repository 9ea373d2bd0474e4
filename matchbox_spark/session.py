"""SparkSession construction with scale-appropriate defaults.

Local testing runs ``local[N]``; the same settings (AQE, adaptive coalesce,
Arrow transfer) are what we'd ship on a multi-executor cluster. Shuffle
partition count is deliberately low for local runs — on a real cluster it
should be ~2-3× total cores, or left to AQE's coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "matchbox_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Args:
        app_name: Spark application name.
        master: master URL; defaults to ``local[$SPARK_GRAFT_CPUS]`` or
            ``local[*]``.
        shuffle_partitions: explicit shuffle partition count; defaults to the
            local core count (AQE coalesces down as needed).
        extra_conf: extra Spark conf entries applied last.
    """
    # Python workers resolve imports from PYTHONPATH, not the driver's
    # sys.path — make sure the package root reaches them even when the driver
    # script runs from another directory. (On a real cluster the package ships
    # via --py-files / a wheel; this covers local + spark-submit-less runs.)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # let AQE coalesce BELOW the cluster's default parallelism: small
        # shuffles collapse to the advisory partition size (64 MB) instead of
        # scheduling core-count near-empty tasks per stage. Large shuffles
        # still split at the advisory size, so scale behaviour is unchanged —
        # this only removes per-task overhead on small exchange stages.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # let AQE re-size the output partitioning of CACHED plans too
        # (default false pins every persist() at spark.sql.shuffle.partitions,
        # so each downstream stage over a small cached frame schedules
        # core-count near-empty tasks — measured 430 → 223 tasks and ~25%
        # wall on the j7 flagship at sf0.1). Nothing in the engine keys on
        # a cached frame's partition ids: per-partition offset recipes
        # (zip-with-index, _pid folds) always freeze their frame with a
        # localCheckpoint first, and id assignment keys on content-derived
        # buckets, not partition ids.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
