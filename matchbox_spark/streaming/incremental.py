"""Incremental source indexing via Structured Streaming.

The reference is batch-only (SURVEY §1.4/§2.12 — its "real-time" matching is
a key lookup over precomputed clusters); this module is the Spark-native
extension it leaves open: new source rows arrive as a stream, each
micro-batch is content-indexed (H1/A1) and merged into the catalog
insert-if-absent (U6), so the cluster store stays current without
re-indexing the corpus.

``foreachBatch`` is the right tool: the per-batch body reuses the exact
batch operators (same hash recipe, same catalog semantics), and exactly-once
sink behaviour comes from checkpointing + the content-addressed idempotence
of the catalog (re-inserting an already-seen hash is a no-op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from matchbox_spark.functions.hashing import row_hash_expr
from matchbox_spark.plans.catalog import Catalog


def incremental_index_stream(
    stream: DataFrame,
    catalog: Catalog,
    step: str,
    key_field: str,
    index_fields: list[str],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Index a streaming source into the catalog, one micro-batch at a time.

    Each batch: H1 row hash over sorted index fields → group hashes → merge
    into ``catalog`` under ``step`` (insert-if-absent; previously seen content
    just accumulates new keys). The step's fingerprint is dropped between
    batches — a streaming step is perpetually amendable, unlike the
    fingerprint-gated batch sync.
    """
    fields = sorted(index_fields)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        hashed = batch.select(
            row_hash_expr(batch.schema, fields).alias("hash"),
            F.col(key_field).cast("string").alias("key"),
        )
        index = hashed.groupBy("hash").agg(
            F.sort_array(F.collect_list("key")).alias("keys")
        )
        # merge semantics: union new keys with whatever the step already holds
        existing_keys = catalog.cluster_keys.where(F.col("source") == step)
        catalog.steps.pop(step, None)  # streaming steps are not fingerprint-gated
        catalog.insert_source_index(step, index, fingerprint=b"streaming")
        merged = (
            catalog.cluster_keys.where(F.col("source") == step)
            .unionByName(existing_keys)
            .dropDuplicates()
        )
        catalog._commit(
            "cluster_keys",
            catalog.cluster_keys.where(F.col("source") != step).unionByName(merged),
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
