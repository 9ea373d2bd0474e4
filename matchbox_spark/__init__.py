"""matchbox_spark — a PySpark-native entity-resolution / record-matching engine.

A from-scratch rebuild of the capabilities of uktrade/matchbox (reference studied
read-only at /root/reference) as an idiomatic Spark library:

- **Source steps** index warehouse/file data by content hash
  (``matchbox_spark.sources``).
- **Model steps** (dedupers / linkers) emit scored pair edges via DataFrame joins
  (``matchbox_spark.operators``).
- **Resolver steps** cluster thresholded edges with connected components —
  driver-side union-find at small scale, iterative large-star/small-star
  DataFrame algorithm at cluster scale (``matchbox_spark.plans.resolvers``).
- **Query layer** projects source keys through the cluster hierarchy with
  priority-coalesced resolver assignments (``matchbox_spark.plans.query``).
- **Content addressing** — deterministic row/table/cluster hashing compatible
  with the reference recipe (``matchbox_spark.functions.hashing``).
- **Training-data pipeline operators** — dedup (exact / MinHash-LSH / n-gram
  Jaccard / SimHash / embedding cosine), similarity search, text analysis,
  multimodal column plumbing (``matchbox_spark.operators.dedup``,
  ``similarity``, ``matchbox_spark.functions.text``).

Everything is expressed with the DataFrame / Spark SQL API so Catalyst handles
pushdown, join strategy, and whole-stage codegen; Python UDFs are avoided in hot
paths.
"""

__version__ = "0.1.0"
