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

# Top-level API (mirrors the reference's `matchbox.DAG` ergonomics): the
# classes a pipeline author touches, importable from the package root.
from matchbox_spark.operators.dedupers import NaiveDeduper  # noqa: E402
from matchbox_spark.operators.linkers import (  # noqa: E402
    DeterministicLinker,
    WeightedDeterministicLinker,
)
from matchbox_spark.operators.probabilistic import FellegiSunterLinker  # noqa: E402
from matchbox_spark.plans.catalog import Catalog  # noqa: E402
from matchbox_spark.plans.collections import Collection, CollectionStore, Run  # noqa: E402
from matchbox_spark.plans.dag import DAG  # noqa: E402
from matchbox_spark.plans.query import QueryConfig, match_key, query_data  # noqa: E402
from matchbox_spark.plans.resolvers import Components  # noqa: E402
from matchbox_spark.session import get_spark  # noqa: E402
from matchbox_spark.sources.source import SourceConfig  # noqa: E402

__all__ = [
    "Catalog",
    "Collection",
    "CollectionStore",
    "Components",
    "DAG",
    "DeterministicLinker",
    "FellegiSunterLinker",
    "NaiveDeduper",
    "QueryConfig",
    "Run",
    "SourceConfig",
    "WeightedDeterministicLinker",
    "get_spark",
    "match_key",
    "query_data",
    "__version__",
]
