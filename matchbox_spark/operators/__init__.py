"""Model operators: dedupers, linkers, result utilities, pipeline dedup ops."""

from matchbox_spark.operators.dedupers import Deduper, NaiveDeduper
from matchbox_spark.operators.linkers import (
    DeterministicLinker,
    Linker,
    WeightedDeterministicLinker,
)
from matchbox_spark.operators.registry import MODEL_CLASSES, add_model_class, get_model_class

# import for registration side-effects so get_model_class sees every model
from matchbox_spark.operators.blocking import SortedNeighborhoodDeduper  # noqa: E402,F401
from matchbox_spark.operators.lsh_linkers import EmbeddingLinker, MinHashLinker  # noqa: E402,F401
from matchbox_spark.operators.probabilistic import FellegiSunterLinker  # noqa: E402,F401

try:  # MLlib wrappers need pyspark.ml (always present in pyspark, cheap gate)
    from matchbox_spark.operators.mllib_lsh import (  # noqa: F401
        MLlibMinHashLinker,
        MLlibRandomProjectionLinker,
    )
except ImportError:  # pragma: no cover
    pass

__all__ = [
    "Deduper",
    "NaiveDeduper",
    "Linker",
    "DeterministicLinker",
    "WeightedDeterministicLinker",
    "MODEL_CLASSES",
    "add_model_class",
    "get_model_class",
]
