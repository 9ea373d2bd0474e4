"""Model operators: dedupers, linkers, result utilities, pipeline dedup ops."""

from matchbox_spark.operators.dedupers import Deduper, NaiveDeduper
from matchbox_spark.operators.linkers import (
    DeterministicLinker,
    Linker,
    WeightedDeterministicLinker,
)
from matchbox_spark.operators.registry import MODEL_CLASSES, add_model_class, get_model_class

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
