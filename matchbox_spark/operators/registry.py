"""Model-class registry (reference extension surface models.py:41-52)."""

from __future__ import annotations

MODEL_CLASSES: dict[str, type] = {}


def add_model_class(cls: type, name: str | None = None) -> type:
    """Register a Deduper/Linker class for lookup by name (usable as decorator)."""
    MODEL_CLASSES[name or cls.__name__] = cls
    return cls


def get_model_class(name: str) -> type:
    try:
        return MODEL_CLASSES[name]
    except KeyError:
        raise ValueError(
            f"unknown model class {name!r}; known: {sorted(MODEL_CLASSES)}"
        ) from None
