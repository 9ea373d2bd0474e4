"""Source steps: read, qualify, and content-index warehouse/file data."""

from matchbox_spark.sources.source import (
    LOCATION_READERS,
    SourceConfig,
    register_location_reader,
    validate_extract_transform,
)

__all__ = [
    "SourceConfig",
    "LOCATION_READERS",
    "register_location_reader",
    "validate_extract_transform",
]
