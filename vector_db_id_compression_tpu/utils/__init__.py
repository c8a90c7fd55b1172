"""Auxiliary subsystems (SURVEY.md §5): profiling/tracing helpers and
artifact integrity."""

from .profiling import device_trace, throughput  # noqa: F401
from .integrity import (  # noqa: F401
    artifact_checksum,
    stamp_artifact,
    verify_artifact,
)
