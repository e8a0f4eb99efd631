"""Structured Streaming surface (SURVEY.md §2.7)."""

from .windows import (  # noqa: F401
    device_last_state_stream,
    sessionized,
    tumbling_counts,
    tumbling_counts_stream,
)
