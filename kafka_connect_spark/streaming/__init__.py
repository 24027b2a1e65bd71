"""Streaming surface: windows/watermarks + observability."""

from .metrics import MetricsListener, parse_exposition, to_exposition
from .windows import session_agg, sliding_agg, tumbling_agg

__all__ = [
    "MetricsListener",
    "to_exposition",
    "parse_exposition",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
]
