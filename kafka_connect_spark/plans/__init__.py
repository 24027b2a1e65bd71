"""Pipeline-spec compiler + lifecycle management (the 'herder' analog)."""

from .herder import Herder, serve_http
from .pipeline import SINKS, SOURCES, STREAM_SINKS, STREAM_SOURCES, TRANSFORMS, Pipeline

__all__ = [
    "Pipeline",
    "Herder",
    "serve_http",
    "SOURCES",
    "TRANSFORMS",
    "SINKS",
    "STREAM_SOURCES",
    "STREAM_SINKS",
]
