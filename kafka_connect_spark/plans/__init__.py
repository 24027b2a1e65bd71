"""Pipeline-spec compiler (the 'herder' analog)."""

from .pipeline import SINKS, SOURCES, TRANSFORMS, Pipeline

__all__ = ["Pipeline", "SOURCES", "TRANSFORMS", "SINKS"]
