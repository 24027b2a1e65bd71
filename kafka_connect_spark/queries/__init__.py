"""Declared query surface. Importing this package registers every query
from SURVEY.md §2 into ``QUERIES`` / ``ORACLE`` (see registry.py)."""

from . import (  # noqa: F401
    cdc,
    dedup,
    metrics,
    multimodal,
    quality,
    relational,
    similarity,
    stats,
    text,
    udf,
)
from .registry import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
