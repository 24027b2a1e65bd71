"""Declared query surface. Importing this package registers every query
from SURVEY.md §2 into ``QUERIES`` / ``ORACLE`` (see registry.py)."""

from . import cdc, dedup, metrics, multimodal, relational, similarity, text, udf  # noqa: F401
from .registry import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
