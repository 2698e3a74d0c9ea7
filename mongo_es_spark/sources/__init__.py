"""Batch/streaming sources."""

from .tables import load_table, prepare_session

__all__ = ["load_table", "prepare_session"]
