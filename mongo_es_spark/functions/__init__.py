"""Reusable Catalyst column-expression helpers."""

from .columns import nest_target_paths, source_path_col

__all__ = ["nest_target_paths", "source_path_col"]
