"""Input sources beyond parquet (SURVEY.md §2.1 S6)."""

from .textline import read_delimited_text

__all__ = ["read_delimited_text"]
