"""Shared scalar-function helpers (SURVEY.md §2.8 — vectorized only)."""

from .numeric import round_half_up, sql_round_half_up

__all__ = ["round_half_up", "sql_round_half_up"]
