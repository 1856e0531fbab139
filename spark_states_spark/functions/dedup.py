"""Deduplication operators (exact + fuzzy) — filled in incrementally."""

from __future__ import annotations
