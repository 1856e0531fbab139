"""Similarity search over embedding vectors — filled in incrementally."""

from __future__ import annotations
