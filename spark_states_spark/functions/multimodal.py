"""Multimodal (binary) column plumbing — filled in incrementally."""

from __future__ import annotations
