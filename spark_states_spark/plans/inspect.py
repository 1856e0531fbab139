"""Helpers for reading formatted physical plans as strings."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_str(df: DataFrame) -> str:
    """The formatted physical plan (`df.explain("formatted")`) as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def scan_section(plan: str, table: str | None = None) -> str:
    """The `Scan parquet` detail block (PushedFilters / ReadSchema lines).

    With ``table``, returns the block for the scan whose Location mentions
    that table; otherwise the first scan block.
    """
    blocks = plan.split("Scan parquet")[1:]
    for block in blocks:
        if table is None or f"{table}.parquet" in block.split("ReadSchema")[0]:
            end = block.find("\n\n")
            return block[:end] if end > 0 else block
    raise AssertionError(f"no parquet scan for {table!r} in plan:\n{plan}")
