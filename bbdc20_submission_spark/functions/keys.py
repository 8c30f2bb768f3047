"""Key-parsing / scalar column helpers (SURVEY.md §2.2 P1/P2/P10).

Reference semantics: composite key strings like ``"s01t01.la"`` are
split by fixed offsets and '.' (``/root/reference/load_data.py:17-19``);
keys are rebuilt by concatenation (``generate_submission.py:510,526``).
All pure Column expressions — JVM-side, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def substr_key(col: Column | str, start: int, length: int) -> Column:
    """Fixed-offset substring (1-indexed, like SQL substr)."""
    return F.substring(F.col(col) if isinstance(col, str) else col, start, length)


def split_part(col: Column | str, sep: str, index: int) -> Column:
    """1-indexed split-then-pick (DuckDB split_part semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, sep).getItem(index - 1)


def concat_key(*cols: Column | str, sep: str | None = None) -> Column:
    """Rebuild a composite key; with sep uses concat_ws."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.concat_ws(sep, *cs) if sep is not None else F.concat(*cs)
