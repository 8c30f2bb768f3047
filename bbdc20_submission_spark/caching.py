"""Library-scoped cache bookkeeping.

Operators persist intermediates (LSH signatures, simhash fingerprints,
kmeans feature vectors) that the RETURNED lazy plan still references,
so they cannot unpersist before the caller's action. ``managed_persist``
records every frame the library persists; ``release_managed`` drops
exactly those — and nothing else — so caller-owned caches (tests,
notebooks, CLI users) survive a query build. The registry's ``@query``
wrapper calls ``release_managed`` before each build, bounding
cached-block accumulation to one query at a time across a 50-query
driver/bench run without the session-global ``clearCache`` hammer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_MANAGED: list[DataFrame] = []


def managed_persist(
    df: DataFrame, level: StorageLevel | None = None
) -> DataFrame:
    """Persist ``df`` and register it for the next ``release_managed``."""
    df = df.persist(level) if level is not None else df.persist()
    _MANAGED.append(df)
    return df


def release_managed() -> int:
    """Unpersist every library-persisted frame; returns how many.
    Released plans simply recompute if re-executed — correctness is
    unaffected, only the cache residency changes."""
    n = 0
    while _MANAGED:
        df = _MANAGED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
