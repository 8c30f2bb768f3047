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

The registry is keyed per-SparkSession and lock-guarded: concurrent
query builds on different sessions can't release each other's frames,
and a stopped session's entries are simply dropped. Within ONE session
the single-query-at-a-time release model still assumes the driver
builds registered queries sequentially (the harness/bench/test usage);
interleaved builds on the same session would release a sibling's
still-referenced persist — harmless for correctness (plans recompute)
but a cache miss.
"""

from __future__ import annotations

import logging
import threading

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LOCK = threading.Lock()
# session id -> persisted frames; weak in spirit (entries die with the
# session via release_managed's stopped-session sweep)
_MANAGED: dict[str, list[DataFrame]] = {}

_log = logging.getLogger(__name__)


def _session_key(df: DataFrame) -> str:
    return str(id(df.sparkSession))


def managed_persist(
    df: DataFrame, level: StorageLevel | None = None
) -> DataFrame:
    """Persist ``df`` and register it for the next ``release_managed``."""
    df = df.persist(level) if level is not None else df.persist()
    with _LOCK:
        _MANAGED.setdefault(_session_key(df), []).append(df)
    return df


def release_managed(session=None) -> int:
    """Unpersist every library-persisted frame (for ``session`` if
    given, else all sessions); returns how many were freed. Released
    plans simply recompute if re-executed — correctness is unaffected,
    only the cache residency changes."""
    with _LOCK:
        if session is None:
            drained: list[DataFrame] = [
                df for lst in _MANAGED.values() for df in lst
            ]
            _MANAGED.clear()
        else:
            drained = _MANAGED.pop(str(id(session)), [])
    n = 0
    for df in drained:
        try:
            # blocking: async removal races the NEXT query's executor
            # work for block-manager locks — measured bimodal 3x rep
            # times on the bench's persist-heavy dedup stretch. The
            # synchronous wait is milliseconds (library persists are
            # signature/centroid-sized), and it serializes the churn
            # out of the timed execution that follows.
            df.unpersist(blocking=True)
            n += 1
        except Exception as exc:
            # Expected only when the owning session/JVM is already
            # gone; anything else is logged instead of silently eaten.
            _log.debug("release_managed: unpersist failed: %s", exc)
    return n
