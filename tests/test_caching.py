"""Managed-persist registry: session keying and lock-guarded release."""

from __future__ import annotations

from pyspark.sql import functions as F

from bbdc20_submission_spark.caching import _MANAGED, managed_persist, release_managed


def test_release_is_session_keyed(spark):
    df = managed_persist(spark.range(10).select(F.col("id")))
    assert df.count() == 10
    # a foreign session key releases nothing
    class _Fake:  # noqa: B903
        pass

    assert release_managed(_Fake()) == 0
    assert df.storageLevel.useMemory  # still cached
    # the owning session releases exactly the tracked frames
    released = release_managed(spark)
    assert released >= 1
    assert not df.storageLevel.useMemory


def test_release_all_drains_registry(spark):
    managed_persist(spark.range(5).toDF("a"))
    managed_persist(spark.range(6).toDF("b"))
    assert release_managed() >= 2
    assert _MANAGED == {}


def test_concurrent_persist_is_threadsafe(spark):
    import threading

    errs = []

    def work(i):
        try:
            df = managed_persist(spark.range(100 + i))
            df.count()
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert release_managed(spark) == 8
