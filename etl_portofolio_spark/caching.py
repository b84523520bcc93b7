"""Session cache lifecycle for multi-branch plans.

Several operators and registry queries ``persist()`` a shared
intermediate so that a subtree feeding two or more plan branches (both
sides of an LSH self-join, a signature frame read by candidate
generation AND verification, an IVF assignment read by query and corpus
sides) is computed once instead of per-branch — Spark performs no
common-subexpression elimination across DataFrame branches, so without
the persist each branch re-runs the subtree's shuffles.

Those frames must stay cached until the *returned* plan has been
consumed, which is after the building function has returned — so the
function itself cannot ``try/finally``-unpersist without eagerly
materializing the result (which would erase the lazy plan that the
plan-quality tests and downstream composition rely on). Instead the
lifecycle contract is explicit:

* plan builders register every persisted intermediate here via
  :func:`scoped_persist` (never bare ``DataFrame.persist``);
* the CALLER owns release: once the returned plan has been consumed
  (collected / written), call :func:`release_cached` — or
  ``spark.catalog.clearCache()``, which Spark's shared cache manager
  already honors for these frames.

``bench.py`` releases between measured passes; the runnable jobs
release in ``finally`` blocks; ``tests/test_cache_hygiene.py`` asserts
that after release a fresh session holds zero persistent RDDs — the
regression gate for "a registry call leaks cache into a long-lived
session".
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

#: Strong references to every scoped-persisted frame not yet released.
#: Strong on purpose: a JVM-side cache entry outlives the Python
#: DataFrame object, so a weakref would lose the only handle that can
#: unpersist it.
_LIVE: list[DataFrame] = []


def scoped_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df`` and register it for :func:`release_cached`.

    Drop-in replacement for ``df.persist(level)`` inside plan builders;
    MEMORY_AND_DISK by default (spill, never recompute, at scale).
    """
    df.persist(level)
    _LIVE.append(df)
    return df


def release_cached(blocking: bool = False) -> int:
    """Unpersist every scoped-persisted frame; returns how many.

    Idempotent and safe to call while downstream plans of the released
    frames still exist — they fall back to recomputing the subtree.
    Unpersisting a frame whose session is already stopped is swallowed
    (the JVM-side cache died with the session).
    """
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:
            pass
    return n


def live_cache_count() -> int:
    """How many scoped-persisted frames are currently unreleased."""
    return len(_LIVE)
