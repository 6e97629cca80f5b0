"""Shared LRU + storage-release discipline for memoized model frames.

Several query families memoize a localCheckpoint()ed model table per
(session, registered fixture dir) — dedup pair sets, SimHash signatures,
LSH indexes (queries/llm.py), DSIR weights (queries/curation.py), BPE
merges, the graph edge cache (queries/advanced.py). Before round 11 each
cache capped growth with ``dict.clear()`` on overflow, which (a) dropped
entries belonging to other LIVE (session, fixture) keys and (b) released
the checkpointed RDD blocks only when the Python handles were eventually
GC'd (ADVICE r10). This module centralizes the contract:

* ``cache_put`` evicts LEAST-RECENTLY-USED entries (insertion order plus
  ``cache_touch`` refreshes — plain dict ordering) until under the cap.
  Capacity eviction DROPS the reference only — callers may still hold
  lazy plans built on the evicted checkpoint, so its blocks must stay
  alive until Python GC (releasing here would fail those deferred
  actions with unrecoverable truncated lineage);
* ``cache_evict`` is EXPLICIT invalidation (register_views(force=True),
  fixture regeneration): the data is wrong anyway, so it releases each
  frame's checkpoint blocks eagerly via ``release_checkpoint``;
* ``release_checkpoint`` frees a local checkpoint's blocks through the
  analyzed plan's ``LogicalRDD`` — ``DataFrame.unpersist()`` only clears
  CacheManager entries and does nothing for checkpoints. A stopped or
  torn-down SparkContext degrades to a no-op (the blocks died with it).
"""

from __future__ import annotations

__all__ = ["release_checkpoint", "cache_touch", "cache_put", "cache_evict"]


def release_checkpoint(df) -> None:
    """Best-effort eager release of a localCheckpoint frame's RDD blocks
    (verified against pyspark 4.1: persistent-RDD count drops to zero).
    Tolerates dead contexts and non-checkpoint frames — eviction must
    never fail a query. But (ADVICE r11) a failure on a frame whose
    SparkContext is still LIVE means the private plan surface this walks
    (queryExecution/analyzed/rdd) moved under us, silently degrading
    eager release back to GC-timed release — warn once so the drift is
    visible beyond the pinned-CI pyspark version."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        try:
            from pyspark import SparkContext
            from pyspark.sql import DataFrame

            sc = SparkContext._active_spark_context
            ctx_live = (
                isinstance(df, DataFrame)  # lists/None fail by design
                and sc is not None
                and not sc._jsc.sc().isStopped()
            )
        except Exception:
            ctx_live = False
        if ctx_live and not release_checkpoint._warned:
            release_checkpoint._warned = True
            import warnings

            warnings.warn(
                "release_checkpoint failed on a live SparkContext — "
                "eager checkpoint-block release degraded to GC-timed "
                "release (pyspark private plan API drift?)",
                RuntimeWarning,
                stacklevel=2,
            )


release_checkpoint._warned = False


def cache_touch(cache: dict, key):
    """Return ``cache[key]`` (or None) and mark it most-recently-used."""
    df = cache.get(key)
    if df is not None:
        cache.pop(key)
        cache[key] = df
    return df


def cache_put(cache: dict, key, df, cap: int = 8):
    """Insert ``df`` under ``key``, LRU-dropping down to ``cap`` entries.
    Capacity drops do NOT release checkpoint blocks — a caller may still
    hold a lazy frame over them (GC reclaims once every reference dies);
    only explicit invalidation (``cache_evict``) releases eagerly.
    Returns ``df`` for chaining."""
    while len(cache) >= cap:
        cache.pop(next(iter(cache)))
    cache[key] = df
    return df


def cache_evict(cache: dict, key=None) -> None:
    """Release-and-drop one entry (``key``) or every entry (``None``)."""
    if key is None:
        for k in list(cache):
            release_checkpoint(cache.pop(k))
        return
    df = cache.pop(key, None)
    if df is not None:
        release_checkpoint(df)
