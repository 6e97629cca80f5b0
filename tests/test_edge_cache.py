"""Lifecycle of the memoized co-purchase edge checkpoint (q121/q164/
q166/q197 share it): eviction must actually free the localCheckpoint
blocks, and a forced view refresh must invalidate the cache so a
regenerated fixture dir can't serve stale edges."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_force_register_invalidates_edge_cache(spark):
    from pandas_td_spark.queries.advanced import _EDGE_CACHE, _copurchase_edges
    from pandas_td_spark.sources.io import _CURRENT_VIEWS, register_views

    register_views(spark, SF_SMALL)
    e = _copurchase_edges(spark)
    n = e.count()  # BEFORE eviction — r11 eviction releases checkpoint
    # blocks eagerly, so stale handles are unusable afterwards (by design)
    assert n > 0
    key = (spark, _CURRENT_VIEWS.get(spark))
    assert key in _EDGE_CACHE
    register_views(spark, SF_SMALL, force=True)
    assert key not in _EDGE_CACHE, (
        "force=True must evict the memoized edges built from the old files"
    )
    # and the consumer transparently rebuilds
    e2 = _copurchase_edges(spark)
    assert e2.count() == n


def test_evict_edge_cache_unpersists(spark):
    from pandas_td_spark.queries.advanced import (
        _EDGE_CACHE,
        _copurchase_edges,
        evict_edge_cache,
    )
    from pandas_td_spark.sources.io import register_views

    register_views(spark, SF_SMALL)
    e = _copurchase_edges(spark)
    e.count()
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    assert before > 0, "edge build must have left checkpoint blocks"
    evict_edge_cache()
    assert not _EDGE_CACHE
    # r11 (ADVICE r10): eviction releases the checkpoint RDD blocks
    # EAGERLY, not at Python GC
    assert jsc.getPersistentRDDs().size() < before


def test_force_register_invalidates_bpe_merge_cache(spark):
    """ADVICE r9: the q265/q270 merge-table memo must be evicted by
    register_views(force=True) like the edge and pairs caches — a
    regenerated fixture dir under the same path would otherwise serve a
    stale merge table while the oracle recomputes from the new data."""
    from pandas_td_spark.queries.curation import (
        _BPE_MERGE_CACHE,
        _bpe_merges_cached,
    )
    from pandas_td_spark.sources.io import _CURRENT_VIEWS, register_views

    register_views(spark, SF_SMALL)
    merges = _bpe_merges_cached(spark)
    assert merges, "fixture corpus should train at least one merge"
    key = (spark, _CURRENT_VIEWS.get(spark))
    assert key in _BPE_MERGE_CACHE
    register_views(spark, SF_SMALL, force=True)
    assert key not in _BPE_MERGE_CACHE, (
        "force=True must evict the memoized BPE merge table"
    )
    # and the consumer transparently retrains to the same table
    assert _bpe_merges_cached(spark) == merges


def test_force_register_invalidates_r10_model_caches(spark):
    """The r10 memoized model/index tables (SimHash signatures, the
    expression-bucket LSH index, DSIR weights) must share the eviction
    contract: register_views(force=True) drops all of them."""
    from pandas_td_spark.queries.curation import (
        _DSIR_WEIGHTS_CACHE,
        _dsir_weights_cached,
    )
    from pandas_td_spark.queries.llm import (
        _LSH_INDEX_CACHE,
        _SIMHASH_SIGS_CACHE,
        _lsh_index_cached,
        _simhash_sigs_cached,
    )
    from pandas_td_spark.sources.io import _CURRENT_VIEWS, register_views

    register_views(spark, SF_SMALL)
    assert _simhash_sigs_cached(spark).count() > 0
    assert _lsh_index_cached(spark).count() > 0
    assert _dsir_weights_cached(spark).count() > 0
    key = (spark, _CURRENT_VIEWS.get(spark))
    for cache in (_SIMHASH_SIGS_CACHE, _LSH_INDEX_CACHE, _DSIR_WEIGHTS_CACHE):
        assert key in cache
    register_views(spark, SF_SMALL, force=True)
    for cache in (_SIMHASH_SIGS_CACHE, _LSH_INDEX_CACHE, _DSIR_WEIGHTS_CACHE):
        assert key not in cache, "force=True must evict every model memo"
