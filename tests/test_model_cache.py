"""LRU + release contract of queries/_model_cache.py (ADVICE r10).

The Spark-side block-release behavior is pinned in
tests/test_edge_cache.py (persistent-RDD count drops on evict); these
tests pin the pure bookkeeping: LRU order (touch refreshes), cap
enforcement with per-entry release (never clear()-everything), and
release tolerance for non-DataFrame values (the BPE cache stores
collected row lists).
"""

from __future__ import annotations

from pandas_td_spark.queries._model_cache import (
    cache_evict,
    cache_put,
    cache_touch,
    release_checkpoint,
)


class _FakeFrame:
    """Records release attempts via the same attribute path the real
    release helper walks."""

    def __init__(self, log, name):
        self._log = log
        self._name = name

    @property
    def _jdf(self):
        self._log.append(self._name)
        raise RuntimeError("stop here — release attempt recorded")


def test_lru_eviction_order_and_touch():
    log: list = []
    cache: dict = {}
    for i in range(4):
        cache_put(cache, i, _FakeFrame(log, i), cap=4)
    assert cache_touch(cache, 0)  # 0 becomes most-recently-used
    cache_put(cache, 9, _FakeFrame(log, 9), cap=4)  # drops LRU = 1, not 0
    assert list(cache) == [2, 3, 0, 9]
    # capacity drops must NOT release storage: a caller may still hold a
    # lazy plan over the dropped checkpoint (r11 review — releasing here
    # would fail its deferred action with truncated lineage); GC reclaims
    assert log == []


def test_cap_drops_down_not_clear():
    log: list = []
    cache: dict = {}
    for i in range(8):
        cache_put(cache, i, _FakeFrame(log, i), cap=8)
    cache_put(cache, 100, _FakeFrame(log, 100), cap=8)
    # one slot freed — the other 7 live entries survive (the old
    # clear()-on-overflow dropped entries of other live fixtures)
    assert len(cache) == 8 and 100 in cache and 0 not in cache
    assert log == [], "capacity drop must not release (see above)"


def test_evict_one_and_all_release():
    log: list = []
    cache = {
        "a": _FakeFrame(log, "a"),
        "b": _FakeFrame(log, "b"),
    }
    cache_evict(cache, "a")
    assert list(cache) == ["b"] and log == ["a"]
    cache_evict(cache, "missing")  # no-op
    cache_evict(cache, None)
    assert not cache and log == ["a", "b"]


def test_release_tolerates_non_frames():
    release_checkpoint([("rank", "l", "r")])  # BPE stores row lists
    release_checkpoint(None)
    release_checkpoint(object())


def test_touch_missing_returns_none():
    assert cache_touch({}, "nope") is None
