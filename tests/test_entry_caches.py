"""Entry-point cache lifecycle (_cache_put): LRU bounds, dead-session
sweeps, and the gating-value side table's independence from sibling caches
(regression: an ANN-cache eviction must not strand _SIG_CACHE without its
_MAX_CLASS_CACHE gate)."""


class _FakeDF:
    def __init__(self):
        self.unpersisted = False

    def unpersist(self):
        self.unpersisted = True


def _entry():
    import __spark_entry__ as E

    E._SIG_CACHE.clear()
    E._ANN_SIG_CACHE.clear()
    E._MAX_CLASS_CACHE.clear()
    return E


def test_lru_eviction_unpersists_oldest():
    E = _entry()
    dfs = [_FakeDF() for _ in range(3)]
    for i, df in enumerate(dfs):
        E._cache_put(E._SIG_CACHE, ("app1", f"sf{i}"), df)
    assert len(E._SIG_CACHE) == E._CACHE_LIMIT
    assert dfs[0].unpersisted and not dfs[2].unpersisted
    assert ("app1", "sf0") not in E._SIG_CACHE


def test_dead_session_entries_dropped_without_unpersist():
    E = _entry()
    old = _FakeDF()
    E._cache_put(E._SIG_CACHE, ("app1", "sfA"), old)
    E._cache_put(E._SIG_CACHE, ("app2", "sfA"), _FakeDF())
    # the dead session's frame is dropped, not unpersisted (its JVM is gone)
    assert ("app1", "sfA") not in E._SIG_CACHE and not old.unpersisted


def test_sibling_cache_eviction_keeps_sig_gate():
    E = _entry()
    # _sigs-style fill: sig cache + its gating value
    E._MAX_CLASS_CACHE[("app1", "sfB")] = 7
    E._cache_put(E._SIG_CACHE, ("app1", "sfB"), _FakeDF())
    # ANN cache churns through other sf dirs and evicts its OWN (app1, sfB)
    for sf in ("sfB", "sfC", "sfD"):
        E._cache_put(E._ANN_SIG_CACHE, ("app1", sf), _FakeDF())
    # the sig cache still holds sfB — its gate must still be present
    assert ("app1", "sfB") in E._SIG_CACHE
    assert E._MAX_CLASS_CACHE[("app1", "sfB")] == 7


def test_sig_eviction_cleans_its_gate():
    # the gate side table rides the on_evict callback exactly as the
    # production _sigs() insertion wires it
    E = _entry()
    gate = lambda k: E._MAX_CLASS_CACHE.pop(k, None)  # noqa: E731
    for i in range(3):
        E._MAX_CLASS_CACHE[("app1", f"sf{i}")] = i
        E._cache_put(
            E._SIG_CACHE, ("app1", f"sf{i}"), _FakeDF(), on_evict=gate
        )
    assert ("app1", "sf0") not in E._MAX_CLASS_CACHE
    assert ("app1", "sf2") in E._MAX_CLASS_CACHE
    # dead-session sweep fires the callback too
    E._MAX_CLASS_CACHE[("app2", "sfX")] = 9
    E._SIG_CACHE[("app2", "sfX")] = _FakeDF()
    E._cache_put(E._SIG_CACHE, ("app3", "sfY"), _FakeDF(), on_evict=gate)
    assert ("app2", "sfX") not in E._MAX_CLASS_CACHE


def test_release_callback_used():
    E = _entry()
    released = []
    for i in range(3):
        E._cache_put(
            E._ANN_SIG_CACHE, ("app1", f"sf{i}"), i,
            release=lambda v: released.append(v),
        )
    assert released == [0]


def test_release_caches_sweeps_everything():
    """The session-end hook (atexit-registered) must unpersist every cached
    frame across ALL entry caches and clear the value side-tables."""
    E = _entry()
    E._SIG_SHA_CACHE.clear()
    E._PAIRS_CACHE.clear()
    dfs = [_FakeDF() for _ in range(3)]
    E._cache_put(E._SIG_CACHE, ("app1", "sfA"), dfs[0])
    E._cache_put(E._SIG_SHA_CACHE, ("app1", "sfA"), dfs[1])
    E._MAX_CLASS_CACHE[("app1", "sfA")] = 7
    pairs_cached = _FakeDF()
    E._PAIRS_CACHE[("app1", "sfA")] = (None, None, pairs_cached)
    E._ANN_SIG_CACHE[("app1", "sfA")] = dfs[2]
    E._IVF_CENTROID_CACHE["sfA"] = (None, None)

    E.release_caches()
    assert all(df.unpersisted for df in dfs)
    assert pairs_cached.unpersisted
    for cache in (
        E._SIG_CACHE, E._SIG_SHA_CACHE, E._ANN_SIG_CACHE, E._PAIRS_CACHE,
        E._MAX_CLASS_CACHE, E._IVF_CENTROID_CACHE,
    ):
        assert not cache


def test_release_caches_runs_at_interpreter_exit():
    """The REAL atexit property, observed end-to-end: a fresh interpreter
    that imports the entry module and plants a fake cached frame must
    unpersist it during interpreter shutdown (this build's
    atexit._ncallbacks does not decrement on unregister, so handler
    bookkeeping cannot be asserted directly)."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import __spark_entry__ as E\n"
        "class F:\n"
        "    def unpersist(self):\n"
        "        print('SWEPT-AT-EXIT')\n"
        "E._SIG_CACHE[('app', 'sf')] = F()\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert "SWEPT-AT-EXIT" in out.stdout
