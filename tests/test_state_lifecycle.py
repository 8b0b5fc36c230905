"""Revival of the reference's disabled state lifecycle suite
(state_test.go:28-120, commented out but documenting intended
behavior): periodic reset counting and keyed CRUD with secondary
indexes by rule and by device."""

from __future__ import annotations

from spinix_spark.engine.stores import StateStore, state_need_reset, state_reset

DEVICES = ["one", "two", "three"]
RULES = ["rule1", "rule2", "rule3", "rule4"]


def _populate() -> tuple[StateStore, list[tuple[str, str]]]:
    store = StateStore()
    ids = []
    for d in DEVICES:
        for r in RULES:
            st = store.lookup_or_make(d, r)
            assert st["device_id"] == d and st["rule_id"] == r
            ids.append((d, r))
    return store, ids


def test_reset_state_counting():
    """TestResetState (state_test.go:28-51): 300 one-minute ticks with
    a 5-minute reset interval → 60 resets, 300 hits."""
    minutes = 300
    st = {"device_id": "one", "rule_id": "one", "now": 0, "last_seen": 0,
          "last_reset": 0, "hits": 0}
    start = 10_000_000 - minutes * 60
    resets = 0
    t = start
    for _ in range(minutes):
        t += 60
        st["now"] = t
        if state_need_reset(st, 5 * 60.0):
            resets += 1
            st["last_reset"] = st["now"]  # UpdateLastResetTime
        st["last_seen"] = st["now"]  # UpdateLastSeenTime
        st["hits"] += 1  # HitIncr (reference doesn't Reset in this loop)
    assert resets == minutes // 5
    assert st["hits"] == minutes


def test_state_lookup():
    store, ids = _populate()
    for d, r in ids:
        st = store.lookup_or_make(d, r)
        assert st["device_id"] == d and st["rule_id"] == r
    assert len(store.snapshot()) == len(DEVICES) * len(RULES)


def test_state_remove_by_rule():
    store, ids = _populate()
    for r in RULES:
        store.remove_by_rule(r)
    assert store.snapshot() == []


def test_state_remove_by_device():
    store, ids = _populate()
    for d in DEVICES:
        store.remove_by_device(d)
    assert store.snapshot() == []


def test_state_reset_clears():
    st = {"device_id": "a", "rule_id": "b", "now": 100, "last_seen": 90,
          "last_reset": 80, "hits": 7}
    state_reset(st)
    assert st["last_seen"] == 0 and st["last_reset"] == 0 and st["hits"] == 0
