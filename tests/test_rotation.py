"""The driver checks only the first ~50 queries() entries per round; the
rotation must surface unverified queries first without altering the set."""

from riot_graphs_spark.plans import driver_queries as dq
from riot_graphs_spark.plans.verified import (
    DEFER_TO_NEXT_WINDOW,
    DRIVER_ROWED,
    DRIVER_VERIFIED,
    rotation_order,
)

# "Seen by the driver" = hash-green OR rows-only-by-design with a non-vacuous
# driver row; both classes give up their window slot to new registrations.
SEEN = DRIVER_VERIFIED | DRIVER_ROWED


def test_rowed_set_is_disjoint_from_hash_green():
    # DRIVER_VERIFIED keeps its strict rows+schema+hash meaning; the weaker
    # rows-only evidence class must never leak into it.
    assert not (DRIVER_VERIFIED & DRIVER_ROWED)


def test_rotation_preserves_set():
    ordered = list(dq.queries())
    assert set(ordered) == set(dq.QUERIES)
    assert len(ordered) == len(dq.QUERIES)


def test_unverified_oracle_paired_come_first():
    ordered = list(dq.queries())
    oracles = set(dq.ORACLES)
    pending = [
        n for n in ordered
        if n not in SEEN and n in oracles
        and n not in DEFER_TO_NEXT_WINDOW
    ]
    # Every pending oracle-paired query precedes every already-verified one.
    first_done = next(
        (i for i, n in enumerate(ordered) if n in SEEN), len(ordered)
    )
    last_pending = max(
        (i for i, n in enumerate(ordered) if n in pending), default=-1
    )
    assert last_pending < first_done or not pending


def test_driver_window_is_all_unverified():
    # While >50 NON-DEFERRED queries lack a driver row, the 50-row window
    # must contain no already-verified names (they would waste a slot).
    ordered = list(dq.queries())
    unverified = [
        n for n in ordered
        if n not in SEEN and n not in DEFER_TO_NEXT_WINDOW
    ]
    if len(unverified) >= 50:
        assert all(n not in SEEN for n in ordered[:50])


def test_deferred_names_come_last_and_window_keeps_pending():
    # Deferring a late registration must not displace ANY older pending
    # query from the round's ~50-entry window.
    ordered = list(dq.queries())
    n = len(ordered)
    for name in DEFER_TO_NEXT_WINDOW:
        assert ordered.index(name) >= n - len(DEFER_TO_NEXT_WINDOW)
    pending = [
        n_ for n_ in ordered
        if n_ not in SEEN and n_ not in DEFER_TO_NEXT_WINDOW
    ]
    # every non-deferred pending name sits inside the first-50 window
    assert all(ordered.index(p) < 50 for p in pending)


def test_rotation_order_is_stable_partition():
    names = ["a", "b", "c", "d"]
    got = rotation_order(names, frozenset(["a", "b", "c", "d"]))
    assert got == names  # none verified -> registration order kept
