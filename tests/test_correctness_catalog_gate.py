"""Round-4 gate: the driver sweep must ROTATE through the whole catalog.

Rounds 1-3 each shipped CORRECTNESS files covering exactly the first 50
entries of ``queries()`` — the driver sweep is a bounded window. Round 3
fixed the never-swept starvation (never-green-first ordering); round 4
fixes the STALENESS gap that ordering degenerates into once every query
is green in *some* round's file: a query last verified in round 1 might
never be re-swept, so a silent regression in the tail would go
driver-undetected forever (VERDICT r3 "What's wrong" #3).

``queries()`` now orders by least-recently-green (never-green still
first, then oldest last-green round), so the 50-row window re-verifies
the entire catalog every ceil(N/50) rounds (= 2 at today's size). This
test pins three invariants:

1. ordering is monotone in staleness (never-green == round -1 first);
2. every never-green query sits inside the next sweep's window;
3. every query OUTSIDE the window was green in the most recent driver
   round — i.e. nothing stale escapes re-verification.

If you add queries and #3 fails, the new-query count exceeded the
window's spare slots (window - stale cohort). Retire/merge queries or
accept multi-round convergence explicitly by raising WINDOW with
evidence of a bigger driver sweep.
"""

from __future__ import annotations

import __spark_entry__ as entry

# Rows per driver sweep, measured from CORRECTNESS_r01/r02/r03 (each
# exactly the catalog's first 50 entries at their round's ordering).
WINDOW = 50


def test_order_monotone_in_staleness():
    last_green = entry._green_rounds()
    names = list(entry.queries())
    rounds = [last_green.get(n, -1) for n in names]
    assert rounds == sorted(rounds), (
        "queries() is not ordered least-recently-green first; "
        f"last-green rounds in listed order: {rounds}"
    )


def test_never_green_inside_window():
    green = entry._driver_green()
    names = list(entry.queries())
    window = set(names[:WINDOW])
    uncovered = [n for n in names if n not in green and n not in window]
    assert not uncovered, (
        f"{len(uncovered)} queries have no driver-green row AND fall "
        f"outside the next {WINDOW}-query sweep window: {uncovered}"
    )


def test_stale_queries_inside_window():
    """Rotation: anything not re-verified next sweep must be freshest."""
    last_green = entry._green_rounds()
    if not last_green:
        return  # no driver files yet — nothing can be stale
    newest = max(last_green.values())
    names = list(entry.queries())
    escaped = [
        n for n in names[WINDOW:] if last_green.get(n, -1) != newest
    ]
    assert not escaped, (
        f"{len(escaped)} stale queries (last green before round "
        f"{newest}) fall outside the next {WINDOW}-query window — the "
        f"rotation no longer covers the catalog in 2 rounds: {escaped}"
    )


def test_oracles_subset_of_queries():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q)
