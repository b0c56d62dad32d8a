"""Round-3 gate: the catalog must never outgrow the driver's sweep.

Rounds 1 and 2 both shipped CORRECTNESS files covering exactly the first
50 entries of ``queries()`` — the driver sweep is a bounded window, and
each round the catalog grew past it (19, then 33 queries with no driver
row; VERDICT r2 item #1). The structural fix is in ``__spark_entry__``:
``queries()`` sorts never-driver-green names first so the window always
lands on uncovered work. This test pins the invariant those two pieces
must jointly satisfy: EVERY catalog query either already has a
driver-green row or sits inside the next sweep's window.

If you add a query and this fails, the unswept backlog exceeds the
window — retire/merge queries or accept multi-round convergence
explicitly by raising WINDOW with evidence of a bigger driver sweep.
"""

from __future__ import annotations

import __spark_entry__ as entry

# Rows per driver sweep, measured from CORRECTNESS_r01/r02 (both exactly
# the catalog's first 50 entries at their round's ordering).
WINDOW = 50


def test_priority_order_puts_unswept_first():
    green = entry._driver_green()
    names = list(entry.queries())
    seen_green = False
    for n in names:
        if n in green:
            seen_green = True
        else:
            assert not seen_green, (
                f"unswept query {n!r} sorted after a driver-green one — "
                "priority ordering broken"
            )


def test_correctness_covers_catalog():
    green = entry._driver_green()
    names = list(entry.queries())
    window = set(names[:WINDOW])
    uncovered = [n for n in names if n not in green and n not in window]
    assert not uncovered, (
        f"{len(uncovered)} queries have no driver-green row AND fall "
        f"outside the next {WINDOW}-query sweep window: {uncovered}"
    )


def test_oracles_subset_of_queries():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q)
