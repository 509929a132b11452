"""Driver-contract ordering checklist (VERDICT r5 item 3).

The external driver checks queries() in dict order until its budget
runs out, so the emission order is the evidence-refresh policy. These
assertions kill the round-5 failure class where a registry entry
(kg_constraint_violations) silently never received a driver row:
every declared query must either already hold a recent CORRECTNESS
row or sit in the priority head that the next round's budget will
reach first.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402


def _rows(round_no: int) -> set:
    path = os.path.join(REPO, f"CORRECTNESS_r{round_no:02d}.json")
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        return set(json.load(f))


def test_queries_and_oracles_share_keys_and_order():
    q = list(entry.queries())
    o = list(entry.oracle_sql())
    assert q == o, "queries() and oracle_sql() must emit the same keys in the same order"


def test_priority_head_names_are_real_queries():
    q = set(entry.queries())
    for name in entry._MODEL_BACKED_FIRST + entry._STALE_NEXT:
        assert name in q, f"priority-head entry {name!r} is not a declared query"


def test_no_query_is_unreachably_stale():
    """Every declared query either has a driver row in the last two
    recorded rounds or is in the priority head (model-backed first or
    the stale-rotation block), so the next driver budget reaches it
    before any recently-green stalwart."""
    recent = _rows(4) | _rows(5)
    head = set(entry._MODEL_BACKED_FIRST + entry._STALE_NEXT)
    missing = [
        name
        for name in entry.queries()
        if name not in recent and name not in head
    ]
    assert not missing, (
        "queries with no recent driver row AND no priority-head slot: "
        f"{missing}"
    )
