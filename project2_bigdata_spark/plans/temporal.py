"""Temporal join surface — as-of join, range join, sessionization.

The reference has no temporal joins (SURVEY.md §2.5: only broadcast
equi-join + pair-mining self-join), so these are engine-surface
extensions over the ``events`` table, each built shuffle-minimal
(operators/asof.py documents the plans) and oracle-checked.
"""

from __future__ import annotations

from ..operators.asof import (
    ORACLE_ASOF,
    ORACLE_RANGE_TIERS,
    asof_join_events_orders,
    oracle_sessionize,
    range_join_event_tiers,
    sessionize_events,
)
from .registry import register

register(
    "asof_join",
    oracle=ORACLE_ASOF,
    doc="As-of join: each event ↔ latest prior order of the same "
        "customer; union + last(ignorenulls) window, one shuffle",
)(asof_join_events_orders)

register(
    "range_join_tiers",
    oracle=ORACLE_RANGE_TIERS,
    doc="Range join events→value tiers via broadcast nested-loop "
        "(tiny range dim ⇒ linear scan, no shuffle)",
)(range_join_event_tiers)

register(
    "sessionize",
    oracle=oracle_sessionize(),
    doc="Gap-based sessionization (30 min): lag + cumulative-sum window, "
        "single shuffle on user_id",
)(sessionize_events)
