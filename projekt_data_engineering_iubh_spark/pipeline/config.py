"""Threshold-rule configuration for the die-bonder pipeline.

Semantics of ``/root/reference/config/schwellwerte.json:1-26`` and the
key→(parameter, event) mapping of
``/root/reference/src/daily_aggregator.py:21-28``. Rules are data, not
code — ``load_rules`` accepts any JSON file of the same shape.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

# logical rule key -> column equalities scoping the rule (rules.RuleMapping)
PARAMETER_EVENT_MAPPING: dict[str, dict[str, str]] = {
    "AS_VacuumUnits": {"parameter_name": "AS_VacuumUnits", "event_name": "AS_Check"},
    "PP_VacuumUnits": {"parameter_name": "PP_VacuumUnits", "event_name": "Pick_Check"},
    "AS_VacuumUnits_Release": {
        "parameter_name": "AS_VacuumUnits",
        "event_name": "AS_Blowoff_Check",
    },
    "PP_VacuumUnits_Release": {
        "parameter_name": "PP_VacuumUnits",
        "event_name": "Place_Check",
    },
    "PickForce": {"parameter_name": "PP_Force", "event_name": "Pick_Check"},
    "PlaceForce": {"parameter_name": "PP_Force", "event_name": "Place_Check"},
}

# Default rules (the shipped schwellwerte.json content).
DEFAULT_RULES: dict[str, Any] = {
    "AS_VacuumUnits": {"error_if_above": 70.0},
    "PP_VacuumUnits": {"error_if_above": 75.0},
    "AS_VacuumUnits_Release": {"error_if_below": 450.0},
    "PP_VacuumUnits_Release": {"error_if_below": 450.0},
    "PickForce": {"error_if_outside_range": [60.0, 120.0]},
    "PlaceForce": {"error_if_outside_range": [60.0, 120.0]},
}

CYCLE_START_EVENT = "Cycle_Start"
CYCLE_END_EVENT = "Cycle_End"
TIMESTAMP_FORMAT_INPUT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"  # ISO 8601 UTC


def load_rules(path: str | Path | None) -> dict[str, Any]:
    """Load threshold rules; a missing file degrades to no rules (all rows
    is_error=0), malformed JSON is fatal — reference behavior
    (daily_aggregator.py:131-141)."""
    if path is None:
        return dict(DEFAULT_RULES)
    p = Path(path)
    if not p.exists():
        return {}
    return json.loads(p.read_text(encoding="utf-8"))
