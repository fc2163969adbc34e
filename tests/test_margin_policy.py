"""Calibration margin policy (scripts/scale_bench): pure-python checks
for the r07 extended-grid / capped-margin / escalation-replay rules —
the behavior that decides whether the scale tiers' worst-case bound
criterion generalizes to unseen query draws (eval/bound.cpp:404-414
criterion)."""

from __future__ import annotations

import copy
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.scale_bench import _MULT_GRID, _STD_GRID, _apply_margin


def test_healthy_fit_keeps_historic_ceiling():
    """A raw fit well inside the grid margins to at most 8.0 — the
    r04-r06 ceiling — even though the grid now extends to 32: the fixed
    step count must not inflate configs whose bounds already hold."""
    raw = {
        (10, 0.01): {"multipler": 2.0, "std_m": 1.0},
        (10, 0.10): {"multipler": 1.0, "std_m": 1.0},
        (50, 0.05): {"multipler": 2.0, "std_m": 1.0},
    }
    out = _apply_margin(copy.deepcopy(raw))
    assert out[(10, 0.01)]["multipler"] == 8.0  # 4 steps, capped
    assert out[(10, 0.01)]["std_m"] == 4.0  # overflow went to std
    assert out[(10, 0.10)]["multipler"] == 4.0  # 2 steps, no cap hit
    assert out[(50, 0.05)]["multipler"] == 4.0  # 1 step


def test_pinned_fit_escalates_past_old_cap():
    """A fit pinned at 8.0 (the old grid cap — the r07 1M k50_b1 draw)
    may escalate into the 16/32 region, up to 4x its fitted value."""
    raw = {(50, 0.01): {"multipler": 8.0, "std_m": 1.0}}
    out = _apply_margin(copy.deepcopy(raw))
    assert out[(50, 0.01)]["multipler"] == 32.0
    assert out[(50, 0.01)]["std_m"] == 2.0  # 3rd step overflowed to std


def test_nan_fallback_row_is_most_conservative():
    """A calibration that found no passing config returns the grid max;
    margin leaves it at the max and bumps std only."""
    raw = {(100, 0.01): {"multipler": _MULT_GRID[-1], "std_m": _STD_GRID[-1]}}
    out = _apply_margin(copy.deepcopy(raw))
    assert out[(100, 0.01)]["multipler"] == _MULT_GRID[-1]
    assert out[(100, 0.01)]["std_m"] == _STD_GRID[-1]


def test_escalation_replay_matches_fresh_bumps():
    """Persisted escalations re-apply deterministically: n saved steps
    reproduce the same (multipler, std_m) that the margin-val pass
    computed, without re-sweeping."""
    from scripts.scale_bench import _escalate_on_margin_val

    params = {(100, 0.05): {"multipler": 4.0, "std_m": 1.0}}
    saved = {json.dumps([100, 0.05]): 2}
    out = _escalate_on_margin_val(None, copy.deepcopy(params), saved)
    assert out[(100, 0.05)]["multipler"] == 16.0
    assert out[(100, 0.05)]["std_m"] == 1.0
