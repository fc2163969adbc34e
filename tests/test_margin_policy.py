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


def test_tight_bound_large_k_healthy_cap_is_16():
    """r10 (second container): the (k>=50, bound<=1%) class — miss
    budget of at most one result — slipped past margin-val on four
    independent containers; its healthy-fit ceiling rises to 16.
    k<=10 keeps the historical cap of 8 (flagship latency config)."""
    raw = {
        (50, 0.01): {"multipler": 2.0, "std_m": 1.0},
        (100, 0.01): {"multipler": 4.0, "std_m": 1.0},
        (10, 0.01): {"multipler": 2.0, "std_m": 1.0},
        (50, 0.05): {"multipler": 2.0, "std_m": 1.0},
    }
    out = _apply_margin(copy.deepcopy(raw))
    assert out[(50, 0.01)]["multipler"] == 16.0  # 3 steps, new cap
    assert out[(50, 0.01)]["std_m"] == 1.0
    assert out[(100, 0.01)]["multipler"] == 16.0  # 8, 16, overflow->std
    assert out[(100, 0.01)]["std_m"] == 2.0
    assert out[(10, 0.01)]["multipler"] == 8.0  # flagship cap unchanged
    assert out[(10, 0.01)]["std_m"] == 4.0
    assert out[(50, 0.05)]["multipler"] == 4.0  # loose bound untouched


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


def _write_params_cache(tmp_path, sb, configs_final, raw_cfg, esc):
    (tmp_path / "params.json").write_text(
        json.dumps(
            {
                "configs_raw": {
                    json.dumps(list(k)): v for k, v in raw_cfg.items()
                },
                "configs": {
                    json.dumps(list(k)): v for k, v in configs_final.items()
                },
                "escalations": esc,
                "mv_slack": sb.MV_POLICY,
                "safety": sb.SAFETY,
                "holdout": True,
                "margin": sb.MARGIN,
                "mult_grid": list(sb._MULT_GRID),
            }
        )
    )


class _NoSweepEP:
    """ErrorProfile stand-in that fails the test if the cached path
    issues any sweep/fit job (VERDICT r07 Next #8: the 100M margin-val
    pass cost 948 s — a driver-side replay must never pay it)."""

    def _sweep_states(self, *a, **k):
        raise AssertionError("cached ensure_profile path must not sweep")

    def fit_and_calibrate_many(self, *a, **k):
        raise AssertionError("cached ensure_profile path must not refit")


def test_cached_profile_replays_without_sweep(monkeypatch, tmp_path):
    """A second ensure_profile call over a populated cache replays the
    persisted escalations in pure numpy/python — zero Spark jobs, zero
    sweeps — and reproduces exactly the persisted final params."""
    import scripts.scale_bench as sb
    from auncel_spark.profile.error_profile import ErrorProfile

    raw_cfg = {(10, 0.01): {"multipler": 2.0, "std_m": 1.0, "minf": 1.0}}
    final = sb._apply_margin(copy.deepcopy(raw_cfg))
    esc = {json.dumps([10, 0.01]): 1}
    replayed = sb._escalate_on_margin_val(None, copy.deepcopy(final), esc)
    _write_params_cache(tmp_path, sb, replayed, raw_cfg, esc)

    monkeypatch.setattr(
        ErrorProfile, "__init__", lambda self, *a, **k: None
    )
    monkeypatch.setattr(
        ErrorProfile, "load", classmethod(lambda cls, idx, p: _NoSweepEP())
    )
    ep, params, fit_s = sb.ensure_profile(None, tmp_path, idx=object())
    assert fit_s == 0.0
    assert isinstance(ep, _NoSweepEP)
    assert params[(10, 0.01)]["multipler"] == replayed[(10, 0.01)]["multipler"]
    assert params[(10, 0.01)]["std_m"] == replayed[(10, 0.01)]["std_m"]


def test_stale_escalation_cache_recomputes(monkeypatch, tmp_path):
    """Persisted final params that do NOT match the replayed escalation
    result (a margin-rule change that slipped past the policy stamp —
    ADVICE r07) force one full margin-val pass instead of silently
    using stale steps."""
    import scripts.scale_bench as sb
    from auncel_spark.profile.error_profile import ErrorProfile

    raw_cfg = {(10, 0.01): {"multipler": 2.0, "std_m": 1.0, "minf": 1.0}}
    esc = {json.dumps([10, 0.01]): 1}
    # deliberately wrong persisted finals: replay cannot reproduce them
    wrong = {(10, 0.01): {"multipler": 1.0, "std_m": 1.0}}
    _write_params_cache(tmp_path, sb, wrong, raw_cfg, esc)

    monkeypatch.setattr(ErrorProfile, "__init__", lambda self, *a, **k: None)
    monkeypatch.setattr(
        ErrorProfile, "load", classmethod(lambda cls, idx, p: object())
    )
    calls = []
    real = sb._escalate_on_margin_val

    def wrapper(ep, params, saved):
        calls.append(saved is None)
        if saved is not None:
            return real(ep, params, saved)
        params["_escalations"] = {}  # simulated full pass
        return params

    monkeypatch.setattr(sb, "_escalate_on_margin_val", wrapper)
    _, params, _ = sb.ensure_profile(None, tmp_path, idx=object())
    assert calls == [False, True]  # replay attempted, then full pass
    rewritten = json.loads((tmp_path / "params.json").read_text())
    assert rewritten["mv_slack"] == sb.MV_POLICY
    assert rewritten["escalations"] == {}


def test_multi_draw_margin_val_escalates_on_any_failing_draw():
    """r10 (MV_SEEDS): the margin-val criterion is the WORST case over
    every independent draw — the fresh 1M build passed the single
    seed-23 draw at 1.0000 yet 1-in-5 fresh draws reproduced the 0.98
    test tail at the same params, so one clean draw must not validate
    a tight-bound config on its own."""
    import types

    import numpy as np

    import scripts.scale_bench as sb

    draws_seen = []

    class _EP:
        multipler = std_m = None
        index = types.SimpleNamespace(
            spark=types.SimpleNamespace(createDataFrame=lambda pdf: pdf)
        )

        def _all_stages(self):
            return []

        def _sweep_states(self, mv, stages):
            s = {"draw": len(draws_seen), "states_d": [np.zeros((1, 100))]}
            draws_seen.append(s)
            return s

        def _simulate_targets(self, sweep, k, acc, cache):
            return None

        def _simulated_quality(self, sweep, chosen, k, gtcol):
            # second draw fails until the multiplier escalates — the
            # first (and any later) draw always passes
            if sweep["draw"] == 1 and self.multipler < 16.0:
                return 0.98, 0.0
            return 1.0, 0.0

    params = {(50, 0.01): {"multipler": 8.0, "std_m": 4.0}}
    out = sb._escalate_on_margin_val(_EP(), params, None)
    esc = out.pop("_escalations")
    assert len(draws_seen) == len(sb.MV_SEEDS)
    assert out[(50, 0.01)]["multipler"] == 16.0  # escalated by draw 2
    assert esc == {json.dumps([50, 0.01]): 1}
    assert out[(50, 0.01)]["margin_val_minf"] == 1.0
