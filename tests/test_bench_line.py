"""The bench stdout line must ALWAYS fit the driver's 2000-char tail
capture (BENCH_r02/r03 were truncated and failed its JSON parse)."""

from __future__ import annotations

import json


def _fake_out(n_queries: int) -> dict:
    return {
        "metric": "headline_query_wall_time",
        "value": 114.63,
        "unit": "sec",
        "sf": 0.1,
        "derived": {
            "n_queries": 250,
            "bounded_search_ms_per_query": 21.12,
            "exact_knn_qps": 169.5,
        },
        "queries": {
            # name lengths match the real catalog's (avg ~18 chars)
            f"catalog_query_{i}": 0.31 + i * 0.27
            for i in range(n_queries)
        },
        "scale_1m": {
            "configs": {},
            "ms_per_query_mean": 4.4,
            "ms_per_query_worst": 4.66,
            "all_bounds_hold": True,
            "rows_per_core": 31250,
        },
        "scale_10m": {
            "configs": {},
            "ms_per_query_mean": 14.0,
            "ms_per_query_worst": 25.2,
            "all_bounds_hold": True,
            "rows_per_core": 312500,
        },
        "scale_100m": {
            "configs": {},
            "ms_per_query_mean": 20.0,
            "ms_per_query_worst": 30.0,
            "all_bounds_hold": True,
            "rows_per_core": 3125000,
            # r05 subsections must still fit the 2000-char tail
            "cold_page_cache": {
                "configs": {},
                "ms_per_query_mean": 30.0,
                "ms_per_query_worst": 45.0,
                "all_bounds_hold": True,
            },
            "throughput": {"nq": 10000, "ms_per_query": 15.0, "qps": 66.0},
            "ivfpq_default": {"ms_per_query": 9.8, "recall_at_10": 0.914},
        },
    }


def test_compact_line_fits_and_parses():
    from bench import _compact_line

    for n in (5, 50, 80, 200):
        line = _compact_line(_fake_out(n))
        assert len(line) <= 1980
        parsed = json.loads(line)
        assert parsed["value"] == 114.63
        # total time is recoverable: listed entries + _rest_sum ≈ value
        q = parsed["queries"]
        listed = sum(v for k, v in q.items())
        want = sum(_fake_out(n)["queries"].values())
        assert abs(listed - want) < 0.01 * max(n, 1)
        if n <= 50:
            # realistic catalog sizes: every optional block still fits
            assert parsed["scale_100m"]["holds"] is True
            assert parsed["derived"]["n_queries"] == 250


def test_compact_line_queries_take_priority():
    """The per-query timings are the driver's round-over-round contract
    (VERDICT r10 Wrong #1): at today's catalog size every timing must
    be listed individually — no '_rest_sum' — BEFORE any optional
    block is considered."""
    from bench import _compact_line

    out = _fake_out(50)
    parsed = json.loads(_compact_line(out))
    assert "_rest_sum" not in parsed["queries"]
    assert len(parsed["queries"]) == 50


def test_compact_line_keeps_heaviest_queries():
    from bench import _compact_line

    out = _fake_out(150)
    parsed = json.loads(_compact_line(out))
    kept = [k for k in parsed["queries"] if k != "_rest_sum"]
    # the heaviest query must always be listed individually
    heaviest = max(out["queries"], key=out["queries"].get)
    assert heaviest in kept
    # skip/error scale sections pass through (decision scalars only)
    out2 = _fake_out(50)
    out2["scale_100m"] = {
        "skipped": "no build cache",
        "remaining_s": 12.0,
        "needed_s": 99.0,
        "evidence": "committed evidence/",
    }
    parsed2 = json.loads(_compact_line(out2))
    assert parsed2["scale_100m"] == {
        "skipped": "no build cache",
        "remaining_s": 12.0,
        "needed_s": 99.0,
    }
