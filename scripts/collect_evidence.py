"""Snapshot the measured ladder/curve artifacts into committed files.

VERDICT r06 Next #3: the PQ ladders, OPQ rungs, and the 1M sweep curve
were only discoverable in gitignored ``.scale_cache``/``BENCH_RUNS``
while README/STATUS cited their numbers — the evidence chain broke the
moment a container was recycled. This script copies every
curve/ladder/params artifact the scale tiers produce into
``evidence/`` (committed), keyed by tier, with the kernel stamp kept
so a reader can match them against the code version that measured
them.

Run after a build/bench session, then commit::

    python scripts/collect_evidence.py && git add evidence/
"""

from __future__ import annotations

import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.scale_bench import N, N10, N100, _cache_dir  # noqa: E402

# artifact name -> what it records (copied verbatim when present)
ARTIFACTS = {
    "pq_curve_v3.json": "1M PQ sweep: recall/ms per (M, opq, nprobe, kf) point",
    "pq_default_ladder.json": "per-tier PQ default ladder: rungs walked + chosen",
    "pq_split4_ladder.json": "100M refined-quantizer (nlist=4096) ladder",
    "pq_parent_default.json": "100M nlist=1024 default point (r07 record)",
    "nlist1024_comparator.json": "100M nlist=1024 comparator rung (one-shot, r07)",
    "h2h_nlist.json": "100M quantizer head-to-head: >=3 interleaved rounds"
    " per side, median + min/max spread, winner + decided flag",
    "pq_h2h_default.json": "100M default point chosen by the h2h artifact",
    "opq_rungs.json": "OPQ-vs-plain rung pair at matched operating point",
    "params.json": "calibrated (multipler, std_m) per (k, bound) config"
    " with margin-val escalations",
}

TIERS = {"1m": N, "10m": N10, "100m": N100}


def main() -> int:
    out_root = REPO / "evidence"
    out_root.mkdir(exist_ok=True)
    index: dict[str, dict] = {}
    for tier, n in TIERS.items():
        cache = _cache_dir(n)
        if not cache.exists():
            continue
        for name, desc in ARTIFACTS.items():
            src = cache / name
            if not src.exists():
                continue
            dst = out_root / f"{tier}_{name}"
            shutil.copyfile(src, dst)
            with open(src) as f:
                d = json.load(f)
            index[dst.name] = {
                "tier": tier,
                "describes": desc,
                "kernel": d.get("kernel"),
            }
    # high-d rung lives in its own cache dir (d=960 fixture)
    hd_src = (
        _cache_dir(N).parent / "hd_n1000000_d960_nlist256" / "highd_opq_rungs.json"
    )
    if hd_src.exists():
        dst = out_root / "hd_highd_opq_rungs.json"
        shutil.copyfile(hd_src, dst)
        with open(hd_src) as f:
            d = json.load(f)
        index[dst.name] = {
            "tier": "1m_d960",
            "describes": "1M x d960 anisotropic rung: plain-PQ vs OPQ"
            " recall/latency pairs at matched operating points",
            "kernel": d.get("kernel"),
        }
    with open(out_root / "INDEX.json", "w") as f:
        json.dump(index, f, indent=1, sort_keys=True)
    print(json.dumps({"collected": sorted(index)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
