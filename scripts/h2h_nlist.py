"""100M quantizer head-to-head, adjudicated with interleaved medians.

VERDICT r07 Next #3/#4 + ADVICE #1: the r07 nlist decision compared a
one-shot comparator (50.2 ms) against a one-shot ladder rung (61.0 ms)
while the same config's fresh runs spread 55.8-107.4 ms — the gap under
adjudication was smaller than the run-to-run noise. This script runs
N>=3 INTERLEAVED rounds per side (interleaving shares any host IO/CPU
window drift across sides), records median + min/max spread per side,
and declares a winner ONLY when the medians' gap exceeds the overlap of
the recorded intervals. The artifact (h2h_nlist.json, kernel-stamped)
is the decision record the per-round bench replays instead of
re-measuring superseded configs.

Sides:
- parent1024: the pinned nlist=1024 quantizer at its recorded operating
  point (M32, nprobe 16, k_factor 32; recall 0.9084 at r07).
- split4096_parent: the refined nlist=4096 quantizer (split_ivfpq_lists)
  at its ladder point (nprobe 24, kf 32 — same recall), scanned with
  the r08 parent-grouped shared-LUT kernel.
- split4096_list: same index/point on the plain per-list kernel (the
  r07 loser) — the control that shows what the kernel change bought.

Usage: python scripts/h2h_nlist.py [--rounds N]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from scripts.scale_bench import (
    KERNEL_VERSION,
    N100,
    N_TEST,
    SCALE_ADC_FP32,
    _cache_dir,
    _dump_stamped,
    _gen_queries_pdf,
    _refine_point,
    _telemetry,
    _warm_read,
    ensure_gt,
    ensure_index_big,
)


def main() -> None:
    rounds = 3
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    from auncel_spark.session import get_spark
    from auncel_spark.index.ivfpq import IVFPQIndex

    spark = get_spark(
        "h2h_nlist", extra_conf={"spark.python.worker.reuse": "false"}
    )
    cache = _cache_dir(N100)
    idx, _ = ensure_index_big(spark, cache, N100)
    gt = ensure_gt(spark, cache, idx)
    test = spark.createDataFrame(_gen_queries_pdf(11, N_TEST, 20_000_000)).cache()
    test.count()

    parent = IVFPQIndex.load(spark, str(cache / "ivfpq_m32"))
    parent.adc_fp32 = SCALE_ADC_FP32
    split = IVFPQIndex.load(spark, str(cache / "ivfpq_m32_s4"))
    split.adc_fp32 = SCALE_ADC_FP32

    # warm protocol: flat lists (the refine source) + both code tables
    # synchronously page-cached — the head-to-head measures scan
    # compute, not IO lottery (125 GB RAM fits 37 + 3.9 + 3.7 GB)
    warm = _warm_read(
        [
            os.path.join(idx.data_path, "lists"),
            str(cache / "ivfpq_m32" / "lists"),
            str(cache / "ivfpq_m32_s4" / "lists"),
        ]
    )
    print(f"# warm {warm}", file=sys.stderr)
    idx._prefetch_done = True

    k = 10
    sides = [
        ("parent1024", parent, 16, 32, None),
        ("split4096_parent", split, 24, 32, "parent"),
        ("split4096_list", split, 24, 32, "list"),
    ]
    base = idx.data.select("id", "vec")
    out: dict = {"rounds": rounds, "k": k, "sides": {}}
    for name, pq, nprobe, kf, mode in sides:
        out["sides"][name] = {
            "nlist": pq.nlist,
            "nprobe": nprobe,
            "k_factor": kf,
            "scan_mode": mode,
            "runs": [],
        }
    def _pin_mode(mode):
        # ADVICE r08 #1: a side with mode=None must RESET the env var,
        # not inherit whatever the previous side pinned — reordering
        # sides or adding an enc_of-bearing side must not silently
        # change the kernel under test
        if mode is not None:
            os.environ["SPARK_GRAFT_SPLIT_SCAN"] = mode
        else:
            os.environ.pop("SPARK_GRAFT_SPLIT_SCAN", None)

    # one untimed warm-up pass per side (JIT/Arrow spin-up)
    for name, pq, nprobe, kf, mode in sides:
        _pin_mode(mode)
        _refine_point(pq, base, test, gt, k, nprobe, kf)
    for r in range(rounds):
        for name, pq, nprobe, kf, mode in sides:
            _pin_mode(mode)
            pt = _refine_point(pq, base, test, gt, k, nprobe, kf)
            out["sides"][name]["runs"].append(pt["ms_per_query"])
            out["sides"][name]["recall_at_10"] = pt["recall_at_10"]
            print(f"# round {r} {name}: {pt}", file=sys.stderr)
    os.environ.pop("SPARK_GRAFT_SPLIT_SCAN", None)

    for name, s in out["sides"].items():
        runs = sorted(s["runs"])
        s["ms_median"] = runs[len(runs) // 2]
        s["ms_min"], s["ms_max"] = runs[0], runs[-1]
        s["spread"] = round(runs[-1] / max(runs[0], 1e-9), 3)
    # adjudicate among sides meeting the recall target: best median
    # wins when the top-two intervals do NOT overlap ("decided");
    # under overlap the medians are statistically indistinguishable
    # and the winner falls back to MINIMAX (smallest recorded
    # worst-case run) — the robust choice when noise exceeds the gap
    # (the r07 failure mode this script exists to prevent).
    elig = [
        (s["ms_median"], n)
        for n, s in out["sides"].items()
        if s.get("recall_at_10", 0) >= 0.9
    ]
    elig.sort()
    out["winner"] = elig[0][1] if elig else None
    if len(elig) >= 2:
        w, ru = out["sides"][elig[0][1]], out["sides"][elig[1][1]]
        out["runner_up"] = elig[1][1]
        out["decided"] = bool(w["ms_max"] < ru["ms_min"])
        if not out["decided"]:
            by_minimax = sorted(
                (out["sides"][n]["ms_max"], n) for _, n in elig
            )
            out["winner"] = by_minimax[0][1]
            out["runner_up"] = by_minimax[1][1]
            out["winner_rule"] = "minimax (medians overlap)"
    else:
        out["decided"] = bool(elig)
    out["telemetry"] = _telemetry(spark)
    out["warm_load"] = warm
    _dump_stamped(cache / "h2h_nlist.json", out)
    print(json.dumps({**out, "kernel": KERNEL_VERSION}))


if __name__ == "__main__":
    main()
