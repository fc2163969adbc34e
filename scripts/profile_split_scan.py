"""Phase-profile the coded IVFPQ scan: parent (nlist=1024) vs split
(nlist=4096) quantizer at the 10M tier, matched scanned-row fraction
(nprobe 16 vs 64). The r07 head-to-head at 100M showed the split index
SLOWER despite gathering 2.7x fewer coded rows per query; this
experiment names the phase that eats the win (VERDICT r07 Next #3)
before any kernel change.

Usage: python scripts/profile_split_scan.py [--runs N]
Writes a JSON summary to stdout; per-task dumps land under
/tmp/scan_prof_{parent,split}/.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.scale_bench import (
    N10,
    _cache_dir,
    _gen_queries_pdf,
    _refine_point,
    ensure_gt,
    ensure_index,
    ensure_ivfpq_split,
    ensure_corpus,
    N_TEST,
    SCALE_ADC_FP32,
)


def _agg(d: str) -> dict:
    tot: dict[str, float] = {}
    files = glob.glob(os.path.join(d, "task_*.json"))
    for fp in files:
        with open(fp) as f:
            rec = json.load(f)
        for k, v in rec.items():
            tot[k] = tot.get(k, 0.0) + v
    tot["n_tasks"] = len(files)
    return {k: round(v, 3) for k, v in tot.items()}


def main() -> None:
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    from auncel_spark.session import get_spark
    from auncel_spark.index.ivfpq import IVFPQIndex

    spark = get_spark(
        "profile_split_scan",
        extra_conf={"spark.python.worker.reuse": "false"},
    )
    cache = _cache_dir(N10)
    base_path = ensure_corpus(spark, cache, N10)
    idx, _ = ensure_index(spark, cache, base_path, N10)
    gt = ensure_gt(spark, cache, idx)
    test = spark.createDataFrame(_gen_queries_pdf(11, N_TEST, 20_000_000)).cache()
    test.count()

    base = spark.read.parquet(base_path).persist()
    base.count()

    parent = IVFPQIndex.load(spark, str(cache / "ivfpq_m32"))
    parent.adc_fp32 = SCALE_ADC_FP32
    os.environ["SPARK_GRAFT_PQ_BUILD"] = "1"
    split, build_s = ensure_ivfpq_split(spark, cache, idx, 32, 4)
    split.adc_fp32 = SCALE_ADC_FP32
    print(f"# split build {build_s:.1f}s", file=sys.stderr)

    out: dict = {"k": 10, "kf": 16, "runs": runs}
    sides = [
        ("parent", parent, 16),
        ("split", split, 64),
    ]
    # warm both (JIT + page cache), then interleave timed passes
    for name, pq, nprobe in sides:
        pq.data.count()
        _refine_point(pq, base, test, gt, 10, nprobe, 16)
    for name, pq, nprobe in sides:
        prof_dir = f"/tmp/scan_prof_{name}"
        shutil.rmtree(prof_dir, ignore_errors=True)
        out[name] = {"nprobe": nprobe, "nlist": pq.nlist, "pts": []}
    for _ in range(runs):
        for name, pq, nprobe in sides:
            os.environ["SPARK_GRAFT_SCAN_PROF"] = f"/tmp/scan_prof_{name}"
            pt = _refine_point(pq, base, test, gt, 10, nprobe, 16)
            out[name]["pts"].append(pt)
            os.environ.pop("SPARK_GRAFT_SCAN_PROF", None)
    for name, pq, nprobe in sides:
        out[name]["prof_sum"] = _agg(f"/tmp/scan_prof_{name}")
        ms = sorted(p["ms_per_query"] for p in out[name]["pts"])
        out[name]["ms_median"] = ms[len(ms) // 2]
        out[name]["recall"] = out[name]["pts"][0]["recall_at_10"]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
