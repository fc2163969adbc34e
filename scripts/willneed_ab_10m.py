"""Cold-IO A/B at the 10M tier: `_willneed_rows` coalesced readahead
(VERDICT r09 Next #1 — the fix landed post-bench in r09, unmeasured).

One arm per process (the env kill-switch must be set before the JVM
forks its Python workers): SPARK_GRAFT_REFINE_WILLNEED=1 vs =0, both
under SPARK_GRAFT_CODED_SCAN=1 (SQ8 scan + exact refine — the layout
whose refine preads the hint accelerates). Protocol mirrors
scale_bench's cold grid: warm-up search first (JIT/codegen), then
evict the scan source + refine sidecar with POSIX_FADV_DONTNEED,
reset the paced prefetch, and time the calibrated CONFIGS_10M grid.

Usage: SPARK_GRAFT_REFINE_WILLNEED={0|1} python scripts/willneed_ab_10m.py
"""
import os, sys, time, json

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
os.environ["SPARK_GRAFT_CODED_SCAN"] = "1"
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
import numpy as np

from auncel_spark.session import get_spark
import scale_bench as sb
from auncel_spark.index.ivf import IVFIndex

ARM = os.environ.get("SPARK_GRAFT_REFINE_WILLNEED", "1")


def evict(roots):
    """POSIX_FADV_DONTNEED every file under roots; returns GB evicted."""
    total = 0
    for root in roots:
        if os.path.isfile(root):
            files = [root]
        else:
            files = [
                os.path.join(dp, f)
                for dp, _, fs in os.walk(root) for f in fs
            ]
        for p in files:
            try:
                fd = os.open(p, os.O_RDONLY)
            except OSError:
                continue
            try:
                os.fsync(fd)
            except OSError:
                pass
            try:
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
                total += os.path.getsize(p)
            finally:
                os.close(fd)
    return round(total / 1e9, 2)


def main():
    spark = get_spark(f"willneed_ab_{ARM}")
    cache = sb._cache_dir(10_000_000)
    idx = IVFIndex.load(spark, str(cache / "ivf"))
    assert idx._use_replica, "coded scan not active — replica missing?"
    ep, params, _ = sb.ensure_profile(
        spark, cache, idx, configs=sb.CONFIGS_10M
    )
    gt = sb.ensure_gt(spark, cache, idx)
    test = spark.createDataFrame(
        sb._gen_queries_pdf(11, sb.N_TEST, 20_000_000)
    ).cache()
    test.count()

    # warm-up, untimed: JIT/codegen + Arrow spin-up on the first config
    idx.scan_source()[0].count()
    k_w, b_w = sb.CONFIGS_10M[0]
    p = params[(k_w, b_w)]
    ep.multipler, ep.std_m = p["multipler"], p["std_m"]
    ep.search(test, k_w, require_acc=1.0 - b_w).count()

    roots = [
        os.path.join(idx.data_path, "lists_sq8"),
        os.path.join(idx.data_path, "refine"),
    ]
    out = {"arm_willneed": ARM, "configs": {}}
    for k, bound in sb.CONFIGS_10M:
        p = params[(k, bound)]
        ep.multipler, ep.std_m = p["multipler"], p["std_m"]
        gb = evict(roots)
        idx.reset_prefetch()
        ds0 = sb._diskstats()
        t0 = time.perf_counter()
        res = ep.search(test, k, require_acc=1.0 - bound)
        pdf = res.toPandas()
        wall = time.perf_counter() - t0
        ds1 = sb._diskstats()
        minf = sb.bound_satisfaction(pdf, gt, k)
        rec = {
            "ms_per_query": round(wall / sb.N_TEST * 1000.0, 3),
            "bound_satisfaction": round(minf, 4),
            "holds": bool(minf >= 1.0 - bound - 1e-9),
            "evicted_gb": gb,
        }
        if ds0 and ds1:
            rgb = ds1["read_gb"] - ds0["read_gb"]
            rec["disk_read_gb"] = round(rgb, 2)
            rec["eff_mb_s"] = round(rgb * 1000.0 / max(wall, 1e-9), 1)
        out["configs"][f"k{k}_b{int(bound * 100)}"] = rec
        print(json.dumps({f"k{k}_b{int(bound*100)}": rec}), flush=True)
    path = f"BENCH_RUNS/willneed_ab_10m_arm{ARM}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
