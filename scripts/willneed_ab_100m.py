"""Cold-IO A/B at the FLAGSHIP 100M tier: `_willneed_rows` coalesced
readahead at real pool density (VERDICT r10 Next #2 — the 10M A/B
measured the hint winning on wall (13.9 vs 16.5 ms/q) while reading
+55% bytes; 100M density is ~1/62 vs 10M's ~1/6, so the bridge
inflation and the benefit both change regime).

Three arms, one per process (the env kill-switch must be set before
the JVM forks its Python workers):
  SPARK_GRAFT_REFINE_WILLNEED=0                       — no hint
  SPARK_GRAFT_REFINE_WILLNEED=1 (INFL default 2.0)    — gated hint
  SPARK_GRAFT_REFINE_WILLNEED=1 INFL=0                — r10 ungated
Protocol mirrors willneed_ab_10m.py: warm-up search (JIT), then evict
scan source + refine sidecar with POSIX_FADV_DONTNEED, reset the
paced prefetch, time the calibrated CONFIGS_10M diagonal, record
diskstats bytes per arm.

Usage: SPARK_GRAFT_REFINE_WILLNEED={0|1}
       [SPARK_GRAFT_REFINE_WILLNEED_INFL=0] python scripts/willneed_ab_100m.py
"""
import os, sys, time, json

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")

from auncel_spark.session import get_spark
import scale_bench as sb
from auncel_spark.index.ivf import IVFIndex
from willneed_ab_10m import evict

N = int(os.environ.get("SPARK_GRAFT_SCALE_N", 100_000_000))
ARM = os.environ.get("SPARK_GRAFT_REFINE_WILLNEED", "1")
INFL = os.environ.get("SPARK_GRAFT_REFINE_WILLNEED_INFL", "2.0")


def main():
    spark = get_spark(f"willneed_ab100m_{ARM}_{INFL}")
    cache = sb._cache_dir(N)
    idx = IVFIndex.load(spark, str(cache / "ivf"))
    assert idx._use_replica, "coded scan not active — replica missing?"
    ep, params, _ = sb.ensure_profile(spark, cache, idx, configs=sb.CONFIGS_10M)
    gt = sb.ensure_gt(spark, cache, idx)
    # base_id 20_000_000 exactly as scale_bench.run() pins it for every
    # tier (bound_satisfaction indexes gt by qid − base_id)
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
    out = {"n": N, "arm_willneed": ARM, "infl": INFL, "configs": {}}
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
    path = f"BENCH_RUNS/willneed_ab_100m_arm{ARM}_infl{INFL}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
