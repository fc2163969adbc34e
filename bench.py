"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall time over the headline set. Each query is fully
materialized (collect) — results are small (nq × k rows)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0  # unknown scale tag; still run

    from auncel_spark.catalog import QUERIES
    from auncel_spark.session import get_spark

    spark = get_spark("auncel_bench")

    # warm the JVM + parquet footers AND the Python/Arrow worker pool
    # (first mapInArrow pays worker spin-up — ~4 s at local[32] — which
    # is process startup, not engine time; the reference's baselines
    # are steady-state on a warmed process too)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.count()
    emb.limit(64).mapInArrow(lambda it: it, emb.schema).count()

    # cold pass: includes one-time index/profile builds (the catalog
    # caches structures per process). warm pass: steady-state query
    # latency over the prebuilt structures — the figure comparable to
    # BASELINE.md, which times queries against a loaded index.
    # streaming pipeline entries run micro-batch drains with tempdir
    # IO — correctness-gated by the driver, but not a query-latency
    # figure; keep them out of the timed headline set
    from auncel_spark.catalog import STREAMING_QUERIES

    timed = {n: f for n, f in QUERIES.items() if n not in STREAMING_QUERIES}
    timings: dict[str, float] = {}
    for name, fn in timed.items():
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        assert rows is not None
    warm: dict[str, float] = {}
    for name, fn in timed.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        warm[name] = round(time.perf_counter() - t0, 3)

    # derived per-query latency figures comparable to BASELINE.md's
    # per-query-ms numbers (nq = embeddings rows with vec_id % 20 = 0;
    # bounded_knn_mixed_acc reuses the cached profile so it is the pure
    # bounded-search batch)
    nq = emb.filter("vec_id % 20 = 0").count()
    derived = {"n_queries": nq}
    if "bounded_knn_mixed_acc" in warm and nq:
        derived["bounded_search_ms_per_query"] = round(
            warm["bounded_knn_mixed_acc"] / nq * 1000.0, 2
        )
    if "exact_knn_l2" in warm and nq:
        derived["exact_knn_qps"] = round(nq / warm["exact_knn_l2"], 1)

    out = {
        "metric": "headline_query_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "derived": derived,
        "sf": sf,
        # ADVICE r02: any ratio vs BASELINE.md's distributed numbers
        # must be read against per-core data volume; scale sections
        # report rows_per_core vs baseline_rows_per_core (81,380 =
        # DEEP1B 1e9 / 128 workers x 96 vCPU). scale_10m exceeds the
        # baseline's per-core volume (~4x), making its ratio
        # conservative; scale_1m is below it (~0.4x), flattering.
        "baseline_note": "compare via rows_per_core fields in scale sections",
    }

    # reference-workload scale bench (VERDICT r01 top item): 1M × d96,
    # IVF1024, eval/run.sh-shaped grid. Build artifacts cache under
    # .scale_cache so per-round reruns time only the online search.
    # Opt out with SPARK_GRAFT_SCALE_BENCH=0.
    if os.environ.get("SPARK_GRAFT_SCALE_BENCH", "1") != "0":
        try:
            from scripts.scale_bench import N10, run as scale_run

            out["scale_1m"] = scale_run(spark)
        except Exception as e:  # never let the scale path kill the bench line
            out["scale_1m"] = {"error": f"{type(e).__name__}: {e}"}
        # 10M × d96 — the reference's actual single-node dataset scale
        # (README.md §3). Representative 3-config diagonal; artifacts
        # cached, so warm reruns time only the online search.
        if os.environ.get("SPARK_GRAFT_SCALE_10M", "1") != "0":
            try:
                out["scale_10m"] = scale_run(spark, n=N10)
            except Exception as e:
                out["scale_10m"] = {"error": f"{type(e).__name__}: {e}"}

    line = json.dumps(out)
    # persist beside the repo as well: the driver's stdout capture
    # truncated BENCH_r02.json (ADVICE r02), losing the per-query
    # record — the committed file is the durable copy
    try:
        with open(os.path.join(_REPO, "BENCH_LOCAL.json"), "w") as f:
            f.write(line + "\n")
    except OSError:
        pass
    print(line)


if __name__ == "__main__":
    main()
