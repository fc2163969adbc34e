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

# before any numpy import (see auncel_spark/session.py: THP-compaction
# first-touch tax on every >=4 MB numpy buffer)
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _tier_state_path() -> str:
    cache = os.environ.get(
        "SPARK_GRAFT_SCALE_CACHE", os.path.join(_REPO, ".scale_cache")
    )
    return os.path.join(cache, "driver_tier_rotation.json")


def _load_tier_state() -> dict:
    try:
        with open(_tier_state_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_tier_state(state: dict) -> None:
    try:
        os.makedirs(os.path.dirname(_tier_state_path()), exist_ok=True)
        with open(_tier_state_path(), "w") as f:
            json.dump(state, f)
    except OSError:
        pass


def main() -> None:
    # wall-clock budget (VERDICT r07 Next #1): BENCH_r07 was rc=124
    # because every tier ran unconditionally with heavy knobs and the
    # driver killed the process mid-ladder at ~60 min. The bench now
    # tracks elapsed time against SPARK_GRAFT_BENCH_BUDGET_S (default
    # 2700 s — inside the driver's observed window with headroom) and
    # enters a scale tier only if the remaining budget covers its last
    # recorded duration; skipped tiers emit an explicit marker pointing
    # at the committed evidence. The builder's final_bench.sh raises
    # the budget for the full committed record.
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "2700"))
    t_bench0 = time.perf_counter()
    tier_req = os.environ.get("SPARK_GRAFT_BENCH_TIER", "auto").lower()
    if "--tier" in sys.argv:
        tier_req = sys.argv[sys.argv.index("--tier") + 1].lower()
    tier_state = _load_tier_state()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0  # unknown scale tag; still run

    from auncel_spark.catalog import QUERIES
    from auncel_spark.session import get_spark

    spark = get_spark("auncel_bench")

    # host-speed fixture (VERDICT r09 Next #6): ~8 s of fixed GEMM +
    # uncached seq/rand IO so cross-round comparisons can separate
    # container drift from code regressions arithmetically (r09's
    # record was confounded by a ~1.3-1.5x slower container and the
    # adjudication had to lean on same-session A/B prose)
    try:
        from scripts.scale_bench import calibration_microbench

        calibration = calibration_microbench()
    except Exception as e:
        calibration = {"error": f"{type(e).__name__}: {e}"}

    # ---- scale-tier plan (decided BEFORE the catalog pass) ----------
    # When rotation reserves the window for the flagship 100M tier, the
    # tier must run FIRST: r09's record spent the catalog pass (~7 min)
    # and the 10M tier out of the same window and then budget-skipped
    # the reserved tier (VERDICT r09 Wrong #2). The reserved tier runs
    # in the DRIVER-SLIM profile (warm grid + throughput; cold grid and
    # the PQ-default pass stay builder-evidence) — the full tier as
    # shaped needs 2852 s, more than the whole driver window
    # (VERDICT r09 Missing #1).
    scale_enabled = os.environ.get("SPARK_GRAFT_SCALE_BENCH", "1") != "0"
    scale_out: dict = {}
    reserved_landed = False
    big_order: list[str] = []
    tier = tier_req
    if scale_enabled:
        from scripts.scale_bench import (
            BUDGET_DRIFT,
            N10,
            N100,
            _cache_dir,
            last_duration,
            pending_revalidation_sec,
            record_duration,
            run as scale_run,
        )

        def run_tier(
            key: str, n: int, default_est: float, build_est: float,
            force: bool = False, reserve_s: float = 0.0,
        ):
            """Enter a tier only if the remaining budget covers its
            last recorded duration under the current knob signature
            (x drift); with no cache the tier is ALWAYS skipped —
            a cold tier build must never start inside a bench run,
            whatever the budget (r07's 82-minute lesson; r10 third
            container: final_bench.sh's raised budget let --tier all
            start the ~20000 s, ~130 GB 100M build on a 80 GB-free
            box). Builds belong to scripts/build_tiers.sh /
            scale_bench.py standalone; SPARK_GRAFT_ALLOW_TIER_BUILD=1
            is the explicit opt-in for a bench-driven build.
            ``reserve_s`` withholds budget for work that must still
            run after this tier (the catalog pass, when the reserved
            big tier goes first)."""
            has_cache = (_cache_dir(n) / "params.json").exists()
            allow_build = (
                os.environ.get("SPARK_GRAFT_ALLOW_TIER_BUILD", "0") == "1"
            )
            est = (
                ((last_duration(key) or default_est) + pending_revalidation_sec(n))
                if has_cache
                else build_est
            ) * BUDGET_DRIFT
            left = budget_s - (time.perf_counter() - t_bench0) - reserve_s
            if (not has_cache and not allow_build) or (
                left < est and not force
            ):
                # note: `force` only overrides the BUDGET gate; the
                # no-cache guard always wins (even --tier 10m/100m) —
                # a cold tier build must never start inside a bench
                # run unless SPARK_GRAFT_ALLOW_TIER_BUILD=1 opts in
                # explicitly (ADVICE r10 #1)
                scale_out[key] = {
                    "skipped": "budget"
                    if has_cache
                    else "no build cache (scripts/build_tiers.sh, or"
                    " SPARK_GRAFT_ALLOW_TIER_BUILD=1 to build in-bench)",
                    "remaining_s": round(left, 1),
                    "needed_s": round(est, 1),
                    "evidence": "committed evidence/ + BENCH_LOCAL.json",
                }
                return
            t0 = time.perf_counter()
            try:
                scale_out[key] = scale_run(spark, n=n, budget_s=left)
                record_duration(key, time.perf_counter() - t0)
            except Exception as e:  # never let a tier kill the bench line
                scale_out[key] = {"error": f"{type(e).__name__}: {e}"}

        if tier in ("auto", "rotate"):
            if tier_state.get("next_big") == "scale_10m":
                big_order = ["scale_10m", "scale_100m"]
            else:
                big_order = ["scale_100m", "scale_10m"]
        elif tier == "all":
            big_order = ["scale_10m", "scale_100m"]
        else:
            big_order = [f"scale_{tier}"] if tier in ("10m", "100m") else []

        # low-core invocation (the driver's catalog-scaling probe): the
        # big-tier grids are shaped for the standard core count and
        # would eat the probe's whole budget at 8 cores, while the 1M
        # grid at BOTH core counts is exactly the non-degenerate
        # scaling signal the sf0.1 catalog cannot give (every catalog
        # query there is scheduling-bound, so 8v32 ratios sit at ~1 —
        # VERDICT r10 Next #7). Explicit --tier requests still win.
        cpus_now = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or "32")
        if cpus_now < 16 and tier in ("auto", "rotate", "all"):
            for key in big_order:
                scale_out[key] = {
                    "skipped": f"low-core invocation (cpus={cpus_now}):"
                    " big tiers run at the standard core count",
                }
            big_order = []

        reserved_100m_first = (
            tier in ("auto", "rotate")
            and bool(big_order)
            and big_order[0] == "scale_100m"
            and os.environ.get("SPARK_GRAFT_SCALE_100M", "1") != "0"
            and (_cache_dir(N100) / "params.json").exists()
        )
        if reserved_100m_first:
            # driver-slim profile: cold grid + PQ default off for this
            # one tier call (throughput keeps its own observed-duration
            # gate). Env knobs are part of the duration signature, so
            # slim runs key their own estimates; restored afterwards so
            # later tiers record under the invocation's own knobs.
            _saved = {
                k: os.environ.get(k)
                for k in ("SPARK_GRAFT_SCALE_COLD", "SPARK_GRAFT_SCALE_PQ_100M")
            }
            os.environ["SPARK_GRAFT_SCALE_COLD"] = "0"
            os.environ["SPARK_GRAFT_SCALE_PQ_100M"] = "0"
            try:
                run_tier(
                    "scale_100m", N100, 1300.0, 20000.0,
                    reserve_s=float(
                        os.environ.get("SPARK_GRAFT_CATALOG_RESERVE_S", "700")
                    ),
                )
            finally:
                for k, v in _saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
            reserved_landed = isinstance(scale_out.get("scale_100m"), dict) and (
                "configs" in scale_out["scale_100m"]
            )
            # alternate the rotation regardless of outcome: a budget-
            # skip here must not starve the 10M/1M tiers indefinitely
            # (ADVICE r09 #4)
            tier_state["next_big"] = "scale_10m"
            _save_tier_state(tier_state)
            if reserved_landed:
                scale_out["scale_100m"]["profile"] = "driver_slim"

    # warm the JVM + parquet footers AND the Python/Arrow worker pool
    # (first mapInArrow pays worker spin-up — ~4 s at local[32] — which
    # is process startup, not engine time; the reference's baselines
    # are steady-state on a warmed process too)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.count()
    emb.limit(64).mapInArrow(lambda it: it, emb.schema).count()

    # pre-fit the LAET GBT model: training a predictor is offline work
    # in the reference's protocol too, so it stays out of the timed
    # window (VERDICT r03 Wrong #3). The sharded HNSW graph build moves
    # off the timed path the same way (VERDICT r10 Next #4): the
    # reference treats index construction as offline, and the other
    # index queries already amortize their builds across the process —
    # the timed figure is the search + contract work. Declared in
    # OPTIMIZATION_r11.md (measurement change: hnsw_knn cold no longer
    # includes the one-time graph build).
    from auncel_spark.catalog import _hnsw_index, _laet_model

    if tier_req not in ("10m", "100m"):
        _laet_model(spark, sf_dir)
        _hnsw_index(spark, sf_dir)

    # cold pass: includes one-time index/profile builds (the catalog
    # caches structures per process). warm pass: steady-state query
    # latency over the prebuilt structures — the figure comparable to
    # BASELINE.md, which times queries against a loaded index.
    # streaming pipeline entries run micro-batch drains with tempdir
    # IO — correctness-gated by the driver, but not a query-latency
    # figure; keep them out of the timed headline set
    from auncel_spark.catalog import STREAMING_QUERIES

    # explicit single-big-tier invocation (--tier 10m|100m): skip the
    # catalog pass entirely so the whole budget window goes to the one
    # scale tier (VERDICT r08 Next #2)
    tier_only = tier_req in ("10m", "100m")
    timed = (
        {}
        if tier_only
        else {n: f for n, f in QUERIES.items() if n not in STREAMING_QUERIES}
    )
    timings: dict[str, float] = {}
    for name, fn in timed.items():
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        assert rows is not None
    # warm figures are per-query MEDIANS over n passes (default 3):
    # the r05 adjudication gap was single-sample records on a host
    # with ±2× IO/CPU windows — one dip must not set the round's
    # steady-state record (VERDICT r05 Next #7)
    n_warm = max(1, int(os.environ.get("SPARK_GRAFT_WARM_RUNS", "3")))
    warm_runs: list[dict[str, float]] = []
    for _ in range(n_warm):
        w: dict[str, float] = {}
        for name, fn in timed.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            w[name] = round(time.perf_counter() - t0, 3)
        warm_runs.append(w)
    warm = {
        name: sorted(w[name] for w in warm_runs)[n_warm // 2]
        for name in timed
    }

    # derived per-query latency figures comparable to BASELINE.md's
    # per-query-ms numbers (nq = embeddings rows with vec_id % 20 = 0;
    # bounded_knn_mixed_acc reuses the cached profile so it is the pure
    # bounded-search batch)
    nq = 0 if tier_only else emb.filter("vec_id % 20 = 0").count()
    derived = {"n_queries": nq}
    # r07: the bounded_knn catalog entry is now the convergence
    # contract (exhaustive probe — correctness, not latency), so the
    # bounded-search latency figure is timed directly on the REAL
    # bounded mode (uniform bound, the reference's flagship workload):
    # median of 3 warm batches over the already-fitted cached profile
    if nq:
        try:
            from auncel_spark.catalog import BOUND as _BOUND
            from auncel_spark.catalog import K as _K
            from auncel_spark.catalog import _fitted_profile

            ep, q = _fitted_profile(spark, sf_dir)
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                ep.search(q, _K, require_acc=1.0 - _BOUND).collect()
                runs.append(time.perf_counter() - t0)
            derived["bounded_search_ms_per_query"] = round(
                sorted(runs)[1] / nq * 1000.0, 2
            )
        except Exception:
            pass
    # exact_knn = l2 + ip tag-union (2 batches of nq queries each)
    if "exact_knn" in warm and nq:
        derived["exact_knn_qps"] = round(2 * nq / warm["exact_knn"], 1)

    # process-state snapshot after the 70-query catalog pass: the r05
    # open question was an in-bench vs standalone gap at the 10M tier
    # (8.6 vs 9.2-9.7 standalone vs 6.0 in r04); each scale tier also
    # snapshots at its own start/end (scripts/scale_bench._telemetry),
    # so heap/GC/worker-RSS growth across the run is attributable
    try:
        from scripts.scale_bench import _telemetry

        telemetry_headline = _telemetry(spark)
    except Exception as e:
        telemetry_headline = {"err": f"{type(e).__name__}: {e}"}

    out = {
        "metric": "scale_tier_wall_time" if tier_only else "headline_query_wall_time",
        "tier_mode": tier_req,
        "calibration": calibration,
        "telemetry_after_headline": telemetry_headline,
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "n_warm_runs": n_warm,
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
    #
    # 1M: the reference's eval/run.sh workload shape (full 9-config
    # grid + PQ sweep + effect_time). 10M: the reference's actual
    # single-node dataset scale, 3-config diagonal. 100M: 3.1M
    # rows/core — 38x the DEEP1B baseline's per-core volume.
    #
    # Tier selection (VERDICT r08 Next #2): both big tiers never fit
    # one driver budget window, so the bench ROTATES the big tier
    # across invocations — the reference splits its grid across run.sh
    # invocations the same way (Auncel/eval/run.sh:1-17) — via a
    # persisted `next_big` marker; an explicit `--tier X` /
    # SPARK_GRAFT_BENCH_TIER=X (1m|10m|100m|all) pins the choice. The
    # reserved 100M tier runs BEFORE the catalog pass in a driver-slim
    # profile (see the pre-pass above).
    if scale_enabled:
        out["budget_s"] = budget_s
        out.update(scale_out)  # reserved-tier pre-pass result, if any

        # 1M tier: the reserved big tier now runs FIRST, so the 1M
        # tier no longer pre-yields its window — it runs whenever the
        # remaining budget covers it (ADVICE r09 #4: the old pre-skip
        # could lose BOTH tiers when the 100M then budget-skipped)
        if tier in ("auto", "rotate", "all", "1m") or tier == "":
            run_tier("scale_1m", 1_000_000, 500.0, 2400.0)
        ran_big = reserved_landed
        for key in big_order:
            if key in out and key in scale_out:
                continue  # already ran in the reserved pre-pass
            n_big, dflt, bld = (
                (N10, 700.0, 3000.0)
                if key == "scale_10m"
                else (N100, 1800.0, 20000.0)
            )
            gate = "SPARK_GRAFT_SCALE_10M" if key == "scale_10m" else "SPARK_GRAFT_SCALE_100M"
            if os.environ.get(gate, "1") == "0":
                continue
            if ran_big and tier in ("auto", "rotate"):
                out[key] = {
                    "skipped": "tier rotation (one big tier per"
                    " invocation; runs next round)",
                }
                continue
            run_tier(key, n_big, dflt, bld, force=tier_only)
            out.update(scale_out)
            if isinstance(out.get(key), dict) and "configs" in out.get(key, {}):
                ran_big = True
                if tier in ("auto", "rotate") and key == big_order[0]:
                    # preferred tier landed: alternate next time
                    tier_state["next_big"] = (
                        "scale_10m" if key == "scale_100m" else "scale_100m"
                    )
                    _save_tier_state(tier_state)
        out.update(scale_out)

    if tier_only:
        out["value"] = round(time.perf_counter() - t_bench0, 3)
    line = json.dumps(out)
    # the full record is the committed file; the driver's stdout
    # capture keeps only the LAST 2000 chars (BENCH_r02/r03's long
    # lines were tail-truncated and failed its JSON parse), so stdout
    # gets a compacted line that always fits that window.
    # BENCH_LOCAL.json is written ONLY under SPARK_GRAFT_WRITE_LOCAL=1
    # (the builder's final run sets it): the driver's own bench run
    # used to clobber the committed record and leave the tree dirty
    # (VERDICT r05 Wrong #3) — it keeps a full timestamped record in
    # the gitignored BENCH_RUNS dir instead.
    try:
        if os.environ.get("SPARK_GRAFT_WRITE_LOCAL") == "1":
            with open(os.path.join(_REPO, "BENCH_LOCAL.json"), "w") as f:
                f.write(line + "\n")
        else:
            runs_dir = os.path.join(_REPO, "BENCH_RUNS")
            os.makedirs(runs_dir, exist_ok=True)
            stamp = time.strftime("%Y%m%dT%H%M%S")
            with open(os.path.join(runs_dir, f"bench_{stamp}.json"), "w") as f:
                f.write(line + "\n")
    except OSError:
        pass
    print(_compact_line(out))


def _compact_scale(s: dict) -> dict:
    """One scale section reduced to its headline scalars."""
    if not isinstance(s, dict) or "configs" not in s:
        if isinstance(s, dict) and "skipped" in s:
            # skip markers keep only the decision scalars on stdout —
            # the 'evidence' pointer lives in the full record
            return {
                k: s[k]
                for k in ("skipped", "remaining_s", "needed_s")
                if k in s
            }
        return s  # error markers pass through
    out = {
        "ms_q_mean": s.get("ms_per_query_mean"),
        "ms_q_worst": s.get("ms_per_query_worst"),
        "holds": s.get("all_bounds_hold"),
        # rows_per_core / tput_ms_q are derivable constants (tier size
        # / cores; 1000·lanes/qps) — BENCH_LOCAL.json keeps them; the
        # stdout line spends the chars on per-query timings instead
    }
    cold = s.get("cold_page_cache")
    if isinstance(cold, dict) and "ms_per_query_worst" in cold:
        out["cold_ms_q_mean"] = cold.get("ms_per_query_mean")
        out["cold_ms_q_worst"] = cold.get("ms_per_query_worst")
        out["cold_holds"] = cold.get("all_bounds_hold")
    tput = s.get("throughput")
    if isinstance(tput, dict) and "qps" in tput:
        out["tput_qps"] = tput.get("qps")
    pqd = s.get("ivfpq_default")
    if isinstance(pqd, dict) and "ms_per_query" in pqd:
        out["ivfpq_ms_q"] = pqd.get("ms_per_query")  # median over n_runs
        out["ivfpq_recall"] = pqd.get("recall_at_10")
        if "ms_per_query_min" in pqd:
            out["ivfpq_ms_min"] = pqd.get("ms_per_query_min")
            out["ivfpq_n_runs"] = pqd.get("n_runs")
        if "nlist" in pqd:  # refined-quantizer default (lists ∝ n)
            out["ivfpq_nlist"] = pqd.get("nlist")
    h2h = s.get("ivfpq_h2h")
    if isinstance(h2h, dict):
        out["h2h_winner"] = h2h.get("winner")
        out["h2h_decided"] = h2h.get("decided")
        if h2h.get("verdict_contradicted"):
            out["h2h_contradicted"] = True
    cmp1024 = s.get("ivfpq_nlist1024")
    if isinstance(cmp1024, dict) and "ms_per_query" in cmp1024:
        # superseded pinned-1024 point: the nlist head-to-head evidence
        out["ivfpq_1024_ms_q"] = cmp1024.get("ms_per_query")
        out["ivfpq_1024_recall"] = cmp1024.get("recall_at_10")
    alt4096 = s.get("ivfpq_nlist4096")
    if isinstance(alt4096, dict) and "ms_per_query" in alt4096:
        # refined-quantizer rung recorded as the losing side of the
        # head-to-head (r07: per-list scan overhead beat the 2.7x
        # gather reduction)
        out["ivfpq_4096_ms_q"] = alt4096.get("ms_per_query")
        out["ivfpq_4096_recall"] = alt4096.get("recall_at_10")
    if s.get("grid_runs_per_config", 1) > 1:
        out["grid_runs"] = s["grid_runs_per_config"]
    return out


def _compact_line(out: dict, budget: int = 1980) -> str:
    """The stdout line, guaranteed to fit the driver's 2000-char tail.

    The per-query timings ARE the driver's round-over-round contract
    (VERDICT r10 Wrong #1: the calibration block was placed before the
    queries and pushed the five smallest timings into '_rest_sum',
    which the PERF tool reported as dropped_from_bench), so ALL query
    timings are placed FIRST; the optional blocks — derived figures,
    compacted scale sections, calibration — are then added one at a
    time, highest adjudication value first, each only if the line
    still fits. '_rest_sum' survives only as a last-resort guard for a
    catalog far larger than today's ~50 entries. The complete record
    lives in BENCH_LOCAL.json."""
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
    }
    items = sorted(out["queries"].items(), key=lambda kv: -kv[1])
    queries: dict[str, float] = {}
    used = len(json.dumps(compact)) + len('"queries": {}, ')
    rest = 0.0
    for name, sec in items:
        entry = len(f'"{name}": {round(sec, 2)}, ')
        if used + entry < budget - 40:  # reserve room for _rest_sum
            queries[name] = round(sec, 2)
            used += entry
        else:
            rest += sec
    if rest:
        queries["_rest_sum"] = round(rest, 2)
    compact["queries"] = queries
    used = len(json.dumps(compact))  # exact, not the running estimate
    optional: list[tuple[str, object]] = [("derived", out.get("derived", {}))]
    # flagship tier first: its presence in the driver record is the
    # round's scale evidence (VERDICT r10 Next #2)
    for k in ("scale_100m", "scale_10m", "scale_1m"):
        if k in out:
            optional.append((k, _compact_scale(out[k])))
    optional.append(("calibration", out.get("calibration", {})))
    optional.append(("detail", "BENCH_LOCAL.json"))
    for key, val in optional:
        entry = len(json.dumps({key: val})) + 2
        if used + entry <= budget:
            compact[key] = val
            used += entry
    return json.dumps(compact)


if __name__ == "__main__":
    main()
