#!/bin/bash
# Builder's final full-record run: unbounded budget, median-of-n
# repeats. The DRIVER's per-round bench runs with the light defaults
# (budget 2700 s, single-pass grids) — see bench.py / VERDICT r07
# Next #1.
set -x
cd /root/repo
export SPARK_GRAFT_WRITE_LOCAL=1
export SPARK_GRAFT_BENCH_BUDGET_S=100000
# knobs match the driver's light defaults EXACTLY (r1p1c1t0): tier
# durations are recorded per knob signature, and the whole point of
# this run is to prime the driver's budget gate with real durations so
# its 2700 s window admits the 100M tier (VERDICT r08 Next #2). The
# heavier medians (PQ_RUNS>1, TPUT_50K) live in separate one-off runs.
export SPARK_GRAFT_SCALE_REPEATS=1
export SPARK_GRAFT_PQ_RUNS=1
export SPARK_GRAFT_TPUT_50K=0
python bench.py --tier all > BENCH_RUNS/final_bench.out 2> BENCH_RUNS/final_bench.log
rc=$?
echo "bench rc=$rc $(date +%H:%M:%S)"
if [ $rc -eq 0 ] && [ -s BENCH_LOCAL.json ]; then
  python scripts/collect_evidence.py
  git add BENCH_LOCAL.json evidence/
  git commit -q -m "Commit the final bench record and evidence snapshots

BENCH_LOCAL.json is the SPARK_GRAFT_WRITE_LOCAL=1 full run of this
session (catalog sf0.1 + 1M/10M/100M tiers, warm+cold, driver-light
knobs so the recorded tier durations prime the driver's budget gate).
evidence/ holds the kernel-stamped ladder/curve/params artifacts the
README and STATUS cite, copied from the gitignored scale cache."
  echo "committed $(git log --oneline -1)"
fi
