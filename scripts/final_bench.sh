#!/bin/bash
# Builder's final full-record run: unbounded budget, median-of-n
# repeats. The DRIVER's per-round bench runs with the light defaults
# (budget 2700 s, single-pass grids) — see bench.py / VERDICT r07
# Next #1.
set -x
cd /root/repo
export SPARK_GRAFT_WRITE_LOCAL=1
export SPARK_GRAFT_BENCH_BUDGET_S=100000
export SPARK_GRAFT_SCALE_REPEATS=1
export SPARK_GRAFT_PQ_RUNS=2
python bench.py > BENCH_RUNS/final_bench.out 2> BENCH_RUNS/final_bench.log
rc=$?
echo "bench rc=$rc $(date +%H:%M:%S)"
if [ $rc -eq 0 ] && [ -s BENCH_LOCAL.json ]; then
  python scripts/collect_evidence.py
  git add BENCH_LOCAL.json evidence/
  git commit -q -m "Commit the final bench record and evidence snapshots

BENCH_LOCAL.json is the SPARK_GRAFT_WRITE_LOCAL=1 full run of this
session (catalog sf0.1 + 1M/10M/100M tiers, warm+cold, PQ_RUNS=2
medians). evidence/ holds the kernel-stamped ladder/curve/params
artifacts the README and STATUS cite, copied from the gitignored
scale cache."
  echo "committed $(git log --oneline -1)"
fi
