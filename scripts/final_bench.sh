#!/bin/bash
set -x
cd /root/repo
export SPARK_GRAFT_WRITE_LOCAL=1
export SPARK_GRAFT_SCALE_REPEATS=1
export SPARK_GRAFT_PQ_RUNS=2
python bench.py > BENCH_RUNS/final_bench.out 2> BENCH_RUNS/final_bench.log
rc=$?
echo "bench rc=$rc $(date +%H:%M:%S)"
if [ $rc -eq 0 ] && [ -s BENCH_LOCAL.json ]; then
  python scripts/collect_evidence.py
  git add BENCH_LOCAL.json evidence/
  git commit -q -m "Commit the r07 final bench record and evidence snapshots

BENCH_LOCAL.json is the SPARK_GRAFT_WRITE_LOCAL=1 full run of this
session (catalog sf0.1 + 1M/10M/100M tiers, warm+cold, single-repeat
grids; the driver's own record carries median-of-2). evidence/ holds
the kernel-stamped ladder/curve/params artifacts the README and STATUS
cite, copied from the gitignored scale cache."
  echo "committed $(git log --oneline -1)"
fi
