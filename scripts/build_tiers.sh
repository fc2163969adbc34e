#!/bin/bash
# Serial scale-tier artifact build (fresh container). Strictly serial:
# r06 OOM post-mortem — never run two big-tier JVMs concurrently.
set -x
cd /root/repo
export SPARK_GRAFT_PQ_BUILD=1
ts() { date +%H:%M:%S; }

echo "=== 1M tier build+run start $(ts)"
SPARK_GRAFT_SCALE_N=1000000 python scripts/scale_bench.py > BENCH_RUNS/build_1m.json 2> BENCH_RUNS/build_1m.log
echo "=== 1M done rc=$? $(ts)"

echo "=== 10M tier build+run start $(ts)"
SPARK_GRAFT_SCALE_N=10000000 python scripts/scale_bench.py > BENCH_RUNS/build_10m.json 2> BENCH_RUNS/build_10m.log
echo "=== 10M done rc=$? $(ts)"

echo "=== 100M tier build start $(ts) (grid+cold deferred to final bench)"
# PQ_100M=0: the 100M PQ encode (~1h) is deferred — the adjudicated
# h2h evidence is committed (evidence/100m_h2h_nlist.json) and the
# round's critical path is the SQ8 replica swap (BUILD_REPLICA=1:
# codes + refine sidecar, then the flat lists are consumed in place)
SPARK_GRAFT_SCALE_N=100000000 SPARK_GRAFT_SCALE_GRID=0 SPARK_GRAFT_SCALE_COLD=0 SPARK_GRAFT_SCALE_TPUT=0 \
  SPARK_GRAFT_SCALE_PQ_100M=0 SPARK_GRAFT_BUILD_REPLICA=1 \
  python scripts/scale_bench.py > BENCH_RUNS/build_100m.json 2> BENCH_RUNS/build_100m.log
echo "=== 100M done rc=$? $(ts)"
