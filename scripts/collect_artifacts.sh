#!/bin/bash
# Collect the round's performance/fidelity artifacts on a TPU host.
#
# Runs, in order: the headline bench, the sample-batch-size sweep, the
# single-prediction latency distribution, and the shared-prefix fidelity
# report — writing the JSON artifacts the docs reference at the repo root.
#
# Never use `timeout` around these on the axon TPU platform: killing a
# client mid-compile wedges the remote-compile queue for every later job.
set -u
cd "$(dirname "$0")/.."
R="${1:-r02}"

echo "== bench (S=16) =="
python bench.py | tee "BENCH_${R}_local.json"

echo "== sample-batch sweep =="
python scripts/bench_sweep.py --out "SWEEP_${R}.json"

echo "== latency =="
python scripts/latency_bench.py | tee "LATENCY_${R}.json"

echo "== fidelity (ViT-L + conjoined, demo images) =="
python scripts/fidelity_report.py --out "FIDELITY_${R}.json"

echo "== conjoined (IMU) workload bench =="
python scripts/bench_conjoined.py --out "BENCH_CONJ_${R}.json"

echo "== serving load (micro-batching on vs off) =="
python scripts/loadgen.py --out "SERVING_${R}.json"

echo "== training throughput (vmae/conjoined/raft steps) =="
python scripts/bench_train.py --out "BENCH_TRAIN_${R}.json"

echo "== data-loader throughput (host-side) =="
python scripts/bench_loader.py --out "BENCH_LOADER_${R}.json"

echo "== done; artifacts: =="
ls -la BENCH_${R}_local.json SWEEP_${R}.json LATENCY_${R}.json \
   FIDELITY_${R}.json BENCH_CONJ_${R}.json SERVING_${R}.json \
   BENCH_TRAIN_${R}.json 2>/dev/null
