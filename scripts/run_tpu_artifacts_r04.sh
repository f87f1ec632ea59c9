#!/bin/bash
# Sequential round-4 TPU artifact run (one chip job at a time — parallel
# jobs contend on the single tunnel chip and contaminate timings).
# Each step has its own timeout and failures don't stop later steps.
cd /root/repo

echo "=== 1. hardware kernel-parity pytest pass ==="
CWM_TEST_TPU=1 timeout 5400 python -m pytest \
    tests/test_flash_attention.py tests/test_raft.py \
    "tests/test_fast_vmae.py::test_multi_scene_stacked_caches_match_per_scene" \
    "tests/test_fast_vmae.py::test_suffix_two_source_matches_concat_engine" \
    "tests/test_fast_vmae.py::test_pooled_prefix_exact_for_constant_windows" \
    "tests/test_fast_vmae.py::test_pooled_prefix_fidelity_smoke" \
    tests/test_fast_conjoined.py \
    -q -rA > TPUTEST_r04.txt 2>&1
echo "pytest exit=$? (tail)"; tail -3 TPUTEST_r04.txt

echo "=== 2. suffix stage modes ==="
timeout 4000 python scripts/exp_suffix_stage.py --s 256 \
    --pools "1,2,2:2,2:2:tanh,4:4:tanh" > /tmp/stage_modes.log 2>&1
grep -E '^\{' /tmp/stage_modes.log

echo "=== 3. fidelity (TPU, pooled + tanh axes) ==="
timeout 7000 python scripts/fidelity_report.py --model large --samples 8 \
    --max-images 2 --prefix-pools '2:1,2:2,2:2:tanh' --conjoined off \
    --out FIDELITY_r04_pooled_tpu.json > /tmp/fid2.log 2>&1
tail -1 /tmp/fid2.log | head -c 600; echo

echo "=== 4. latency ==="
timeout 5400 python scripts/latency_bench.py --iters 30 \
    > /tmp/latency.log 2>&1
grep -E '^\{' /tmp/latency.log | tail -1 > LATENCY_r04.json
cat LATENCY_r04.json

echo "=== 5. train bench ==="
timeout 7000 python scripts/bench_train.py --out BENCH_TRAIN_r04.json \
    > /tmp/btrain.log 2>&1
tail -2 /tmp/btrain.log

echo "=== 6. conjoined bench (clean, solo) ==="
timeout 5400 python scripts/bench_conjoined.py \
    --out BENCH_CONJOINED_r04.json > /tmp/conj2.log 2>&1
grep -E '^\{' /tmp/conj2.log | tail -1 | head -c 400; echo

echo "=== 7. headline bench ==="
timeout 7000 python bench.py > /tmp/bench_final.log 2>&1
grep -E '^\{' /tmp/bench_final.log | tail -1 | tee BENCH_r04_local.json

echo "=== DONE ==="
