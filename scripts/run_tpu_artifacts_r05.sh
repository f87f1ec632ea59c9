#!/bin/bash
# Sequential round-5 TPU artifact run (one chip job at a time — parallel
# jobs contend on the single tunnel chip and contaminate timings).
# Each step has its own timeout and failures don't stop later steps.
cd /root/repo

echo "=== 0. headline bench ==="
timeout 9000 python bench.py > /tmp/bench_r05.log 2>&1
grep -E '^\{' /tmp/bench_r05.log | tail -1 | tee BENCH_r05_local.json

echo "=== 1. hardware kernel-parity pytest pass ==="
CWM_TEST_TPU=1 timeout 5400 python -m pytest \
    tests/test_flash_attention.py tests/test_raft.py \
    "tests/test_fast_vmae.py::test_multi_scene_stacked_caches_match_per_scene" \
    "tests/test_fast_vmae.py::test_suffix_two_source_matches_concat_engine" \
    "tests/test_fast_vmae.py::test_pooled_prefix_exact_for_constant_windows" \
    "tests/test_fast_vmae.py::test_pooled_prefix_fidelity_smoke" \
    "tests/test_fast_vmae.py::test_sfx_bucketing_matches_exact_width" \
    "tests/test_fast_vmae.py::test_sfx_bucketing_ragged_rows" \
    tests/test_fast_conjoined.py \
    -q -rA > TPUTEST_r05.txt 2>&1
echo "pytest exit=$? (tail)"; tail -3 TPUTEST_r05.txt

echo "=== 2. fidelity (TPU: rung ladder + end products + f32 decomposition) ==="
timeout 9000 python scripts/fidelity_report.py --model large --samples 8 \
    --max-images 2 --prefix-pools '2:2,2:2:tanh,4:4:tanh' --conjoined off \
    --out FIDELITY_r05_tpu.json > /tmp/fid_r05.log 2>&1
echo "fidelity exit=$?"; tail -c 600 /tmp/fid_r05.log; echo

echo "=== 3. train bench (remat ladder) ==="
timeout 9000 python scripts/bench_train.py --out BENCH_TRAIN_r05.json \
    > /tmp/btrain_r05.log 2>&1
echo "train exit=$?"; tail -2 /tmp/btrain_r05.log

echo "=== 4. latency (fused probes + tail diagnosis) ==="
timeout 5400 python scripts/latency_bench.py --iters 30 \
    > /tmp/latency_r05.log 2>&1
grep -E '^\{' /tmp/latency_r05.log | tail -1 > /tmp/latency_main.json
cat /tmp/latency_main.json | head -c 400; echo

echo "=== 5. serve first-request by prompt size (bucketed warmup) ==="
timeout 5400 python scripts/serve_latency.py --num-samples 4 \
    --max-prompt 16 --out /tmp/serve_latency.json > /tmp/servelat_r05.log 2>&1
echo "serve_latency exit=$?"; tail -2 /tmp/servelat_r05.log

python - <<'EOF'
import json
try:
    main = json.load(open('/tmp/latency_main.json'))
except Exception as e:
    main = {'error': str(e)}
try:
    main.update(json.load(open('/tmp/serve_latency.json')))
except Exception as e:
    main['serve_first_request_by_prompt_size'] = {'error': str(e)}
with open('LATENCY_r05.json', 'w') as f:
    json.dump(main, f, indent=1)
print('wrote LATENCY_r05.json')
EOF

echo "=== 6. conjoined bench ==="
timeout 5400 python scripts/bench_conjoined.py \
    --out BENCH_CONJOINED_r05.json > /tmp/conj_r05.log 2>&1
grep -E '^\{' /tmp/conj_r05.log | tail -1 | head -c 400; echo

echo "=== DONE ==="
