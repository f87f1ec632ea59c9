#!/bin/bash
# Round-5 follow-up TPU artifact run: the stages that crashed on the
# stolen-decorator bug (fixed in e34a7b3) plus the f32 decomposition leg
# that OOM'd before the wide-dtype VMEM gate existed. Sequential — one
# chip job at a time (parallel jobs contend on the single tunnel chip).
cd /root/repo

echo "=== 2b. fidelity f32 decomposition leg (now unblocked) ==="
timeout 9000 python scripts/fidelity_report.py --model large --samples 8 \
    --max-images 1 --prefix-pools '4:4:tanh' --conjoined off \
    --out /tmp/fid_decompose.json > /tmp/fid_r05b.log 2>&1
echo "fidelity exit=$?"; tail -c 400 /tmp/fid_r05b.log; echo
python - <<'EOF'
import json
try:
    dec = json.load(open('/tmp/fid_decompose.json'))
    main = json.load(open('FIDELITY_r05_tpu.json'))
    main['bf16_vs_isolation_decomposition'] = \
        dec['bf16_vs_isolation_decomposition']
    with open('FIDELITY_r05_tpu.json', 'w') as f:
        json.dump(main, f, indent=1)
    print('merged decomposition into FIDELITY_r05_tpu.json')
except Exception as e:
    print('merge failed:', e)
EOF

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
