"""Sample-batch-size scaling sweep of the counterfactual benchmark.

Runs bench.py's workload at several per-scene sample counts S and records
throughput. Backs the engineering claim that the shared-prefix engine
amortizes scene-level work: per-sim cost falls with S until the per-sample
stages saturate the chip.

Writes SWEEP_r{N}.json (one JSON object) and prints it.
"""
import argparse
import json
import os
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sizes', type=int, nargs='+',
                    default=[8, 16, 32, 64, 128])
    ap.add_argument('--out', default='SWEEP_r02.json')
    args = ap.parse_args()

    rows = []
    for s in args.sizes:
        env = dict(os.environ, CWM_BENCH_S=str(s))
        out = subprocess.run([sys.executable,
                              os.path.join(os.path.dirname(__file__), '..',
                                           'bench.py')],
                             env=env, capture_output=True, text=True)
        line = [l for l in out.stdout.splitlines() if l.startswith('{')]
        if not line:
            print(f'S={s}: bench failed\n{out.stderr[-2000:]}',
                  file=sys.stderr)
            continue
        rec = json.loads(line[-1])
        # keep each row's engine/backend: bench.py can degrade or CPU-fall
        # back per invocation, and a mixed curve must be readable as such
        rows.append({'s': s, 'sims_per_sec': rec['value'],
                     'mfu_vs_v5e_peak': rec.get('mfu_vs_v5e_peak'),
                     'stages': rec.get('stages'),
                     'config': rec.get('config')})
        print(f"S={s}: {rec['value']} sims/s "
              f"({rec.get('config', {}).get('engine')}, "
              f"{rec.get('config', {}).get('backend')})", file=sys.stderr)

    report = {'workload': 'bench.py (ViT-L 4x4 224px, RAFT-24, '
                          'shared-prefix engine)',
              'rows': rows}
    with open(args.out, 'w') as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == '__main__':
    main()
