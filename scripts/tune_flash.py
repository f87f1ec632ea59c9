#!/usr/bin/env python
"""Flash-attention block-size autotuner.

Sweeps (block_q, block_k) over the counterfactual workload's attention
shapes on the current backend and writes the best configs to
``counterfactualworldmodels_tpu/ops/flash_tuned.json``, which
``_pick_blocks`` consults before its heuristic. Run on a TPU host:

    python scripts/tune_flash.py            # bench shapes, S=16
    python scripts/tune_flash.py --s 32 64  # more sample batches

Never wrap in `timeout` on the axon platform (wedges the compile queue).
"""
import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def candidate_blocks(n, nk):
    # 16-aligned only: the bf16 native tile is (16, 128) — 8-multiples
    # pass interpret mode but can fail/mistile under Mosaic on hardware
    # (ops/flash_attention.py:_pick_blocks enforces the same); the score
    # tile cap matches _SCORE_TILE_BYTES so archived entries are never
    # rejected by the loader's validation. The v2 kernel unrolls
    # exact-divisor key chunks, so k candidates are divisors of the
    # 16-padded panel (big chunks = few unrolled islands)
    qs = sorted({d for d in range(128, min(512, n) + 1, 16)
                 if n % d == 0} | {256, -(-n // 16) * 16 if n < 256
                                   else 256})
    nk16 = -(-nk // 16) * 16
    ks = sorted({d for d in range(256, nk16 + 1, 16) if nk16 % d == 0}
                | {512, min(nk16, 1568)})
    return [(q, k) for q in qs for k in ks
            if q % 16 == 0 and k % 16 == 0
            and q * k * 4 <= 5 * 1024 * 1024][:24]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--s', type=int, nargs='+', default=[16])
    ap.add_argument('--iters', type=int, default=8)
    ap.add_argument('--only-2src', action='store_true',
                    help='skip the single-source sweeps (whose padded '
                         'K/V copies OOM at large --s) and tune only the '
                         'two-source records')
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(__file__), '..', 'counterfactualworldmodels_tpu',
        'ops', 'flash_tuned.json'))
    args = ap.parse_args()

    import numpy as np
    # a dead axon relay hangs the first jax touch forever; probe in a
    # subprocess first (same guard as bench.py / latency_bench.py)
    from counterfactualworldmodels_tpu.utils.backend_guard import (
        ensure_live_backend)
    ensure_live_backend(__file__)
    import jax
    import jax.numpy as jnp
    from counterfactualworldmodels_tpu.utils.cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    from counterfactualworldmodels_tpu.ops.flash_attention import (
        flash_attention)

    if jax.default_backend() != 'tpu':
        print('tuner requires TPU (interpret mode timings are meaningless)',
              file=sys.stderr)
        return 1

    # ViT-L 4x4 @224: encoder prefix (n0 x n0, 16 heads), decoder prefix,
    # decoder suffix (n1 queries vs n0+n1 keys, 8 heads). The persisted
    # table is keyed by (nq, nk, d) ONLY (matching _pick_blocks' lookup),
    # so tune each shape once — at the first (production) --s — rather
    # than letting later batch sizes silently overwrite the entry
    shapes = []
    n0 = 3136
    if not args.only_2src:
        shapes += [
            ('enc_prefix', 1, 16, n0, n0, 64),
            ('dec_prefix', 1, 8, n0, n0, 64),
            ('dec_suffix', args.s[0], 8, n0, 2 * n0, 64),
        ]

    rng = np.random.RandomState(0)
    table = {}
    for name, b, h, nq, nk, d in shapes:
        q = jnp.asarray(rng.randn(b, h, nq, d).astype(np.float32),
                        jnp.bfloat16) * 0.125
        k = jnp.asarray(rng.randn(b, h, nk, d).astype(np.float32),
                        jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, h, nk, d).astype(np.float32),
                        jnp.bfloat16)
        best = None
        for bq, bk in candidate_blocks(nq, nk):
            try:
                out = flash_attention(q, k, v, block_q=bq, block_k=bk)
                float(jnp.sum(jnp.abs(out).astype(jnp.float32)))  # warm
                t0 = time.perf_counter()
                acc = jnp.float32(0)
                for _ in range(args.iters):
                    acc = acc + jnp.sum(jnp.abs(flash_attention(
                        q, k, v, block_q=bq, block_k=bk)).astype(jnp.float32))
                float(acc)
                dt = (time.perf_counter() - t0) / args.iters * 1e3
            except Exception as e:
                print(f'{name} ({bq},{bk}): {type(e).__name__}',
                      file=sys.stderr)
                continue
            print(f'{name} ({bq:4d},{bk:5d}): {dt:7.2f} ms', file=sys.stderr)
            if best is None or dt < best[0]:
                best = (dt, bq, bk)
        if best:
            table[f'{nq}x{nk}x{d}'] = {'v': 2, 'block_q': best[1],
                                       'block_k': best[2],
                                       'ms': round(best[0], 3),
                                       'shape': [b, h, nq, nk, d],
                                       'name': name}
    # merge into any existing archive rather than clobbering it: a run
    # where every candidate failed (broken kernel on this TPU gen) must
    # not erase a previously tuned table with an empty one
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
        merged.update(table)
        table = merged
    if not any(not k.startswith('two_source') for k in table):
        print('no shape tuned successfully; leaving the archive untouched',
              file=sys.stderr)
        return 1

    # --- two-source kernel: compile check + delta vs the concat
    # formulation at the engine's decoder-suffix shapes. No block knobs of
    # its own — it derives blocks via _pick_blocks, so persist the table
    # tuned above FIRST and reset the in-process cache, making both
    # measurements use the freshly tuned configs. This answers the open
    # r02 question of whether flash_attention_prefix compiles on hardware
    # and whether it beats the broadcast+concat fallback
    # (CWM_FLASH_TWO_SOURCE=0).
    with open(args.out, 'w') as f:
        json.dump(table, f, indent=1)
    import counterfactualworldmodels_tpu.ops.flash_attention as fa
    if os.path.realpath(args.out) == os.path.realpath(
            os.path.join(os.path.dirname(fa.__file__), 'flash_tuned.json')):
        fa._TUNED_TABLE = None  # re-read the table just written
    else:
        fa._TUNED_TABLE = table  # --out elsewhere: inject directly
    from counterfactualworldmodels_tpu.ops.flash_attention import (
        flash_attention_prefix)
    # (name, n0, n1, h): plain decoder suffix (the conjoined engine adds
    # only its 64 null-padding rows to n1), plus the pooled-prefix
    # variants (prefix panel /4 and /16 keys)
    two_src_shapes = [
        ('dec_suffix_2src', 3136, 3136, 8),
        ('dec_suffix_2src_pool2', 784, 3136, 8),
        ('dec_suffix_2src_pool4', 196, 3136, 8),
    ]
    for s in args.s:
        for name2, n0, n1, h in two_src_shapes:
            d = 64
            q = jnp.asarray(rng.randn(s, h, n1, d).astype(np.float32),
                            jnp.bfloat16) * 0.125
            k0 = jnp.asarray(rng.randn(1, h, n0, d).astype(np.float32),
                             jnp.bfloat16)
            v0 = jnp.asarray(rng.randn(1, h, n0, d).astype(np.float32),
                             jnp.bfloat16)
            k1 = jnp.asarray(rng.randn(s, h, n1, d).astype(np.float32),
                             jnp.bfloat16)
            v1 = jnp.asarray(rng.randn(s, h, n1, d).astype(np.float32),
                             jnp.bfloat16)

            def t_of(fn):
                float(jnp.sum(jnp.abs(fn()).astype(jnp.float32)))
                t0 = time.perf_counter()
                acc = jnp.float32(0)
                for _ in range(args.iters):
                    acc = acc + jnp.sum(jnp.abs(fn()).astype(jnp.float32))
                float(acc)
                return (time.perf_counter() - t0) / args.iters * 1e3

            # sweep the two-source kernel's own blocks (panel chunks need
            # not match the single-source entries) and archive the best as
            # a '2src:' record flash_attention_prefix consults first. The
            # prefix chunk is capped at the panel (ck0 = min(ck, n0)).
            best2 = None
            for bq, ck in [(448, 1568), (448, 784), (448, 3136),
                           (224, 1568), (448, 448), (224, 3136),
                           (448, 196), (448, 1045)]:
                if bq * ck * 4 > 5 * 1024 * 1024 or (n1 % ck and ck > n0):
                    continue
                ck0 = min(ck, n0)
                if n0 % ck0 or n1 % ck:
                    continue
                try:
                    dt = t_of(lambda: flash_attention_prefix(
                        q, k0, v0, k1, v1, block_q=bq, block_k0=ck0,
                        block_k1=ck))
                except Exception as e:
                    print(f'{name2} ({bq},{ck}): {type(e).__name__}',
                          file=sys.stderr)
                    continue
                print(f'{name2} ({bq:4d},{ck:5d}): {dt:7.2f} ms',
                      file=sys.stderr)
                if best2 is None or dt < best2[0]:
                    best2 = (dt, bq, ck0, ck)
            if best2 is not None and s == args.s[0]:
                table[f'2src:{n1}x{n0}x{n1}x{d}'] = {
                    'v': 2, 'block_q': best2[1], 'block_k0': best2[2],
                    'block_k1': best2[3], 'ms': round(best2[0], 3),
                    'shape': [s, h, n0, n1, d], 'name': name2}
            with open(args.out, 'w') as f:
                json.dump(table, f, indent=1)
            if os.path.realpath(args.out) == os.path.realpath(
                    os.path.join(os.path.dirname(fa.__file__),
                                 'flash_tuned.json')):
                fa._TUNED_TABLE = None
            else:
                fa._TUNED_TABLE = table
        # two-source vs broadcast+concat comparison at the PLAIN decoder
        # suffix shape (q/k0/v0/k1/v1 are the last-iterated pooled shape,
        # so rebuild the plain panels here)
        h, n0, n1, d = 8, 3136, 3136, 64
        q = jnp.asarray(rng.randn(s, h, n1, d).astype(np.float32),
                        jnp.bfloat16) * 0.125
        k0 = jnp.asarray(rng.randn(1, h, n0, d).astype(np.float32),
                         jnp.bfloat16)
        v0 = jnp.asarray(rng.randn(1, h, n0, d).astype(np.float32),
                         jnp.bfloat16)
        k1 = jnp.asarray(rng.randn(s, h, n1, d).astype(np.float32),
                         jnp.bfloat16)
        v1 = jnp.asarray(rng.randn(s, h, n1, d).astype(np.float32),
                         jnp.bfloat16)
        entry = {'shape': [s, h, n0, n1, d], 'name': 'dec_suffix_2src'}
        try:
            entry['two_source_ms'] = round(
                t_of(lambda: flash_attention_prefix(q, k0, v0, k1, v1)), 3)
            entry['compiles'] = True
        except Exception as e:
            entry['compiles'] = False
            entry['error'] = f'{type(e).__name__}: {e}'[:300]
            print(f'two-source S={s}: COMPILE FAILED {type(e).__name__}',
                  file=sys.stderr)
        try:
            kf = jnp.concatenate(
                [jnp.broadcast_to(k0, (s,) + k0.shape[1:]), k1], axis=2)
            vf = jnp.concatenate(
                [jnp.broadcast_to(v0, (s,) + v0.shape[1:]), v1], axis=2)
            entry['concat_ms'] = round(
                t_of(lambda: flash_attention(q, kf, vf)), 3)
        except Exception as e:  # e.g. OOM at large --s: keep the partials
            entry['concat_error'] = f'{type(e).__name__}: {e}'[:300]
            print(f'concat S={s}: FAILED {type(e).__name__}',
                  file=sys.stderr)
        if entry.get('compiles') and 'concat_ms' in entry:
            entry['speedup_vs_concat'] = round(
                entry['concat_ms'] / entry['two_source_ms'], 3)
            print(f"two-source S={s}: {entry['two_source_ms']} ms vs concat "
                  f"{entry['concat_ms']} ms", file=sys.stderr)
        table[f'two_source_s{s}'] = entry
        # persist incrementally: a crash at a later S keeps earlier results
        with open(args.out, 'w') as f:
            json.dump(table, f, indent=1)

    with open(args.out, 'w') as f:
        json.dump(table, f, indent=1)
    print(json.dumps({'tuned': list(table), 'out': args.out}))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
