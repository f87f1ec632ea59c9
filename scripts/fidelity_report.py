"""Quantify shared-prefix engine fidelity vs the exact per-sample path.

Runs the full counterfactual pipeline (mask -> perturbation -> VMAE predict
-> RAFT flow) twice on real demo images — once through the exact model
(pipelines.segmentation.counterfactual_videos_and_flows) and once through
the shared-prefix engine (counterfactual_videos_and_flows_fast) — and
reports agreement statistics of the predicted videos and flow fields.

Writes FIDELITY_r{N}.json at the repo root (one JSON object) and prints it.

Usage: python scripts/fidelity_report.py [--samples 8] [--out FIDELITY.json]
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--samples', type=int, default=8)
    ap.add_argument('--images', default='/root/reference/demo/images/*.png')
    ap.add_argument('--max-images', type=int, default=3)
    ap.add_argument('--out', default='FIDELITY_r02.json')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--model', default='large', choices=['large', 'base'],
                    help='base is light enough for CPU smoke runs')
    ap.add_argument('--raft-iters', type=int, default=24)
    args = ap.parse_args()

    from counterfactualworldmodels_tpu.utils.backend_guard import (
        ensure_live_backend)
    ensure_live_backend(__file__)
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from counterfactualworldmodels_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from counterfactualworldmodels_tpu.models import vmae
    from counterfactualworldmodels_tpu.models.fast_vmae import stack_vmae_params
    from counterfactualworldmodels_tpu.models.raft.raft import (
        RAFT, init_raft_params)
    from counterfactualworldmodels_tpu.pipelines.segmentation import (
        counterfactual_videos_and_flows, counterfactual_videos_and_flows_fast)

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    factory = (vmae.large_4x4patch_2frames_1tube if args.model == 'large'
               else vmae.base_8x8patch_2frames_1tube)
    model = factory(dtype=dtype, attn_impl='flash' if on_tpu else 'dense')
    params = vmae.init_params(model, jax.random.PRNGKey(0))
    fp = stack_vmae_params(model, params)
    raft = RAFT(iters=args.raft_iters, dtype=dtype)
    raft_params = init_raft_params(raft, jax.random.PRNGKey(1), hw=64)

    n = model.num_patches
    npf = n // 2
    s = args.samples
    n_vis = npf + 32 + 1
    rng = np.random.RandomState(args.seed)

    paths = sorted(glob.glob(args.images))[:args.max_images]
    per_image = []
    for path in paths:
        img = Image.open(path).convert('RGB').resize((224, 224))
        x = jnp.asarray(np.asarray(img), jnp.float32).transpose(2, 0, 1)[None] / 255.
        x = jnp.stack([x, x], 1)[0][None]

        passive = np.ones((1, n, s), dtype=bool)
        passive[:, :npf] = False
        active = np.ones((1, n, s), dtype=bool)
        active[:, :npf] = False
        for i in range(s):
            passive[0, npf + rng.choice(npf, 32, replace=False), i] = False
            active[0, npf + rng.randint(npf), i] = False
        passive = jnp.asarray(passive)
        active = jnp.asarray(active)
        shifts = jnp.asarray(rng.randint(-3, 4, size=(1, s, 2)), jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(args.seed + 1),
                                s).reshape(1, s, 2)

        y_e, f_e, _ = counterfactual_videos_and_flows(
            model, params, raft, raft_params, x, passive, active, shifts,
            keys, n_vis, True, args.raft_iters, True)
        from counterfactualworldmodels_tpu.models.fast_vmae import (
            resolve_two_source)
        y_f, f_f, _ = counterfactual_videos_and_flows_fast(
            model, fp, raft, raft_params, x, passive, active, shifts,
            keys, n_vis, True, args.raft_iters, True, on_tpu,
            resolve_two_source(on_tpu))

        ye = np.asarray(y_e.reshape(s, -1), np.float32)
        yf = np.asarray(y_f.reshape(s, -1), np.float32)
        fe = np.asarray(f_e.reshape(-1), np.float32)
        ff = np.asarray(f_f.reshape(-1), np.float32)
        video_corr = float(np.corrcoef(ye.reshape(-1), yf.reshape(-1))[0, 1])
        flow_corr = float(np.corrcoef(fe, ff)[0, 1])
        flow_rel = float(np.abs(fe - ff).mean() / (np.abs(fe).mean() + 1e-8))
        per_image.append({'image': os.path.basename(path),
                          'video_corr': round(video_corr, 5),
                          'flow_corr': round(flow_corr, 5),
                          'flow_mean_rel_dev': round(flow_rel, 5)})

    report = {
        'engine': 'shared-prefix (models/fast_vmae.py)',
        'weights': 'random-init (no released checkpoints reachable — '
                   'see PARITY_CHECKPOINTS.md)',
        'samples_per_image': s,
        'model': args.model,
        'raft_iters': args.raft_iters,
        'backend': jax.default_backend(),
        'per_image': per_image,
        'min_flow_corr': min(r['flow_corr'] for r in per_image),
        'min_video_corr': min(r['video_corr'] for r in per_image),
    }
    with open(args.out, 'w') as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == '__main__':
    main()
