"""Benchmark: counterfactual simulations/sec/chip, ViT-L 4x4 @ 224px.

One counterfactual simulation = build a (mask, shift) motion prompt, run the
ViT-L/4x4 masked predictor on the visible tokens, and probe the predicted
2-frame movie with RAFT (24 refinement iterations, the reference default —
cwm/models/segmentation.py:49). This is the demo workload of the reference
(movability / Spelke segmentation sampling loops).

Prints ONE JSON line. vs_baseline is measured against the driver target of
100 sims/sec/chip (BASELINE.md — the reference publishes no numbers).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from counterfactualworldmodels_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from counterfactualworldmodels_tpu.models import vmae
    from counterfactualworldmodels_tpu.models.raft.raft import (
        RAFT, init_raft_params)
    from counterfactualworldmodels_tpu.pipelines.segmentation import (
        counterfactual_videos_and_flows)

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    model = vmae.large_4x4patch_2frames_1tube(
        dtype=dtype, attn_impl='flash' if on_tpu else 'dense')
    params = vmae.init_params(model, jax.random.PRNGKey(0))
    raft = RAFT(iters=24, dtype=dtype)
    raft_params = init_raft_params(raft, jax.random.PRNGKey(1), hw=64)

    b, s = 1, 16 if on_tpu else 2
    hw = 224 if on_tpu else 224
    n = model.num_patches
    npf = n // 2

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, 2, 3, hw, hw).astype(np.float32))
    # demo mask policy: frame 0 visible; 32 visible patches (clumped) +
    # 1 active patch per sample in frame 1
    passive = np.ones((b, n, s), dtype=bool)
    passive[:, :npf] = False
    for i in range(s):
        vis = rng.choice(npf, 32, replace=False)
        passive[0, npf + vis, i] = False
    active = np.ones((b, n, s), dtype=bool)
    active[:, :npf] = False
    for i in range(s):
        active[0, npf + rng.randint(npf), i] = False
    passive = jnp.asarray(passive)
    active = jnp.asarray(active)
    shifts = jnp.asarray(rng.randint(-3, 4, size=(b, s, 2)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(2), b * s).reshape(b, s, 2)
    n_vis = npf + 32 + 1

    def dispatch():
        y, flows, masks = counterfactual_videos_and_flows(
            model, params, raft, raft_params, x, passive, active, shifts,
            keys, n_vis, True, 24, True)
        return jnp.sum(jnp.abs(flows))

    # axon's block_until_ready does not actually block; force completion
    # with a scalar host transfer
    float(dispatch())  # compile + warm
    float(dispatch())

    # steady-state throughput: pipeline dispatches, sync once per round
    iters = 4 if on_tpu else 1
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(iters):
            acc = acc + dispatch()
        float(acc)
        times.append((time.perf_counter() - t0) / iters)
    dt = min(times)
    sims_per_sec = (b * s) / dt

    print(json.dumps({
        'metric': 'counterfactual sims/sec/chip (ViT-L 4x4, 224px, RAFT-24)',
        'value': round(sims_per_sec, 3),
        'unit': 'sims/sec/chip',
        'vs_baseline': round(sims_per_sec / 100.0, 4),
    }))


if __name__ == '__main__':
    main()
