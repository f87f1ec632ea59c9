"""Script equivalent of the reference demo notebooks
(demo/MovabilityAndMotionCovariance.ipynb and the two notebooks referenced by
the reference README): factual prediction, counterfactual motion prompts,
Spelke segments, movability maps, and motion covariance on the bundled demo
images.

Checkpoints: pass --checkpoint_dir with the released reference .pth files to
reproduce the paper's outputs; without checkpoints the script runs the full
pipeline with random weights (structure/latency demo only).

Usage:
    python demo/demo_counterfactuals.py [--image PATH] [--checkpoint_dir DIR]
        [--model base|large] [--samples 8] [--out demo_out]
"""
import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--image', default=None)
    ap.add_argument('--checkpoint_dir', default=None)
    ap.add_argument('--model', default='base', choices=['base', 'large'])
    ap.add_argument('--samples', type=int, default=8)
    ap.add_argument('--raft_iters', type=int, default=12)
    ap.add_argument('--out', default='demo_out')
    ap.add_argument('--movability', action='store_true')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from PIL import Image

    from counterfactualworldmodels_tpu.utils.cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    from counterfactualworldmodels_tpu.models import vmae
    from counterfactualworldmodels_tpu.models.raft.raft import (
        RAFT, init_raft_params)
    from counterfactualworldmodels_tpu.pipelines import (FlowGenerator,
                                                         MovabilityPredictor)
    from counterfactualworldmodels_tpu.ops.flow_viz import flow_to_rgb
    from counterfactualworldmodels_tpu import masking

    os.makedirs(args.out, exist_ok=True)

    # ---- input image ----
    img_path = args.image or os.path.join(
        os.path.dirname(__file__), 'images', 'apple_0.png')
    if not os.path.exists(img_path):
        img_path = '/root/reference/demo/images/apple_0.png'
    img = Image.open(img_path).convert('RGB').resize((224, 224))
    x = jnp.asarray(np.asarray(img), jnp.float32)[None].transpose(
        0, 3, 1, 2) / 255.0

    # ---- models ----
    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    attn = 'flash' if on_tpu else 'dense'
    if args.model == 'base':
        model = vmae.base_8x8patch_2frames_1tube(dtype=dtype, attn_impl=attn)
        grid = 28
        ckpt_name = 'cwm_baseVMAE_224px_8x8patches_2frames.pth'
    else:
        model = vmae.large_4x4patch_2frames_1tube(dtype=dtype, attn_impl=attn)
        grid = 56
        ckpt_name = 'cwm_largeVMAE_224px_4x4patches_2frames.pth'

    ckpt_dir = args.checkpoint_dir
    predictor_path = (os.path.join(ckpt_dir, ckpt_name)
                      if ckpt_dir else None)
    raft_path = (os.path.join(ckpt_dir, 'raft_checkpoints', 'raft-large.pth')
                 if ckpt_dir else None)
    if predictor_path and not os.path.exists(predictor_path):
        predictor_path = None
    if raft_path and not os.path.exists(raft_path):
        raft_path = None

    params = (None if predictor_path
              else vmae.init_params(model, jax.random.PRNGKey(0)))
    raft = RAFT(iters=args.raft_iters, dtype=dtype)
    raft_params = (None if raft_path
                   else init_raft_params(raft, jax.random.PRNGKey(1)))

    mask_gen = masking.RotatedTableUniformMaskingGenerator(
        (2, grid, grid), mask_ratio=0.99, clumping_factor=2, seed=0)
    G = FlowGenerator(
        predictor=model, params=params, predictor_load_path=predictor_path,
        flow_model=raft, flow_params=raft_params,
        flow_model_load_path=raft_path, raft_iters=args.raft_iters,
        imagenet_normalize_inputs=True, mask_generator=mask_gen, seed=0)

    # ---- 1. factual prediction ----
    video = jnp.broadcast_to(x[:, None], (1, 2, *x.shape[1:]))
    pred = G(video)
    plt.imsave(os.path.join(args.out, 'factual_pred.png'),
               np.clip(np.asarray(pred[0, 0]).transpose(1, 2, 0), 0, 1))
    print('factual prediction ->', os.path.join(args.out, 'factual_pred.png'))

    # ---- 2. one counterfactual: move the center patch right ----
    n = model.num_patches
    npf = n // 2
    active = np.ones((1, n), bool)
    active[0, :npf] = False
    active[0, npf + (grid // 2) * grid + grid // 2] = False
    ys, flows = G.predict_counterfactual_videos_and_flows(
        x, active_patches=jnp.asarray(active), shifts=[(0, 2)],
        num_samples=1, sample_batch_size=1)
    rgb = flow_to_rgb(flows[0, 0], max_speed=max(
        float(jnp.abs(flows).max()), 1e-3))
    plt.imsave(os.path.join(args.out, 'counterfactual_flow.png'),
               np.clip(np.asarray(rgb).transpose(1, 2, 0), 0, 1))
    seg = G.compute_mean_motion_map(G._batch_to_samples(flows))
    plt.imsave(os.path.join(args.out, 'spelke_segment.png'),
               np.asarray(seg[0, 0]), cmap='inferno')
    print('counterfactual flow + Spelke segment saved')

    # ---- 3. batched random counterfactuals + covariance ----
    flows_s, actives, passives = G.sample_counterfactual_motion_map(
        x, num_active_patches=1, num_passive_patches=1,
        num_samples=args.samples, sample_batch_size=args.samples)
    motion = G.compute_mean_motion_map(flows_s)
    plt.imsave(os.path.join(args.out, 'mean_motion_map.png'),
               np.asarray(motion[0, 0]), cmap='inferno')
    corrs = G.compute_flow_corrs(flows_s, downsample=4)
    center = corrs[0, 0, corrs.shape[2] // 2, corrs.shape[3] // 2]
    plt.imsave(os.path.join(args.out, 'motion_covariance_center.png'),
               np.asarray(center), cmap='RdBu_r')
    print('mean motion map + covariance probe saved')

    # ---- 4. movability (optional; heavier) ----
    if args.movability:
        M = MovabilityPredictor(
            predictor=model, params=G.params, flow_model=raft,
            flow_params=G.flow_params, raft_iters=args.raft_iters,
            imagenet_normalize_inputs=True, seed=0,
            initialize_from_keypoints=False,
            num_initial_samples=args.samples,
            num_samples_per_iteration=args.samples, num_iters=2,
            sample_batch_size=args.samples)
        movability = M(video)
        plt.imsave(os.path.join(args.out, 'movability.png'),
                   np.asarray(movability[0, 0]), cmap='inferno')
        print('movability map saved')


if __name__ == '__main__':
    main()
