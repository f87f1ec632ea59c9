#!/usr/bin/env python
"""Structure extraction via differentiable masking (Soft ChannelMAE).

The paper's use case for the Soft ChannelMAE family (reference
cwm/models/VideoMAE/cmae.py:663-1059): optimize a per-patch *soft
visibility* over one image so a frozen SoftInputChannelMae reconstructs the
whole image from as few revealed patches as possible. The patches that
survive the sparsity pressure are the image's "structure". The soft mask is
a lerp to the mask token, so the whole pipeline is differentiable
end-to-end — one `jax.grad`, no REINFORCE.

With no released checkpoints reachable (PARITY_CHECKPOINTS.md) the default
runs random weights: the *mechanics* (gradients through the mask, sparsity
trade-off curve) are exercised; pass --params for a converted checkpoint to
get paper-quality structure maps.

Writes <out>/structure_mask.png, <out>/structure_recon.png and prints one
JSON line with the loss trajectory endpoints.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--image',
                    default='/root/reference/demo/images/apple_0.png')
    ap.add_argument('--img-size', type=int, default=224)
    ap.add_argument('--patch-size', type=int, default=32)
    ap.add_argument('--model', default='tiny', choices=['tiny', 'paper'],
                    help='tiny = CPU-runnable; paper = reference-scale '
                         '(768d x 12L encoder)')
    ap.add_argument('--params', default=None, help='orbax checkpoint dir')
    ap.add_argument('--steps', type=int, default=100)
    ap.add_argument('--lr', type=float, default=0.1)
    ap.add_argument('--sparsity', type=float, default=0.5,
                    help='weight on mean visibility (higher -> fewer '
                         'revealed patches)')
    ap.add_argument('--out', default='demo_out')
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    from PIL import Image
    from counterfactualworldmodels_tpu.utils.cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    from counterfactualworldmodels_tpu.models import cmae as jcmae

    if os.path.exists(args.image):
        img = Image.open(args.image).convert('RGB').resize(
            (args.img_size, args.img_size))
        x = np.asarray(img, np.float32).transpose(2, 0, 1)[None] / 255.0
    else:
        yy, xx = np.mgrid[0:args.img_size, 0:args.img_size] / args.img_size
        x = np.stack([0.3 + 0.3 * yy, 0.4 + 0.2 * xx, 0.5 - 0.2 * yy],
                     0)[None].astype(np.float32)
    x = jnp.asarray(x)

    kw = dict(image_size=(args.img_size, args.img_size),
              patch_size=(args.patch_size, args.patch_size), in_channels=3,
              channel_partition=(3,))
    if args.model == 'tiny':
        model = jcmae.SoftInputChannelMae(
            encoder_embed_dim=96, encoder_depth=2, encoder_num_heads=2,
            decoder_embed_dim=64, decoder_depth=1, decoder_num_heads=2,
            mlp_ratio=2.0, **kw)
    else:
        model = jcmae.SoftInputChannelMae(**kw)

    if args.params:
        from counterfactualworldmodels_tpu.utils.checkpoint import load_params
        params = load_params(os.path.abspath(args.params))
    else:
        params = model.init(jax.random.PRNGKey(args.seed), x,
                            jnp.ones((1, model.num_patches)))['params']

    labels = model.apply({'params': params}, x,
                         method=jcmae.SoftInputChannelMae.compute_labels)

    def loss_fn(logits):
        soft_mask = jax.nn.sigmoid(logits)          # 1 = masked
        preds = model.apply({'params': params}, x, soft_mask)
        recon = sum(((p - l) ** 2).mean() for p, l in zip(preds, labels))
        visibility = (1.0 - soft_mask).mean()
        return recon + args.sparsity * visibility, (recon, visibility)

    logits = jnp.zeros((1, model.num_patches))      # start 50/50
    opt = optax.adam(args.lr)
    opt_state = opt.init(logits)

    @jax.jit
    def step(logits, opt_state):
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(logits)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(logits, updates), opt_state, loss, aux

    first = None
    for i in range(args.steps):
        logits, opt_state, loss, (recon, vis) = step(logits, opt_state)
        if first is None:
            first = (float(loss), float(recon), float(vis))
    final = (float(loss), float(recon), float(vis))

    # render: visibility heatmap + reconstruction from the optimized mask
    os.makedirs(args.out, exist_ok=True)
    soft_mask = jax.nn.sigmoid(logits)
    g = args.img_size // args.patch_size
    vis_map = np.asarray(1.0 - soft_mask).reshape(g, g)
    vis_img = np.kron(vis_map, np.ones((args.patch_size, args.patch_size)))
    Image.fromarray((np.clip(vis_img, 0, 1) * 255).astype(np.uint8)).save(
        os.path.join(args.out, 'structure_mask.png'))

    preds = model.apply({'params': params}, x, soft_mask)
    y = jcmae.soft_channel_mae_recombine(model, preds)  # [1, n, pd, C]
    ph = args.patch_size
    recon_img = np.asarray(y[0]).reshape(g, g, ph, ph, 3)
    recon_img = recon_img.transpose(0, 2, 1, 3, 4).reshape(
        args.img_size, args.img_size, 3)
    Image.fromarray(
        (np.clip(recon_img, 0, 1) * 255).astype(np.uint8)).save(
        os.path.join(args.out, 'structure_recon.png'))

    print(json.dumps({
        'metric': 'structure-extraction (SoftInputChannelMae, soft-mask '
                  'optimization)',
        'model': args.model, 'steps': args.steps,
        'sparsity_weight': args.sparsity,
        'initial': {'loss': round(first[0], 5), 'recon': round(first[1], 5),
                    'visibility': round(first[2], 4)},
        'final': {'loss': round(final[0], 5), 'recon': round(final[1], 5),
                  'visibility': round(final[2], 4)},
        'weights': 'checkpoint' if args.params else 'random-init',
        'out': args.out,
    }))


if __name__ == '__main__':
    main()
