"""Shared helpers for the benchmark scripts.

Keeps the small-config conjoined model, the demo-image loader, and the
demo prompt policy in ONE place so bench.py, bench_conjoined.py, and
latency_bench.py measure identical shapes (they previously carried
copy-pasted definitions that could drift).
"""
import os

import numpy as np


def small_conjoined_model(dtype, attn_impl):
    """The small (CPU-dryrunnable) IMU-conditioned conjoined config used by
    bench_conjoined.py and latency_bench.py's --imu path. Returns
    (model, hw)."""
    from counterfactualworldmodels_tpu.models import conjoined as conj
    ctx = conj.StreamSpec(
        is_imu=True, in_chans=6, sequence_length=400, imu_tubelet=16,
        encoder_embed_dim=64, encoder_depth=2, encoder_num_heads=4,
        decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=4,
        decoder_num_classes=96, mlp_ratio=2.0, concat_dummy_token=False,
        padded=True, max_padding_tokens=25)
    main_s = conj.StreamSpec(
        img_size=(112, 112), patch_size=(8, 8), in_chans=3, num_frames=2,
        encoder_embed_dim=96, encoder_depth=2, encoder_num_heads=4,
        decoder_embed_dim=64, decoder_depth=2, decoder_num_heads=4,
        mlp_ratio=2.0, padded=True, max_padding_tokens=64)
    model = conj.ConjoinedVMAE(
        main=main_s, context=ctx,
        conjoin_encoder_layers=((0, 0), (1, 1)),
        conjoin_decoder_layers=((0, 0),), dtype=dtype, attn_impl=attn_impl)
    return model, 112


def demo_static_movie(hw, rng, b=1):
    """[B, 2, 3, hw, hw] static 2-frame movie of the reference demo image
    (the counterfactual construction input); random fallback keeps the
    benches self-contained without the reference mount."""
    import jax.numpy as jnp
    img_path = '/root/reference/demo/images/apple_0.png'
    if os.path.exists(img_path):
        from PIL import Image
        im = Image.open(img_path).convert('RGB').resize((hw, hw))
        frame = np.asarray(im, np.float32).transpose(2, 0, 1) / 255.0
        return jnp.asarray(np.broadcast_to(frame, (b, 2, 3, hw, hw)).copy())
    return jnp.asarray(rng.rand(b, 2, 3, hw, hw).astype(np.float32))


def demo_prompts(rng, n, s, seed_key=2, b=1):
    """The benches' demo mask policy: frame 0 visible; 32 visible patches
    + 1 active patch per sample in frame 1. Returns
    (passive, active, shifts, keys, n_vis) with masks as [B, N, S] bool."""
    import jax
    import jax.numpy as jnp
    npf = n // 2
    p = np.ones((b, n, s), dtype=bool)
    p[:, :npf] = False
    a = np.ones((b, n, s), dtype=bool)
    a[:, :npf] = False
    for i in range(s):
        p[0, npf + rng.choice(npf, 32, replace=False), i] = False
        a[0, npf + rng.randint(npf), i] = False
    shifts = jnp.asarray(rng.randint(-3, 4, size=(b, s, 2)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(seed_key),
                            b * s).reshape(b, s, 2)
    return (jnp.asarray(p), jnp.asarray(a), shifts, keys, npf + 32 + 1)
