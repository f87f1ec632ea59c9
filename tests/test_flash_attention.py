"""Flash attention kernel vs dense softmax attention."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from counterfactualworldmodels_tpu.ops.flash_attention import flash_attention
from counterfactualworldmodels_tpu.models.layers import dense_attention


@pytest.mark.parametrize('n', [64, 128, 200, 384])
def test_flash_matches_dense(n):
    rng = np.random.RandomState(0)
    b, h, d = 2, 3, 64
    q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)) * (d ** -0.5)
    k = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    ref = np.asarray(dense_attention(q, k, v))
    out = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_flash_in_vmae_matches_dense_model():
    """attn_impl='flash' end-to-end inside the VMAE forward."""
    from counterfactualworldmodels_tpu.models import vmae as jvmae
    m_dense = jvmae.PretrainVisionTransformer(
        img_size=(32, 32), patch_size=(8, 8), encoder_embed_dim=64,
        encoder_depth=2, encoder_num_heads=4, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, attn_impl='dense')
    import dataclasses
    m_flash = dataclasses.replace(m_dense, attn_impl='flash',
                                  parent=None, name=None)
    params = jvmae.init_params(m_dense)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 3, 2, 32, 32).astype(np.float32))
    n = m_dense.num_patches
    mask = jnp.asarray(np.tile(np.arange(n) >= 10, (2, 1)))
    y_dense = m_dense.apply({'params': params}, x, mask, 10)
    y_flash = m_flash.apply({'params': params}, x, mask, 10)
    np.testing.assert_allclose(np.asarray(y_flash), np.asarray(y_dense),
                               atol=1e-4)


def test_flash_attention_prefix_matches_concat():
    """Two-source kernel == flash over concat([broadcast(prefix), own])."""
    import numpy as np
    from counterfactualworldmodels_tpu.ops.flash_attention import (
        flash_attention, flash_attention_prefix)
    rng = np.random.RandomState(0)
    s, h, nq, n0, n1, d = 3, 2, 10, 17, 10, 16
    q = jnp.asarray(rng.randn(s, h, nq, d).astype(np.float32)) * 0.3
    k0 = jnp.asarray(rng.randn(1, h, n0, d).astype(np.float32))
    v0 = jnp.asarray(rng.randn(1, h, n0, d).astype(np.float32))
    k1 = jnp.asarray(rng.randn(s, h, n1, d).astype(np.float32))
    v1 = jnp.asarray(rng.randn(s, h, n1, d).astype(np.float32))

    kf = jnp.concatenate([jnp.broadcast_to(k0, (s, h, n0, d)), k1], axis=2)
    vf = jnp.concatenate([jnp.broadcast_to(v0, (s, h, n0, d)), v1], axis=2)
    ref = flash_attention(q, kf, vf)
    out = flash_attention_prefix(q, k0, v0, k1, v1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_flagship_shapes_interpret():
    """Kernel correctness at the FLAGSHIP workload shapes (ViT-L 4x4
    @224, S=16 suffix decode: q 1568 rows vs kv 4704, head_dim 64 —
    PERF.md): exercises the divisor-aware block choice at the real
    sizes, in interpret mode off-TPU. Catches shape/divisibility bugs
    the tiny-shape tests cannot."""
    rng = np.random.RandomState(0)
    b, h, nq, nk, d = 1, 2, 1568, 4704, 64
    q = jnp.asarray(rng.randn(b, h, nq, d).astype(np.float32)) * (d ** -0.5)
    k = jnp.asarray(rng.randn(b, h, nk, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, nk, d).astype(np.float32))
    ref = np.asarray(dense_attention(q, k, v))
    out = np.asarray(flash_attention(q, k, v))
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_flash_prefix_flagship_shapes_interpret():
    """Two-source kernel at flagship suffix-decode shapes: shared prefix
    panels n0=3136 (frame-0 KV), per-sample suffix n1=1568, q 1568 —
    both the shared-prefix (s0=1) and the stacked per-sample-prefix
    (s0=S, the multi-scene route) layouts."""
    from counterfactualworldmodels_tpu.ops.flash_attention import (
        flash_attention_prefix)
    rng = np.random.RandomState(1)
    s, h, nq, n0, n1, d = 2, 2, 1568, 3136, 1568, 64
    q = jnp.asarray(rng.randn(s, h, nq, d).astype(np.float32)) * (d ** -0.5)
    k1 = jnp.asarray(rng.randn(s, h, n1, d).astype(np.float32))
    v1 = jnp.asarray(rng.randn(s, h, n1, d).astype(np.float32))
    for s0 in (1, s):   # shared prefix / stacked per-sample prefixes
        k0 = jnp.asarray(rng.randn(s0, h, n0, d).astype(np.float32))
        v0 = jnp.asarray(rng.randn(s0, h, n0, d).astype(np.float32))
        kf = jnp.concatenate([jnp.broadcast_to(k0, (s, h, n0, d)), k1], 2)
        vf = jnp.concatenate([jnp.broadcast_to(v0, (s, h, n0, d)), v1], 2)
        ref = np.asarray(flash_attention(q, kf, vf))
        out = np.asarray(flash_attention_prefix(q, k0, v0, k1, v1))
        np.testing.assert_allclose(out, ref, atol=3e-5,
                                   err_msg=f's0={s0}')


def test_pick_blocks_tile_aligned_and_budgeted():
    """Every heuristic pick is 16-aligned (the bf16 native tile is
    (16, 128); interpret mode would accept 8-multiples that Mosaic can
    reject on hardware) and respects the f32 score-tile budget; a pinned
    block_q caps block_k against the ACTUAL pair (the two-source kernel
    shares one q block across both k panels)."""
    from counterfactualworldmodels_tpu.ops.flash_attention import (
        _SCORE_TILE_BYTES, _pick_blocks)
    for n, nk in [(3136, 6272), (3136, 3136), (1568, 4704), (33, 817),
                  (100, 100), (3136, 817), (17, 16), (448, 25088)]:
        bq, bk = _pick_blocks(n, nk)
        assert bq % 16 == 0 and bk % 16 == 0, (n, nk, bq, bk)
        assert bq * bk * 4 <= _SCORE_TILE_BYTES, (n, nk, bq, bk)
        bq2, bk2 = _pick_blocks(n, nk, force_block_q=bq)
        assert bq2 == bq and bq2 * bk2 * 4 <= _SCORE_TILE_BYTES


def test_flash_prefix_rejects_empty_panels():
    """N0=0 / N1=0 raise a clear ValueError instead of a zero-size
    BlockSpec lowering failure or a bare ZeroDivisionError."""
    from counterfactualworldmodels_tpu.ops.flash_attention import (
        flash_attention_prefix)
    rng = np.random.RandomState(2)
    s, h, nq, d = 1, 1, 16, 64
    q = jnp.asarray(rng.randn(s, h, nq, d).astype(np.float32))
    kv = jnp.asarray(rng.randn(s, h, 16, d).astype(np.float32))
    empty = jnp.zeros((s, h, 0, d), jnp.float32)
    with pytest.raises(ValueError, match='empty panel'):
        flash_attention_prefix(q, empty, empty, kv, kv)
    with pytest.raises(ValueError, match='empty panel'):
        flash_attention_prefix(q, kv, kv, empty, empty)


def test_flash_prefix_weight_matches_replicated_keys():
    """prefix_weight=w with one prefix key per group == unweighted
    attention where that key appears w times: the pooled-prefix weighting
    semantics (each pooled key counts as pool^2 originals) are EXACT for
    locally-constant prefix panels."""
    from counterfactualworldmodels_tpu.ops.flash_attention import (
        flash_attention, flash_attention_prefix)
    rng = np.random.RandomState(2)
    s, h, nq, n0, n1, d, w = 2, 2, 12, 9, 12, 16, 4
    q = jnp.asarray(rng.randn(s, h, nq, d).astype(np.float32)) * 0.3
    k0 = jnp.asarray(rng.randn(1, h, n0, d).astype(np.float32))
    v0 = jnp.asarray(rng.randn(1, h, n0, d).astype(np.float32))
    k1 = jnp.asarray(rng.randn(s, h, n1, d).astype(np.float32))
    v1 = jnp.asarray(rng.randn(s, h, n1, d).astype(np.float32))

    # reference: each prefix key replicated w times in a plain concat
    k0r = jnp.repeat(k0, w, axis=2)
    v0r = jnp.repeat(v0, w, axis=2)
    kf = jnp.concatenate([jnp.broadcast_to(k0r, (s, h, n0 * w, d)), k1], 2)
    vf = jnp.concatenate([jnp.broadcast_to(v0r, (s, h, n0 * w, d)), v1], 2)
    ref = np.asarray(flash_attention(q, kf, vf))

    out = np.asarray(flash_attention_prefix(q, k0, v0, k1, v1,
                                            prefix_weight=float(w)))
    np.testing.assert_allclose(out, ref, atol=3e-5)

    # dense two-source impl agrees too
    from counterfactualworldmodels_tpu.models.fast_vmae import (
        _dense_attention_prefix)
    out_d = np.asarray(_dense_attention_prefix(q, k0, v0, k1, v1,
                                               weight0=float(w)))
    np.testing.assert_allclose(out_d, ref, atol=3e-5)


def test_dense_attention_prefix_matches_concat():
    """Concat-free dense two-source == dense over [broadcast prefix; own],
    shared (s0=1) and stacked (s0=S) prefix layouts."""
    from counterfactualworldmodels_tpu.models.fast_vmae import (
        _dense_attention, _dense_attention_prefix)
    rng = np.random.RandomState(3)
    s, h, nq, n0, n1, d = 3, 2, 7, 11, 7, 16
    q = jnp.asarray(rng.randn(s, h, nq, d).astype(np.float32)) * 0.3
    k1 = jnp.asarray(rng.randn(s, h, n1, d).astype(np.float32))
    v1 = jnp.asarray(rng.randn(s, h, n1, d).astype(np.float32))
    for s0 in (1, s):
        k0 = jnp.asarray(rng.randn(s0, h, n0, d).astype(np.float32))
        v0 = jnp.asarray(rng.randn(s0, h, n0, d).astype(np.float32))
        kf = jnp.concatenate([jnp.broadcast_to(k0, (s, h, n0, d)), k1], 2)
        vf = jnp.concatenate([jnp.broadcast_to(v0, (s, h, n0, d)), v1], 2)
        ref = np.asarray(_dense_attention(q, kf, vf))
        out = np.asarray(_dense_attention_prefix(q, k0, v0, k1, v1))
        np.testing.assert_allclose(out, ref, atol=3e-5)


def test_flash_suffix_weight_matches_replicated_keys():
    """suffix_weight=w == per-sample keys each appearing w times (the
    pooled-suffix mode's weighting semantics)."""
    from counterfactualworldmodels_tpu.ops.flash_attention import (
        flash_attention, flash_attention_prefix)
    from counterfactualworldmodels_tpu.models.fast_vmae import (
        _dense_attention_prefix)
    rng = np.random.RandomState(4)
    s, h, nq, n0, n1, d, w = 2, 2, 12, 9, 8, 16, 4
    q = jnp.asarray(rng.randn(s, h, nq, d).astype(np.float32)) * 0.3
    k0 = jnp.asarray(rng.randn(1, h, n0, d).astype(np.float32))
    v0 = jnp.asarray(rng.randn(1, h, n0, d).astype(np.float32))
    k1 = jnp.asarray(rng.randn(s, h, n1, d).astype(np.float32))
    v1 = jnp.asarray(rng.randn(s, h, n1, d).astype(np.float32))

    kf = jnp.concatenate([jnp.broadcast_to(k0, (s, h, n0, d)),
                          jnp.repeat(k1, w, axis=2)], 2)
    vf = jnp.concatenate([jnp.broadcast_to(v0, (s, h, n0, d)),
                          jnp.repeat(v1, w, axis=2)], 2)
    ref = np.asarray(flash_attention(q, kf, vf))

    out = np.asarray(flash_attention_prefix(q, k0, v0, k1, v1,
                                            suffix_weight=float(w)))
    np.testing.assert_allclose(out, ref, atol=3e-5)
    out_d = np.asarray(_dense_attention_prefix(q, k0, v0, k1, v1,
                                               weight1=float(w)))
    np.testing.assert_allclose(out_d, ref, atol=3e-5)


def test_flash_attention_gradient_matches_dense():
    """flash_attention is differentiable (custom_vjp over the chunked
    dense reference) — gradients must match the dense formulation to the
    kernel's forward tolerance. This is what makes attn_impl='flash'
    models trainable on TPU (the r04 train bench failure)."""
    import jax
    from counterfactualworldmodels_tpu.ops.flash_attention import (
        flash_attention)
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(1, 2, 24, 8).astype(np.float32)) * 0.4
    k = jnp.asarray(rng.randn(1, 2, 40, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 40, 8).astype(np.float32))

    def dense(q, k, v):
        s = jnp.einsum('bhqd,bhkd->bhqk', q, k)
        p = jax.nn.softmax(s, -1)
        return jnp.einsum('bhqk,bhkd->bhqd', p, v)

    @jax.jit
    def g_flash(q, k, v):
        return jax.grad(lambda *a: jnp.sum(flash_attention(
            *a, block_q=8, block_k=8, interpret=True) ** 2),
            argnums=(0, 1, 2))(q, k, v)

    @jax.jit
    def g_dense(q, k, v):
        return jax.grad(lambda *a: jnp.sum(dense(*a) ** 2),
                        argnums=(0, 1, 2))(q, k, v)

    for a, b in zip(g_flash(q, k, v), g_dense(q, k, v)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2, rtol=5e-3)


def test_wide_dtype_fallback_routes_to_dense():
    """f32 panels wide enough to blow scoped VMEM must route to the
    chunked dense fallback BEFORE touching Pallas — so the entry points
    work with interpret=False even off-TPU (the r05 fidelity f32
    decomposition leg OOM'd in Mosaic: 23.87 MiB scoped vs 16 MiB)."""
    import jax
    from counterfactualworldmodels_tpu.ops.flash_attention import (
        flash_attention, flash_attention_prefix, _dense_two_source,
        _wide_dtype_vmem_overflow)
    # gate: f32 at the measured-OOM width trips, bf16 production never
    assert _wide_dtype_vmem_overflow(6272, 64, 4)
    assert not _wide_dtype_vmem_overflow(6336, 64, 2)
    assert not _wide_dtype_vmem_overflow(512, 64, 4)

    rng = np.random.RandomState(11)
    b, h, d = 1, 2, 64
    nk = 8192  # > gate threshold for itemsize 4
    q = jnp.asarray(rng.randn(b, h, 16, d).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.randn(b, h, nk, d).astype(np.float32)) * 0.2
    v = jnp.asarray(rng.randn(b, h, nk, d).astype(np.float32))

    def dense(q, k, v):
        s = jnp.einsum('bhqd,bhkd->bhqk', q, k)
        p = jax.nn.softmax(s, -1)
        return jnp.einsum('bhqk,bhkd->bhqd', p, v)

    # interpret=False off-TPU would die in Pallas lowering if the gate
    # did not reroute; rerouting means this returns fine and matches
    out = np.asarray(flash_attention(q, k, v, interpret=False))
    np.testing.assert_allclose(out, np.asarray(dense(q, k, v)),
                               atol=2e-5, rtol=1e-5)

    # two-source: weighted panels -> +ln(w) bias dense image
    n0, n1 = 4096, 4608
    k0 = k[:, :, :n0]; v0 = v[:, :, :n0]
    k1 = k[:, :, n0:n0 + n1] * 0.5; v1 = v[:, :, n0:n0 + n1]
    out2 = np.asarray(flash_attention_prefix(
        q, k0, v0, k1, v1, interpret=False,
        prefix_weight=2.0, suffix_weight=1.0))
    ref2 = np.asarray(_dense_two_source(q, k0, v0, k1, v1, 2.0, 1.0))
    np.testing.assert_allclose(out2, ref2, atol=2e-5, rtol=1e-5)
    # and the dense image itself against explicit key replication
    kf = jnp.concatenate([k0, k0, k1], 2)
    vf = jnp.concatenate([v0, v0, v1], 2)
    np.testing.assert_allclose(out2, np.asarray(dense(q, kf, vf)),
                               atol=2e-5, rtol=1e-5)


def _dense_ref(q, k, v):
    s = jnp.einsum('bhqd,bhkd->bhqk', q, k)
    return jnp.einsum('bhqk,bhkd->bhqd', jax.nn.softmax(s, -1), v)


def test_flash_lse_forward_matches_plain_kernel():
    """The lse-emitting forward (_flash_bhnd_lse) must return the exact
    same output as the plain kernel plus the dense logsumexp rows."""
    from counterfactualworldmodels_tpu.ops.flash_attention import (
        _flash_bhnd, _flash_bhnd_lse)
    rng = np.random.RandomState(3)
    bh, n, nk, d = 3, 200, 333, 64   # ragged: padding on both axes
    q = jnp.asarray(rng.randn(bh, n, d).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(bh, nk, d).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(bh, nk, d).astype(np.float32))
    out0 = _flash_bhnd(q, k, v, 64, 128, True)
    out1, lse = _flash_bhnd_lse(q, k, v, 64, 128, True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               atol=1e-6, rtol=1e-6)
    s = jnp.einsum('bqd,bkd->bqk', q, k)
    ref = jax.scipy.special.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_flash_pallas_backward_matches_dense_grads(monkeypatch):
    """The fused Pallas backward (CWM_FLASH_BWD=pallas, interpret mode on
    CPU) must reproduce the dense-attention gradients for ragged
    cross-attention shapes — padding on queries AND keys exercises the
    no-masking-needed arithmetic in _flash_bwd_kernel's docstring."""
    monkeypatch.setenv('CWM_FLASH_BWD', 'pallas')
    from counterfactualworldmodels_tpu.ops.flash_attention import (
        flash_attention, _pick_bwd_blocks)
    assert _pick_bwd_blocks(200, 333, 64, 4) is not None
    rng = np.random.RandomState(4)
    b, h, n, nk, d = 1, 2, 200, 333, 64
    q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(b, h, nk, d).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(b, h, nk, d).astype(np.float32))
    co = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) * co)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_ref(q, k, v) * co)

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip('qkv', g_f, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-4, err_msg=name)


def test_flash_pallas_backward_self_attention_exact_divisors(monkeypatch):
    """Self-attention at block-divisible sizes (no padding at all) — the
    production training shape class (decoder N=6272 = 448*14)."""
    monkeypatch.setenv('CWM_FLASH_BWD', 'pallas')
    from counterfactualworldmodels_tpu.ops.flash_attention import (
        flash_attention)
    rng = np.random.RandomState(5)
    b, h, n, d = 1, 2, 256, 64
    q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    g_f = jax.grad(lambda *a: jnp.sum(flash_attention(*a) ** 2),
                   argnums=(0, 1, 2))(q, k, v)
    g_d = jax.grad(lambda *a: jnp.sum(_dense_ref(*a) ** 2),
                   argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip('qkv', g_f, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-4, err_msg=name)
