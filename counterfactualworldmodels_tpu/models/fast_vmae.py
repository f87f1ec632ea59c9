"""Shared-prefix counterfactual engine for the VMAE predictor.

The counterfactual workload (reference cwm/models/segmentation.py:324-432)
runs the SAME 2-frame scene through the predictor S times per batch, varying
only a motion prompt: frame 0 is fully visible and *identical across all S
samples* (fix_passive construction), while frame 1 contributes ~33 visible
tokens out of 3136 per sample. The reference — and the exact path in
models/vmae.py — re-encodes the ~3.1k shared frame-0 tokens through every
transformer block S times.

This module removes that redundancy with *prefix-isolated attention*, the
prefix-LM / KV-cache factorization adapted to bidirectional MAE decoding:

* frame-0 (prefix) tokens attend only to frame-0 tokens → their encoder
  and decoder states are sample-independent and computed ONCE per batch
  (and are cacheable across requests on the same image);
* per-sample (suffix) tokens attend to the cached prefix keys/values plus
  their own tokens — full context, per-sample cost O(n_suffix · N) in the
  encoder and O(N_frame1 · N) in the decoder.

The deviation from the exact model is that prefix tokens do not see the
~1% of keys that are sample-specific; suffix tokens (which carry the
motion prompt and produce every predicted patch) see everything. Per-sim
FLOPs drop ~5x at S=16 (amortized); fidelity versus the exact path is
quantified in tests/test_fast_vmae.py and scripts/fidelity_report.py.

All functions are pure over the standard param tree of
models/vmae.py:PretrainVisionTransformer — no separate weight format; block
params are stacked [L, ...] once (stack_vmae_params) so each pass is one
`lax.scan` over layers.
"""
from __future__ import annotations

import collections
import functools
import hashlib
import os
from typing import Any, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import patches as patch_ops
from ..ops.flash_attention import flash_attention, flash_attention_prefix
from ..ops.normalization import imagenet_normalize
from ..ops.pos_embed import sinusoid_encoding_table
from .layers import dense_attention
from .vmae import PretrainVisionTransformer, mask_order


class FastParams(NamedTuple):
    """VMAE params re-laid-out for the engine (see stack_vmae_params)."""
    patch_kernel: Any
    patch_bias: Any
    enc_blocks: Any     # pytree of [L, ...] arrays
    enc_norm: Any
    e2d_kernel: Any
    mask_token: Any
    dec_blocks: Any     # pytree of [L, ...] arrays
    dec_norm: Any
    head_kernel: Any
    head_bias: Any


def stack_vmae_params(model: PretrainVisionTransformer, params,
                      dtype=None) -> FastParams:
    """Stack block params on a leading layer axis and cast to the compute
    dtype. Pure re-layout of the standard tree — call once per params."""
    if getattr(model, 'qk_scale', None) is not None:
        raise ValueError(
            'the shared-prefix engine hardcodes the default attention scale '
            'head_dim**-0.5; qk_scale overrides are only supported by the '
            'exact path (models/vmae.py). No released CWM checkpoint sets '
            'qk_scale (reference vmae.py:563-619 factories).')
    if getattr(model, 'use_learnable_pos_emb', False):
        raise ValueError(
            'the shared-prefix engine adds the fixed sinusoid positional '
            'table; a model with use_learnable_pos_emb=True would silently '
            'diverge. Use the exact path (models/vmae.py) for learnable '
            'positional embeddings. No released CWM checkpoint uses them '
            '(reference vmae.py:563-619 factories).')
    dtype = dtype or model.dtype

    def cast(t):
        return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), t)

    enc = params['encoder']
    dec = params['decoder']
    enc_blocks = [enc[f'blocks_{i}'] for i in range(model.encoder_depth)]
    dec_blocks = [dec[f'blocks_{i}'] for i in range(model.decoder_depth)]
    stack = lambda bs: jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, 0), *bs)
    return FastParams(
        patch_kernel=cast(enc['patch_embed']['proj']['kernel']),
        patch_bias=cast(enc['patch_embed']['proj']['bias']),
        enc_blocks=cast(stack(enc_blocks)),
        enc_norm=cast(enc['norm']),
        e2d_kernel=cast(params['encoder_to_decoder']['kernel']),
        mask_token=cast(params['mask_token']),
        dec_blocks=cast(stack(dec_blocks)),
        dec_norm=cast(dec['norm']),
        head_kernel=cast(dec['head']['kernel']),
        head_bias=cast(dec['head']['bias']),
    )


def _ln(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * p['scale'] + p['bias']).astype(x.dtype)


def _qkv(p_attn, h, num_heads: int):
    """h [B, N, D] -> q, k, v [B, H, N, d] (q unscaled)."""
    b, n, d = h.shape
    qkv = jnp.einsum('bnd,dta->bnta', h, p_attn['qkv_kernel'],
                     preferred_element_type=jnp.float32).astype(h.dtype)
    if 'q_bias' in p_attn:
        q_bias = p_attn['q_bias']
        qkv = qkv + jnp.stack([q_bias, jnp.zeros_like(q_bias),
                               p_attn['v_bias']])
    a = qkv.shape[-1]
    qkv = qkv.reshape(b, n, 3, num_heads, a // num_heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, d]
    return (jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
            jnp.swapaxes(v, 1, 2))


def _proj(p_attn, out, b, n):
    a = out.shape[1] * out.shape[3]
    out = jnp.swapaxes(out, 1, 2).reshape(b, n, a)
    return (jnp.dot(out, p_attn['proj']['kernel'],
                    preferred_element_type=jnp.float32).astype(out.dtype)
            + p_attn['proj']['bias'])


def _mlp(p_mlp, x, gelu: str = 'erf'):
    h = (jnp.dot(x, p_mlp['fc1']['kernel'],
                 preferred_element_type=jnp.float32).astype(x.dtype)
         + p_mlp['fc1']['bias'])
    # 'erf' matches the reference's torch nn.GELU exactly; 'tanh' is the
    # cheap approximation (measured 195 ms cheaper per S=256 suffix
    # dispatch on v5e — XLA's erf is ~25 VPU ops/element), max abs
    # activation error ~3e-4, far below the engine's bf16 isolation error
    h = jax.nn.gelu(h, approximate=(gelu == 'tanh'))
    return (jnp.dot(h, p_mlp['fc2']['kernel'],
                    preferred_element_type=jnp.float32).astype(h.dtype)
            + p_mlp['fc2']['bias'])


def resolve_gelu(gelu: Optional[str] = None) -> str:
    """Resolve the gelu knob OUTSIDE jit (like resolve_two_source): None
    reads CWM_FAST_GELU ('erf' default = reference-exact)."""
    if gelu is None:
        gelu = os.environ.get('CWM_FAST_GELU', 'erf')
    assert gelu in ('erf', 'tanh'), gelu
    return gelu


# Minimum frame-1 grid edge for each 'auto' pooling rung: pool engages
# only when the grid divides by it AND the pooled panel keeps enough
# spatial resolution that the within-window K/V variation (the whole
# approximation error, see pool_dec_prefix) stays small relative to the
# scene. Calibrated against the measured fidelity ladder
# (FIDELITY_r05_*.json / tests/test_fast_vmae.py trained-weights gates):
# ViT-L 4x4 @224 (grid 56) -> pool 4 (the headline rung); ViT-B 8x8 @224
# (grid 28) -> pool 2; test-scale grids (<=16) stay exact.
_AUTO_POOL_MIN_GRID = {4: 32, 2: 24}


def resolve_pools(gh: int, gw: int, prefix_pool='auto', suffix_pool='auto',
                  gelu='auto'):
    """Resolve the generator-level pooling/gelu knobs OUTSIDE jit.

    'auto' (the FlowGenerator production default) picks the largest
    pooling rung in {4, 2, 1} the (gh, gw) frame-1 token grid supports
    per _AUTO_POOL_MIN_GRID, and pairs it with the tanh gelu when any
    pooling is engaged (its ~3e-4 activation error is far below the
    measured pooling/bf16 deviations — PERF.md) or the reference-exact
    erf when none is. Integers and 'erf'/'tanh' pass through; env
    CWM_PREFIX_POOL / CWM_SUFFIX_POOL / CWM_FAST_GELU override at the
    generator level (pipelines/segmentation.py ctor).

    Returns (prefix_pool: int, suffix_pool: int, gelu: str).
    """
    def auto_pool():
        for p in (4, 2):
            if (gh % p == 0 and gw % p == 0
                    and min(gh, gw) >= _AUTO_POOL_MIN_GRID[p]):
                return p
        return 1

    pp = auto_pool() if prefix_pool in (None, 'auto') else int(prefix_pool)
    sp = auto_pool() if suffix_pool in (None, 'auto') else int(suffix_pool)
    if gelu is None:
        gelu = os.environ.get('CWM_FAST_GELU', 'auto')
    if gelu == 'auto':
        gelu = 'tanh' if max(pp, sp) > 1 else 'erf'
    assert gelu in ('erf', 'tanh'), gelu
    assert pp >= 1 and sp >= 1, (pp, sp)
    return pp, sp, gelu


def sfx_bucket(n_sfx: int, n1: int) -> int:
    """Serving-shape bucket for the per-sample visible-frame-1 width.

    Every distinct suffix width keys its own XLA program; without
    bucketing, a user clicking a prompt size the serving warmup did not
    anticipate pays the full first-compile (~35 s on TPU — PERF.md
    serving section). Padding the width up to the next bucket makes any
    click count hit one of a handful of already-compiled programs; the
    pad slots carry a sentinel index (= n1) that the engine masks out of
    attention and drops at the scatter, so bucketing is numerics-neutral
    (tests/test_fast_vmae.py::test_sfx_bucketing_*).

    Buckets are 4, 8, 16 in the interactive-click regime, then widen
    with midpoints (24, 32, 40, 48, 64, 96, ...) so the pad overhead
    stays <=~40% of the real width — in particular the reference's
    canonical 32-passive + 1-active probe prompt (width 33,
    cwm/models/segmentation.py:346-432) pads to 40, not 64 (a pure
    power-of-two ladder measured ~7% off the exact-numerics rung's
    throughput via the doubled encoder-suffix width). Capped at n1;
    width 0 (a factual prompt with frame 1 fully masked) stays 0 — it
    has its own suffix-free program. CWM_SFX_BUCKET=0 disables
    bucketing (exact widths, one program per width).
    """
    if n_sfx <= 0:
        return 0
    if os.environ.get('CWM_SFX_BUCKET', '1') == '0':
        return n_sfx
    for b in (4, 8, 16, 24, 32, 40, 48, 64, 96, 128, 192, 256, 384, 512,
              768, 1024, 1536, 2048, 3072, 4096):
        if b >= n_sfx or b >= n1:
            return min(b, n1)
    return n1


def pad_vis1_idx(mask1, n_sfx_pad: int):
    """Visible-first frame-1 indices padded to a static bucket width.

    mask1: bool [S, N1] (True = masked). Returns int32 [S, n_sfx_pad]:
    each row's real visible indices first (original order), then the
    sentinel N1 in the pad slots. Rows with MORE than n_sfx_pad visible
    tokens are silently truncated — callers derive n_sfx_pad from the
    max visible count (sfx_bucket), so this cannot happen in practice.
    """
    n1 = mask1.shape[-1]
    vis_counts = (~mask1).sum(-1)
    order = mask_order(mask1)[:, :n_sfx_pad]
    col = jnp.arange(n_sfx_pad, dtype=vis_counts.dtype)[None]
    return jnp.where(col < vis_counts[:, None], order, n1)


def _dense_attention(q, k, v):
    return dense_attention(q, k, v, dtype=v.dtype)


def _dense_attention_prefix(q, k0, v0, k1, v1, weight0: float = 1.0,
                            weight1: float = 1.0, own_valid=None):
    """Two-source dense attention WITHOUT materializing broadcast+concat
    K/V: softmax over [shared prefix scores ; own scores], f32 like
    dense_attention. q [S, H, Nq, d]; k0/v0 [S0, H, N0, d] with S0 in
    {1, S}; k1/v1 [S, H, N1, d].

    The concat path broadcasts the prefix panels S-fold per layer
    (S=256 ViT-L encoder suffix: ~1.6 GB per tensor per layer of pure
    HBM traffic if XLA fails to fuse it); here only the per-sample
    score matrix ever exists, which is inherent to attention.

    weight0/weight1: key multiplicity of the prefix/own panel (pooled
    modes) — each key counts as weight identical keys in the softmax.

    own_valid: optional bool [S, N1]; False marks pad keys in the own
    panel (suffix-width bucketing, sfx_bucket) whose scores are set to
    -inf — exp(-inf) = 0, so the softmax runs over exactly the real key
    set and masking is numerics-neutral. A row with no valid own key
    degenerates to prefix-only attention (the running max stays the
    finite prefix max).

    A zero-width own panel (N1 == 0: a factual prompt whose frame 1 is
    fully masked — the reference's default /predict workload,
    cwm/models/masking.py:478-545 at mask_ratio 1.0) degenerates to
    single-source attention over the prefix; `s1.max(-1)` over a
    zero-size axis would otherwise throw at trace time.
    """
    qf = q.astype(jnp.float32)
    if k1.shape[2] == 0:
        if k0.shape[0] == 1:
            s0 = jnp.einsum('shqd,hkd->shqk', qf, k0[0].astype(jnp.float32))
        else:
            s0 = jnp.einsum('shqd,shkd->shqk', qf, k0.astype(jnp.float32))
        p0 = jax.nn.softmax(s0, axis=-1)
        if v0.shape[0] == 1:
            o = jnp.einsum('shqk,hkd->shqd', p0, v0[0].astype(jnp.float32))
        else:
            o = jnp.einsum('shqk,shkd->shqd', p0, v0.astype(jnp.float32))
        return o.astype(v1.dtype)
    if k0.shape[0] == 1:
        s0 = jnp.einsum('shqd,hkd->shqk', qf, k0[0].astype(jnp.float32))
    else:
        s0 = jnp.einsum('shqd,shkd->shqk', qf, k0.astype(jnp.float32))
    s1 = jnp.einsum('shqd,shkd->shqk', qf, k1.astype(jnp.float32))
    if weight0 != 1.0:
        s0 = s0 + float(np.log(weight0))
    if weight1 != 1.0:
        s1 = s1 + float(np.log(weight1))
    if own_valid is not None:
        s1 = jnp.where(own_valid[:, None, None, :], s1, -jnp.inf)
    m = jnp.maximum(s0.max(-1, keepdims=True), s1.max(-1, keepdims=True))
    p0 = jnp.exp(s0 - m)
    p1 = jnp.exp(s1 - m)
    l = p0.sum(-1, keepdims=True) + p1.sum(-1, keepdims=True)
    if v0.shape[0] == 1:
        o = jnp.einsum('shqk,hkd->shqd', p0, v0[0].astype(jnp.float32))
    else:
        o = jnp.einsum('shqk,shkd->shqd', p0, v0.astype(jnp.float32))
    o = o + jnp.einsum('shqk,shkd->shqd', p1, v1.astype(jnp.float32))
    return (o / l).astype(v1.dtype)


def prefix_block_one(p, h, num_heads: int, use_flash: bool):
    """One pre-norm ViT Block over prefix tokens; returns (h, (k, v)).

    THE single definition of the self-attention block body, shared by both
    shared-prefix engines (fast_conjoined delegates here) — a numerics fix
    must land in exactly one place or the engines' measured exact/fast
    parity silently diverges."""
    scale = (h.shape[-1] // num_heads) ** -0.5
    b, n, _ = h.shape
    ln = _ln(h, p['norm1'])
    q, k, v = _qkv(p['attn'], ln, num_heads)
    if use_flash:
        o = flash_attention(q * scale, k, v)
    else:
        o = _dense_attention(q * scale, k, v)
    o = _proj(p['attn'], o, b, n)
    if 'gamma_1' in p:
        o = p['gamma_1'] * o
    h = h + o
    m = _mlp(p['mlp'], _ln(h, p['norm2']))
    if 'gamma_2' in p:
        m = p['gamma_2'] * m
    return h + m, (k, v)


def _pool_kv_grid(x, pool: int, grid):
    """Average-pool per-sample K/V [S, H, N, d] pool x pool over the
    (gh, gw) token grid (N = gh*gw row-major); f32 accumulation."""
    gh, gw = grid
    s, h, n, d = x.shape
    p = x.reshape(s, h, gh // pool, pool, gw // pool, pool, d)
    p = p.astype(jnp.float32).mean(axis=(3, 5))
    return p.reshape(s, h, (gh // pool) * (gw // pool), d).astype(x.dtype)


def suffix_block_one(p, kv0, h, num_heads: int, use_flash: bool,
                     two_source: bool, prefix_weight: float = 1.0,
                     suffix_pool: int = 1, grid=None, gelu: str = 'erf',
                     key_valid=None):
    """One pre-norm ViT Block: per-sample tokens attend [cached prefix
    kv0 ; own kv]. Shared by both engines — see prefix_block_one.

    prefix_weight: key multiplicity of the prefix panel (pooled-prefix
    mode; 1.0 = exact). Routed through whichever attention impl runs.
    suffix_pool: >1 pools the PER-SAMPLE keys/values pool x pool over the
    (gh, gw) token ``grid`` and weights them pool^2-fold — queries stay
    full-resolution, so every output position is still computed; only
    what it READS from the other suffix positions is coarsened.
    key_valid: optional bool [S, N] pad-key mask (suffix-width bucketing,
    sfx_bucket) — False keys are excluded from every query's softmax.
    Only the bucketed encoder-suffix pass uses it (tiny N), so it forces
    the dense two-source impl; incompatible with suffix_pool > 1 (pooling
    would average pad garbage into real windows)."""
    scale = (h.shape[-1] // num_heads) ** -0.5
    s, n, _ = h.shape
    k0, v0 = kv0
    ln = _ln(h, p['norm1'])
    q, k, v = _qkv(p['attn'], ln, num_heads)
    suffix_weight = 1.0
    if suffix_pool > 1:
        assert key_valid is None, 'bucketed pad keys cannot be pooled'
        k = _pool_kv_grid(k, suffix_pool, grid)
        v = _pool_kv_grid(v, suffix_pool, grid)
        suffix_weight = float(suffix_pool * suffix_pool)
    if two_source and use_flash and key_valid is None:
        o = flash_attention_prefix(q * scale, k0, v0, k, v,
                                   prefix_weight=prefix_weight,
                                   suffix_weight=suffix_weight)
    elif (two_source or prefix_weight != 1.0 or suffix_weight != 1.0
          or key_valid is not None):
        # dense two-source: no S-fold broadcast+concat of the prefix
        # panels (also the only dense impl that can weight the panels
        # or mask bucketing pad keys)
        o = _dense_attention_prefix(q * scale, k0, v0, k, v,
                                    weight0=prefix_weight,
                                    weight1=suffix_weight,
                                    own_valid=key_valid)
    else:
        kf = jnp.concatenate(
            [jnp.broadcast_to(k0, (s,) + k0.shape[1:]), k], axis=2)
        vf = jnp.concatenate(
            [jnp.broadcast_to(v0, (s,) + v0.shape[1:]), v], axis=2)
        if use_flash:
            o = flash_attention(q * scale, kf, vf)
        else:
            o = _dense_attention(q * scale, kf, vf)
    o = _proj(p['attn'], o, s, n)
    if 'gamma_1' in p:
        o = p['gamma_1'] * o
    h = h + o
    m = _mlp(p['mlp'], _ln(h, p['norm2']), gelu)
    if 'gamma_2' in p:
        m = p['gamma_2'] * m
    return h + m


def _prefix_blocks(stacked, h0, num_heads: int, use_flash: bool):
    """Full self-attention over the prefix; emits per-layer (k, v)."""
    def body(h, p):
        return prefix_block_one(p, h, num_heads, use_flash)

    return jax.lax.scan(body, h0, stacked)


def resolve_two_source(use_flash: bool, two_source=None) -> bool:
    """Resolve the two-source-kernel knob OUTSIDE jit. ``None`` reads the
    CWM_FLASH_TWO_SOURCE env var (default on); the result is passed as a
    static argument so it participates in the jit cache key — flipping the
    env var between calls takes effect instead of silently reusing the
    first trace."""
    if two_source is None:
        two_source = os.environ.get('CWM_FLASH_TWO_SOURCE', '1') != '0'
    return bool(use_flash and two_source)


def _suffix_blocks(stacked, kvs, hs, num_heads: int, use_flash: bool,
                   two_source: bool, prefix_weight: float = 1.0,
                   suffix_pool: int = 1, grid=None, gelu: str = 'erf',
                   key_valid=None):
    """Per-sample tokens attending to [cached prefix kv ; own kv].

    two_source=True uses the two-source attention (flash kernel on TPU,
    concat-free dense otherwise), which reads the shared prefix panels
    in place instead of broadcasting S copies per layer (see bench.py
    degrade chain). prefix_weight / suffix_pool / key_valid: see
    suffix_block_one (key_valid is layer-invariant, closed over)."""
    def body(h, xs):
        p, kv0 = xs
        return suffix_block_one(p, kv0, h, num_heads, use_flash,
                                two_source, prefix_weight, suffix_pool,
                                grid, gelu, key_valid), None

    return jax.lax.scan(body, hs, (stacked, kvs))[0]


def _pool_panel(panel, pool: int, gh: int, gw: int):
    """Average-pool one [L, S0, H, N0, d] prefix K/V panel pool x pool
    over its (gh, gw) token grid (N0 = t * gh * gw, row-major). f32
    accumulation, cast back to the panel dtype."""
    l, s0, h, n0, d = panel.shape
    t = n0 // (gh * gw)
    p = panel.reshape(l, s0, h, t, gh // pool, pool, gw // pool, pool, d)
    p = p.astype(jnp.float32).mean(axis=(5, 7))
    return p.reshape(l, s0, h, t * (gh // pool) * (gw // pool),
                     d).astype(panel.dtype)


def pool_dec_prefix(dec_kvs, pool: int, gh: int, gw: int):
    """Pooled-prefix mode: shrink the decoder prefix K/V panels pool^2-fold.

    Each pooled key/value is the mean of a pool x pool spatial window of
    frame-0 decoder keys/values; downstream attention weights it as pool^2
    identical keys (prefix_weight), so if the window's keys/values are
    equal the softmax is EXACT — the approximation error is only the
    within-window variation of the scene context. Cuts the suffix
    decoder's score elements (the measured throughput bound, PERF.md)
    from Nq*(N0+Nq) to Nq*(N0/pool^2+Nq): ~38%% fewer at pool=2.
    """
    if gh % pool or gw % pool:
        raise ValueError(f'prefix grid {gh}x{gw} not divisible by '
                         f'pool={pool}')
    k0, v0 = dec_kvs
    return (_pool_panel(k0, pool, gh, gw), _pool_panel(v0, pool, gh, gw))


class PrefixCache(NamedTuple):
    """Sample-independent state for one 2-frame scene: reusable across any
    number of counterfactual prompts on the same image."""
    enc_kvs: Any     # [L, ...] per-layer prefix (k, v) of the encoder
    dec_kvs: Any     # [L, ...] per-layer prefix (k, v) of the decoder


@functools.partial(jax.jit, static_argnums=(0, 2))
def encode_prefix(model: PretrainVisionTransformer, fp: FastParams,
                  use_flash: bool, x0n) -> PrefixCache:
    """Run the shared frame-0 pass once. x0n: [1, C, H, W] normalized
    frame 0. Returns the per-layer encoder/decoder prefix KV caches."""
    n0 = model.num_patches_per_frame
    dtype = fp.patch_kernel.dtype

    p0 = patch_ops.patchify(x0n[:, :, None], model.full_patch_size,
                            temporal_dim=2, squeeze_channel_dim=True)
    tokens0 = (jnp.dot(p0.astype(dtype), fp.patch_kernel,
                       preferred_element_type=jnp.float32).astype(dtype)
               + fp.patch_bias)
    pos_enc = sinusoid_encoding_table(
        model.num_patches, model.encoder_embed_dim)[:, :n0].astype(dtype)
    tokens0 = tokens0 + pos_enc

    h0, enc_kvs = _prefix_blocks(fp.enc_blocks, tokens0,
                                 model.encoder_num_heads, use_flash)
    h0 = _ln(h0, fp.enc_norm)

    z0 = jnp.dot(h0, fp.e2d_kernel,
                 preferred_element_type=jnp.float32).astype(dtype)
    pos_dec = sinusoid_encoding_table(
        model.num_patches, model.decoder_embed_dim).astype(dtype)
    z0 = z0 + pos_dec[:, :n0]
    _, dec_kvs = _prefix_blocks(fp.dec_blocks, z0,
                                model.decoder_num_heads, use_flash)
    return PrefixCache(enc_kvs=enc_kvs, dec_kvs=dec_kvs)


def predict_frame1_from_prefix(model: PretrainVisionTransformer,
                               fp: FastParams, use_flash: bool,
                               cache: PrefixCache, x1n, vis1_idx,
                               two_source: Optional[bool] = None,
                               prefix_pool: int = 1,
                               suffix_pool: int = 1,
                               gelu: Optional[str] = None):
    """Per-sample pass: encode the visible frame-1 tokens against the
    cached prefix, decode every frame-1 position.

    x1n: [S, C, H, W] normalized counterfactual frame 1; vis1_idx:
    int32 [S, n_sfx] visible patch indices within frame 1 (row-major
    order). Returns [S, N1, out_dim] predictions for ALL frame-1 patches.
    two_source: see resolve_two_source (None -> env default).
    prefix_pool: >1 pools the decoder prefix K/V panels pool x pool
    (pool_dec_prefix); suffix_pool: >1 pools the per-sample decoder
    keys/values likewise (queries stay full-res). Throughput/fidelity
    trades quantified in tests/test_fast_vmae.py and
    scripts/fidelity_report.py.

    ``cache`` may be a stacked multi-scene cache (stack_prefix_caches,
    batch dim S): sample i then attends scene i's own prefix.
    """
    return _predict_frame1_core(model, fp, use_flash,
                                resolve_two_source(use_flash, two_source),
                                cache, x1n, vis1_idx, int(prefix_pool),
                                int(suffix_pool), resolve_gelu(gelu))


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 7, 8, 9))
def _predict_frame1_core(model: PretrainVisionTransformer,
                         fp: FastParams, use_flash: bool, two_source: bool,
                         cache: PrefixCache, x1n, vis1_idx,
                         prefix_pool: int = 1, suffix_pool: int = 1,
                         gelu: str = 'erf'):
    n0 = model.num_patches_per_frame
    n1 = model.num_patches - n0
    dtype = fp.patch_kernel.dtype
    s = x1n.shape[0]
    n_sfx = vis1_idx.shape[1]

    pos_dec = sinusoid_encoding_table(
        model.num_patches, model.decoder_embed_dim)[0].astype(dtype)
    base = jnp.broadcast_to(fp.mask_token.astype(dtype) + pos_dec[n0:],
                            (s, n1, pos_dec.shape[-1]))
    if n_sfx == 0:
        # factual prompt with frame 1 fully masked (the reference's default
        # /predict workload — cwm/models/masking.py:478-545 at mask_ratio
        # 1.0): no visible frame-1 tokens exist, so the encoder-suffix pass
        # is empty and the decoder rows are pure mask tokens. Skipping the
        # suffix stage is exact, not an approximation.
        z1 = base
    else:
        # pad slots (suffix-width bucketing, sfx_bucket / pad_vis1_idx)
        # carry the sentinel index n1: gather them safely at slot 0, mask
        # their keys out of attention, and drop them at the scatter. With
        # no padding, valid is all-True and every step below is the
        # identity — non-bucketed numerics are unchanged.
        valid = vis1_idx < n1
        idx_safe = jnp.where(valid, vis1_idx, 0)
        # --- encode suffix: gather visible patches, embed, add positions
        p1 = patch_ops.patchify(x1n[:, :, None], model.full_patch_size,
                                temporal_dim=2, squeeze_channel_dim=True)
        p1v = jnp.take_along_axis(p1, idx_safe[..., None], axis=1)
        tok = (jnp.dot(p1v.astype(dtype), fp.patch_kernel,
                       preferred_element_type=jnp.float32).astype(dtype)
               + fp.patch_bias)
        pos_enc = sinusoid_encoding_table(
            model.num_patches, model.encoder_embed_dim)[0].astype(dtype)
        tok = tok + jnp.take(pos_enc, n0 + idx_safe, axis=0)

        # encoder suffix: ~n_sfx (~33) queries — far below the flash
        # kernel's minimum block, so dense attention wins regardless of
        # use_flash; two_source=True routes to the concat-free dense impl
        # (no S-fold prefix K/V broadcast per layer)
        hs = _suffix_blocks(fp.enc_blocks, cache.enc_kvs, tok,
                            model.encoder_num_heads, False, True, gelu=gelu,
                            key_valid=valid)
        hs = _ln(hs, fp.enc_norm)
        zs = jnp.dot(hs, fp.e2d_kernel,
                     preferred_element_type=jnp.float32).astype(dtype)

        # --- decoder frame-1 rows: mask tokens everywhere, encoded tokens
        # at the visible slots (order within the sequence is irrelevant:
        # attention is permutation-equivariant and positions ride the
        # embeddings); pad rows index n1 = out of bounds -> dropped
        vals = zs + jnp.take(pos_dec, n0 + idx_safe, axis=0)
        z1 = jax.vmap(lambda b, i, v: b.at[i].set(v, mode='drop'))(
            base, vis1_idx, vals)

    dec_kvs, pw = cache.dec_kvs, 1.0
    ph, pw_ = model.full_patch_size[-2:]
    gh, gw = x1n.shape[-2] // ph, x1n.shape[-1] // pw_
    if prefix_pool > 1:
        dec_kvs = pool_dec_prefix(dec_kvs, prefix_pool, gh, gw)
        pw = float(prefix_pool * prefix_pool)
    y1 = _suffix_blocks(fp.dec_blocks, dec_kvs, z1,
                        model.decoder_num_heads, use_flash, two_source, pw,
                        suffix_pool, (gh, gw), gelu)
    y1 = _ln(y1, fp.dec_norm)
    return (jnp.dot(y1, fp.head_kernel,
                    preferred_element_type=jnp.float32).astype(dtype)
            + fp.head_bias)


def stack_prefix_caches(caches) -> PrefixCache:
    """Stack the per-scene caches of S different scenes into ONE cache
    whose batch dim is S: the multi-scene batched warm path.

    ``predict_frame1_from_prefix`` with a stacked cache and S per-sample
    frames runs all S suffixes (each attending its OWN scene's prefix) as
    one dispatch — concurrent S=1 warm-prefix requests on different
    images batch into a single program instead of serializing. The
    two-source flash kernel reads the per-sample prefix panels in place
    (ops/flash_attention.flash_attention_prefix, s0=S path)."""
    caches = list(caches)
    if len(caches) == 1:
        return caches[0]
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=1), *caches)


def make_prefix_cache(model: PretrainVisionTransformer, fp: FastParams,
                      use_flash: bool, normalize: bool, x0) -> PrefixCache:
    """Build the reusable frame-0 cache for a scene. x0: [1, C, H, W] raw
    frame 0 (same normalization flag as the later prediction calls). Serving
    layers key this by image hash to skip prefix work on repeat requests."""
    if normalize:
        x0 = imagenet_normalize(x0[:, None], temporal_dim=1)[:, 0]
    return encode_prefix(model, fp, use_flash, x0)


class HashLru:
    """sha1-keyed LRU over arrays; subclasses define ``_build(*arrays)``
    (and optionally ``_key_arrays`` to key on a subset of the inputs).
    Keys cover shape + dtype + bytes so reinterpreted buffers never
    collide.

    Thread-safe: get() holds an internal lock across lookup AND build,
    so concurrent cold-key callers (threaded serving) cannot double-run
    the expensive _build (two full prefix encodes) or corrupt the
    eviction order."""

    def __init__(self, size: int = 4):
        import threading
        self.size = size
        self._entries = collections.OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _key(*arrays):
        hsh = hashlib.sha1()
        for arr in arrays:
            a = np.asarray(arr)
            hsh.update(repr((a.shape, a.dtype.str)).encode())
            hsh.update(a.tobytes())
        return hsh.hexdigest()

    def _key_arrays(self, *arrays):
        return arrays

    def get(self, *arrays):
        """-> (entry, hit: bool)."""
        key = self._key(*self._key_arrays(*arrays))
        with self._lock:
            if key in self._entries:
                self._entries.move_to_end(key)
                self.hits += 1
                return self._entries[key], True
            entry = self._build(*arrays)
            self._entries[key] = entry
            if len(self._entries) > self.size:
                self._entries.popitem(last=False)
            self.misses += 1
        return entry, False


class PrefixLru(HashLru):
    """LRU of PrefixCache entries.

    Serving and interactive layers probe the SAME image with many
    counterfactual prompts (the reference interface's whole event loop —
    reference cwm/interface.py:497-678 — operates on one loaded image);
    caching the frame-0 prefix across those requests removes the per-request
    prefix encoder/decoder pass entirely. get(x0) with x0 [1, C, H, W] raw
    frame 0 -> (PrefixCache, hit)."""

    def __init__(self, model: PretrainVisionTransformer, fp: FastParams,
                 use_flash: bool, normalize: bool, size: int = 4):
        super().__init__(size)
        self.model, self.fp = model, fp
        self.use_flash, self.normalize = use_flash, normalize

    def _build(self, x0):
        return make_prefix_cache(self.model, self.fp, self.use_flash,
                                 self.normalize, x0)


def predict_videos_shared_prefix(model: PretrainVisionTransformer,
                                 fp: FastParams, use_flash: bool,
                                 n_vis: int, normalize: bool,
                                 x_mocos, mask_mocos,
                                 cache: Optional[PrefixCache] = None,
                                 two_source: Optional[bool] = None,
                                 prefix_pool: int = 1,
                                 suffix_pool: int = 1,
                                 gelu: Optional[str] = None):
    """See _predict_videos_core; two_source as in resolve_two_source
    (resolved here, outside jit, so the knob is part of the cache key).

    Unlike the jitted core (which can only check n_vis >= n0), this
    public entry point also verifies that no frame-0 patch is masked —
    a tube/forward-backward mask with the right popcount would otherwise
    silently leak the masked frame-0 pixels through the prefix cache and
    drop visible frame-1 tokens. Eager-path only (one small host fetch);
    the fused dispatch pipelines build their masks correct-by-
    construction and call the core directly."""
    n0 = model.num_patches_per_frame
    n1 = model.num_patches - n0
    if bool(np.asarray(mask_mocos[..., :n0]).any()):
        raise ValueError(
            'predict_videos_shared_prefix: mask touches frame 0; the '
            'shared-prefix engine requires frame 0 fully visible — use '
            'the exact path (pipelines.prediction.predict_video) for '
            'such prompts')
    if n_vis < n0:
        raise ValueError(
            f'n_vis={n_vis} < num_patches_per_frame={n0}: the shared-prefix '
            'engine requires frame 0 fully visible in every prompt (the '
            'fix_passive construction); masks touching frame 0 must use the '
            'exact path (pipelines.segmentation.counterfactual_videos_and_'
            'flows)')
    return _predict_videos_core(model, fp, use_flash,
                                resolve_two_source(use_flash, two_source),
                                sfx_bucket(n_vis - n0, n1), normalize,
                                x_mocos, mask_mocos, cache,
                                int(prefix_pool), int(suffix_pool),
                                resolve_gelu(gelu))


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 9, 10, 11))
def _predict_videos_core(model: PretrainVisionTransformer,
                         fp: FastParams, use_flash: bool, two_source: bool,
                         n_sfx_pad: int, normalize: bool,
                         x_mocos, mask_mocos,
                         cache: Optional[PrefixCache] = None,
                         prefix_pool: int = 1, suffix_pool: int = 1,
                         gelu: str = 'erf'):
    """Drop-in fast path for pipelines.prediction.predict_video on the
    counterfactual workload: x_mocos [S, T, C, H, W] share frame 0 (the
    fix_passive construction guarantees it; only sample 0's frame 0 is
    read), frame 0 fully visible, per-sample visibility in frame 1 only.

    n_sfx_pad: STATIC bucketed suffix width (sfx_bucket) — the only
    prompt-size-dependent piece of the program key, so every prompt size
    within a bucket reuses one compiled program. Real per-sample visible
    counts are derived from the mask (traced); they may be ragged, and
    each must be <= n_sfx_pad.

    Returns [S, T, C, H, W] reconstructed videos: input patches at visible
    positions, predictions at masked ones — exactly the layout of
    prediction.scatter_pred_patches.

    cache: optional precomputed make_prefix_cache(...) for this scene's
    frame 0; when given, the prefix passes are skipped entirely.
    """
    s, t, c, h, w = x_mocos.shape
    n0 = model.num_patches_per_frame

    xm = imagenet_normalize(x_mocos, temporal_dim=1) if normalize else x_mocos

    if cache is None:
        cache = encode_prefix(model, fp, use_flash, xm[0:1, 0])

    mask1 = mask_mocos[:, n0:]
    vis1_idx = pad_vis1_idx(mask1, n_sfx_pad)
    y1 = _predict_frame1_core(model, fp, use_flash, two_source, cache,
                              xm[:, 1], vis1_idx, prefix_pool, suffix_pool,
                              gelu)

    # --- reconstruct: frame 0 = input; frame 1 = input at visible patches,
    # prediction elsewhere (same layout as prediction.scatter_pred_patches)
    raw1 = patch_ops.patchify(x_mocos[:, 1:2], model.full_patch_size,
                              temporal_dim=1)
    full1 = jnp.where(mask1[..., None], y1.astype(raw1.dtype), raw1)
    frame1 = patch_ops.unpatchify(full1, model.full_patch_size,
                                  (s, 1, c, h, w), temporal_dim=1)
    return jnp.concatenate([x_mocos[:, 0:1], frame1], axis=1)
