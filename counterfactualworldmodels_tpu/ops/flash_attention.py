"""Flash attention for TPU (Pallas).

Replaces the reference's optional HazyResearch CUDA flash-attention path
(cwm/models/VideoMAE/utils.py:71-73,102-106) with a Pallas kernel: online-
softmax tiling over key blocks so the [N, N] score matrix never materializes
in HBM. Numerically interchangeable with the dense softmax path
(VideoMAE/utils.py:108-113): q arrives pre-scaled (softmax scale 1), scores
and the accumulator run in f32.

Layout: q, k, v [B, H, N, D] -> out [B, H, N, D]. Non-multiple-of-block
sequence lengths are zero-padded; padded keys are masked to -inf, padded
queries sliced off.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512

# f32 score-tile budget per program; [block_q, block_k] must fit in VMEM
# alongside the full per-(batch, head) K/V panels the BlockSpec pins there
_SCORE_TILE_BYTES = 5 * 1024 * 1024


_TUNED_TABLE = None


def _tuned_blocks(n: int, nk: int, d: int = 64):
    """Measured-best blocks from scripts/tune_flash.py, if archived.

    Defensive validation at load: entries must be 16-aligned (the bf16
    native tile is (16, 128); 16 also satisfies the f32 (8, 128) tile) and
    respect the score-tile budget — a stale or hand-edited record must not
    reintroduce a Mosaic tiling hazard."""
    global _TUNED_TABLE
    if _TUNED_TABLE is None:
        import json
        import os
        path = os.path.join(os.path.dirname(__file__), 'flash_tuned.json')
        try:
            with open(path) as f:
                _TUNED_TABLE = json.load(f)
        except (OSError, ValueError):
            _TUNED_TABLE = {}
    rec = _TUNED_TABLE.get(f'{n}x{nk}x{d}')
    if not rec:
        return None
    bq, bk = rec['block_q'], rec['block_k']
    if bq % 16 or bk % 16 or bq * bk * 4 > _SCORE_TILE_BYTES:
        return None
    return bq, bk


def _vmem_budget_check(nk_padded: int, block_q: int, max_block_k: int,
                       d: int, itemsize: int, interpret: bool, what: str):
    """Refuse configurations beyond the VMEM budget with a clear error
    rather than failing deep inside Mosaic. Counts the kernel's REAL
    residency, not just raw panel bytes: zero-PADDED K/V panels (both
    kernels keep whole panels resident), the double-buffered q/out
    blocks, the f32 score + exp tiles, and the f32 accumulator."""
    panel_bytes = 2 * nk_padded * d * itemsize
    qo_bytes = 2 * 2 * block_q * d * itemsize       # q + out, 2x pipelined
    score_bytes = 2 * block_q * max_block_k * 4     # s and p tiles, f32
    acc_bytes = block_q * (d + 2) * 4               # acc + m + l, f32
    total = panel_bytes + qo_bytes + score_bytes + acc_bytes
    if not interpret and total > 14 * 1024 * 1024:
        raise ValueError(
            f'{what}: estimated VMEM residency {total / 2 ** 20:.1f} MiB '
            f'(padded keys={nk_padded}, d={d}, block_q={block_q}, '
            f'block_k={max_block_k}) exceeds the ~14 MiB budget of this '
            'kernel, which keeps whole K/V panels resident; use '
            'attn_impl="dense" or a k-streaming kernel for sequences '
            'this long')


def _pick_blocks(n: int, nk: int, d: int = 64, force_block_q: int = None):
    """Choose (block_q, block_k) minimizing padding + loop overhead.

    A measured table (scripts/tune_flash.py -> ops/flash_tuned.json) wins
    when present. Heuristic otherwise — measured on TPU v5e at the
    counterfactual workload shapes (S=16 ViT-L 4x4 suffix decode: q 1568,
    kv 4704): exact-divisor q blocks plus a single k block beat the padded
    256/512 default by ~30% — the kernel is MXU-bound at head_dim 64, so
    eliminating pad flops and the inner-loop carry dependency is worth more
    than tile reuse.

    All blocks are multiples of 16: the bf16 native tile is (16, 128)
    (f32's (8, 128) is also satisfied), so VMEM windows and the in-kernel
    pl.ds key slices stay sublane-aligned on hardware — interpret mode
    would accept 8-multiples that Mosaic rejects or mistiles.

    force_block_q: pin block_q (the two-source kernel shares one q block
    across both of its k panels) — block_k is then capped against the
    PINNED q so the score tile respects the budget for the actual pair.
    """
    tuned = _tuned_blocks(n, nk, d)
    if tuned and force_block_q is None:
        return tuned
    if force_block_q is not None:
        block_q = force_block_q
        if tuned and block_q * tuned[1] * 4 <= _SCORE_TILE_BYTES:
            return block_q, tuned[1]
    else:
        block_q = None
        for cand in range(min(448, n) - min(448, n) % 16, 127, -16):
            if n % cand == 0:  # cand is a multiple of 16 by construction
                block_q = cand
                break
        if block_q is None:
            block_q = min(DEFAULT_BLOCK_Q, -(-n // 16) * 16)
    nk16 = -(-nk // 16) * 16
    if block_q * nk16 * 4 <= _SCORE_TILE_BYTES:
        block_k = nk16
    else:
        block_k = None
        cap = _SCORE_TILE_BYTES // (4 * block_q)
        for cand in range(min(cap - cap % 16, nk16), 255, -16):
            if nk16 % cand == 0:
                block_k = cand
                break
        block_k = block_k or min(DEFAULT_BLOCK_K,
                                 max(16, cap - cap % 16))
    return block_q, block_k


def _init_softmax_carry(bq: int, d: int):
    return (jnp.full((bq, 1), -jnp.inf, jnp.float32),
            jnp.zeros((bq, 1), jnp.float32),
            jnp.zeros((bq, d), jnp.float32))


def _attend_panel(q, k_ref, v_ref, block_k: int, n_valid: int, carry):
    """Fold one resident K/V panel into the online-softmax state.

    Shared by the single-source and two-source kernels. Matmuls run in
    the input dtype (bf16 inputs hit the MXU at bf16 rate) with f32
    accumulation; softmax statistics (m, l) stay f32 throughout. Keys
    at index >= n_valid are padding and masked to -inf.
    """
    n_pad = k_ref.shape[1]

    def body(i, c):
        m, l, acc = c
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        key_idx = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1) \
            + i * block_k
        s = jnp.where(key_idx < n_valid, s, -jnp.inf)
        m_new = jnp.maximum(m, s.max(-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p.astype(v.dtype), v,
                                        preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    return jax.lax.fori_loop(0, n_pad // block_k, body, carry)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, n_valid: int):
    q = q_ref[0]                               # [BQ, D]
    bq, d = q.shape
    m, l, acc = _attend_panel(q, k_ref, v_ref, block_k, n_valid,
                              _init_softmax_carry(bq, d))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('block_q', 'block_k',
                                             'interpret'))
def _flash_bhnd(q, k, v, block_q: int, block_k: int, interpret: bool):
    bh, n, d = q.shape
    nk = k.shape[1]
    n_pad_q = -(-n // block_q) * block_q
    n_pad_k = -(-nk // block_k) * block_k
    _vmem_budget_check(n_pad_k, block_q, block_k, d, q.dtype.itemsize,
                       interpret, 'flash_attention')
    qp = jnp.pad(q, ((0, 0), (0, n_pad_q - n), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, n_pad_k - nk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad_k - nk), (0, 0)))

    grid = (bh, n_pad_q // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, n_valid=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad_k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad_k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad_q, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_pad_q * n_pad_k * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=bh * n_pad_q * n_pad_k),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :n]


def flash_attention(q, k, v, block_q: int = None, block_k: int = None,
                    interpret: bool = None) -> jnp.ndarray:
    """Online-softmax attention. q [B, H, Nq, D] pre-scaled; k, v
    [B, H, Nk, D] (cross-attention shapes allowed: Nq != Nk). Block sizes
    are auto-tuned to the sequence lengths unless given.

    On non-TPU backends the kernel runs in interpreter mode (slow; tests
    only) unless ``interpret`` is forced.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, h, n, d = q.shape
    nk = k.shape[2]
    if block_q is None or block_k is None:
        auto_q, auto_k = _pick_blocks(n, nk, d)
        block_q = block_q or auto_q
        block_k = block_k or auto_k
    q3 = q.reshape(b * h, n, d)
    k3 = k.reshape(b * h, nk, d)
    v3 = v.reshape(b * h, nk, d)
    out = _flash_bhnd(q3, k3, v3, block_q, block_k, interpret)
    return out.reshape(b, h, n, d)


def _flash2_kernel(q_ref, k0_ref, v0_ref, k1_ref, v1_ref, o_ref, *,
                   block_k0: int, block_k1: int, n0_valid: int,
                   n1_valid: int):
    """Two-source online softmax: shared prefix K/V panels then per-sample
    own panels, one softmax state across both (_attend_panel twice)."""
    q = q_ref[0]
    bq, d = q.shape
    carry = _attend_panel(q, k0_ref, v0_ref, block_k0, n0_valid,
                          _init_softmax_carry(bq, d))
    m, l, acc = _attend_panel(q, k1_ref, v1_ref, block_k1, n1_valid, carry)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def flash_attention_prefix(q, k0, v0, k1, v1,
                           interpret: bool = None) -> jnp.ndarray:
    """Attention over [shared prefix keys ; per-sample own keys] WITHOUT
    materializing the prefix per sample.

    q [S, H, Nq, D] pre-scaled; k0, v0 [1, H, N0, D] sample-independent
    (the shared-prefix engine's per-layer cache — read in place via the
    BlockSpec index map); k1, v1 [S, H, N1, D]. Equivalent to
    flash_attention(q, concat([broadcast(k0), k1], 2), ...) but skips the
    S-fold broadcast+concat HBM writes of the prefix panels.

    k0, v0 may instead be [S, H, N0, D]: a PER-SAMPLE prefix (stacked
    caches of S different scenes — the multi-scene batched warm path,
    fast_vmae.stack_prefix_caches). Panel b then maps to sample b//H's
    own prefix instead of the shared one.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    s, h, nq, d = q.shape
    s0 = k0.shape[0]
    if s0 not in (1, s):
        # a ValueError (not assert) so a mis-stacked prefix batch fails
        # loudly even under python -O, instead of the BlockSpec index map
        # silently reading wrong-scene panels
        raise ValueError(
            f'flash_attention_prefix: prefix batch dim {s0} must be 1 '
            f'(shared scene) or match the sample dim {s} (stacked '
            'per-sample prefixes)')
    n0 = k0.shape[2]
    n1 = k1.shape[2]
    if n0 == 0 or n1 == 0:
        raise ValueError(
            f'flash_attention_prefix: empty panel (N0={n0}, N1={n1}); '
            'use flash_attention for single-source attention')

    block_q, block_k0 = _pick_blocks(nq, n0, d)
    # the q block is shared across both k panels: pin it so block_k1 is
    # capped against the ACTUAL pair (score tile = block_q x block_k1)
    _, block_k1 = _pick_blocks(nq, n1, d, force_block_q=block_q)

    nq_p = -(-nq // block_q) * block_q
    n0_p = -(-n0 // block_k0) * block_k0
    n1_p = -(-n1 // block_k1) * block_k1
    # this kernel keeps BOTH (padded) prefix and suffix K/V panels resident
    _vmem_budget_check(n0_p + n1_p, block_q, max(block_k0, block_k1), d,
                       q.dtype.itemsize, interpret,
                       'flash_attention_prefix')
    qp = jnp.pad(q.reshape(s * h, nq, d), ((0, 0), (0, nq_p - nq), (0, 0)))
    k0p = jnp.pad(k0.reshape(s0 * h, n0, d),
                  ((0, 0), (0, n0_p - n0), (0, 0)))
    v0p = jnp.pad(v0.reshape(s0 * h, n0, d),
                  ((0, 0), (0, n0_p - n0), (0, 0)))
    k1p = jnp.pad(k1.reshape(s * h, n1, d), ((0, 0), (0, n1_p - n1), (0, 0)))
    v1p = jnp.pad(v1.reshape(s * h, n1, d), ((0, 0), (0, n1_p - n1), (0, 0)))

    grid = (s * h, nq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_flash2_kernel, block_k0=block_k0,
                          block_k1=block_k1, n0_valid=n0, n1_valid=n1),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            # prefix panels: shared (s0=1) -> block index b % H, every
            # sample of a head reads the SAME panel, nothing materialized
            # per sample; per-sample (s0=S, stacked scenes) -> panel b
            pl.BlockSpec((1, n0_p, d),
                         (lambda b, i, _h=h: (b % _h, 0, 0)) if s0 == 1
                         else (lambda b, i: (b, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n0_p, d),
                         (lambda b, i, _h=h: (b % _h, 0, 0)) if s0 == 1
                         else (lambda b, i: (b, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1_p, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1_p, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s * h, nq_p, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * s * h * nq_p * (n0_p + n1_p) * d,
            bytes_accessed=(qp.size + k0p.size + v0p.size + k1p.size
                            + v1p.size) * qp.dtype.itemsize,
            transcendentals=s * h * nq_p * (n0_p + n1_p)),
        interpret=interpret,
    )(qp, k0p, v0p, k1p, v1p)
    return out[:, :nq].reshape(s, h, nq, d)
