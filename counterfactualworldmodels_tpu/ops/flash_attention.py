"""Flash attention for TPU (Pallas).

Replaces the reference's optional HazyResearch CUDA flash-attention path
(cwm/models/VideoMAE/utils.py:71-73,102-106) with a Pallas kernel: the
[N, N] score matrix never materializes in HBM. Numerically interchangeable
with the dense softmax path (VideoMAE/utils.py:108-113): q arrives
pre-scaled (softmax scale 1), scores and the accumulator run in f32.

Kernel design (v2, tuned on v5e at the counterfactual suffix-decode
shapes — see PERF.md "Suffix attention kernel"):

- whole (zero-padded) K/V panels stay resident in VMEM per (batch, head)
  program; the VMEM budget check refuses shapes beyond that regime;
- keys are processed in python-unrolled CHUNKS whose expensive ops (QK^T,
  softmax, PV) are mutually independent dataflow islands; only a cheap
  [bq, 1]/[bq, d] running merge chains chunks, so Mosaic can overlap
  chunk j+1's QK^T matmul with chunk j's softmax instead of serializing
  on a fori_loop online-softmax carry;
- softmax runs in the exp2 domain (p = exp2(s*log2e - m*log2e), one FMA +
  one exp2 per score element instead of sub + exp);
- padded-key masking is applied ONLY to chunks that statically contain
  padding (measured: the always-mask iota+where cost ~4% at the bench
  shape, and most workload shapes divide exactly).

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

_LOG2E = 1.4426950408889634

# f32 score-tile budget per program; [block_q, block_k] must fit in VMEM
# alongside the full per-(batch, head) K/V panels the BlockSpec pins there
_SCORE_TILE_BYTES = 5 * 1024 * 1024


_TUNED_TABLE = None


def _tuned_blocks(n: int, nk: int, d: int = 64):
    """Measured-best blocks from scripts/tune_flash.py, if archived.

    Entries carry ``v: 2`` (the unrolled-partials kernel); records tuned
    for the retired v1 carry-chain kernel are ignored. Defensive
    validation at load: entries must be 16-aligned (the bf16 native tile
    is (16, 128); 16 also satisfies the f32 (8, 128) tile) and respect
    the score-tile budget — a stale or hand-edited record must not
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
    if not rec or rec.get('v') != 2:
        return None
    bq, bk = rec['block_q'], rec['block_k']
    if bq % 16 or bk % 16 or bq * bk * 4 > _SCORE_TILE_BYTES:
        return None
    return bq, bk


def _tuned_2src(nq: int, n0: int, n1: int, d: int, itemsize: int = 2):
    """Measured-best (block_q, block_k0, block_k1) for the two-source
    kernel at this exact panel pair, if archived (same validation rules
    as _tuned_blocks, with the score-tile cap evaluated at the PAIR's
    total panel residency)."""
    _tuned_blocks(0, 0, 0)  # ensure the table is loaded
    rec = _TUNED_TABLE.get(f'2src:{nq}x{n0}x{n1}x{d}')
    if not rec or rec.get('v') != 2:
        return None
    bq, bk0, bk1 = rec['block_q'], rec['block_k0'], rec['block_k1']
    if any(x % 16 for x in (bq, bk0, bk1)):
        return None
    if (bq * max(bk0, bk1) * 4
            > _score_tile_cap(n0 + n1, bq, d, itemsize)):
        return None
    return bq, bk0, bk1


def _vmem_budget_check(nk_padded: int, block_q: int, max_block_k: int,
                       d: int, itemsize: int, interpret: bool, what: str):
    """Refuse configurations beyond the VMEM budget with a clear error
    rather than failing deep inside Mosaic. Counts the kernel's REAL
    residency: zero-PADDED K/V panels at their LANE-PADDED width (the
    VMEM tile is (8/16, 128), so d=64 panels occupy 128 lanes), the
    double-buffered q/out blocks, two in-flight f32 score/exp tiles, and
    the running softmax state."""
    d_lanes = -(-d // 128) * 128
    panel_bytes = 2 * nk_padded * d_lanes * itemsize
    qo_bytes = 2 * 2 * block_q * d_lanes * itemsize  # q + out, 2x pipelined
    score_bytes = 2 * block_q * max_block_k * 4      # s and p tiles, f32
    # running (m, l, acc) state: two lane-padded [bq, 1] + one [bq, d],
    # twice (the in-flight chunk's island + the merged state)
    acc_bytes = 2 * block_q * (d_lanes + 2 * 128) * 4
    total = panel_bytes + qo_bytes + score_bytes + acc_bytes
    if not interpret and total > 14 * 1024 * 1024:
        raise ValueError(
            f'{what}: estimated VMEM residency {total / 2 ** 20:.1f} MiB '
            f'(padded keys={nk_padded}, d={d}, block_q={block_q}, '
            f'block_k={max_block_k}) exceeds the ~14 MiB budget of this '
            'kernel, which keeps whole K/V panels resident; use '
            'attn_impl="dense" or a k-streaming kernel for sequences '
            'this long')


def _score_tile_cap(nk_resident: int, block_q: int, d: int,
                    itemsize: int) -> int:
    """Max score-tile bytes consistent with _vmem_budget_check's residency
    model at this panel size: 14 MiB minus panels, q/out, and softmax
    state, split over the TWO in-flight score tiles. Without this,
    _pick_blocks could choose a tile that passes the per-tile cap but
    blows the whole-kernel budget once the panels are counted (seen at
    the conjoined nq=3168/nk=6336 shapes)."""
    d_lanes = -(-d // 128) * 128
    panel_bytes = 2 * nk_resident * d_lanes * itemsize
    qo_bytes = 2 * 2 * block_q * d_lanes * itemsize
    acc_bytes = 2 * block_q * (d_lanes + 2 * 128) * 4
    free = 14 * 1024 * 1024 - panel_bytes - qo_bytes - acc_bytes
    return max(0, min(_SCORE_TILE_BYTES, free // 2))


def _wide_dtype_vmem_overflow(nk_resident: int, d: int,
                              itemsize: int) -> bool:
    """True when this whole-panel-resident kernel cannot fit the dtype.

    Mosaic double-buffers the K/V panel windows, so the real scoped-VMEM
    floor is ~2x the single-copy panel bytes plus score/softmax
    temporaries. The bf16 production shapes (up to 6336 resident keys,
    ~6.5 MiB double-buffered panels) compile and run on v5e; the same
    panel WIDTH in f32 was measured OOM (23.87 MiB scoped vs the 16 MiB
    limit — ViT-L decoder 6272x6272 f32, fidelity_report decomposition
    leg, r05). Wide dtypes therefore get this conservative gate and the
    entry points fall back to the chunked dense reference (same math);
    bf16 block selection is untouched (measured-good)."""
    if itemsize < 4:
        return False
    d_lanes = -(-d // 128) * 128
    panels2 = 2 * 2 * nk_resident * d_lanes * itemsize  # K+V, 2x buffered
    return panels2 + 6 * 1024 * 1024 > 15 * 1024 * 1024


def _pick_blocks(n: int, nk: int, d: int = 64, force_block_q: int = None,
                 nk_resident: int = None, itemsize: int = 2):
    """Choose (block_q, block_k): q block and key CHUNK size.

    A measured table (scripts/tune_flash.py -> ops/flash_tuned.json) wins
    when present. Heuristic otherwise — measured on TPU v5e at the
    counterfactual workload shapes (ViT-L 4x4 @224 suffix decode: q 3136,
    kv 6272): large exact-divisor q blocks (the MXU streams M; bigger
    blocks amortize panel residency and per-program overhead) with key
    chunks of 1-4 exact-divisor slices beat padded defaults — pad flops
    are pure waste for an MXU-bound kernel at head_dim 64.

    All blocks are multiples of 16: the bf16 native tile is (16, 128)
    (f32's (8, 128) is also satisfied), so VMEM windows and the in-kernel
    static key slices stay sublane-aligned on hardware — interpret mode
    would accept 8-multiples that Mosaic rejects or mistiles.

    force_block_q: pin block_q (the two-source kernel shares one q block
    across both of its k panels) — block_k is then capped against the
    PINNED q so the score tile respects the budget for the actual pair.

    nk_resident: total padded keys the kernel keeps resident (for the
    two-source kernel: BOTH panels) — the score-tile cap shrinks as the
    panels grow so the whole-kernel VMEM budget holds. Defaults to nk.
    """
    nk_res16 = -(-(nk_resident or nk) // 16) * 16
    tuned = _tuned_blocks(n, nk, d)
    if tuned is not None:
        tile_cap = _score_tile_cap(nk_res16, tuned[0], d, itemsize)
        if tuned[0] * tuned[1] * 4 > tile_cap:
            tuned = None  # tuned at a smaller-panel shape; re-derive
    if tuned and force_block_q is None:
        return tuned
    if force_block_q is not None:
        block_q = force_block_q
        if tuned and (block_q * tuned[1] * 4
                      <= _score_tile_cap(nk_res16, block_q, d, itemsize)):
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
    tile_cap = _score_tile_cap(nk_res16, block_q, d, itemsize)
    if block_q * nk16 * 4 <= tile_cap:
        block_k = nk16
    else:
        block_k = None
        cap = tile_cap // (4 * block_q)
        for cand in range(min(cap - cap % 16, nk16), 255, -16):
            if nk16 % cand == 0:
                block_k = cand
                break
        block_k = block_k or min(DEFAULT_BLOCK_K,
                                 max(16, cap - cap % 16))
    return block_q, block_k


def _panel_partials(q2, k_ref, v_ref, block_k: int, n_valid: int, state,
                    score_dtype=jnp.float32, weight: float = 1.0):
    """Fold one resident K/V panel into the softmax ``state`` (m, l, acc).

    Chunks are PYTHON-UNROLLED: chunk j's expensive ops (QK^T matmul,
    softmax, PV matmul) form an independent dataflow island — only the
    cheap [bq, 1]/[bq, d] running merge at the end of each chunk chains
    to the previous chunk, so Mosaic can run chunk j+1's QK^T under
    chunk j's softmax instead of serializing on an online-softmax carry
    (a fori_loop body cannot be scheduled across iterations; measured
    +15% at the dec_suffix bench shape). Matmuls run in the input dtype
    (bf16 inputs hit the MXU at bf16 rate) with f32 accumulation. Keys
    at index >= n_valid are padding; the -inf mask is applied only to
    chunks that statically contain padding (the always-mask iota+where
    cost ~4% at the bench shape).

    score_dtype: dtype the MXU emits the QK^T score tile in. The kernel
    class is bound by score-tile result-write bytes (PERF.md roofline),
    so bfloat16 halves the binding traffic (~2x) at the cost of rounding
    each logit to bf16 (~0.4% relative) BEFORE the (still f32) softmax.
    Exp/merge statistics and the accumulator stay f32 either way.

    weight: static multiplicity of every key in this panel — each key
    counts as ``weight`` identical keys in the softmax (l and acc scale
    by it; equivalent to adding ln(weight) to the panel's logits). Used
    by the pooled-prefix mode, where one pooled key stands for pool^2
    originals. 1.0 is a no-op.
    """
    n_pad = k_ref.shape[-2]
    lead = (0,) * (len(k_ref.shape) - 2)  # collapse (1, [1,]) block dims
    m_run, l_run, acc_run = state
    for j in range(n_pad // block_k):
        sl = lead + (slice(j * block_k, (j + 1) * block_k), slice(None))
        k = k_ref[sl]
        v = v_ref[sl]
        s = jax.lax.dot_general(q2, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if score_dtype != jnp.float32:
            # Mosaic requires a 32-bit matmul accumulator, so the rounding
            # is a fused epilogue cast: the [bq, bk] tile then lives in
            # VMEM (and feeds max/exp) at half the bytes
            s = s.astype(score_dtype)
        if (j + 1) * block_k > n_valid:  # static: this chunk has padding
            key_idx = jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1) + j * block_k
            s = jnp.where(key_idx < n_valid, s,
                          jnp.asarray(-jnp.inf, score_dtype))
        m = s.max(-1, keepdims=True).astype(jnp.float32)
        # p = exp(s - m) == exp2(s*log2e - m*log2e): one FMA + one exp2;
        # computed in f32 (a vreg-fused cast when s is bf16)
        p = jnp.exp2(s.astype(jnp.float32) * _LOG2E - m * _LOG2E)
        l = p.sum(-1, keepdims=True)
        acc = jax.lax.dot_general(p.astype(v.dtype), v,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if weight != 1.0:
            # each key counts `weight` times: scale the [bq, 1]/[bq, d]
            # partials (m stays the raw max — stability only)
            l = l * weight
            acc = acc * weight
        if m_run is None:
            m_run, l_run, acc_run = m, l, acc
        else:
            # cheap running merge; an all-padding chunk has m = -inf and
            # contributes exp2(-inf - m_new) = 0 exactly
            m_new = jnp.maximum(m_run, m)
            a_old = jnp.exp2((m_run - m_new) * _LOG2E)
            a_new = jnp.exp2((m - m_new) * _LOG2E)
            l_run = l_run * a_old + l * a_new
            acc_run = acc_run * a_old + acc * a_new
            m_run = m_new
    return m_run, l_run, acc_run


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, n_valid: int,
                  score_dtype):
    m, l, acc = _panel_partials(q_ref[0], k_ref, v_ref, block_k, n_valid,
                                (None, None, None), score_dtype)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('block_q', 'block_k',
                                             'interpret', 'score_dtype'))
def _flash_bhnd(q, k, v, block_q: int, block_k: int, interpret: bool,
                score_dtype: str = 'float32'):
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
        functools.partial(_flash_kernel, block_k=block_k, n_valid=nk,
                          score_dtype=jnp.dtype(score_dtype)),
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


def _flash_kernel_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                      block_k: int, n_valid: int, score_dtype):
    """Forward kernel that also writes the per-row softmax logsumexp
    (m + ln l) — the residual the Pallas backward needs to rebuild the
    probabilities without re-running the online softmax."""
    m, l, acc = _panel_partials(q_ref[0], k_ref, v_ref, block_k, n_valid,
                                (None, None, None), score_dtype)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


@functools.partial(jax.jit, static_argnames=('block_q', 'block_k',
                                             'interpret', 'score_dtype'))
def _flash_bhnd_lse(q, k, v, block_q: int, block_k: int, interpret: bool,
                    score_dtype: str = 'float32'):
    """_flash_bhnd variant returning (out, lse[bh, n] f32). Used only on
    the training forward (custom_vjp fwd rule); the lse write adds n
    floats per (batch, head) — noise next to the attention matmuls."""
    bh, n, d = q.shape
    nk = k.shape[1]
    n_pad_q = -(-n // block_q) * block_q
    n_pad_k = -(-nk // block_k) * block_k
    _vmem_budget_check(n_pad_k, block_q, block_k, d, q.dtype.itemsize,
                       interpret, 'flash_attention(lse)')
    qp = jnp.pad(q, ((0, 0), (0, n_pad_q - n), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, n_pad_k - nk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad_k - nk), (0, 0)))
    grid = (bh, n_pad_q // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel_lse, block_k=block_k, n_valid=nk,
                          score_dtype=jnp.dtype(score_dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad_k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad_k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad_q, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad_q, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_pad_q * n_pad_k * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=bh * n_pad_q * n_pad_k),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :n], lse[:, :n, 0]


def _flash_bwd_kernel(q_ref, do_ref, l_ref, dd_ref, k_ref, v_ref,
                      dq_ref, dk_ref, dv_ref, *, chunk_q: int):
    """Fused flash backward, one program per (batch*head, key block).

    Scores are rebuilt TRANSPOSED ([block_k, chunk_q]) so the per-QUERY
    statistics (lse L, delta D = rowsum(dO*O)) broadcast along the lane
    dimension — L and D arrive pre-reshaped to [1, n_chunks, chunk_q] and
    are sliced on sublanes (lane slices at non-128 offsets would force a
    relayout). Per key block: dv += P^T dO', dS^T = P^T * (V dO^T - D),
    dk += dS^T Q, and the dq panel (same output block for every key step
    of a (batch, head) — the sequential-grid revisiting accumulation
    idiom) gains dS K per query chunk. 5 MXU matmuls per (q, k) tile pair
    = 10*Nq*Nk*D backward FLOPs, no score tensor ever in HBM.

    Padded queries contribute exactly zero to dk/dv/dq (dO, L, D are
    zero-padded: P^T column = exp(0-0) = 1 but every product term is 0);
    padded keys produce garbage dk/dv rows that the host slices off, and
    their dq contribution is dS^T^T @ 0 = 0. No masking needed anywhere.
    """
    first = pl.program_id(1) == 0
    kb = k_ref[0]                       # [bk, d]
    vb = v_ref[0]
    nq_pad = q_ref.shape[1]
    dk_acc = None
    dv_acc = None
    for i in range(nq_pad // chunk_q):
        sl = slice(i * chunk_q, (i + 1) * chunk_q)
        qc = q_ref[0, sl]               # [cq, d]
        doc = do_ref[0, sl]
        lc = l_ref[0, i:i + 1, :]       # [1, cq] f32, lanes = queries
        dc = dd_ref[0, i:i + 1, :]
        s_t = jax.lax.dot_general(kb, qc, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        p_t = jnp.exp2(s_t * _LOG2E - lc * _LOG2E)      # [bk, cq]
        dv_c = jax.lax.dot_general(p_t.astype(doc.dtype), doc,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dp_t = jax.lax.dot_general(vb, doc, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        ds_t = (p_t * (dp_t - dc)).astype(qc.dtype)     # [bk, cq]
        dk_c = jax.lax.dot_general(ds_t, qc, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dq_c = jax.lax.dot_general(ds_t, kb, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

        @pl.when(first)
        def _():
            dq_ref[0, sl] = dq_c

        @pl.when(jnp.logical_not(first))
        def _():
            dq_ref[0, sl] = dq_ref[0, sl] + dq_c

        dk_acc = dk_c if dk_acc is None else dk_acc + dk_c
        dv_acc = dv_c if dv_acc is None else dv_acc + dv_c
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _divisor_block(n16: int, cap: int) -> int:
    """Largest 16-multiple <= cap that divides n16 (itself a multiple of
    16); falls back to cap (the caller pads) when none >= 128 exists."""
    top = min(cap, n16)
    for cand in range(top - top % 16, 127, -16):
        if n16 % cand == 0:
            return cand
    return top - top % 16 or 16


def _pick_bwd_blocks(n: int, nk: int, d: int, itemsize: int):
    """(chunk_q, block_k) for the fused backward, or None when the
    resident set (q/dO panels + f32 dq panel) cannot fit VMEM — the
    caller then falls back to the chunked dense vjp."""
    d_lanes = -(-d // 128) * 128
    n16 = -(-n // 16) * 16
    nk16 = -(-nk // 16) * 16
    panels = n16 * d_lanes * (2 * itemsize + 4)       # q + dO + f32 dq
    if panels > 9 * 1024 * 1024:
        return None
    for cap_k in (512, 256, 128):
        bk = _divisor_block(nk16, cap_k)
        for cap_q in (512, 256, 128):
            cq = _divisor_block(n16, cap_q)
            tiles = 3 * bk * cq * 4                   # s/p, dp, ds tiles
            blocks = 4 * bk * d_lanes * 4             # k, v, dk, dv
            if panels + tiles + blocks < 12 * 1024 * 1024:
                return cq, bk
    return None


@functools.partial(jax.jit, static_argnames=('chunk_q', 'block_k',
                                             'interpret'))
def _flash_bwd_bhnd(q, k, v, do, lse, delta, chunk_q: int, block_k: int,
                    interpret: bool):
    """Dispatch the fused backward kernel. q/k/v/do [bh, n(, k), d];
    lse/delta [bh, n] f32 (delta = rowsum(dO * O)). Returns (dq, dk, dv)
    in q.dtype."""
    bh, n, d = q.shape
    nk = k.shape[1]
    n_pad = -(-n // chunk_q) * chunk_q
    nk_pad = -(-nk // block_k) * block_k
    qp = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))
    dop = jnp.pad(do, ((0, 0), (0, n_pad - n), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, nk_pad - nk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, nk_pad - nk), (0, 0)))
    nc = n_pad // chunk_q
    lp = jnp.pad(lse, ((0, 0), (0, n_pad - n))).reshape(bh, nc, chunk_q)
    dp_ = jnp.pad(delta, ((0, 0), (0, n_pad - n))).reshape(bh, nc, chunk_q)
    grid = (bh, nk_pad // block_k)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, chunk_q=chunk_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_pad, d), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, chunk_q), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, chunk_q), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_pad, d), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, nk_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, d), q.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * n_pad * nk_pad * d,
            bytes_accessed=3 * (qp.size + kp.size) * qp.dtype.itemsize,
            transcendentals=bh * n_pad * nk_pad),
        interpret=interpret,
    )(qp, dop, lp, dp_, kp, vp)
    return (dq[:, :n].astype(q.dtype), dk[:, :nk], dv[:, :nk])


def _chunked_dense_attention(q, k, v, bias=None):
    """Differentiable reference attention, scanned over query chunks with
    per-chunk rematerialization — O(chunk * Nk) live score memory in both
    passes instead of O(Nq * Nk). Numerics match the dense path (f32
    logits/softmax); used as the backward rule for the Pallas forward
    (which defines no VJP of its own) and as the wide-dtype fallback of
    the entry points (_wide_dtype_vmem_overflow).

    bias: optional [Nk] f32 per-key logit bias (the dense image of the
    kernel's per-panel key-multiplicity weights: +ln(weight))."""
    b, h, n, d = q.shape

    def scores(qc):
        s = jnp.einsum('bhqd,bhkd->bhqk', qc, k,
                       preferred_element_type=jnp.float32)
        return s if bias is None else s + bias

    # bound the live f32 score tile to ~128 MB
    per_row = b * h * k.shape[2] * 4
    chunk = max(64, min(1024, int(2 ** 27 // max(per_row, 1) // 64 * 64)))
    if n <= chunk:
        attn = jax.nn.softmax(scores(q), axis=-1).astype(v.dtype)
        return jnp.einsum('bhqk,bhkd->bhqd', attn, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)
    nc = -(-n // chunk)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, nc * chunk - n), (0, 0)))
    qs = jnp.moveaxis(qp.reshape(b, h, nc, chunk, d), 2, 0)

    def body(_, qc):
        p = jax.nn.softmax(scores(qc), axis=-1).astype(v.dtype)
        o = jnp.einsum('bhqk,bhkd->bhqd', p, v,
                       preferred_element_type=jnp.float32).astype(q.dtype)
        return None, o

    _, out = jax.lax.scan(jax.checkpoint(body), None, qs)
    out = jnp.moveaxis(out, 0, 2).reshape(b, h, nc * chunk, d)
    return out[:, :, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention_vjp(q, k, v, block_q, block_k, interpret, score_dtype):
    b, h, n, d = q.shape
    nk = k.shape[2]
    out = _flash_bhnd(q.reshape(b * h, n, d), k.reshape(b * h, nk, d),
                      v.reshape(b * h, nk, d), block_q, block_k, interpret,
                      score_dtype)
    return out.reshape(b, h, n, d)


def _flash_vjp_fwd(q, k, v, block_q, block_k, interpret, score_dtype):
    b, h, n, d = q.shape
    nk = k.shape[2]
    out, lse = _flash_bhnd_lse(
        q.reshape(b * h, n, d), k.reshape(b * h, nk, d),
        v.reshape(b * h, nk, d), block_q, block_k, interpret, score_dtype)
    out = out.reshape(b, h, n, d)
    return out, (q, k, v, out, lse.reshape(b, h, n))


def _flash_vjp_bwd(block_q, block_k, interpret, score_dtype, res, g):
    """Backward: the fused Pallas kernel (_flash_bwd_kernel — 5 MXU
    matmuls per tile pair, scores never in HBM) when the resident set
    fits VMEM; the chunked dense vjp otherwise (same math, bounded
    memory). CWM_FLASH_BWD forces 'dense' (the pre-r05 path) or 'pallas'
    (even under interpret — CPU parity tests)."""
    import os
    q, k, v, out, lse = res
    mode = os.environ.get('CWM_FLASH_BWD', 'auto')
    b, h, n, d = q.shape
    nk = k.shape[2]
    blocks = _pick_bwd_blocks(n, nk, d, q.dtype.itemsize)
    use_pallas = (mode != 'dense' and blocks is not None
                  and (not interpret or mode == 'pallas'))
    if not use_pallas:
        _, pullback = jax.vjp(_chunked_dense_attention, q, k, v)
        return pullback(g.astype(q.dtype))
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), -1)
    cq, bk = blocks
    dq, dk, dv = _flash_bwd_bhnd(
        q.reshape(b * h, n, d), k.reshape(b * h, nk, d),
        v.reshape(b * h, nk, d), g.astype(q.dtype).reshape(b * h, n, d),
        lse.reshape(b * h, n), delta.reshape(b * h, n), cq, bk, interpret)
    return (dq.reshape(b, h, n, d), dk.reshape(b, h, nk, d),
            dv.reshape(b, h, nk, d))


_flash_attention_vjp.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(q, k, v, block_q: int = None, block_k: int = None,
                    interpret: bool = None,
                    score_dtype: str = 'float32') -> jnp.ndarray:
    """Flash attention. q [B, H, Nq, D] pre-scaled; k, v [B, H, Nk, D]
    (cross-attention shapes allowed: Nq != Nk). Block sizes are
    auto-tuned to the sequence lengths unless given.

    score_dtype: 'float32' (default, exact-parity logits) or 'bfloat16'
    (MXU emits bf16 score tiles — ~2x on the score-write-bound decode
    shapes, each logit rounded to bf16 before the f32 softmax; see
    _panel_partials).

    Differentiable: the forward runs the Pallas kernel; reverse-mode
    gradients come from a chunked dense reference (same math, bounded
    memory), so attn_impl='flash' models train as-is.

    On non-TPU backends the kernel runs in interpreter mode (slow; tests
    only) unless ``interpret`` is forced.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, h, n, d = q.shape
    nk = k.shape[2]
    if not interpret and _wide_dtype_vmem_overflow(nk, d,
                                                   q.dtype.itemsize):
        # f32 panels this wide blow the scoped-VMEM limit; same math,
        # bounded memory, still differentiable
        return _chunked_dense_attention(q, k, v)
    if block_q is None or block_k is None:
        auto_q, auto_k = _pick_blocks(n, nk, d, itemsize=q.dtype.itemsize)
        block_q = block_q or auto_q
        block_k = block_k or auto_k
    return _flash_attention_vjp(q, k, v, block_q, block_k, interpret,
                                str(score_dtype))


def _flash2_kernel(q_ref, k0_ref, v0_ref, k1_ref, v1_ref, o_ref, *,
                   block_k0: int, block_k1: int, n0_valid: int,
                   n1_valid: int, score_dtype, prefix_weight: float,
                   suffix_weight: float):
    """Two-source softmax: shared prefix K/V panels then per-sample own
    panels; all chunks of both panels contribute independent partials to
    ONE softmax (combined at the end)."""
    q = q_ref[0, 0]
    state = _panel_partials(q, k0_ref, v0_ref, block_k0, n0_valid,
                            (None, None, None), score_dtype,
                            weight=prefix_weight)
    m, l, acc = _panel_partials(q, k1_ref, v1_ref, block_k1, n1_valid,
                                state, score_dtype, weight=suffix_weight)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _dense_two_source(q, k0, v0, k1, v1, w0: float, w1: float):
    """Chunked dense image of _flash2_kernel's two-source softmax: the
    per-panel key-multiplicity weights become +ln(w) logit biases over
    the concatenated panels. Wide-dtype fallback (the two-source kernel
    keeps both panels resident; see _wide_dtype_vmem_overflow)."""
    import math
    s = q.shape[0]
    if k0.shape[0] == 1 and s > 1:
        k0 = jnp.broadcast_to(k0, (s,) + k0.shape[1:])
        v0 = jnp.broadcast_to(v0, (s,) + v0.shape[1:])
    k = jnp.concatenate([k0, k1], 2)
    v = jnp.concatenate([v0, v1], 2)
    bias = None
    if w0 != 1.0 or w1 != 1.0:
        bias = jnp.concatenate([
            jnp.full((k0.shape[2],), math.log(w0), jnp.float32),
            jnp.full((k1.shape[2],), math.log(w1), jnp.float32)])
    return _chunked_dense_attention(q, k, v, bias)


@functools.partial(jax.jit, static_argnames=('interpret', 'block_q',
                                             'block_k0', 'block_k1',
                                             'score_dtype',
                                             'prefix_weight',
                                             'suffix_weight'))
def flash_attention_prefix(q, k0, v0, k1, v1,
                           interpret: bool = None,
                           block_q: int = None, block_k0: int = None,
                           block_k1: int = None,
                           score_dtype: str = 'float32',
                           prefix_weight: float = 1.0,
                           suffix_weight: float = 1.0) -> jnp.ndarray:
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

    The grid is ordered (H, S, q-blocks) so that, in the shared-prefix
    layout, consecutive programs of one head revisit the SAME prefix
    panel — Pallas skips the re-fetch, so each prefix panel is DMA'd once
    per head instead of once per (sample, head).
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

    if not interpret and _wide_dtype_vmem_overflow(n0 + n1, d,
                                                   q.dtype.itemsize):
        return _dense_two_source(q, k0, v0, k1, v1,
                                 float(prefix_weight),
                                 float(suffix_weight))

    item = q.dtype.itemsize
    tuned2 = _tuned_2src(nq, n0, n1, d, item)
    if tuned2 and not (block_q or block_k0 or block_k1):
        block_q, block_k0, block_k1 = tuned2
    # both panels stay resident: cap every score tile against their SUM
    auto_q, auto_k0 = _pick_blocks(nq, n0, d, nk_resident=n0 + n1,
                                   itemsize=item)
    block_q = block_q or auto_q
    block_k0 = block_k0 or (auto_k0 if block_q == auto_q else
                            _pick_blocks(nq, n0, d, force_block_q=block_q,
                                         nk_resident=n0 + n1,
                                         itemsize=item)[1])
    # the q block is shared across both k panels: pin it so block_k1 is
    # capped against the ACTUAL pair (score tile = block_q x block_k1)
    block_k1 = block_k1 or _pick_blocks(nq, n1, d, force_block_q=block_q,
                                        nk_resident=n0 + n1,
                                        itemsize=item)[1]

    nq_p = -(-nq // block_q) * block_q
    n0_p = -(-n0 // block_k0) * block_k0
    n1_p = -(-n1 // block_k1) * block_k1
    # this kernel keeps BOTH (padded) prefix and suffix K/V panels resident
    _vmem_budget_check(n0_p + n1_p, block_q, max(block_k0, block_k1), d,
                       q.dtype.itemsize, interpret,
                       'flash_attention_prefix')
    # [S, H, N, D] kept 4-D: the grid is (H, S, i) so panel index maps can
    # address heads and samples separately
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, nq_p - nq), (0, 0)))
    k0p = jnp.pad(k0, ((0, 0), (0, 0), (0, n0_p - n0), (0, 0)))
    v0p = jnp.pad(v0, ((0, 0), (0, 0), (0, n0_p - n0), (0, 0)))
    k1p = jnp.pad(k1, ((0, 0), (0, 0), (0, n1_p - n1), (0, 0)))
    v1p = jnp.pad(v1, ((0, 0), (0, 0), (0, n1_p - n1), (0, 0)))

    # shared prefix (s0=1): panel index (0, h) is CONSTANT while s and i
    # iterate -> fetched once per head. Stacked prefixes (s0=S): panel
    # follows the sample.
    prefix_map = ((lambda h_, s_, i: (0, h_, 0, 0)) if s0 == 1
                  else (lambda h_, s_, i: (s_, h_, 0, 0)))
    grid = (h, s, nq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_flash2_kernel, block_k0=block_k0,
                          block_k1=block_k1, n0_valid=n0, n1_valid=n1,
                          score_dtype=jnp.dtype(score_dtype),
                          prefix_weight=float(prefix_weight),
                          suffix_weight=float(suffix_weight)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda h_, s_, i: (s_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n0_p, d), prefix_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n0_p, d), prefix_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n1_p, d),
                         lambda h_, s_, i: (s_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n1_p, d),
                         lambda h_, s_, i: (s_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda h_, s_, i: (s_, h_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, h, nq_p, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * s * h * nq_p * (n0_p + n1_p) * d,
            bytes_accessed=(qp.size + k0p.size + v0p.size + k1p.size
                            + v1p.size) * qp.dtype.itemsize,
            transcendentals=s * h * nq_p * (n0_p + n1_p)),
        interpret=interpret,
    )(qp, k0p, v0p, k1p, v1p)
    return out[:, :, :nq]
