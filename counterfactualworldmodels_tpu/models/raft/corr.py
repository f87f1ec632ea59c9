"""All-pairs correlation volume + pyramid lookup, XLA-native.

Re-design of reference cwm/models/raft/corr.py:12-60: the correlation is one
einsum (MXU), the pyramid is reshaped mean-pooling, and the bilinear lookup
is a vectorized gather-lerp with zero padding that reproduces
torch.grid_sample(align_corners=True, padding_mode='zeros') — including the
reference's (quirky but checkpoint-relevant) offset ordering where the first
offset axis is added to x and the second to y (corr.py:43-49).
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp


def all_pairs_correlation(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """fmap1/2: [B, H, W, C] -> corr [B, H, W, H, W] scaled by 1/sqrt(C)."""
    c = fmap1.shape[-1]
    corr = jnp.einsum('bijc,bklc->bijkl', fmap1, fmap2,
                      preferred_element_type=jnp.float32)
    return corr / jnp.sqrt(jnp.float32(c))


def build_pyramid(corr: jnp.ndarray, num_levels: int = 4) -> List[jnp.ndarray]:
    """corr [B, H1, W1, H2, W2] -> list of [B*H1*W1, h, w] levels."""
    b, h1, w1, h2, w2 = corr.shape
    level = corr.reshape(b * h1 * w1, h2, w2)
    pyramid = [level]
    for _ in range(num_levels - 1):
        n, h, w = level.shape
        # torch avg_pool2d(kernel=2, stride=2) floors odd dims (drops the
        # last row/col), e.g. 7x7 -> 3x3 at 224px inputs
        level = level[:, :2 * (h // 2), :2 * (w // 2)]
        level = level.reshape(n, h // 2, 2, w // 2, 2).mean((2, 4))
        pyramid.append(level)
    return pyramid


def bilinear_sample(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Sample img [N, H, W] at float pixel coords (xs, ys) [N, ...] with
    bilinear interpolation and zero padding (per-corner zeroing, matching
    torch grid_sample align_corners=True)."""
    n, h, w = img.shape
    flat = img.reshape(n, h * w)

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0

    out = jnp.zeros_like(xs)
    for dy, wy_c in ((0, 1 - wy), (1, wy)):
        for dx, wx_c in ((0, 1 - wx), (1, wx)):
            xi = x0 + dx
            yi = y0 + dy
            valid = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
            idx = (jnp.clip(yi, 0, h - 1) * w +
                   jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
            vals = jnp.take_along_axis(flat, idx.reshape(n, -1),
                                       axis=1).reshape(xs.shape)
            out = out + vals * wx_c * wy_c * valid.astype(img.dtype)
    return out


def pad_pyramid(pyramid: List[jnp.ndarray], radius: int) -> List[jnp.ndarray]:
    """Zero-pad each level by 2*radius+2 so window lookups never leave the
    array even at the coordinate clip bounds. Call once per pyramid (outside
    the GRU scan) — padding inside the refinement loop would re-materialize
    every iteration."""
    pad = 2 * radius + 2
    return [jnp.pad(lv, ((0, 0), (pad, pad), (pad, pad))) for lv in pyramid]


def _window_lookup(level_padded: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                   radius: int, h: int, w: int) -> jnp.ndarray:
    """Bilinear window sample via ONE contiguous dynamic-slice per query.

    The (2r+1)^2 bilinear samples of a window share a (2r+2)^2 integer patch,
    so instead of 4 scattered element-gathers per offset (the XLA-gather
    formulation is ~25x slower on TPU), slice the patch and combine the four
    shifted views with the separable bilinear weights. Zero padding + coord
    pre-clipping reproduce grid_sample's zero out-of-bounds exactly.

    level_padded: [N, h+2p, w+2p] (p = 2*radius+2, what pad_pyramid
    applies — the window slice reaches up to 4r+3 rows past a clipped
    coord); x, y: [N] float coords in
    the UNPADDED frame. Returns [N, 2r+1, 2r+1] where out[:, a, b] is the
    sample at (x - r + a, y - r + b) — the reference's offset ordering
    (corr.py:43-49: first axis offsets x, second offsets y).
    """
    r = radius
    pad = 2 * r + 2
    win = 2 * r + 2
    n, hp, wp = level_padded.shape
    # clip so the window stays inside the padded array; clipped coords have
    # fully-out-of-bounds windows whose real-data contributions get weight 0
    x = jnp.clip(x, -(r + 1.0), w + r)
    y = jnp.clip(y, -(r + 1.0), h + r)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[:, None, None]
    wy = (y - y0)[:, None, None]
    sy = (y0 - r + pad).astype(jnp.int32)
    sx = (x0 - r + pad).astype(jnp.int32)

    # one flat gather of the shared win x win patch per query (a vmapped
    # dynamic_slice compiles pathologically on TPU here)
    ar = jnp.arange(win, dtype=jnp.int32)
    iy = sy[:, None, None] + ar[None, :, None]   # [N, win, 1]
    ix = sx[:, None, None] + ar[None, None, :]   # [N, 1, win]
    idx = (iy * wp + ix).reshape(n, win * win)
    flat = level_padded.reshape(n, hp * wp)
    patch = jnp.take_along_axis(flat, idx, axis=1).reshape(n, win, win)

    p = 2 * r + 1
    out = ((1 - wy) * (1 - wx) * patch[:, :p, :p] +
           (1 - wy) * wx * patch[:, :p, 1:] +
           wy * (1 - wx) * patch[:, 1:, :p] +
           wy * wx * patch[:, 1:, 1:])
    # out[n, row=y-offset, col=x-offset] -> reference order [x-offset, y-offset]
    return jnp.swapaxes(out, 1, 2)


def build_pyramid_lanes(corr: jnp.ndarray, num_levels: int = 4,
                        nb: int = 512) -> List[jnp.ndarray]:
    """Query-on-lanes pyramid layout for the TPU lookup kernel: each level
    is [h2, w2, N_pad] (N = B*H1*W1 queries on the minor/lane axis, padded
    here ONCE to a multiple of the kernel lane block — padding inside the
    refinement scan would re-materialize the full level every iteration)."""
    levels = [jnp.transpose(lv, (1, 2, 0))
              for lv in build_pyramid(corr, num_levels)]
    n = levels[0].shape[2]
    n_pad = -(-n // nb) * nb
    if n_pad != n:
        levels = [jnp.pad(lv, ((0, 0), (0, 0), (0, n_pad - n)))
                  for lv in levels]
    return levels


def lookup_pyramid_lanes(pyramid_t: List[jnp.ndarray], coords: jnp.ndarray,
                         radius: int, force_kernel: bool = False
                         ) -> jnp.ndarray:
    """lookup_pyramid for the lanes layout (build_pyramid_lanes). Same
    returned ordering as lookup_pyramid; runs the vectorized one-hot kernel
    (no gathers, no per-query loops) on TPU. Off-TPU the Pallas interpreter
    is minutes-per-call slow, so this falls back to the equivalent gather
    path unless ``force_kernel`` (parity tests) is set."""
    b, h, w, _ = coords.shape
    r = radius
    p = 2 * r + 1
    on_tpu = jax.default_backend() == 'tpu'
    if not on_tpu and not force_kernel:
        n = b * h * w
        pyramid = pad_pyramid(
            [jnp.transpose(lv[:, :, :n], (2, 0, 1)) for lv in pyramid_t], r)
        return lookup_pyramid(pyramid, coords, r, padded=True)
    x = coords[..., 0].reshape(b * h * w)
    y = coords[..., 1].reshape(b * h * w)
    out = []
    for i, level in enumerate(pyramid_t):
        vals = _window_lookup_lanes(level, x / (2 ** i), y / (2 ** i), r,
                                    interpret=not on_tpu)
        out.append(vals.reshape(b, h, w, p * p))
    return jnp.concatenate(out, axis=-1)


def lookup_pyramid(pyramid: List[jnp.ndarray], coords: jnp.ndarray,
                   radius: int, padded: bool = False,
                   impl: Optional[str] = None) -> jnp.ndarray:
    """Index the correlation pyramid around current flow coords.

    coords: [B, H, W, 2] (x, y) pixel coords at 1/8 res. ``padded`` marks
    pyramid levels already processed by :func:`pad_pyramid`.
    Returns [B, H, W, num_levels * (2r+1)^2] features, ordered exactly like
    the reference (levels outer; within a level, offset (i, j) row-major
    where i offsets x and j offsets y).

    impl: None = backend auto (Pallas kernel on TPU, gather elsewhere);
    'kernel' forces the Pallas window kernel; 'gather' forces the pure-jnp
    gather/lerp formulation — the only path with a reverse-mode derivative
    (the Pallas kernels define no VJP), so training uses it.
    """
    b, h, w, _ = coords.shape
    r = radius
    p = 2 * r + 1
    if not padded:
        pyramid = pad_pyramid(pyramid, radius)
    pad = 2 * r + 2

    x = coords[..., 0].reshape(b * h * w)
    y = coords[..., 1].reshape(b * h * w)
    if impl is None:
        use_pallas = jax.default_backend() == 'tpu'
    else:
        use_pallas = impl == 'kernel'
    out = []
    for i, level in enumerate(pyramid):
        lh = level.shape[1] - 2 * pad
        lw = level.shape[2] - 2 * pad
        fn = _window_lookup_tpu if use_pallas else _window_lookup
        vals = fn(level, x / (2 ** i), y / (2 ** i), r, lh, lw)
        out.append(vals.reshape(b, h, w, p * p))
    return jnp.concatenate(out, axis=-1)


# ---------------------------------------------------------------------------
# Pallas window-lookup kernel: the XLA gather formulation above moves one
# element per index; this kernel keeps each query's corr rows in VMEM,
# slices the row window dynamically (sublane dim), and selects the column
# window with a one-hot matmul (MXU) — no gathers at all.
# ---------------------------------------------------------------------------

def _window_lookup_kernel(sy_ref, sx_ref, wy_ref, wx_ref, lvl_ref, out_ref,
                          *, win: int, rows_per_block: int):
    import jax.experimental.pallas as pl

    wp = lvl_ref.shape[-1]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (wp, win), 0)
    off_iota = jax.lax.broadcasted_iota(jnp.int32, (wp, win), 1)
    p = win - 1
    base = pl.program_id(0) * rows_per_block

    for r in range(rows_per_block):
        sy = sy_ref[base + r]
        sx = sx_ref[base + r]
        rows = lvl_ref[r, pl.ds(sy, win), :].astype(jnp.float32)  # [win, wp]
        onehot = (col_iota == (sx + off_iota)).astype(jnp.float32)
        patch = jnp.dot(rows, onehot,
                        preferred_element_type=jnp.float32)  # [win, win]
        wy = wy_ref[base + r]
        wx = wx_ref[base + r]
        out = ((1 - wy) * (1 - wx) * patch[:p, :p] +
               (1 - wy) * wx * patch[:p, 1:] +
               wy * (1 - wx) * patch[1:, :p] +
               wy * wx * patch[1:, 1:])
        out_ref[r] = out.astype(out_ref.dtype)


def _window_lookup_tpu(level_padded, x, y, radius: int, h: int, w: int,
                       rows_per_block: int = 32, interpret: bool = False):
    """Pallas implementation of :func:`_window_lookup` (same contract)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import functools as _ft

    r = radius
    pad = 2 * r + 2
    win = 2 * r + 2
    n, hp, wp = level_padded.shape
    x = jnp.minimum(jnp.maximum(x, -(r + 1.0)), float(w + r))
    y = jnp.minimum(jnp.maximum(y, -(r + 1.0)), float(h + r))
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(jnp.float32)
    wy = (y - y0).astype(jnp.float32)
    sy = (y0 - r + pad).astype(jnp.int32)
    sx = (x0 - r + pad).astype(jnp.int32)

    nb = rows_per_block
    n_pad = -(-n // nb) * nb
    if n_pad != n:
        level_padded = jnp.pad(level_padded,
                               ((0, n_pad - n), (0, 0), (0, 0)))
        sy = jnp.pad(sy, (0, n_pad - n))
        sx = jnp.pad(sx, (0, n_pad - n))
        wx = jnp.pad(wx, (0, n_pad - n))
        wy = jnp.pad(wy, (0, n_pad - n))

    p = win - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_pad // nb,),
        in_specs=[
            pl.BlockSpec((nb, hp, wp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, p, p), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _ft.partial(_window_lookup_kernel, win=win, rows_per_block=nb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, p, p), jnp.float32),
        interpret=interpret,
    )(sy, sx, wy, wx, level_padded)
    # kernel emits [row=y, col=x]; reference order is [x-offset, y-offset]
    return jnp.swapaxes(out[:n], 1, 2)


# ---------------------------------------------------------------------------
# Lane-parallel window lookup: queries ride the 128-wide lane axis, the
# window select+bilinear is a small static fma loop over one-hot weights —
# no gathers, no per-query dynamic slices, no MXU. This is the TPU-shaped
# answer to torch.grid_sample on the corr pyramid (reference corr.py:43-56):
# the whole per-iteration lookup costs ~VPU-bandwidth over the level arrays.
# ---------------------------------------------------------------------------

def _window_lookup_lanes_kernel(y0_ref, x0_ref, wy_ref, wx_ref, lvl_ref,
                                out_ref, *, radius: int, hp: int, wp: int):
    r = radius
    p = 2 * r + 1
    y0 = y0_ref[0]            # [nb] int32 (floor(y))
    x0 = x0_ref[0]
    wy = wy_ref[0]            # [nb] f32
    wx = wx_ref[0]
    nb = y0.shape[0]

    # Window offset rides the sublane axis: weight tiles are [p, nb] where
    # weight[o, n] is the bilinear contribution of level row/col `i` to the
    # query-n window at offset o. Only i == coord0 - r + o gets (1-frac) and
    # i == coord0 - r + o + 1 gets frac; out-of-range rows never match, so
    # grid_sample's zero padding falls out for free.
    off = jax.lax.broadcasted_iota(jnp.int32, (p, nb), 0)

    def weights(i, c0, frac):
        d = i - off + r           # [p, nb]
        c0b = c0[None, :]
        return (jnp.where(c0b == d, 1.0 - frac[None, :], 0.0) +
                jnp.where(c0b == d - 1, frac[None, :], 0.0))

    # rows first: T[a] [wp, nb] = sum_i roww[a, i] * level[i]
    T = [jnp.zeros((wp, nb), jnp.float32) for _ in range(p)]
    for i in range(hp):
        roww = weights(i, y0, wy)           # [p, nb]
        li = lvl_ref[i]                     # [wp, nb]
        for a in range(p):
            T[a] = T[a] + roww[a][None, :] * li
    # columns second: OUT[a] [p(b), nb] = sum_j colw[j] * T[a][j]
    colws = [weights(j, x0, wx) for j in range(wp)]   # each [p(b), nb]
    for a in range(p):
        acc = jnp.zeros((p, nb), jnp.float32)
        for j in range(wp):
            acc = acc + colws[j] * T[a][j][None, :]
        for b in range(p):
            out_ref[b * p + a] = acc[b]
    # the out block's sublane dim is padded to a multiple of 8 (Mosaic
    # tiling); define the pad rows instead of leaving them uninitialized
    for i in range(p * p, out_ref.shape[0]):
        out_ref[i] = jnp.zeros((nb,), jnp.float32)


def _window_lookup_lanes(level_t: jnp.ndarray, x: jnp.ndarray,
                         y: jnp.ndarray, radius: int, nb: int = 512,
                         interpret: bool = False) -> jnp.ndarray:
    """level_t: [h, w, N] (queries on lanes); x, y: [N] pixel coords.
    Returns [N, 2r+1, 2r+1] ordered [x-offset, y-offset] like
    _window_lookup."""
    import functools as _ft
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = radius
    p = 2 * r + 1
    h, w, n_lvl = level_t.shape
    n = x.shape[0]          # true query count; n_lvl may be pre-padded
    # same safety clip as the gather path; values beyond it contribute zero
    # either way, the clip just keeps floor() in int32 range
    x = jnp.clip(x, -(r + 1.0), w + r)
    y = jnp.clip(y, -(r + 1.0), h + r)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f).astype(jnp.float32)
    wy = (y - y0f).astype(jnp.float32)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    n_pad = -(-n // nb) * nb
    if n_lvl == n_pad:
        pass  # level pre-padded by build_pyramid_lanes (the hot path)
    elif n_lvl == n:
        # lone-call path: pad here (inside a scan this copy repeats every
        # iteration — pass pre-padded levels instead)
        level_t = jnp.pad(level_t, ((0, 0), (0, 0), (0, n_pad - n)))
    else:
        raise ValueError(
            f'level lane dim {n_lvl} matches neither the query count {n} '
            f'nor its padded size {n_pad}')
    if n_pad != n:
        x0 = jnp.pad(x0, (0, n_pad - n))
        y0 = jnp.pad(y0, (0, n_pad - n))
        wx = jnp.pad(wx, (0, n_pad - n))
        wy = jnp.pad(wy, (0, n_pad - n))

    pp_pad = -(-(p * p) // 8) * 8   # sublane-aligned out block (81 -> 88)
    out = pl.pallas_call(
        _ft.partial(_window_lookup_lanes_kernel, radius=r, hp=h, wp=w),
        grid=(n_pad // nb,),
        in_specs=[
            pl.BlockSpec((1, nb), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w, nb), lambda g: (0, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pp_pad, nb), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pp_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(y0[None], x0[None], wy[None], wx[None], level_t)
    return jnp.transpose(out[:p * p, :n], (1, 0)).reshape(n, p, p)
