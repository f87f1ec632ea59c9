"""All-pairs correlation volume + pyramid lookup, XLA-native.

Re-design of reference cwm/models/raft/corr.py:12-60: the correlation is one
einsum (MXU), the pyramid is reshaped mean-pooling, and the bilinear lookup
is a vectorized gather-lerp with zero padding that reproduces
torch.grid_sample(align_corners=True, padding_mode='zeros') — including the
reference's (quirky but checkpoint-relevant) offset ordering where the first
offset axis is added to x and the second to y (corr.py:43-49).
"""
from __future__ import annotations

from typing import List, Tuple

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


def lookup_pyramid(pyramid: List[jnp.ndarray], coords: jnp.ndarray,
                   radius: int) -> jnp.ndarray:
    """Index the correlation pyramid around current flow coords.

    coords: [B, H, W, 2] (x, y) pixel coords at 1/8 res.
    Returns [B, H, W, num_levels * (2r+1)^2] features, ordered exactly like
    the reference (levels outer; within a level, offset (i, j) row-major
    where i offsets x and j offsets y).
    """
    b, h, w, _ = coords.shape
    r = radius
    p = 2 * r + 1
    off = jnp.arange(-r, r + 1, dtype=coords.dtype)
    # reference: delta[...,0] (added to x) varies along axis 0; delta[...,1]
    # (added to y) varies along axis 1
    off_x = jnp.broadcast_to(off[:, None], (p, p))
    off_y = jnp.broadcast_to(off[None, :], (p, p))

    x = coords[..., 0].reshape(b * h * w)
    y = coords[..., 1].reshape(b * h * w)
    out = []
    for i, level in enumerate(pyramid):
        xs = x[:, None, None] / (2 ** i) + off_x[None]
        ys = y[:, None, None] / (2 ** i) + off_y[None]
        vals = bilinear_sample(level, xs, ys)  # [BHW, p, p]
        out.append(vals.reshape(b, h, w, p * p))
    return jnp.concatenate(out, axis=-1)
