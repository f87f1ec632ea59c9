"""Coordinate grids (reference: cwm/models/utils.py:128-150)."""
from __future__ import annotations

import jax.numpy as jnp


def coordinate_ims(batch_size: int, seq_length: int, imsize,
                   normalize: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    """[B,T,H,W,2] grid of (h, w) coordinates; [B,H,W,2] if seq_length == 0.

    normalize=True maps coordinates to [-1, 1].
    """
    static = seq_length == 0
    t = max(seq_length, 1)
    h_dim, w_dim = imsize
    if normalize:
        h = 2.0 * (jnp.arange(h_dim, dtype=dtype) / (h_dim - 1) - 0.5)
        w = 2.0 * (jnp.arange(w_dim, dtype=dtype) / (w_dim - 1) - 0.5)
    else:
        h = jnp.arange(h_dim, dtype=dtype)
        w = jnp.arange(w_dim, dtype=dtype)
    hh = jnp.broadcast_to(h[:, None], (h_dim, w_dim))
    ww = jnp.broadcast_to(w[None, :], (h_dim, w_dim))
    grid = jnp.stack([hh, ww], axis=-1)  # [H,W,2]
    grid = jnp.broadcast_to(grid[None, None], (batch_size, t, h_dim, w_dim, 2))
    if static:
        return grid[:, 0]
    return grid
