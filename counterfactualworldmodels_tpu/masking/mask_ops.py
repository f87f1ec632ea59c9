"""Mask manipulation ops (pure jnp).

Equivalents of reference cwm/models/masking.py:10-132 (upsample_masks,
patch_distance_transform, patches_adjacent_to_visible, partition_masks,
RectangularizeMasks). Mask convention everywhere: bool, True = masked.

The reference equalizes ragged visible counts *after the fact* with a Python
loop (RectangularizeMasks). Here :func:`rectangularize` is a vectorized,
key-driven version; but generators in this package produce fixed-popcount
masks *by construction*, so it is only needed for user-supplied masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample_masks(masks: jnp.ndarray, size) -> jnp.ndarray:
    """Nearest-neighbor resize of a [..., h, w] mask to (H, W).

    Integer up/down factors only (all uses in this codebase are integral).
    Reference: masking.py:10-30.
    """
    h, w = masks.shape[-2:]
    H, W = size
    if (H, W) == (h, w):
        return masks
    if H < h and W < w:
        sh, sw = h // H, w // W
        return masks[..., ::sh, ::sw]
    assert H % h == 0 and W % w == 0, ((h, w), (H, W))
    masks = jnp.repeat(masks, H // h, axis=-2)
    masks = jnp.repeat(masks, W // w, axis=-1)
    return masks


def patch_distance_transform(masks: jnp.ndarray, self_mask: bool = True) -> jnp.ndarray:
    """Normalized L-inf distance from each patch to the nearest visible patch.

    masks: bool [B,T,H,W], True = masked. Returns float [B,T,H,W].
    Fully vectorized (the reference loops over B*T and visible indices;
    masking.py:32-56).
    """
    b, t, h, w = masks.shape
    m = masks.reshape(b * t, h * w)
    hh = jnp.arange(h, dtype=jnp.float32)
    ww = jnp.arange(w, dtype=jnp.float32)
    # pairwise L-inf distances between all grid cells, normalized per axis
    dh = jnp.abs(hh[:, None] - hh[None, :]) / max((h - 1) // 2, 1)  # [h,h]
    dw = jnp.abs(ww[:, None] - ww[None, :]) / max((w - 1) // 2, 1)  # [w,w]
    # dist[(i,j),(k,l)] = max(dh[i,k], dw[j,l]) -> [h,w,h,w]
    dist = jnp.maximum(dh[:, None, :, None], dw[None, :, None, :])
    dist = dist.reshape(h * w, h * w)

    inf = jnp.float32(jnp.inf)
    vis = ~m  # [BT, HW]
    d_to_vis = jnp.where(vis[:, None, :], dist[None], inf).min(-1)  # [BT,HW]
    any_vis = vis.any(-1, keepdims=True)
    d_to_vis = jnp.where(any_vis, d_to_vis, 0.0)
    if self_mask:
        row_max = d_to_vis.max(-1, keepdims=True)
        d_to_vis = jnp.where(vis, row_max, d_to_vis)
    return d_to_vis.reshape(b, t, h, w)


def patches_adjacent_to_visible(masks: jnp.ndarray, radius=1, size=None):
    """Patches within ``radius`` (in patch units) of a visible patch.

    Reference: masking.py:58-71. radius=None returns the mask unchanged;
    radius=0 returns a graded (float) map.
    """
    if size is not None:
        masks = masks.reshape(-1, 1, *size)
    if radius is None:
        return masks
    h, w = masks.shape[-2:]
    dists = patch_distance_transform(masks)
    if radius != 0:
        r = 1.0 / max((min(h, w) - 1) // 2, 1)
        return dists <= (r * radius)
    rmax = dists.max((-1, -2), keepdims=True)
    return (rmax - dists) / jnp.clip(rmax, min=1.0)


def partition_masks(key, masks: jnp.ndarray, num_samples: int = 2,
                    leave_one_out: bool = False):
    """Split each row's visible set into S disjoint (or leave-one-out) masks.

    masks: bool [B, N]. Returns list of S bool [B, N] masks.
    Reference: masking.py:73-88.
    """
    b, n = masks.shape
    s = num_samples
    keys = jax.random.split(key, b)

    def per_row(k, row):
        # random rank among visible positions; masked positions get rank >= n
        noise = jax.random.uniform(k, (n,))
        order = jnp.argsort(jnp.where(row, 2.0 + noise, noise))
        rank = jnp.argsort(order)  # rank of each position in the shuffle
        group = rank % s
        return group, rank

    group, rank = jax.vmap(per_row)(keys, masks)
    num_vis = (~masks).sum(-1, keepdims=True)
    in_vis = rank < num_vis
    out = []
    for i in range(s):
        if leave_one_out:
            part = jnp.where(in_vis & (group == i), True, masks)
        else:
            part = ~(in_vis & (group == i))
        out.append(part)
    return out


def rectangularize(key, masks: jnp.ndarray, num_visible=None,
                   mode: str = 'min') -> jnp.ndarray:
    """Equalize visible counts across a batch of masks.

    masks: bool [B, N], True = masked. Rows with surplus visible patches have
    random visible patches re-masked; rows with deficits have random masked
    patches revealed — the same semantics as the reference's per-row loop
    (masking.py:90-132), vectorized with a single keyed argsort.

    ``num_visible`` overrides the target; otherwise it follows ``mode`` in
    {'min','max','mean'} over the batch's MASKED counts, exactly like the
    reference (masking.py:112-115: 'min' equalizes to the least-masked
    row — i.e. the MOST visible — and 'max' to the most-masked row).
    """
    if mode in (None, 'none'):
        return masks
    if mode == 'full':
        return jnp.ones_like(masks)
    b, n = masks.shape
    if num_visible is None:
        masked_counts = masks.sum(-1)
        if mode == 'min':
            target_masked = masked_counts.min()
        elif mode == 'max':
            target_masked = masked_counts.max()
        else:
            target_masked = masked_counts.mean().astype(jnp.int32)
        num_visible = n - target_masked
    noise = jax.random.uniform(key, (b, n), minval=0.0, maxval=0.999)
    priority = (~masks).astype(jnp.float32) + noise
    order = jnp.argsort(-priority, axis=-1)     # visible first, random ties
    rank = jnp.argsort(order, axis=-1)
    return rank >= num_visible                  # top-num_visible stay visible


def invert_mask_frame(mask: jnp.ndarray, size, frame: int = -1) -> jnp.ndarray:
    """Invert one temporal frame of a flat [B, N] mask (reference prediction.py:371-381)."""
    shape = mask.shape
    m = mask.reshape(shape[0], -1, *size)
    t = frame % m.shape[1]
    m = m.at[:, t].set(~m[:, t])
    return m.reshape(shape)
