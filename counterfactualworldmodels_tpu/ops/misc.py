"""Small distribution / indexing / loss utilities, pure jnp.

TPU-native equivalents of the remaining helpers in the reference's
cwm/models/utils.py (spatial moments 97-126, soft indexing 239-278, channel
errors 510-553, masked losses 663-766). Everything is a pure function safe
to call under jit; losses that the reference wraps in nn.Modules are plain
functions here (wrap with functools.partial to bind defaults).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .coords import coordinate_ims
from .sampling import index_into_images


# ---------------------------------------------------------------------------
# spatial distributions (reference utils.py:97-126)
# ---------------------------------------------------------------------------
def spatial_moments_from_local_dist(local_dist, eps=1e-3, squeeze=True):
    """First spatial moment of a local k*k distribution at every pixel.

    local_dist: [B,K,H,W] or [B,C,K,H,W] with K = k*k. Returns [B,2,H,W]
    (or [B,C,2,H,W]): the normalized-grid centroid of each local patch
    distribution.
    """
    if local_dist.ndim == 4:
        local_dist = local_dist[:, None]
    b, c, kk, h, w = local_dist.shape
    k = int(np.sqrt(kk))
    norm = jnp.clip(local_dist.sum(-3, keepdims=True), min=eps)  # [B,C,1,H,W]
    grid = coordinate_ims(1, 1, (k, k), normalize=True)[0, 0]    # [k,k,2]
    grid = grid.reshape(kk, 2)
    moments = jnp.einsum('bckhw,kd->bcdhw', local_dist, grid) / norm
    if c == 1 and squeeze:
        return moments[:, 0]
    return moments


def get_distribution_centroid(dist, eps=1e-9, normalize=False):
    """Centroid of a [B,T,1,H,W] spatial distribution -> [B,T,2]
    (reference utils.py:116-126)."""
    b, t, c, h, w = dist.shape
    assert c == 1, dist.shape
    dist = dist / jnp.clip(dist.sum((-2, -1), keepdims=True), min=eps)
    grid = coordinate_ims(b, t, (h, w), normalize=normalize)  # [B,T,H,W,2]
    grid = jnp.moveaxis(grid, -1, 2)                          # [B,T,2,H,W]
    return (grid * dist).sum((-2, -1))


def soft_index(images, indices, scale_by_imsize=True):
    """Bilinear read of [B,C,H,W] images at [B,P,2] float (h, w) points
    (reference utils.py:239-278). ``scale_by_imsize`` maps [-1, 1] coords to
    pixels. Returns [B,P,C]."""
    assert indices.shape[-1] == 2, indices.shape
    b, c, h, w = images.shape
    h_inds, w_inds = indices[..., 0], indices[..., 1]
    if scale_by_imsize:
        h_inds = (h_inds + 1.0) * h * 0.5
        w_inds = (w_inds + 1.0) * w * 0.5
    h_inds = jnp.clip(h_inds, 0.0, h - 1)
    w_inds = jnp.clip(w_inds, 0.0, w - 1)

    h0, w0 = jnp.floor(h_inds), jnp.floor(w_inds)
    h1, w1 = jnp.ceil(h_inds), jnp.ceil(w_inds)
    tl = (h1 - h_inds) * (w1 - w_inds)
    tr = (h1 - h_inds) * (w_inds - w0)
    bl = (h_inds - h0) * (w1 - w_inds)
    br = (h_inds - h0) * (w_inds - w0)

    def read(hi, wi):
        return index_into_images(
            images, jnp.stack([hi, wi], -1).astype(jnp.int32))

    out = (read(h0, w0) * tl[..., None] + read(h0, w1) * tr[..., None] +
           read(h1, w0) * bl[..., None] + read(h1, w1) * br[..., None])
    return out


# ---------------------------------------------------------------------------
# channel-reduced errors (reference utils.py:510-553)
# ---------------------------------------------------------------------------
def channel_mse(x, y, dim=-3):
    """RMS error over the channel dim, kept (reference utils.py:510-513 —
    despite the name this is a root-mean-square, not a plain MSE)."""
    return jnp.sqrt(((x - y) ** 2).mean(dim, keepdims=True))


def channel_l1error(x, y, dim=-3):
    return jnp.abs(x - y).mean(dim, keepdims=True)


def channel_l2error(x, y, dim=-3):
    return ((x - y) ** 2).mean(dim, keepdims=True)


def max_delta_error(x, y, dim=-3, backward=False):
    sign = -1.0 if backward else 1.0
    return jax.nn.relu(sign * (x - y)).max(axis=dim, keepdims=True)


# ---------------------------------------------------------------------------
# masked losses (reference utils.py:663-766)
# ---------------------------------------------------------------------------
def l2_loss(x, y):
    return (x - y) ** 2


def l1_loss(x, y):
    return jnp.abs(x - y)


def charbonnier_loss(x, y, eps=1e-3, alpha=0.5):
    """(reference utils.py:669-677); sums over the channel dim."""
    return (((x - y) ** 2 + eps ** 2) ** alpha).sum(-3, keepdims=True)


def masked_per_pixel_loss(logits, labels, mask, loss_fn=l2_loss):
    """Mean per-pixel loss over a [.., 1, H, W] validity mask
    (reference utils.py:679-696)."""
    if mask is None:
        mask = jnp.ones_like(labels[..., 0:1, :, :])
    mask = jax.lax.stop_gradient(mask)
    num_px = jnp.clip(mask.sum((-2, -1)), min=1)
    loss = (loss_fn(logits, labels) * mask).sum((-2, -1)) / num_px
    return loss.mean()


def masked_bce_loss(logits, labels, mask, with_logits=False, eps=1e-7):
    """(reference utils.py:698-710). Returns a per-batch-element loss."""
    if with_logits:
        per_px = (jax.nn.relu(logits) - logits * labels +
                  jnp.log1p(jnp.exp(-jnp.abs(logits))))
    else:
        p = jnp.clip(logits, eps, 1.0 - eps)
        per_px = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
    mask = jax.lax.stop_gradient(mask)
    num_valid = jnp.clip(mask.sum((-3, -2, -1)), min=1)
    return (per_px * mask).sum((-3, -2, -1)) / num_valid


def weighted_softmax(x, mask, dim=-1, eps=1e-12):
    """Softmax normalized over masked-in entries only
    (reference utils.py:712-716)."""
    maxes = x.max(axis=dim, keepdims=True)
    x_exp = jnp.exp(x - maxes)
    x_exp_sum = (x_exp * mask).sum(dim, keepdims=True) + eps
    return (x_exp / x_exp_sum) * mask


def masked_kl_div_loss(logits, labels, mask, dim=-1, eps=1e-9):
    """KL(labels || softmax(logits)) over K at each pixel, masked
    (reference utils.py:718-740). logits/labels/mask: [B,K,H,W].
    Returns [B]."""
    b, k, h, w = logits.shape
    n = h * w
    logits = jnp.swapaxes(logits.reshape(b, k, n), 1, 2)  # [B,N,K]
    labels = jnp.swapaxes(labels.reshape(b, k, n), 1, 2)
    mask = jnp.swapaxes(mask.reshape(b, k, n), 1, 2)

    probs = weighted_softmax(logits, mask, dim=dim, eps=eps)
    log_probs = jnp.log(jnp.clip(probs, min=eps))
    labels = (labels * mask) / jnp.clip(
        (labels * mask).sum(dim, keepdims=True), min=eps)

    # F.kl_div(log_q, p) = p * (log p - log_q); torch defines 0 log 0 = 0
    kl = jnp.where(labels > 0, labels * (jnp.log(jnp.clip(labels, min=eps)) -
                                         log_probs), 0.0)
    loss = (kl * mask).sum(-1)  # [B,N]
    num_valid = jnp.clip((mask.sum(-1) > 0).astype(loss.dtype).sum(1), min=1)
    return loss.sum(1) / num_valid


def masked_sequence_loss(logits_seq, labels, mask, gamma=0.8,
                         loss_func=functools.partial(masked_per_pixel_loss,
                                                     loss_fn=l1_loss)):
    """Exponentially-weighted loss over an iteration sequence
    (reference utils.py:742-757; RAFT-style training loss). Defaults to
    the L1 per-pixel loss like the reference's MaskedL1Loss default."""
    if not isinstance(logits_seq, (list, tuple)):
        logits_seq = [logits_seq]
    n = len(logits_seq)
    loss = 0.0
    for it in range(n):
        loss = loss + loss_func(logits_seq[it], labels, mask) * \
            (gamma ** (n - it - 1))
    return loss


def confidence_thresh_samples(x, value_thresh=0.0, confidence_thresh=0.5,
                              dim=-1):
    """Boolean consensus over a sample axis (reference utils.py:759-766)."""
    if isinstance(x, (list, tuple)):
        x = jnp.stack(x, axis=dim)
    if value_thresh is not None:
        x = (x > value_thresh).astype(jnp.float32)
    else:
        x = x.astype(jnp.float32)
    return x.mean(axis=dim) >= confidence_thresh


# ---------------------------------------------------------------------------
# local neighborhoods / boundaries (reference utils.py:280-433)
# ---------------------------------------------------------------------------
def get_local_neighbors(im, size=None, radius=3, invalid=-1.0,
                        to_image=False):
    """All (2r+1)^2 local values at every pixel (reference utils.py:280-307).

    im: [B,N] / [B,C,N] (with ``size``=(H,W)) or [B,C,H,W].
    Returns [B,C,K,H,W] if ``to_image`` else [B,C,K,H*W], K=(2r+1)^2.
    """
    if im.ndim == 2:
        h, w = size
        im = im.reshape(im.shape[0], 1, h, w)
    elif im.ndim == 3:
        h, w = size
        im = im.reshape(im.shape[0], im.shape[1], h, w)
    b, c, h, w = im.shape
    k = 2 * radius + 1
    padded = jnp.pad(im.astype(jnp.float32),
                     ((0, 0), (0, 0), (radius, radius), (radius, radius)),
                     constant_values=invalid)
    patches = jax.lax.conv_general_dilated_patches(
        padded, (k, k), (1, 1), 'VALID')          # [B, C*K, H, W]
    patches = patches.reshape(b, c, k * k, h, w).astype(im.dtype)
    return patches if to_image else patches.reshape(b, c, k * k, h * w)


def get_patches(x, radius=1):
    """Zero-padded local patches as channels (reference utils.py:309-321).

    x: [B,C,H,W] (or [B,T,C,H,W]) -> [B, C*(2r+1)^2, H, W]."""
    if radius == 0:
        return x
    shape = x.shape
    if x.ndim == 5:
        x = x.reshape(shape[0] * shape[1], *shape[2:])
    b, c, h, w = x.shape
    k = 2 * radius + 1
    padded = jnp.pad(x, ((0, 0), (0, 0), (radius, radius), (radius, radius)))
    out = jax.lax.conv_general_dilated_patches(padded, (k, k), (1, 1),
                                               'VALID')
    if len(shape) == 5:
        out = out.reshape(shape[0], shape[1], *out.shape[1:])
    return out


def _unit(x, dim=1, eps=1e-12):
    return x / jnp.clip(jnp.linalg.norm(x, axis=dim, keepdims=True), min=eps)


def _to_circular(vecs, beta):
    """Project [B,2,H,W] orientation vectors onto the 9 grid directions
    (reference utils.py:323-334)."""
    circle = coordinate_ims(1, 0, (3, 3), normalize=True)  # [1,3,3,2]
    circle = jnp.moveaxis(circle, -1, 1).reshape(1, 2, 9, 1, 1)
    dots = (_unit(vecs[:, :, None]) * _unit(circle)).sum(1)  # [B,9,H,W]
    if beta is None:
        return jax.nn.one_hot(dots.argmax(1), 9, axis=1,
                              dtype=jnp.float32)
    return jax.nn.softmax(dots * beta, axis=1)


def spatial_moments_to_circular_target(moments, beta=10.0):
    return _to_circular(moments, beta)


def circular_target_to_spatial_moment(target):
    """(reference utils.py:336-344)."""
    assert target.shape[1] == 8, target.shape
    clock = jnp.asarray([[-1, -1], [0, -1], [0, 1], [0, -1], [0, 1],
                         [1, -1], [1, 0], [1, 1]], jnp.float32)
    clock = clock.reshape(1, 8, 2, 1, 1)
    return (target[:, :, None] * clock).sum(1)


def estimate_boundary_orientations(boundaries, energy, radius=3,
                                   to_circle=False, beta=10.0, eps=1e-3):
    """Orientation of each boundary pixel from the local energy centroid
    (reference utils.py:346-376). boundaries/energy: [B,1,H,W]."""
    b, _, h, w = boundaries.shape
    local = get_local_neighbors(energy * (1 - boundaries), size=(h, w),
                                radius=radius, invalid=0.0,
                                to_image=True)[:, 0]          # [B,K,H,W]
    num_px = local.sum(1, keepdims=True)
    k = 2 * radius + 1
    grid = coordinate_ims(1, 0, (k, k), normalize=True)       # [1,k,k,2]
    grid = jnp.moveaxis(grid, -1, 1).reshape(1, 2, k * k, 1, 1)
    orientations = (local[:, None] * grid).sum(2)             # [B,2,H,W]
    orientations = orientations / jnp.clip(num_px, min=eps)
    if not to_circle:
        return orientations
    return _to_circular(orientations, beta)


def compute_local_effects(source, adj_local):
    """Splat each source pixel into its local window weighted by affinity
    (reference utils.py:378-412; the inverse 'fold' of get_local_neighbors).

    source: [B,D,H,W]; adj_local: [B,K,H,W] -> [B,D,H,W]."""
    b, d, h, w = source.shape
    kk = adj_local.shape[-3]
    k = int(np.sqrt(kk))
    assert k * k == kk, kk
    r = (k - 1) // 2
    eff = source[:, :, None] * adj_local[:, None]   # [B,D,K,H,W]
    out = jnp.zeros((b, d, h + 2 * r, w + 2 * r), source.dtype)
    for i in range(k):
        for j in range(k):
            out = out.at[:, :, i:i + h, j:j + w].add(
                eff[:, :, i * k + j])
    return out[:, :, r:r + h, r:r + w]


def local_average(values, excluded, radius=1):
    """Mean over non-excluded local neighbors (reference utils.py:414-421)."""
    neighbors = get_local_neighbors(values * (1 - excluded), radius=radius,
                                    invalid=0.0, to_image=True)
    norm = get_local_neighbors(1 - excluded, radius=radius, invalid=0.0,
                               to_image=True).sum(-3)
    return neighbors.sum(-3) / jnp.clip(norm, min=1)


def get_mask_boundaries(masks):
    """Pixels of a mask whose 3x3 neighborhood leaves the mask
    (reference utils.py:423-433, without the ConvLocalShifts module).
    masks: [B,K,H,W] -> boundaries [B,K,H,W] float."""
    m = (masks > 0.5).astype(jnp.float32)
    b, kch, h, w = m.shape
    neigh = get_local_neighbors(m, radius=1, invalid=0.0,
                                to_image=True)      # [B,K,9,H,W]
    center = neigh[:, :, 4:5]
    boundaries = (neigh != center).any(2).astype(jnp.float32)
    return boundaries * m
