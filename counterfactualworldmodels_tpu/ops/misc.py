"""Small distribution / indexing / loss utilities, pure jnp.

TPU-native equivalents of the remaining helpers in the reference's
cwm/models/utils.py (spatial moments 97-126, soft indexing 239-278, channel
errors 510-553, masked losses 663-766). Everything is a pure function safe
to call under jit; losses that the reference wraps in nn.Modules are plain
functions here (wrap with functools.partial to bind defaults).
"""
from __future__ import annotations

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
                         loss_func=masked_per_pixel_loss):
    """Exponentially-weighted loss over an iteration sequence
    (reference utils.py:742-757; RAFT-style training loss)."""
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
