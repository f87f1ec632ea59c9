"""Energy-weighted sampling primitives, pure functions over jax.random keys.

Equivalents of reference cwm/models/utils.py:93-213 (boltzmann,
sample_image_inds_from_probs, sample_from_energy, index_into_images). The
reference consumes a numpy/torch global RNG; here every sampler takes an
explicit PRNG key, which makes the whole counterfactual pipeline vmap-able
over the sample axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def boltzmann(x: jnp.ndarray, beta=1.0, eps: float = 1e-9) -> jnp.ndarray:
    """exp(x*beta) normalized by its spatial max (reference utils.py:93-97)."""
    if beta is None:
        return x
    x = jnp.exp(x * beta)
    return x / jnp.clip(x.max((-1, -2), keepdims=True), min=eps)


def sample_image_inds_from_probs(key, probs: jnp.ndarray, num_points: int,
                                 eps: float = 1e-9,
                                 normalize: bool = False) -> jnp.ndarray:
    """Draw P (h, w) indices per batch row from a [B,H,W] probability map.

    Sampling is categorical **with replacement**, matching the reference
    (utils.py:152-170). Returns int32 [B, P, 2].
    """
    b, h, w = probs.shape
    p = probs.reshape(b, h * w)
    if normalize:
        p = p - p.min(-1, keepdims=True)
    p = jax.nn.relu(p + eps)
    p = p / jnp.clip(p.sum(-1, keepdims=True), min=eps)
    logits = jnp.log(jnp.clip(p, min=1e-30))
    idx = jax.random.categorical(key, logits, axis=-1,
                                 shape=(num_points, b)).T  # [B,P]
    idx_h = jnp.clip(idx // w, 0, h - 1)
    idx_w = jnp.clip(idx % w, 0, w - 1)
    return jnp.stack([idx_h, idx_w], axis=-1).astype(jnp.int32)


def index_into_images(images: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather values at P points: images [B,C,H,W], indices [B,P,2] -> [B,P,C]."""
    assert indices.shape[-1] == 2, indices.shape
    idx_h = indices[..., 0].astype(jnp.int32)
    idx_w = indices[..., 1].astype(jnp.int32)
    gathered = jax.vmap(lambda img, ih, iw: img[:, ih, iw].T)(images, idx_h, idx_w)
    return gathered


def sample_from_energy(key, probs: jnp.ndarray, num_points: int = 1,
                       num_samples: int = 1, binarize: bool = False,
                       normalize: bool = False, eps: float = 1e-9) -> jnp.ndarray:
    """Scatter sampled point energies into a zero map (reference utils.py:172-213).

    probs: [B,1,H,W] or [B,T,1,H,W]. Returns a map of the same leading shape
    with S*B stacked in the batch dim, nonzero only at the drawn points.
    """
    shape = probs.shape
    if len(shape) == 5:
        b, t, _, h, w = shape
    else:
        b, _, h, w = shape
        t = 1
        probs = probs[:, None]
    s = num_samples

    flat = jnp.broadcast_to(probs[:, None], (b, s, t, 1, h, w))
    flat = flat.reshape(b * s * t, h, w)
    inds = sample_image_inds_from_probs(key, flat, num_points, eps=eps,
                                        normalize=normalize)  # [BST,P,2]
    energy = index_into_images(flat[:, None], inds)[..., 0]  # [BST,P]
    if binarize:
        energy = jnp.ones_like(energy)

    lin = inds[..., 0] * w + inds[..., 1]  # [BST,P]
    activated = jnp.zeros((b * s * t, h * w), dtype=flat.dtype)
    activated = jax.vmap(lambda a, i, e: a.at[i].set(e))(activated, lin, energy)
    activated = activated.reshape(b * s, t, 1, h, w)
    if len(shape) == 4:
        activated = activated[:, 0]
    return activated


def sample_per_pixel(key, probs: jnp.ndarray) -> jnp.ndarray:
    """Bernoulli per-pixel sample (reference utils.py:215-219)."""
    p = jnp.clip(jax.nn.relu(probs), max=1.0)
    return jax.random.bernoulli(key, p).astype(probs.dtype)
