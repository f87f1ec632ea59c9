"""Imagenet (un)normalization for [B,T,C,H,W] / [B,C,T,H,W] videos.

Reference: cwm/models/utils.py:12-31.
"""
from __future__ import annotations

import jax.numpy as jnp

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)


def _mean_std(x: jnp.ndarray, temporal_dim: int):
    mean = jnp.asarray(IMAGENET_DEFAULT_MEAN, dtype=x.dtype)
    std = jnp.asarray(IMAGENET_DEFAULT_STD, dtype=x.dtype)
    shape = [1] * x.ndim
    channel_dim = 2 if temporal_dim == 1 else 1
    if x.ndim == 4:  # [B,C,H,W]
        channel_dim = 1
    shape[channel_dim] = 3
    return mean.reshape(shape), std.reshape(shape)


def imagenet_normalize(x: jnp.ndarray, temporal_dim: int = 1) -> jnp.ndarray:
    mean, std = _mean_std(x, temporal_dim)
    return (x - mean) / std


def imagenet_unnormalize(x: jnp.ndarray, temporal_dim: int = 1) -> jnp.ndarray:
    mean, std = _mean_std(x, temporal_dim)
    return x * std + mean
