"""Sharded pixel-pair flow covariance.

The flow-covariance map (pipelines/segmentation.py:compute_flow_corrs,
reference segmentation.py:478-547) is an [N, N] pixel-pair matrix with
N = (H/ds)*(W/ds); at full 224px resolution and ds=1 that is 6.3GB per batch
row in f32 — past a single chip at useful batch sizes. This shards the ROW
axis of the covariance matrix over a named mesh axis: every device z-scores
the (small) [N, S] magnitude matrix locally and computes only its row block
of the outer product (SURVEY §5's "all-gather + sharded covariance" rebuild
note).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .pipeline import _shard_map, _SHARD_MAP_KW


def sharded_flow_corrs(mesh: Mesh, flow_samples: jnp.ndarray,
                       downsample: int = 1, use_covariance: bool = False,
                       eps: float = 1e-12, axis: str = 'rows'):
    """Row-sharded equivalent of compute_flow_corrs (plain corr/cov path).

    flow_samples: [B, C, H, W, S] (replicated). Returns the full
    [B, 1, h, w, h, w] matrix, rows computed shard-wise over ``axis``.
    The row axis h*w must be divisible by the axis size.
    """
    b, c, h, w, s = flow_samples.shape
    ds = downsample
    hd, wd = h // ds, w // ds
    n = hd * wd
    size = mesh.shape[axis]
    assert n % size == 0, (n, size)

    fs = flow_samples.reshape(b, c, hd, ds, wd, ds, s).mean((3, 5))
    mags = jnp.sqrt((fs ** 2).mean(1)).reshape(b, n, s)  # RMS over channels

    # center (and scale, for correlation) once — cheap, replicated
    centered = mags - mags.mean(-1, keepdims=True)
    if use_covariance:
        denom = jnp.float32(max(s - 1, 1))
        z = centered / jnp.sqrt(denom)
    else:
        norm = jnp.clip(jnp.sqrt((centered ** 2).sum(-1, keepdims=True)),
                        min=eps)
        z = centered / norm

    def row_block(z_full, z_rows):
        # z_rows: [B, n/size, S] local row chunk; z_full replicated
        return jnp.einsum('bis,bjs->bij', z_rows, z_full)

    f = _shard_map(row_block, mesh=mesh,
                   in_specs=(P(), P(None, axis, None)),
                   out_specs=P(None, axis, None), **_SHARD_MAP_KW)
    corr = f(z, z)
    corr = jnp.nan_to_num(corr, nan=0.0)
    return corr.reshape(b, 1, hd, wd, hd, wd)
