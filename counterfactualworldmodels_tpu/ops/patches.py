"""Video <-> patch-vector conversion, TPU-native.

Pure-functional equivalents of the reference ``Patchify`` module
(reference: cwm/models/patches.py:10-137). All functions are shape-static and
jit/vmap friendly: no hidden state, the caller passes the patch size and the
layout is recovered from the array shapes.

Layout convention (identical to the reference):
    video  [B, T, C, H, W]   (temporal_dim=1) or [B, C, T, H, W] (temporal_dim=2)
    patches [B, N, D*C] with N = (T/pt)*(H/ph)*(W/pw), D = pt*ph*pw,
    flattened frame-major then row-major: n = t*(H'*W') + i*W' + j,
    and within a patch the layout is (pt, ph, pw, c) flattened.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from einops import rearrange


def canonical_patch_size(patch_size) -> Tuple[int, int, int]:
    """Normalize an int / 2-tuple / 3-tuple patch size to (pt, ph, pw)."""
    if isinstance(patch_size, int):
        return (1, patch_size, patch_size)
    patch_size = tuple(patch_size)
    if len(patch_size) == 2:
        return (1, patch_size[0], patch_size[1])
    assert len(patch_size) == 3, patch_size
    return patch_size


def num_patches(video_shape: Sequence[int], patch_size) -> int:
    """Number of patch tokens for a [B,T,C,H,W] video shape."""
    pt, ph, pw = canonical_patch_size(patch_size)
    _, t, _, h, w = video_shape
    return (t // pt) * (h // ph) * (w // pw)


def mask_shape(video_shape: Sequence[int], patch_size) -> Tuple[int, int, int]:
    """(T', H', W') grid of patch tokens for a [B,T,C,H,W] video shape."""
    pt, ph, pw = canonical_patch_size(patch_size)
    _, t, _, h, w = video_shape
    return (t // pt, h // ph, w // pw)


def patchify(x: jnp.ndarray, patch_size, temporal_dim: int = 1,
             squeeze_channel_dim: bool = True) -> jnp.ndarray:
    """Convert a video [B,T,C,H,W] (or image [B,C,H,W]) into patch vectors.

    Returns [B, N, pt*ph*pw*C] if squeeze_channel_dim else [B, N, pt*ph*pw, C].
    Mirrors reference cwm/models/patches.py:67-78.
    """
    pt, ph, pw = canonical_patch_size(patch_size)
    if x.ndim == 4:
        assert pt == 1, (pt, x.shape)
        out = rearrange(x, 'b c (h ph) (w pw) -> b (h w) (ph pw) c', ph=ph, pw=pw)
    else:
        assert x.ndim == 5, x.shape
        order = ('b (t pt) c (h ph) (w pw)' if temporal_dim == 1
                 else 'b c (t pt) (h ph) (w pw)')
        out = rearrange(x, order + ' -> b (t h w) (pt ph pw) c', pt=pt, ph=ph, pw=pw)
    if squeeze_channel_dim:
        out = out.reshape(out.shape[0], out.shape[1], -1)
    return out


def unpatchify(patches: jnp.ndarray, patch_size, video_shape: Sequence[int],
               temporal_dim: int = 1) -> jnp.ndarray:
    """Inverse of :func:`patchify` for a full set of N patches.

    ``video_shape`` is the original [B,T,C,H,W] (or [B,C,H,W]) shape.
    Mirrors reference cwm/models/patches.py:80-109.
    """
    pt, ph, pw = canonical_patch_size(patch_size)
    if len(video_shape) == 4:
        b, c, h, w = video_shape
        t = 1
    else:
        if temporal_dim == 1:
            b, t, c, h, w = video_shape
        else:
            b, c, t, h, w = video_shape
    gt, gh, gw = t // pt, h // ph, w // pw

    if patches.ndim == 3:
        patches = patches.reshape(b, patches.shape[1], -1, c)
    vid = rearrange(
        patches,
        'b (t h w) (pt ph pw) c -> b c (t pt) (h ph) (w pw)',
        pt=pt, ph=ph, pw=pw, t=gt, h=gh, w=gw)

    if len(video_shape) == 4:
        return vid[:, :, 0]
    if temporal_dim == 1:
        vid = jnp.swapaxes(vid, 1, 2)
    return vid


def average_within_patches(z: jnp.ndarray, num_channels: int) -> jnp.ndarray:
    """Mean over the intra-patch dim, broadcast back (reference patches.py:122-125)."""
    if z.ndim == 3:
        z = rearrange(z, 'b n (d c) -> b n d c', c=num_channels)
    mean = z.mean(-2, keepdims=True)
    return jnp.broadcast_to(mean, z.shape)
