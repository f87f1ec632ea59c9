"""RAFT optical flow in JAX, TPU-native.

Re-design of reference cwm/models/raft/raft_model.py:113-300. The 24-step
ConvGRU refinement runs under nn.scan (compiled once, parameters broadcast),
the correlation volume is an einsum, and the convex upsampling is a gather-
free shifted-stack einsum. Supports the ``output_dim`` head used by the
keypoint-predictor variant (raft_model.py:152-159).

API: images in [0, 255] (use scale_inputs for [0,1] videos), NCHW in/out to
mirror the reference; everything internal is NHWC.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .corr import (all_pairs_correlation, build_pyramid,
                   build_pyramid_lanes, lookup_pyramid,
                   lookup_pyramid_lanes, pad_pyramid)
from .layers import (BasicEncoder, BasicUpdateBlock, SmallEncoder,
                     SmallUpdateBlock, conv)


def coords_grid(b: int, h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """[B, H, W, 2] grid of (x, y) pixel coordinates."""
    y, x = jnp.meshgrid(jnp.arange(h, dtype=dtype),
                        jnp.arange(w, dtype=dtype), indexing='ij')
    return jnp.broadcast_to(jnp.stack([x, y], -1)[None], (b, h, w, 2))


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray,
                    factor: int = 8) -> jnp.ndarray:
    """Convex-combination 8x upsampling (reference raft_model.py:179-192).

    flow: [B, H, W, C]; mask: [B, H, W, 9*factor^2]. Returns
    [B, H*factor, W*factor, C].
    """
    b, h, w, c = flow.shape
    u = factor
    m = mask.reshape(b, h, w, 9, u, u)
    m = jax.nn.softmax(m, axis=3)

    fp = jnp.pad(factor * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    shifts = jnp.stack([fp[:, ky:ky + h, kx:kx + w]
                        for ky in range(3) for kx in range(3)], axis=3)
    # out[b,h,u,w,v,c] = sum_k m[b,h,w,k,u,v] * shifts[b,h,w,k,c]
    out = jnp.einsum('bhwkuv,bhwkc->bhuwvc', m, shifts,
                     preferred_element_type=jnp.float32).astype(flow.dtype)
    return out.reshape(b, h * u, w * u, c)


def upflow8(flow: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 8x upsample * 8 (reference raft/utils.py:88-91). NHWC.

    The reference interpolates with align_corners=True; jax.image.resize
    only offers the half-pixel convention, which shifts every sample
    position, so the align_corners grid (out pixel i -> in coord
    i*(h-1)/(H-1)) is gathered explicitly."""
    b, h, w, c = flow.shape
    H, W = 8 * h, 8 * w

    def grid(n_out, n_in):
        if n_out <= 1 or n_in <= 1:
            return jnp.zeros((n_out,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) /
                                                       (n_out - 1))

    yy, xx = grid(H, h), grid(W, w)
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (yy - y0).astype(flow.dtype)[None, :, None, None]
    wx = (xx - x0).astype(flow.dtype)[None, None, :, None]
    f00 = flow[:, y0][:, :, x0]
    f01 = flow[:, y0][:, :, x1]
    f10 = flow[:, y1][:, :, x0]
    f11 = flow[:, y1][:, :, x1]
    return 8 * (f00 * (1 - wy) * (1 - wx) + f01 * (1 - wy) * wx
                + f10 * wy * (1 - wx) + f11 * wy * wx)


class _UpdateStep(nn.Module):
    """One GRU refinement step, wrapped by nn.scan in RAFT.__call__."""
    small: bool
    corr_levels: int
    corr_radius: int
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32
    # 'lanes' = query-on-lanes Pallas kernel layout, 'window' = backend-auto
    # window lookup, 'gather' = pure-jnp gather/lerp (the differentiable path)
    lookup: str = 'window'
    emit_flow: bool = False  # per-iteration upsampled flows (training)

    @nn.compact
    def __call__(self, carry, inp, coords0, pyramid):
        net, coords1, _prev_mask = carry
        if self.lookup == 'lanes':
            corr = lookup_pyramid_lanes(pyramid, coords1, self.corr_radius)
        else:
            corr = lookup_pyramid(
                pyramid, coords1, self.corr_radius, padded=True,
                impl='gather' if self.lookup == 'gather' else None)
        flow = coords1 - coords0
        if self.small:
            block = SmallUpdateBlock(self.corr_levels, self.corr_radius,
                                     self.hidden_dim, self.dtype,
                                     name='update_block')
        else:
            block = BasicUpdateBlock(self.corr_levels, self.corr_radius,
                                     self.hidden_dim, self.dtype,
                                     name='update_block')
        net, up_mask, delta = block(net, inp, corr, flow)
        coords1 = coords1 + delta
        if up_mask is None:
            up_mask = _prev_mask
        ys = None
        if self.emit_flow:
            # this iteration's full-res flow estimate, upsampled the same
            # way the final one is (RAFT training supervises every
            # iteration; the reference repo has no RAFT training code —
            # its MaskedSequenceLoss, utils.py:742-757, carries the
            # gamma-weighting semantics)
            f = coords1 - coords0
            ys = upflow8(f) if self.small else convex_upsample(f, up_mask)
        return (net, coords1, up_mask), ys


class RAFT(nn.Module):
    """Reference RAFT (raft_model.py:113-300) as a flax module.

    __call__(image1, image2): NCHW [B, 3, H, W] images in [0, 255];
    returns (flow_lr [B,2,H/8,W/8], flow_up [B,C,H,W]) like the reference
    test-mode output pair.
    """
    small: bool = False
    corr_levels: int = 4
    # None resolves per the reference: 3 for the small model, 4 otherwise
    # (raft_model.py forces args.corr_radius=3 when args.small)
    corr_radius: Optional[int] = None
    output_dim: Optional[int] = None
    iters: int = 24
    dtype: jnp.dtype = jnp.float32
    # Correlation-lookup implementation. None = backend auto (lanes Pallas
    # kernel on TPU unless CWM_RAFT_LANES=0, gather elsewhere); 'lanes' /
    # 'window' force those kernels; 'gather' forces the pure-jnp path —
    # required under jax.grad (the Pallas lookups define no VJP), so the
    # training steps clone the model with corr_lookup='gather'.
    corr_lookup: Optional[str] = None

    @property
    def radius(self):
        if self.corr_radius is not None:
            return self.corr_radius
        return 3 if self.small else 4

    @property
    def hidden_dim(self):
        return 96 if self.small else 128

    @property
    def context_dim(self):
        return 64 if self.small else 128

    @nn.compact
    def __call__(self, image1, image2, iters: Optional[int] = None,
                 with_sequence: bool = False):
        """with_sequence=True additionally returns the per-iteration
        upsampled flow estimates [iters, B, 2, H, W] for sequence-loss
        training (supervise every GRU refinement, exponentially weighted
        toward the last — the objective the reference's published RAFT
        checkpoints imply; its repo ships no RAFT training code)."""
        iters = iters if iters is not None else self.iters
        hdim, cdim = self.hidden_dim, self.context_dim

        x1 = jnp.moveaxis(image1, 1, -1)
        x2 = jnp.moveaxis(image2, 1, -1)
        x1 = 2 * (x1 / 255.0) - 1.0
        x2 = 2 * (x2 / 255.0) - 1.0

        if self.small:
            fnet = SmallEncoder(128, 'instance', self.dtype, name='fnet')
            cnet = SmallEncoder(hdim + cdim, 'none', self.dtype, name='cnet')
        else:
            fnet = BasicEncoder(256, 'instance', self.dtype, name='fnet')
            cnet = BasicEncoder(hdim + cdim, 'batch', self.dtype, name='cnet')

        if x1.shape[0] == x2.shape[0]:
            fmaps = fnet(jnp.concatenate([x1, x2], axis=0))
            fmap1, fmap2 = jnp.split(fmaps.astype(jnp.float32), 2, axis=0)
        else:
            # shared-frame0 counterfactual batch: image1 [1,...] is the same
            # scene for every image2 [S,...]; encode it once and broadcast
            # (all norms are frozen/per-sample so batch-1 == batch-S rows)
            assert x1.shape[0] == 1, (x1.shape, x2.shape)
            fmap1 = fnet(x1).astype(jnp.float32)
            fmap2 = fnet(x2).astype(jnp.float32)
            fmap1 = jnp.broadcast_to(fmap1, fmap2.shape)
        corr = all_pairs_correlation(fmap1, fmap2)
        # CWM_RAFT_LANES=0 falls back to the r01-validated window-lookup
        # kernel (read at trace time; benches flip it if the lanes kernel
        # fails to compile on a given TPU generation)
        lookup = self.corr_lookup
        if lookup is None:
            import os
            lookup = ('lanes' if (jax.default_backend() == 'tpu'
                                  and os.environ.get('CWM_RAFT_LANES', '1')
                                  != '0')
                      else 'window')
        if lookup == 'lanes':
            pyramid = build_pyramid_lanes(corr, self.corr_levels)
        else:
            pyramid = pad_pyramid(build_pyramid(corr, self.corr_levels),
                                  self.radius)

        c = cnet(x1)
        net = jnp.tanh(c[..., :hdim])
        inp = nn.relu(c[..., hdim:])
        if net.shape[0] != x2.shape[0]:
            net = jnp.broadcast_to(net, (x2.shape[0],) + net.shape[1:])
            inp = jnp.broadcast_to(inp, (x2.shape[0],) + inp.shape[1:])

        b, h8, w8, _ = net.shape
        coords0 = coords_grid(b, h8, w8)
        coords1 = coords_grid(b, h8, w8)
        mask0 = jnp.zeros((b, h8, w8, 9 * 64), self.dtype)

        scan = nn.scan(_UpdateStep,
                       variable_broadcast='params',
                       split_rngs={'params': False},
                       in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                       length=iters)
        step = scan(self.small, self.corr_levels, self.radius,
                    self.hidden_dim, self.dtype, lookup,
                    emit_flow=with_sequence, name='update_step')
        (net, coords1, up_mask), flow_seq = step((net, coords1, mask0),
                                                 inp, coords0, pyramid)

        if self.output_dim is not None:
            hid = 192 if self.small else 256
            out = nn.relu(conv(hid, 3, 1, 1, 'output_block_0',
                               self.dtype)(net))
            out = conv(self.output_dim, 1, 1, 0, 'output_block_2',
                       self.dtype)(out)
        else:
            out = coords1 - coords0

        if self.small:
            flow_up = upflow8(out)
        else:
            flow_up = convex_upsample(out, up_mask)

        flow_lr = jnp.moveaxis(coords1 - coords0, -1, 1)
        if with_sequence:
            return (flow_lr, jnp.moveaxis(flow_up, -1, 1),
                    jnp.moveaxis(flow_seq, -1, 2))
        return flow_lr, jnp.moveaxis(flow_up, -1, 1)


def init_raft_params(model: RAFT, key=None, hw: int = 64):
    key = key if key is not None else jax.random.PRNGKey(0)
    img = jnp.zeros((1, 3, hw, hw), jnp.float32)
    return model.init(key, img, img, 2)['params']


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def apply_raft_video(model: RAFT, params, video, backward: bool = False,
                     iters: Optional[int] = None, scale_inputs: bool = True):
    """Multiframe wrapper (reference raft_model.py:276-300).

    video: [B, T, C, H, W]; values in [0,1] when scale_inputs (the wrapper
    convention) else [0,255]. Returns flows [B, T-1, 2, H, W]; with
    ``backward`` the pair order is swapped and the stack reversed.
    """
    x = video * 255.0 if scale_inputs else video
    if x.ndim == 4:
        x = x[:, None]
    if x.shape[1] == 1:
        x = jnp.tile(x, (1, 2, 1, 1, 1))
    t = x.shape[1]
    flows = []
    for i in range(t - 1):
        a, bb = x[:, i], x[:, i + 1]
        if backward:
            a, bb = bb, a
        flow = model.apply({'params': params}, a, bb, iters)[1]
        if backward:
            flows.insert(0, flow)
        else:
            flows.append(flow)
    return jnp.stack(flows, 1)


class InputPadder:
    """Pad images so spatial dims divide by 8 (reference raft/utils.py:9-29)."""

    def __init__(self, dims, mode='sintel'):
        self.ht, self.wd = dims[-2:]
        pad_ht = (((self.ht // 8) + 1) * 8 - self.ht) % 8
        pad_wd = (((self.wd // 8) + 1) * 8 - self.wd) % 8
        if mode == 'sintel':
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2,
                         pad_ht // 2, pad_ht - pad_ht // 2]
        else:
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    def pad(self, *inputs):
        l, r, t, b = self._pad
        return [jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(t, b), (l, r)],
                        mode='edge') for x in inputs]

    def unpad(self, x):
        l, r, t, b = self._pad
        ht, wd = x.shape[-2:]
        return x[..., t:ht - b, l:wd - r]


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def apply_raft_shared0(model: RAFT, params, video,
                       iters: Optional[int] = None,
                       scale_inputs: bool = True):
    """Counterfactual-batch flow probe: ``video`` [S, 2, C, H, W] where
    frame 0 is the SAME scene in every sample (the fix_passive
    construction). fnet/cnet run once on frame 0 instead of S times;
    numerics are identical to apply_raft_video because every norm in the
    encoders is frozen or per-sample. Returns flows [S, 1, 2, H, W]."""
    x = video * 255.0 if scale_inputs else video
    flow = model.apply({'params': params}, x[0:1, 0], x[:, 1], iters)[1]
    return flow[:, None]
