"""RAFT building blocks in flax (NHWC internally, TPU-native).

Re-implementation of reference cwm/models/raft/{extractor,update}.py.
BatchNorm runs in eval mode in the reference (inference-only flow probe), so
it is implemented here as FrozenBatchNorm with converted running stats.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm2d in eval mode: params hold the torch running stats."""
    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.features,),
                          jnp.float32)
        mean = self.param('mean', nn.initializers.zeros, (self.features,),
                          jnp.float32)
        var = self.param('var', nn.initializers.ones, (self.features,),
                         jnp.float32)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x - mean) * inv + bias


class InstanceNorm(nn.Module):
    """InstanceNorm2d with torch defaults (affine=False). NHWC input."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = x.mean((1, 2), keepdims=True)
        var = ((x - mean) ** 2).mean((1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


def make_norm(norm_fn: str, features: int, name: str):
    if norm_fn == 'batch':
        return FrozenBatchNorm(features, name=name)
    if norm_fn == 'instance':
        return InstanceNorm(name=name)
    if norm_fn == 'group':
        return nn.GroupNorm(num_groups=features // 8, name=name)
    if norm_fn == 'none':
        return lambda x: x
    raise ValueError(norm_fn)


def conv(features, kernel, stride=1, padding=0, name=None, dtype=jnp.float32):
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return nn.Conv(features, kernel, strides=(stride, stride) if
                   isinstance(stride, int) else stride,
                   padding=padding, name=name, dtype=dtype)


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str = 'group'
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = conv(self.planes, 3, self.stride, 1, 'conv1', self.dtype)(x)
        y = nn.relu(make_norm(self.norm_fn, self.planes, 'norm1')(y))
        y = conv(self.planes, 3, 1, 1, 'conv2', self.dtype)(y)
        y = nn.relu(make_norm(self.norm_fn, self.planes, 'norm2')(y))
        if self.stride != 1:
            x = conv(self.planes, 1, self.stride, 0, 'downsample_conv',
                     self.dtype)(x)
            x = make_norm(self.norm_fn, self.planes, 'norm3')(x)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    planes: int
    norm_fn: str = 'group'
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p4 = self.planes // 4
        y = conv(p4, 1, 1, 0, 'conv1', self.dtype)(x)
        y = nn.relu(make_norm(self.norm_fn, p4, 'norm1')(y))
        y = conv(p4, 3, self.stride, 1, 'conv2', self.dtype)(y)
        y = nn.relu(make_norm(self.norm_fn, p4, 'norm2')(y))
        y = conv(self.planes, 1, 1, 0, 'conv3', self.dtype)(y)
        y = nn.relu(make_norm(self.norm_fn, self.planes, 'norm3')(y))
        if self.stride != 1:
            x = conv(self.planes, 1, self.stride, 0, 'downsample_conv',
                     self.dtype)(x)
            x = make_norm(self.norm_fn, self.planes, 'norm4')(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Reference extractor.py:118-192. Input NHWC in [-1, 1]."""
    output_dim: int = 128
    norm_fn: str = 'batch'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = conv(64, 7, 2, 3, 'conv1', self.dtype)(x)
        x = nn.relu(make_norm(self.norm_fn, 64, 'norm1')(x))
        for i, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)]):
            x = ResidualBlock(dim, self.norm_fn, stride, self.dtype,
                              name=f'layer{i + 1}_0')(x)
            x = ResidualBlock(dim, self.norm_fn, 1, self.dtype,
                              name=f'layer{i + 1}_1')(x)
        return conv(self.output_dim, 1, 1, 0, 'conv2', self.dtype)(x)


class SmallEncoder(nn.Module):
    """Reference extractor.py:195-267."""
    output_dim: int = 128
    norm_fn: str = 'batch'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = conv(32, 7, 2, 3, 'conv1', self.dtype)(x)
        x = nn.relu(make_norm(self.norm_fn, 32, 'norm1')(x))
        for i, (dim, stride) in enumerate([(32, 1), (64, 2), (96, 2)]):
            x = BottleneckBlock(dim, self.norm_fn, stride, self.dtype,
                                name=f'layer{i + 1}_0')(x)
            x = BottleneckBlock(dim, self.norm_fn, 1, self.dtype,
                                name=f'layer{i + 1}_1')(x)
        return conv(self.output_dim, 1, 1, 0, 'conv2', self.dtype)(x)


class FlowHead(nn.Module):
    hidden_dim: int = 256
    out_dim: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(conv(self.hidden_dim, 3, 1, 1, 'conv1', self.dtype)(x))
        return conv(self.out_dim, 3, 1, 1, 'conv2', self.dtype)(x)


class _ConvParams(nn.Module):
    """Parameter holder with nn.Conv's exact tree ({kernel, bias}); lets a
    caller run several same-input convolutions as ONE fused conv without
    changing the checkpoint layout."""
    features: int
    kernel: tuple
    in_features: int

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel
        k = self.param('kernel', nn.initializers.lecun_normal(),
                       (kh, kw, self.in_features, self.features), jnp.float32)
        b = self.param('bias', nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class SepConvGRU(nn.Module):
    """Separable ConvGRU (reference update.py:33-61). NHWC.

    The z and r gates read the same [h, x] input, so their convolutions run
    as one fused conv with stacked output channels (identical per-channel
    math to the reference's separate convz/convr; params stay separate)."""
    hidden_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    def _zr(self, hx, kernel, namez, namer, pad):
        hd = self.hidden_dim
        in_f = hx.shape[-1]
        kz, bz = _ConvParams(hd, kernel, in_f, name=namez)()
        kr, br = _ConvParams(hd, kernel, in_f, name=namer)()
        k = jnp.concatenate([kz, kr], axis=-1).astype(self.dtype)
        b = jnp.concatenate([bz, br]).astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            hx.astype(self.dtype), k, (1, 1), pad,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b
        zr = jax.nn.sigmoid(out)
        return zr[..., :hd], zr[..., hd:]

    @nn.compact
    def __call__(self, h, x):
        hd = self.hidden_dim
        # horizontal pass (1x5 kernels)
        hx = jnp.concatenate([h, x], axis=-1)
        z, r = self._zr(hx, (1, 5), 'convz1', 'convr1', ((0, 0), (2, 2)))
        q = jnp.tanh(conv(hd, (1, 5), 1, ((0, 0), (2, 2)), 'convq1',
                          self.dtype)(jnp.concatenate([r * h, x], -1)))
        h = (1 - z) * h + z * q
        # vertical pass (5x1 kernels)
        hx = jnp.concatenate([h, x], axis=-1)
        z, r = self._zr(hx, (5, 1), 'convz2', 'convr2', ((2, 2), (0, 0)))
        q = jnp.tanh(conv(hd, (5, 1), 1, ((2, 2), (0, 0)), 'convq2',
                          self.dtype)(jnp.concatenate([r * h, x], -1)))
        return (1 - z) * h + z * q


class ConvGRU(nn.Module):
    """Plain ConvGRU (reference update.py:16-31)."""
    hidden_dim: int = 96
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hd = self.hidden_dim
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(conv(hd, 3, 1, 1, 'convz', self.dtype)(hx))
        r = jax.nn.sigmoid(conv(hd, 3, 1, 1, 'convr', self.dtype)(hx))
        q = jnp.tanh(conv(hd, 3, 1, 1, 'convq', self.dtype)(
            jnp.concatenate([r * h, x], -1)))
        return (1 - z) * h + z * q


class BasicMotionEncoder(nn.Module):
    """Reference update.py:81-99."""
    corr_levels: int = 4
    corr_radius: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(conv(256, 1, 1, 0, 'convc1', self.dtype)(corr))
        c = nn.relu(conv(192, 3, 1, 1, 'convc2', self.dtype)(c))
        f = nn.relu(conv(128, 7, 1, 3, 'convf1', self.dtype)(flow))
        f = nn.relu(conv(64, 3, 1, 1, 'convf2', self.dtype)(f))
        out = nn.relu(conv(126, 3, 1, 1, 'conv', self.dtype)(
            jnp.concatenate([c, f], -1)))
        return jnp.concatenate([out, flow], -1)


class SmallMotionEncoder(nn.Module):
    """Reference update.py:63-79."""
    corr_levels: int = 4
    corr_radius: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(conv(96, 1, 1, 0, 'convc1', self.dtype)(corr))
        f = nn.relu(conv(64, 7, 1, 3, 'convf1', self.dtype)(flow))
        f = nn.relu(conv(32, 3, 1, 1, 'convf2', self.dtype)(f))
        out = nn.relu(conv(80, 3, 1, 1, 'conv', self.dtype)(
            jnp.concatenate([c, f], -1)))
        return jnp.concatenate([out, flow], -1)


class BasicUpdateBlock(nn.Module):
    """Reference update.py:115-136."""
    corr_levels: int = 4
    corr_radius: int = 4
    hidden_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(self.corr_levels, self.corr_radius,
                                    self.dtype, name='encoder')(flow, corr)
        inp = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, self.dtype, name='gru')(net, inp)
        delta = FlowHead(256, 2, self.dtype, name='flow_head')(net)
        m = nn.relu(conv(256, 3, 1, 1, 'mask_0', self.dtype)(net))
        mask = 0.25 * conv(64 * 9, 1, 1, 0, 'mask_2', self.dtype)(m)
        return net, mask, delta


class SmallUpdateBlock(nn.Module):
    """Reference update.py:101-113."""
    corr_levels: int = 4
    corr_radius: int = 3
    hidden_dim: int = 96
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = SmallMotionEncoder(self.corr_levels, self.corr_radius,
                                    self.dtype, name='encoder')(flow, corr)
        inp = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.hidden_dim, self.dtype, name='gru')(net, inp)
        delta = FlowHead(128, 2, self.dtype, name='flow_head')(net)
        return net, None, delta
