"""Stream preprocessors: declarative input pipelines for conjoined models.

Re-design of reference cwm/models/preprocessor.py:18-388. Each preprocessor
is a lightweight config object whose __call__ is pure (frame selection,
channel ops, RAFT flow, IMU reshape) — safe to trace inside jit. The RAFT
model used by FramePairFlow is held as (module, params) rather than loaded
from a hard-coded checkpoint path.

Convention: video inputs are [B, C, T, H, W] (temporal_dim=2, the predictor
layout); IMU inputs are [B, C=6, L].
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax.numpy as jnp

from ..ops.normalization import imagenet_normalize, imagenet_unnormalize


class Preprocessor:
    """Select frames and optionally transform them
    (reference preprocessor.py:18-136)."""
    num_channels: Optional[int] = None

    def __init__(self, frames_list=None, temporal_dim=2, channel_dim=None,
                 preproc_func=None, num_frames=None, num_channels=None,
                 stack=False, **unused):
        if isinstance(frames_list, int):
            frames_list = [frames_list, frames_list + 1]
        self.frames_list = list(frames_list) if frames_list is not None else None
        self.temporal_dim = self.t_dim = temporal_dim
        self.channel_dim = self.c_dim = (channel_dim if channel_dim is not None
                                         else (1 if temporal_dim == 2 else 2))
        self.preproc_func = preproc_func or (lambda x: x)
        self.num_frames = num_frames
        if num_channels is not None:
            self.num_channels = num_channels
        self.stack = stack

    def get_num_frames(self):
        if self.stack:
            return 1
        if self.num_frames is None:
            return len(self.frames_list) if self.frames_list is not None else None
        return self.num_frames

    def _frames(self, x, frames=None, temporal_dim=None):
        frames = frames if frames is not None else self.frames_list
        dim = temporal_dim if temporal_dim is not None else self.t_dim
        t = x.shape[dim]
        idx = jnp.asarray([f % t for f in frames])
        return jnp.take(x, idx, axis=dim)

    def get_output_frames(self, y, temporal_dim=None):
        """Select the output frames (reference preprocessor.py:117-122)."""
        nf = self.get_num_frames() or y.shape[
            temporal_dim if temporal_dim is not None else self.t_dim]
        frames = (self.frames_list or list(range(y.shape[
            temporal_dim if temporal_dim is not None else self.t_dim])))
        return self._frames(y, frames[-nf:], temporal_dim)

    def __call__(self, x, timestamps=None, **kwargs):
        if self.frames_list is not None:
            x = self._frames(x)
        x = self.preproc_func(x)
        if self.stack:
            b = x.shape[0]
            x = x.reshape(b, x.shape[1] * x.shape[2], 1, *x.shape[-2:])
        return x


class Noise(Preprocessor):
    """Random noise with the input's shape (reference preprocessor.py:138-146,
    torch.rand_like — fresh noise per call).

    Pass ``key`` for explicit control; otherwise ``self.key`` advances on
    every call (split), so repeated calls draw fresh patterns like the
    reference. Note the self.key path is stateful — inside jit, pass
    ``key`` explicitly.
    """

    def __init__(self, *args, key=None, **kwargs):
        super().__init__(*args, **kwargs)
        import jax
        self.key = key if key is not None else jax.random.PRNGKey(0)

    def __call__(self, x, timestamps=None, key=None, **kwargs):
        import jax
        if self.frames_list is not None:
            x = self._frames(x)
        if key is None:
            self.key, key = jax.random.split(self.key)
        return jax.random.uniform(key, x.shape, x.dtype)


class ImagenetNormalize(Preprocessor):
    num_channels = 3

    def __init__(self, unnormalize=False, **kwargs):
        super().__init__(**kwargs)
        func = imagenet_unnormalize if unnormalize else imagenet_normalize
        self.preproc_func = lambda x: func(x, temporal_dim=self.t_dim)


class IMU(Preprocessor):
    """[B, 6, L] IMU stream -> [B, 6, L, 1, 1] pseudo-video
    (reference preprocessor.py:169-206)."""
    num_channels = 6

    def __init__(self, sequence_length=None, **kwargs):
        kwargs.setdefault('frames_list', None)
        super().__init__(**kwargs)
        self.sequence_length = sequence_length
        self.num_frames = None

    def get_num_frames(self):
        return None

    def __call__(self, imu=None, timestamps=None, **kwargs):
        if imu is None:
            return None
        imu = imu[..., None, None]
        return self.preproc_func(imu)


class FramePairFlow(Preprocessor):
    """RAFT flow between consecutive frames, optionally with backward flow
    and RGB concatenated (reference preprocessor.py:208-285).

    Holds a (RAFT module, params) pair; runs inside the caller's jit.
    Output flow is normalized to [-1, 1] by half the image size.
    """
    num_channels = 2

    def __init__(self, flow_model=None, flow_params=None, iters=24,
                 backward=False, unnormalize_rgb=True, normalize_flow=True,
                 concat_backward=False, concat_rgb=False, **kwargs):
        super().__init__(**kwargs)
        if flow_model is None:
            from .raft.raft import RAFT
            flow_model = RAFT(iters=iters)
        self.flow_model = flow_model
        self.flow_params = flow_params
        self.iters = iters
        self.backward = backward
        self.unnormalize_rgb = unnormalize_rgb
        self.normalize_flow = normalize_flow
        self.concat_backward = concat_backward
        self.concat_rgb = concat_rgb
        self.num_channels = 2 + 2 * int(concat_backward) + 3 * int(concat_rgb)
        if self.frames_list is not None:
            self.num_frames = len(self.frames_list) - 1

    def get_num_frames(self):
        if self.num_frames is None:
            return (len(self.frames_list) - 1
                    if self.frames_list is not None else None)
        return self.num_frames

    def _get_flow(self, x, backward):
        """x: [B, C, T, H, W] in [0, 1]. Returns [B, 2, T-1, H, W]."""
        from .raft.raft import apply_raft_video
        video = jnp.swapaxes(x, 1, 2)  # [B,T,C,H,W]
        flow = apply_raft_video(self.flow_model, self.flow_params, video,
                                backward, self.iters, True)
        return jnp.swapaxes(flow, 1, 2)

    def __call__(self, x, timestamps=None, **kwargs):
        if self.frames_list is not None:
            x = self._frames(x)
        # a T-frame input yields T-1 flow frames; with frames_list=None
        # record it at call time (the reference sets num_frames after the
        # first forward the same way, preprocessor.py:241) so
        # get_output_frames selects T-1 mask frames, not all T
        self.num_frames = x.shape[self.t_dim] - 1
        if self.unnormalize_rgb:
            x = imagenet_unnormalize(x, temporal_dim=self.t_dim)
        outs = [self._get_flow(x, self.backward)]
        if self.concat_backward:
            outs.append(self._get_flow(x, not self.backward))
        if self.concat_rgb:
            rgb = x
            if self.unnormalize_rgb:
                rgb = imagenet_normalize(rgb, temporal_dim=self.t_dim)
            frames = (self.frames_list or list(range(x.shape[self.t_dim])))
            outs.append(self._frames(rgb, frames[1:]))
        out = jnp.concatenate(outs, axis=self.c_dim)

        if self.normalize_flow:
            h, w = out.shape[-2:]
            scale = [w, h] * (2 if self.concat_backward else 1)
            if self.concat_rgb:
                scale = scale + [2.0, 2.0, 2.0]
            scale = jnp.asarray(scale, out.dtype).reshape(1, -1, 1, 1, 1) / 2.0
            out = out / scale
        return out


# Registry mirroring reference preprocessor.py:289-388
RGB02 = partial(Preprocessor, num_channels=3, frames_list=[0, -1])
RGB01 = partial(Preprocessor, num_channels=3, frames_list=[0, 1])
RGB01Stack = partial(Preprocessor, num_channels=6, frames_list=[0, 1],
                     stack=True)
RGB12 = partial(Preprocessor, num_channels=3, frames_list=[1, -1])
RGB012 = partial(Preprocessor, num_channels=3, frames_list=[0, 1, -1])
RGB0 = partial(Preprocessor, num_channels=3, frames_list=[0])
RGB1 = partial(Preprocessor, num_channels=3, frames_list=[1])
Noise1 = partial(Noise, num_channels=3, frames_list=[1])
Flow01 = partial(FramePairFlow, frames_list=[0, 1])
FlowRGB01 = partial(FramePairFlow, frames_list=[0, 1], concat_rgb=True)
Flow = partial(FramePairFlow)
FlowRGB = partial(FramePairFlow, concat_rgb=True)
FlowBackRGB = partial(FramePairFlow, concat_backward=True, concat_rgb=True)
FlowBack01 = partial(FramePairFlow, frames_list=[0, 1], concat_backward=True)
FlowBackRGB01 = partial(FramePairFlow, frames_list=[0, 1],
                        concat_backward=True, concat_rgb=True)

_REGISTRY = {
    'rgb01': RGB01, 'rgb02': RGB02, 'rgb0': RGB0, 'rgb1': RGB1,
    'noise1': Noise1, 'flow01': Flow01, 'flow_rgb01': FlowRGB01,
    'flow': Flow, 'flow_rgb': FlowRGB, 'flowback_rgb': FlowBackRGB,
    'flowback01': FlowBack01, 'flowback_rgb01': FlowBackRGB01,
    'rgb12': RGB12, 'rgb012': RGB012, 'imu': IMU, 'rgb01stack': RGB01Stack,
}


def get_preprocessor(name, temporal_dim=2, unnormalize=True, **kwargs):
    """(reference preprocessor.py:364-388). ``unnormalize`` prepends an
    imagenet-unnormalize to visual streams."""
    if unnormalize and 'imu' not in name:
        kwargs['preproc_func'] = \
            lambda x: imagenet_unnormalize(x, temporal_dim=temporal_dim)
    return _REGISTRY[name](temporal_dim=temporal_dim, **kwargs)
