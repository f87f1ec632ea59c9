"""Mask generators, TPU-native.

Functional re-design of the reference generator family
(cwm/models/masking.py:135-630). Differences by design:

* Every sampler is a pure function over an explicit ``jax.random`` key, so
  masks are bitwise-stable under a fixed seed and the whole family is
  vmap-able over batch and sample axes.
* Popcounts are exact **by construction** (scores + argsort instead of
  shuffles), so downstream jitted model code sees static visible-token
  counts — no RectangularizeMasks pass needed on generated masks.

Mask convention: bool, True = masked, flattened frame-major then row-major.

Thin class wrappers at the bottom mirror the reference API (constructor args,
``num_visible`` / ``mask_ratio`` setters, ``__call__(x)``) for drop-in use.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .mask_ops import upsample_masks

__all__ = [
    'uniform_frame_mask', 'uniform_mask', 'tube_mask', 'rotated_table_mask',
    'rotated_table_uniform_mask', 'forward_backward_rotated_table_mask',
    'energy_mask', 'rotated_table_energy_mask',
    'MaskingGenerator', 'UniformMaskingGenerator', 'TubeMaskingGenerator',
    'RotatedTableMaskingGenerator', 'RotatedTableUniformMaskingGenerator',
    'ForwardBackwardRotatedTableMaskingGenerator',
    'EnergySamplingMaskingGenerator', 'RotatedTableEnergyMaskingGenerator',
    'FullMaskGenerator', 'ImuFullMaskGenerator', 'MissingDataImuMaskGenerator',
    'MixedMaskGenerator', 'MixedClumpingMaskingGenerator',
    'RotatedTableMixedClumpingMaskingGenerator',
]


def _canonical_clump(clumping_factor) -> Tuple[int, int]:
    if isinstance(clumping_factor, int):
        return (clumping_factor, clumping_factor)
    return tuple(clumping_factor[:2])


def uniform_frame_mask(key, height: int, width: int, num_masked: int,
                       clumping_factor=1) -> jnp.ndarray:
    """One frame's [H, W] bool mask with exactly ``num_masked`` masked coarse
    cells, sampled uniformly; clumping tiles the coarse grid by the clump
    factor (reference masking.py:347-375).
    """
    ch, cw = _canonical_clump(clumping_factor)
    gh, gw = height // ch, width // cw
    n = gh * gw
    key_sample, key_pad = jax.random.split(key)
    scores = jax.random.uniform(key_sample, (n,))
    order = jnp.argsort(scores)
    mask = jnp.zeros((n,), dtype=bool).at[order[:num_masked]].set(True)
    mask = mask.reshape(gh, gw)
    if max(ch, cw) > 1:
        mask = jnp.repeat(jnp.repeat(mask, ch, axis=0), cw, axis=1)
        pad_h, pad_w = height - gh * ch, width - gw * cw
        if pad_h or pad_w:
            # independent subkeys: one key for both draws would correlate
            # the offsets (identical whenever pad_h == pad_w), placing the
            # block only on diagonal offsets
            key_h, key_w = jax.random.split(key_pad)
            off_h = jax.random.randint(key_h, (), 0, pad_h + 1) if pad_h else 0
            off_w = jax.random.randint(key_w, (), 0, pad_w + 1) if pad_w else 0
            full = jnp.ones((height, width), dtype=bool)
            mask = jax.lax.dynamic_update_slice(full, mask, (off_h, off_w))
    return mask


def uniform_mask(key, input_size: Sequence[int], mask_ratio: float,
                 clumping_factor=1, batch_size: int = 1) -> jnp.ndarray:
    """[B, T*H*W] mask, each frame masked independently at exact ratio."""
    t, h, w = input_size
    ch, cw = _canonical_clump(clumping_factor)
    n_per_frame = (h // ch) * (w // cw)
    num_masked = int(mask_ratio * n_per_frame)
    keys = jax.random.split(key, batch_size * t).reshape(batch_size, t, 2)
    frame_fn = lambda k: uniform_frame_mask(k, h, w, num_masked, (ch, cw))
    masks = jax.vmap(jax.vmap(frame_fn))(keys)  # [B,T,H,W]
    return masks.reshape(batch_size, -1)


def tube_mask(key, input_size: Sequence[int], mask_ratio: float,
              clumping_factor=1, batch_size: int = 1) -> jnp.ndarray:
    """Same mask repeated across all frames (reference masking.py:221-226)."""
    t, h, w = input_size
    ch, cw = _canonical_clump(clumping_factor)
    n_per_frame = (h // ch) * (w // cw)
    num_masked = int(mask_ratio * n_per_frame)
    keys = jax.random.split(key, batch_size)
    frame_fn = lambda k: uniform_frame_mask(k, h, w, num_masked, (ch, cw))
    frame = jax.vmap(frame_fn)(keys)  # [B,H,W]
    masks = jnp.broadcast_to(frame[:, None], (batch_size, t, h, w))
    return masks.reshape(batch_size, -1)


def rotated_table_mask(key, input_size: Sequence[int], mask_ratio: float,
                       tube_length: Optional[int] = None,
                       clumping_factor=1, batch_size: int = 1) -> jnp.ndarray:
    """First frames fully visible, remaining frames share one tube mask
    (reference masking.py:229-244)."""
    t, h, w = input_size
    tube_length = tube_length or (t - 1)
    table = t - tube_length
    tubes = tube_mask(key, (tube_length, h, w), mask_ratio, clumping_factor,
                      batch_size)
    top = jnp.zeros((batch_size, table * h * w), dtype=bool)
    return jnp.concatenate([top, tubes], axis=-1)


def rotated_table_uniform_mask(key, input_size: Sequence[int],
                               mask_ratio: float, visible_frames: Optional[int] = None,
                               clumping_factor=1,
                               batch_size: int = 1) -> jnp.ndarray:
    """The workhorse policy: ``visible_frames`` leading frames fully visible,
    each remaining frame independently masked at exact ratio
    (reference masking.py:478-545). Returns bool [B, T*H*W].
    """
    t, h, w = input_size
    if visible_frames is None:
        visible_frames = t - 1
    masked_frames = t - visible_frames
    vis = jnp.zeros((batch_size, visible_frames * h * w), dtype=bool)
    rest = uniform_mask(key, (masked_frames, h, w), mask_ratio,
                        clumping_factor, batch_size)
    return jnp.concatenate([vis, rest], axis=-1)


def forward_backward_rotated_table_mask(key, input_size: Sequence[int],
                                        mask_ratio: float,
                                        context_mask_ratio: Optional[float] = None,
                                        clumping_factor=1, flip_prob: float = 0.5,
                                        batch_size: int = 1) -> jnp.ndarray:
    """Rotated-table masks, randomly time-flipped per row
    (reference masking.py:547-601)."""
    t, h, w = input_size
    key_m, key_v, key_f = jax.random.split(key, 3)
    masked = uniform_mask(key_m, (t - 1, h, w), mask_ratio, clumping_factor,
                          batch_size)
    ctx_ratio = context_mask_ratio if context_mask_ratio is not None else (1 - mask_ratio)
    vis = uniform_mask(key_v, (1, h, w), ctx_ratio, clumping_factor, batch_size)
    fwd = jnp.concatenate([vis, masked], axis=-1)
    bwd = jnp.concatenate([masked, vis], axis=-1)
    cond = jax.random.uniform(key_f, (batch_size, 1)) < flip_prob
    return jnp.where(cond, bwd, fwd)


def _pool_energy(energy: jnp.ndarray, out_hw: Tuple[int, int],
                 pool_mode: str = 'mean') -> jnp.ndarray:
    """Pool a [B,1,H,W] energy map down to [B,1,h,w]."""
    b, c, h, w = energy.shape
    oh, ow = out_hw
    kh, kw = h // oh, w // ow
    if (kh, kw) == (1, 1):
        return energy
    e = energy.reshape(b, c, oh, kh, ow, kw)
    if pool_mode == 'mean':
        return e.mean((3, 5))
    if pool_mode == 'max':
        return e.max((3, 5))
    if pool_mode == 'min':
        return e.min((3, 5))
    raise ValueError(pool_mode)


def energy_frame_mask(key, energy: jnp.ndarray, height: int, width: int,
                      num_visible: int, clumping_factor: int = 1,
                      temperature: Optional[float] = None,
                      pool_mode: str = 'mean', energy_power: float = 1,
                      eps: float = 1e-9) -> jnp.ndarray:
    """Sample ``num_visible`` coarse cells proportional to an energy map.

    energy: [B, 1, He, We] (He, We multiples of height, width). Draws are
    categorical with replacement, matching the reference
    (sampling.py:63-90 -> utils.py:172-213). Returns bool [B, H*W].
    """
    b = energy.shape[0]
    cf = clumping_factor
    gh, gw = height // cf, width // cf
    e = _pool_energy(energy, (gh, gw), pool_mode)
    if temperature is not None:
        e = e - e.max((-2, -1), keepdims=True)
        e = jnp.exp(e * temperature)
    e = jnp.power(e, energy_power)

    p = e.reshape(b, gh * gw)
    p = p - p.min(-1, keepdims=True)
    p = jax.nn.relu(p + eps)
    p = p / jnp.clip(p.sum(-1, keepdims=True), min=eps)
    logits = jnp.log(jnp.clip(p, min=1e-30))
    npts = max(num_visible, 1)
    idx = jax.random.categorical(key, logits, axis=-1, shape=(npts, b)).T  # [B,P]
    visible = jnp.zeros((b, gh * gw), dtype=bool)
    visible = jax.vmap(lambda v, i: v.at[i].set(True))(visible, idx)
    if num_visible == 0:
        visible = jnp.zeros_like(visible)
    visible = visible.reshape(b, gh, gw)
    if cf > 1:
        visible = upsample_masks(visible, (height, width))
    return ~visible.reshape(b, height * width)


def energy_mask(key, energy: jnp.ndarray, input_size: Sequence[int],
                num_visible: int, visible_frames: int = 0,
                clumping_factor: int = 1, temperature: Optional[float] = None,
                pool_mode: str = 'mean', energy_power: float = 1) -> jnp.ndarray:
    """Full [B, T*H*W] energy-sampled mask with optional leading visible frames."""
    t, h, w = input_size
    b = energy.shape[0]
    m = energy_frame_mask(key, energy, h, w, num_visible, clumping_factor,
                          temperature, pool_mode, energy_power)
    masked_frames = t - visible_frames
    m = jnp.tile(m, (1, masked_frames))
    if visible_frames > 0:
        vis = jnp.zeros((b, visible_frames * h * w), dtype=bool)
        m = jnp.concatenate([vis, m], axis=-1)
    return m


def rotated_table_energy_mask(key, energy, input_size, num_visible,
                              clumping_factor=1, temperature=None,
                              pool_mode='mean', energy_power=1):
    """Energy mask with frame 0 fully visible (reference sampling.py:114-126)."""
    return energy_mask(key, energy, input_size, num_visible, visible_frames=1,
                       clumping_factor=clumping_factor, temperature=temperature,
                       pool_mode=pool_mode, energy_power=energy_power)


# ---------------------------------------------------------------------------
# Class wrappers mirroring the reference API (stateful key management only).
# ---------------------------------------------------------------------------

class _KeyedGenerator:
    """Base: owns a PRNG key; each __call__ consumes a fresh subkey."""

    def __init__(self, seed: int = 0):
        self.seed = seed
        self._key = jax.random.PRNGKey(seed)

    def reset(self, seed: Optional[int] = None):
        if seed is not None:
            self.seed = seed
        self._key = jax.random.PRNGKey(self.seed)

    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub


class MaskingGenerator(_KeyedGenerator):
    """Uniform per-frame masking (reference masking.py:267-401)."""

    sampler = staticmethod(uniform_mask)

    def __init__(self, input_size, mask_ratio, seed=0, visible_frames=0,
                 clumping_factor=1, randomize_num_visible=False,
                 always_batch=True, **unused):
        super().__init__(seed)
        assert len(input_size) == 3, input_size
        self.frames, self.height, self.width = input_size
        self.clumping_factor = clumping_factor
        self.visible_frames = visible_frames
        self.always_batch = always_batch
        self.randomize_num_visible = randomize_num_visible
        ch, cw = _canonical_clump(clumping_factor)
        self.num_patches_per_frame = (self.height // ch) * (self.width // cw)
        self.mask_ratio = mask_ratio

    # mask_ratio / num_visible accounting, mirroring the reference properties
    @property
    def mask_ratio(self):
        return self._mask_ratio

    @mask_ratio.setter
    def mask_ratio(self, val):
        self._mask_ratio = val
        self._num_masks_per_frame = int(val * self.num_patches_per_frame)

    @property
    def num_masks_per_frame(self):
        return self._num_masks_per_frame

    @num_masks_per_frame.setter
    def num_masks_per_frame(self, val):
        self._num_masks_per_frame = int(val)
        self._mask_ratio = val / self.num_patches_per_frame

    @property
    def num_visible(self):
        return self.num_patches_per_frame - self.num_masks_per_frame

    @num_visible.setter
    def num_visible(self, val):
        self.num_masks_per_frame = self.num_patches_per_frame - val

    @property
    def input_size(self):
        return (self.frames, self.height, self.width)

    def _batch_size(self, x):
        if x is None:
            return 1
        return int(x.shape[0])

    def sample(self, key, batch_size=1):
        t = self.frames
        m = uniform_mask(key, (t, self.height, self.width), self.mask_ratio,
                         self.clumping_factor, batch_size)
        if self.visible_frames > 0:
            vis = jnp.zeros((batch_size, self.visible_frames *
                             self.height * self.width), dtype=bool)
            m = jnp.concatenate([vis, m], axis=-1)
        return m

    def __call__(self, x=None, key=None):
        b = self._batch_size(x)
        key = key if key is not None else self.next_key()
        masks = self.sample(key, b)
        if b == 1 and not self.always_batch:
            masks = masks[0]
        return masks

    def __repr__(self):
        return ("%s: patches/frame %d, masked/frame %d, ratio %.3f" %
                (type(self).__name__, self.num_patches_per_frame,
                 self.num_masks_per_frame, self.mask_ratio))


class UniformMaskingGenerator(MaskingGenerator):
    pass


class TubeMaskingGenerator(MaskingGenerator):
    def sample(self, key, batch_size=1):
        return tube_mask(key, self.input_size, self.mask_ratio,
                         self.clumping_factor, batch_size)


class RotatedTableMaskingGenerator(MaskingGenerator):
    def __init__(self, *args, tube_length=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.tube_length = tube_length

    def sample(self, key, batch_size=1):
        return rotated_table_mask(key, self.input_size, self.mask_ratio,
                                  self.tube_length, self.clumping_factor,
                                  batch_size)


class RotatedTableUniformMaskingGenerator(MaskingGenerator):
    """Frame 0 (or leading frames) visible; last frame(s) uniformly masked.

    The generator used by all demos (reference masking.py:478-545).
    """

    def __init__(self, input_size, mask_ratio, visible_frames=None, seed=0,
                 clumping_factor=1, always_batch=True,
                 randomize_num_visible=False, full_mask_prob=0, **unused):
        assert len(input_size) == 3, input_size
        if visible_frames is None:
            visible_frames = input_size[0] - 1
        super().__init__(
            input_size=(input_size[0] - visible_frames, *input_size[1:]),
            mask_ratio=mask_ratio, seed=seed, visible_frames=visible_frames,
            clumping_factor=clumping_factor, always_batch=always_batch,
            randomize_num_visible=randomize_num_visible)
        self.full_mask_prob = full_mask_prob

    def sample(self, key, batch_size=1):
        key_m, key_f = jax.random.split(key)
        t_total = self.frames + self.visible_frames
        m = rotated_table_uniform_mask(
            key_m, (t_total, self.height, self.width), self.mask_ratio,
            self.visible_frames, self.clumping_factor, batch_size)
        if self.full_mask_prob > 0:
            n_vis = self.visible_frames * self.height * self.width
            fully = jax.random.uniform(key_f, (batch_size, 1)) < self.full_mask_prob
            tail = jnp.where(fully, jnp.ones_like(m[:, n_vis:]), m[:, n_vis:])
            m = jnp.concatenate([m[:, :n_vis], tail], axis=-1)
        return m


class ForwardBackwardRotatedTableMaskingGenerator(RotatedTableUniformMaskingGenerator):
    """Reference masking.py:547-601."""

    def __init__(self, *args, context_mask_ratio=None, flip_prob=0.5, **kwargs):
        super().__init__(*args, **kwargs)
        self.context_mask_ratio = context_mask_ratio
        self.flip_prob = flip_prob

    def sample(self, key, batch_size=1):
        t_total = self.frames + self.visible_frames
        return forward_backward_rotated_table_mask(
            key, (t_total, self.height, self.width), self.mask_ratio,
            self.context_mask_ratio, self.clumping_factor, self.flip_prob,
            batch_size)


class EnergySamplingMaskingGenerator(MaskingGenerator):
    """Sample visible patches proportional to an energy map
    (reference sampling.py:11-112)."""

    def __init__(self, input_size, mask_ratio, seed=0, temperature=None,
                 clumping_factor=1, pool_mode='mean', eps=1e-9,
                 energy_power=1, visible_frames=0, **kwargs):
        super().__init__(input_size=input_size, mask_ratio=mask_ratio,
                         seed=seed, visible_frames=visible_frames,
                         clumping_factor=clumping_factor, **kwargs)
        self.temperature = temperature
        self.pool_mode = pool_mode
        self.eps = eps
        self.energy_power = energy_power

    @property
    def cf(self):
        return _canonical_clump(self.clumping_factor)[0]

    def __call__(self, energy, key=None):
        """energy: [B,1,H,W] (or [B,T,1,H,W]: first frame is used)."""
        energy = jnp.asarray(energy)
        if energy.ndim == 5:
            energy = energy[:, 0]
        if energy.ndim == 3:
            energy = energy[:, None]
        key = key if key is not None else self.next_key()
        num_visible = (self.num_patches_per_frame - self.num_masks_per_frame) \
            // (self.cf ** 2)
        return energy_mask(
            key, energy, (self.frames + self.visible_frames, self.height,
                          self.width),
            num_visible, self.visible_frames, self.cf, self.temperature,
            self.pool_mode, self.energy_power)


class RotatedTableEnergyMaskingGenerator(EnergySamplingMaskingGenerator):
    """Reference sampling.py:114-126."""

    def __init__(self, input_size, mask_ratio, visible_frames=1, seed=0,
                 **kwargs):
        super().__init__(
            input_size=(input_size[0] - visible_frames, *input_size[1:]),
            mask_ratio=mask_ratio, seed=seed, visible_frames=visible_frames,
            **kwargs)


class FullMaskGenerator(MaskingGenerator):
    """Fully masked / visible with some probability (reference masking.py:403-432)."""

    def __init__(self, full_mask_prob=0.2, full_vis_prob=0.0,
                 full_mask_per_example=False, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.full_mask_prob = min(max(full_mask_prob, 0), 1)
        self.full_vis_prob = min(max(full_vis_prob, 0), 1)
        self.partial_prob = max(1 - self.full_mask_prob - self.full_vis_prob, 0)
        self._final_full_mask_prob = self.full_mask_prob / max(
            self.full_mask_prob + self.full_vis_prob, 1e-6)
        self._per_sample = full_mask_per_example

    def sample(self, key, batch_size=1):
        key_m, key_a, key_b = jax.random.split(key, 3)
        masks = super().sample(key_m, batch_size)
        if not self._per_sample:
            u1 = jax.random.uniform(key_a, ())
            u2 = jax.random.uniform(key_b, ())
            masks = jnp.where(u1 < self.partial_prob, masks,
                              jnp.where(u2 < self._final_full_mask_prob,
                                        jnp.ones_like(masks),
                                        jnp.zeros_like(masks)))
        else:
            fully = jax.random.uniform(key_a, (batch_size, 1)) < self.full_mask_prob
            masks = masks | fully
        return masks


class ImuFullMaskGenerator(FullMaskGenerator):
    """1-D token stream variant (reference masking.py:434-446)."""

    def __init__(self, input_size=10, clumping_factor=1, *args, **kwargs):
        if not isinstance(input_size, int):
            input_size = int(math.prod(input_size))
        super().__init__(input_size=(1, 1, input_size),
                         clumping_factor=(1, clumping_factor), *args, **kwargs)


class MissingDataImuMaskGenerator(ImuFullMaskGenerator):
    """Union masks with a missing-data indicator (reference masking.py:448-476)."""

    def __init__(self, truncation_mode='max', *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.mode = truncation_mode

    def set_mode(self, mode):
        self.mode = mode

    def __call__(self, missing=None, key=None):
        key = key if key is not None else self.next_key()
        b = 1 if missing is None else int(missing.shape[0])
        masks = self.sample(key, b)
        if missing is None:
            return masks
        missing = jnp.asarray(missing).astype(bool)
        combined = masks | missing
        if self.mode in ('none', None):
            return combined
        from .mask_ops import rectangularize
        return rectangularize(self.next_key(), combined, mode=self.mode)


class MixedMaskGenerator:
    """Min-combine several generators (reference masking.py:603-630)."""

    def __init__(self, mask_generator_list, mask_ratio_list=None):
        self.mask_generator_list = mask_generator_list
        if mask_ratio_list is not None:
            for g, r in zip(mask_generator_list, mask_ratio_list):
                g.mask_ratio = r

    def __call__(self, *args, **kwargs):
        masks = jnp.stack([g(*args, **kwargs) for g in self.mask_generator_list],
                          axis=-1)
        return masks.min(-1)


class MixedClumpingMaskingGenerator(_KeyedGenerator):
    """Random clumping factor per row (reference masking.py:640-675)."""

    def __init__(self, input_size, mask_ratio, clumping_factor=(1, 2, 4, 8),
                 seed=0, mask_generator_func=MaskingGenerator, **kwargs):
        super().__init__(seed)
        if isinstance(clumping_factor, int):
            clumping_factor = (clumping_factor,)
        self.generators = [
            mask_generator_func(input_size=input_size, mask_ratio=mask_ratio,
                                seed=seed, clumping_factor=c, always_batch=True,
                                **kwargs)
            for c in clumping_factor]

    def __call__(self, x=None, **kwargs):
        if x is None:
            choice = jax.random.randint(self.next_key(), (), 0,
                                        len(self.generators))
            return self.generators[int(choice)](x, **kwargs)
        b = int(x.shape[0])
        rows = []
        for i in range(b):
            choice = int(jax.random.randint(self.next_key(), (), 0,
                                            len(self.generators)))
            rows.append(self.generators[choice](x[i:i + 1], **kwargs))
        return jnp.concatenate(rows, 0)


class RotatedTableMixedClumpingMaskingGenerator(MixedClumpingMaskingGenerator):
    def __init__(self, *args, **kwargs):
        super().__init__(*args,
                         mask_generator_func=RotatedTableUniformMaskingGenerator,
                         **kwargs)


def three_frame_forward_backward_mask(key, input_size, mask_ratio,
                                      independent_samples=True,
                                      fully_visible=False,
                                      batch_size: int = 1):
    """3-frame masking: frame 0 masked at a random ratio q, frame 1 at the
    configured ratio, frame 2 at (1 - q) (reference masking.py:685-756).

    Exact per-row popcounts with a static-shape construction: each frame's
    mask reveals the top-k of a keyed random score with a *traced* k.
    """
    t, h, w = input_size
    assert t == 3, input_size
    n = h * w
    key_p, key_m = jax.random.split(key)
    if independent_samples:
        q = jax.random.uniform(key_p, (batch_size,))
    else:
        q = jnp.broadcast_to(jax.random.uniform(key_p, (1,)), (batch_size,))
    n1 = (q * n).astype(jnp.int32)
    n2 = jnp.full((batch_size,), int(mask_ratio * n), jnp.int32)
    n3 = n - n1
    if fully_visible:
        n1 = jnp.zeros_like(n1)
        n3 = jnp.zeros_like(n3)

    keys = jax.random.split(key_m, batch_size * t).reshape(batch_size, t, 2)
    counts = jnp.stack([n1, n2, n3], 1)  # [B, 3]

    def frame(k, num_masked):
        scores = jax.random.uniform(k, (n,))
        rank = jnp.argsort(jnp.argsort(scores))
        return rank < num_masked

    m = jax.vmap(jax.vmap(frame))(keys, counts)  # [B, 3, n]
    return m.reshape(batch_size, -1)


class ThreeFrameForwardBackwardMasking(_KeyedGenerator):
    """Class wrapper (reference masking.py:685-756)."""

    def __init__(self, input_size, mask_ratio, independent_samples=True,
                 fully_visible=False, seed=0, **unused):
        super().__init__(seed)
        if len(input_size) == 2:
            input_size = (3, *input_size)
        self.input_size = tuple(input_size)
        self.mask_ratio = mask_ratio
        self.independent_samples = independent_samples
        self.fully_visible = fully_visible

    def __call__(self, x=None, key=None):
        b = 1 if x is None else int(x.shape[0])
        key = key if key is not None else self.next_key()
        return three_frame_forward_backward_mask(
            key, self.input_size, self.mask_ratio,
            self.independent_samples, self.fully_visible, b)
