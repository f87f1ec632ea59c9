"""Factual & counterfactual prediction pipeline.

TPU-native re-design of reference cwm/models/prediction.py. The functional
core (:func:`predict_video`, :func:`predict_counterfactual`) is fully jitted:
preprocessing, the masked-ViT forward, and the scatter of predictions back
into the video all fuse into one XLA program. The
:class:`PredictorBasedGenerator` wrapper reproduces the reference class API
(predict / predict_per_sample / batch_predict_per_sample /
get_counterfactual_prediction / mask utilities) as a thin stateful shell:
all state is (params, config, PRNG key); every compute call is pure.

Wrapper video layout: [B, T, C, H, W]; predictor layout: [B, C, T, H, W]
(reference prediction.py:304-312). Masks: bool [B, N], True = masked.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..masking import mask_ops
from ..models.vmae import mask_order, take_tokens
from ..ops import patches as patch_ops
from ..ops.normalization import imagenet_normalize, imagenet_unnormalize
from ..ops.sampling import boltzmann
from . import perturbation as perturb


def scatter_pred_patches(y: jnp.ndarray, x: jnp.ndarray, mask: jnp.ndarray,
                         n_vis: int, patch_size) -> jnp.ndarray:
    """Rebuild a video with input at visible patches and predictions at
    masked patches (reference pred_patches_to_video, prediction.py:245-259).

    y: [B, N - n_vis, D] predicted patch vectors (masked positions, in
       original row-major order); x: [B, T, C, H, W] the raw input video.
    """
    patches = patch_ops.patchify(x, patch_size, temporal_dim=1)
    order = mask_order(mask)
    x_vis = take_tokens(patches, order[:, :n_vis])
    merged = jnp.concatenate([x_vis, y.astype(patches.dtype)], axis=1)
    inv = jnp.argsort(order, axis=-1)
    full = jnp.take_along_axis(merged, inv[..., None], axis=1)
    return patch_ops.unpatchify(full, patch_size, x.shape, temporal_dim=1)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 7))
def predict_video(model, params, x, mask, n_vis: int, normalize: bool,
                  frame: Optional[int], t_dim: int = 2):
    """Jitted: preprocess -> masked forward -> scatter back -> frame select.

    x: [B, T, C, H, W] wrapper layout. Returns [B, T, C, H, W] (or a single
    frame [B, 1, C, H, W] when ``frame`` is not None). ``t_dim`` is where
    the predictor expects the time axis (reference set_temporal_dim,
    prediction.py:187-195): 2 transposes to [B, C, T, H, W], 1 feeds the
    wrapper layout through unchanged.
    """
    xm = imagenet_normalize(x, temporal_dim=1) if normalize else x
    if t_dim == 2:
        xm = jnp.swapaxes(xm, 1, 2)  # -> [B, C, T, H, W]
    y = model.apply({'params': params}, xm, mask, n_vis)
    vid = scatter_pred_patches(y, x, mask, n_vis, model.full_patch_size)
    if frame is not None:
        f = frame % vid.shape[1]
        vid = vid[:, f:f + 1]
    return vid


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 9, 10, 11))
def predict_counterfactuals(model, params, x, masks, n_vis: int,
                            normalize: bool, frame: Optional[int],
                            actives, shifts, n_samples: int,
                            fix_passive: bool = True, t_dim: int = 2, *,
                            keys=None):
    """Jitted batched counterfactual prediction.

    x: [B, T, C, H, W]; masks (passive) bool [B, N, S]; actives bool
    [B, N, S]; shifts int [B, S, 2] patch units; keys [B, S, 2] uint32.
    Returns predicted videos [B*S, T, C, H, W] (sample-major per batch row,
    matching the reference (b s) flattening at segmentation.py:313-315).
    """
    b, t, c, h, w = x.shape
    s = n_samples

    def one(xb, passive, active, shift, key):
        return perturb.make_motion_counterfactual(
            xb, passive, active, shift, key, model.full_patch_size,
            n_vis_target=n_vis, fix_passive=fix_passive)

    # vmap over samples then batch
    f = jax.vmap(one, in_axes=(None, 1, 1, 0, 0))       # over S
    f = jax.vmap(f, in_axes=(0, 0, 0, 0, 0))            # over B
    x_mocos, mask_mocos = f(x, masks, actives, shifts, keys)
    x_mocos = x_mocos.reshape(b * s, t, c, h, w)
    mask_mocos = mask_mocos.reshape(b * s, -1)
    return predict_video(model, params, x_mocos, mask_mocos, n_vis,
                         normalize, frame, t_dim), x_mocos, mask_mocos


class PredictorBasedGenerator:
    """Stateful wrapper mirroring reference PredictorBasedGenerator
    (cwm/models/prediction.py:17-836)."""

    def __init__(self,
                 predictor=None,
                 params=None,
                 predictor_load_path: Optional[str] = None,
                 keypoint_predictor=None,
                 keypoint_params=None,
                 keypoint_predictor_load_path: Optional[str] = None,
                 imagenet_normalize_inputs: bool = False,
                 temporal_dim: int = 2,
                 seed: int = 0,
                 mask_generator=None,
                 max_shift_fraction: float = 0.15,
                 error_func=None,
                 **kwargs):
        # elementwise error used by the error APIs (reference
        # prediction.py:28 defaults to nn.MSELoss(reduction='none'))
        self.error_func = (error_func if error_func is not None
                           else (lambda p, t: (p - t) ** 2))
        self.predictor = predictor
        if params is None and predictor_load_path is not None:
            from ..utils.torch_convert import load_vmae_checkpoint
            params = load_vmae_checkpoint(predictor_load_path)
        self.params = params
        self.imagenet_normalize_inputs = imagenet_normalize_inputs
        self.temporal_dim = temporal_dim
        self.max_shift_fraction = max_shift_fraction
        self.seed = seed
        self._key = jax.random.PRNGKey(seed)
        self.rng = np.random.RandomState(seed=seed)

        self.mask_generator = mask_generator
        self.keypoint_predictor = keypoint_predictor
        self.keypoint_params = keypoint_params
        if keypoint_predictor is not None and keypoint_params is None and \
                keypoint_predictor_load_path is not None:
            from ..utils.torch_convert import load_raft_checkpoint
            self.keypoint_params = load_raft_checkpoint(
                keypoint_predictor_load_path)

        self.x = None
        self.mask = None
        self.timestamps = None
        self.shifts = []

    # ------------------------------------------------------------------
    # bookkeeping / properties (reference prediction.py:131-214)
    # ------------------------------------------------------------------
    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def set_predictor(self, net, predictor_load_path=None, params=None):
        """Swap the predictor network and load its weights — from a
        checkpoint path or an in-memory params tree (flax weights live
        outside the module, so unlike the reference's prediction.py:75-79
        the new net does not carry its own; passing neither keeps the old
        params, valid only for an identically-parameterized module).
        Clears the held input/mask state; engine caches keyed on params
        identity rebuild automatically."""
        self.predictor = net
        if params is not None:
            self.params = params
        self.load_predictor(predictor_load_path)
        self.x = self.mask = None
        self.inp_shape = None

    def load_predictor(self, load_path=None, converter=None):
        """Load predictor weights from a released reference checkpoint
        (reference prediction.py:81-107). ``converter`` overrides the
        torch->flax converter (default: the VMAE converter the constructor
        uses); with no path this is a no-op, matching the reference's
        "fine as long as you already loaded the weights" branch."""
        if load_path is None:
            return
        if converter is None:
            from ..utils.torch_convert import load_vmae_checkpoint
            converter = load_vmae_checkpoint
        self.params = converter(load_path)
        self._predictor_load_path = load_path

    def reset_padding_masks(self):
        """Reference prediction.py:121-130 clears the padded predictor's
        cached ``padding_mask`` buffers. The TPU rebuild computes padding
        masks in-program from the (mask, n_vis) arguments on every call
        (models/conjoined.py null-token scheme), so there is no cached
        state to clear; kept for API parity."""

    def set_temporal_dim(self, t_dim=1):
        """Set where the predictor expects the time axis (reference
        prediction.py:187-195). t_dim=2 (default for every bundled model)
        means the predictor consumes [B, C, T, H, W]; t_dim=1 feeds the
        wrapper's [B, T, C, H, W] layout through unchanged."""
        if t_dim not in (1, 2):
            raise ValueError('temporal_dim must be 1 or 2')
        self.temporal_dim = t_dim

    @property
    def t_dim(self):
        """(reference prediction.py:197-201)."""
        return None if self.predictor is None else self.temporal_dim

    @property
    def c_dim(self):
        """(reference prediction.py:203-207)."""
        if self.predictor is None:
            return None
        return 2 if self.temporal_dim == 1 else 1

    def set_image_size(self, *args, **kwargs):
        """(reference prediction.py:209-214). The flax models are
        static-shaped, so a size that differs from the predictor's build
        size is an error rather than a silent re-configuration."""
        assert self.predictor is not None, \
            "Can't set the image size without a predictor"
        size = args[0] if len(args) == 1 else tuple(args)
        if hasattr(self.predictor, 'set_image_size'):
            self.predictor.set_image_size(size, **kwargs)
            return
        if isinstance(size, int):
            size = (size, size)
        built = tuple(getattr(self.predictor, 'img_size', size))
        if tuple(size) != built:
            raise ValueError(
                f'predictor was built for image size {built}; rebuild the '
                f'model to run at {tuple(size)} (static XLA shapes)')

    @property
    def patch_size(self):
        return self.predictor.full_patch_size

    @property
    def image_size(self):
        return self.predictor.img_size

    @property
    def sequence_length(self):
        return self.predictor.num_frames

    @property
    def mask_shape(self):
        return self.predictor.mask_size

    @property
    def inp_mask_shape(self):
        return (self.x.shape[0], int(np.prod(self.mask_shape)))

    # ------------------------------------------------------------------
    # masks (reference prediction.py:109-130, 216-243, 577-659)
    # ------------------------------------------------------------------
    def generate_mask(self, x=None):
        assert self.mask_generator is not None
        if x is None:
            x = self.x
        mask = self.mask_generator(x, key=self.next_key())
        return jnp.asarray(mask).reshape(x.shape[0], -1)

    def set_new_mask(self, x=None):
        self.mask = self.generate_mask(x if x is not None else self.x)

    def get_zeros_mask(self, x=None, frame=-1):
        if x is None:
            x = self.x
        t, h, w = self.mask_shape
        mask = np.zeros((t, h, w), dtype=bool)
        if frame is not None:
            mask[frame] = True
        mask = jnp.asarray(mask.reshape(-1))
        return jnp.broadcast_to(mask[None], (x.shape[0], mask.shape[0]))

    def get_fully_visible_mask(self, x=None):
        if x is None:
            x = self.x
        n = int(np.prod(self.mask_shape))
        return jnp.zeros((x.shape[0], n), dtype=bool)

    def get_mask_image(self, mask, upsample=False, invert=False, shape=None):
        if shape is None:
            shape = self.mask_shape
        mask = mask.reshape(-1, *shape)
        if upsample:
            mask = mask_ops.upsample_masks(
                mask.astype(jnp.float32), self.x.shape[-2:])
        if invert:
            mask = 1 - mask if upsample else ~mask
        return mask

    def maskshow(self, mask, shape=None, ex=0, **kwargs):
        """Show one example's mask frames as heatmaps
        (reference prediction.py:367-370)."""
        from ..vis_utils import imshow
        m = self.get_mask_image(mask, shape=shape)
        t = m.shape[1]
        return imshow(
            jnp.asarray(m[ex:ex + 1], jnp.float32).reshape(1, t, 1, *m.shape[-2:]),
            cmap='inferno', vmin=0, vmax=1, **kwargs)

    @staticmethod
    def invert_mask_frame(mask, size, frame=-1):
        """Invert one temporal frame of a flat [B, N] mask
        (reference prediction.py:372-383)."""
        return mask_ops.invert_mask_frame(jnp.asarray(mask), size, frame)

    def _invert_mask(self, mask, frame=-1):
        return mask_ops.invert_mask_frame(mask, self.mask_shape[-2:], frame)

    @staticmethod
    def patch_idx_list_from_mask(mask):
        """[b, t, i, j] index lists of the VISIBLE patches of a 4-D mask
        image (reference prediction.py:609-616)."""
        mask = np.asarray(mask)
        assert mask.ndim == 4, mask.shape
        return [list(p) for p in np.argwhere(~mask)]

    @staticmethod
    def make_visible_from_patch_idx_list(mask, patch_idx_list, stride=1,
                                         b=0, t=-1):
        """Reveal the patches at the listed positions in a 4-D mask image
        (reference prediction.py:618-638). Index rows may be (i, j),
        (t, i, j) or (b, t, i, j); pixel coordinates are converted to
        patch coordinates by ``stride``. Returns a new mask (the reference
        mutates in place)."""
        mask = jnp.asarray(mask)
        if len(patch_idx_list) == 0:
            return mask
        idx = np.asarray(patch_idx_list, dtype=np.int64)
        inds_h = (idx[:, -2] // stride) % mask.shape[-2]
        inds_w = (idx[:, -1] // stride) % mask.shape[-1]
        if idx.shape[-1] == 2:
            inds_b = np.full_like(inds_h, b)
            inds_t = np.full_like(inds_h, t)
        elif idx.shape[-1] == 3:
            inds_b = np.full_like(inds_h, b)
            inds_t = idx[:, 0]
        else:
            assert idx.shape[-1] == 4, idx.shape
            inds_b, inds_t = idx[:, 0], idx[:, 1]
        inds_t = inds_t % mask.shape[1]
        return mask.at[inds_b, inds_t, inds_h, inds_w].set(
            jnp.zeros((), mask.dtype))

    def generate_cutout_mask(self, patch_idx_list, radius=1, stride=None,
                             b=0, frame=-1):
        """Visible cutout of the listed patches plus their radius-
        neighborhood in ``frame`` (reference prediction.py:650-659)."""
        mask = self.generate_mask_from_patch_idx_list(
            patch_idx_list, stride=stride, b=b, frame=frame)
        m = self.get_mask_image(mask)
        f = frame % m.shape[1]
        cutout = mask_ops.patches_adjacent_to_visible(
            m[:, f:f + 1], radius=radius).astype(bool)
        cutout = cutout | (~m[:, f:f + 1])
        m = m.at[:, f].set(cutout[:, 0])
        return m.reshape(m.shape[0], -1)

    def mask_complement(self, mask1, mask2, frame=-1):
        m1 = self.get_mask_image(mask1)
        m2 = self.get_mask_image(mask2)
        diff = m1 & (~m2)
        if frame is None:
            return (~diff).reshape(diff.shape[0], -1)
        f = frame % m1.shape[1]
        out = m1.at[:, f].set(~diff[:, f])
        return out.reshape(diff.shape[0], -1)

    def get_nearby_patches(self, mask, radius=1, upsample=False, shape=None):
        mask = self.get_mask_image(mask, shape=shape)
        nearby = mask_ops.patches_adjacent_to_visible(mask, radius=radius)
        if upsample:
            nearby = mask_ops.upsample_masks(nearby, self.x.shape[-2:])
        return nearby

    def sample_random_masks(self, num_samples=10, num_visible=1,
                            mask_ratio=None):
        assert self.mask_generator is not None
        prev = self.mask_generator.num_visible
        if mask_ratio is None:
            self.mask_generator.num_visible = num_visible
        else:
            self.mask_generator.mask_ratio = mask_ratio
        masks = jnp.stack([self.generate_mask(self.x)
                           for _ in range(num_samples)], -1)
        self.mask_generator.num_visible = prev
        return masks

    # ------------------------------------------------------------------
    # inputs (reference prediction.py:703-739)
    # ------------------------------------------------------------------
    def set_input(self, x, mask=None, make_mask=False, timestamps=None):
        x = jnp.asarray(x)
        if x.ndim == 4:
            x = x[:, None]
        assert x.ndim == 5, x.shape
        self.x = x
        self.inp_shape = x.shape
        self.B, self.T, self.C = x.shape[:3]
        if mask is not None:
            self.mask = jnp.asarray(mask)
        elif make_mask:
            self.set_new_mask(x)
        if timestamps is not None:
            self.timestamps = timestamps

    def make_static_movie(self, x=None, t=None, frame=0):
        if x is None:
            x = self.x
        if t is None:
            t = self.predictor.num_frames
        return perturb.make_static_movie(jnp.asarray(x), t=t, frame=frame)

    get_static_input = make_static_movie

    # ------------------------------------------------------------------
    # prediction (reference prediction.py:406-540)
    # ------------------------------------------------------------------
    def _equalize(self, mask):
        """Ensure equal visible counts (static shapes); returns mask, n_vis."""
        counts = np.asarray((~mask).sum(-1))
        if counts.min() != counts.max():
            mask = mask_ops.rectangularize(self.next_key(), mask,
                                           num_visible=int(counts.max()))
            return mask, int(counts.max())
        return mask, int(counts[0])

    def predict(self, x=None, mask=None, frame=-1, **kwargs):
        if x is None:
            x = self.x
        if mask is None:
            mask = self.mask if self.mask is not None else self.generate_mask(x)
        x = jnp.asarray(x)
        if x.ndim == 4:
            x = x[:, None]
        mask = jnp.asarray(mask).reshape(x.shape[0], -1)
        mask, n_vis = self._equalize(mask)
        return predict_video(self.predictor, self.params, x, mask, n_vis,
                             self.imagenet_normalize_inputs, frame,
                             self.temporal_dim)

    def predict_per_sample(self, x, masks, frame=-1, split_samples=True,
                           **kwargs):
        """Tile B -> B*S over the sample axis (reference prediction.py:456-482)."""
        assert masks.ndim == 3, masks.shape
        if x is None:
            x = self.x
        x = jnp.asarray(x)
        b, s = x.shape[0], masks.shape[-1]
        x_t = jnp.repeat(x, s, axis=0)
        m_t = jnp.swapaxes(masks, 1, 2).reshape(b * s, -1)
        y = self.predict(x_t, m_t, frame=frame, **kwargs)
        if not split_samples:
            return y
        y = y.reshape(b, s, *y.shape[1:])
        return jnp.moveaxis(y, 1, -1)

    def sample_tile(self, z, num_samples):
        return jnp.repeat(jnp.asarray(z), num_samples, axis=0)

    def sample_tile_all_tensors(self, num_samples, **kwargs):
        """Tile every array-valued kwarg over the sample axis
        (reference prediction.py:489-495)."""
        return {k: (self.sample_tile(v, num_samples)
                    if isinstance(v, (jnp.ndarray, np.ndarray)) else v)
                for k, v in kwargs.items()}

    def pred_patches_to_video(self, y, x, mask):
        """Public scatter of predicted patch vectors back into the video
        (reference prediction.py:245-259): input content at visible
        positions, predictions at masked positions."""
        x = jnp.asarray(x)
        if x.ndim == 4:
            x = x[:, None]
        mask = jnp.asarray(mask).reshape(x.shape[0], -1)
        counts = np.asarray((~mask).sum(-1))
        assert counts.min() == counts.max(), \
            'rows must have equal visible counts (rectangularize first)'
        return scatter_pred_patches(y, x, mask, int(counts[0]),
                                    self.patch_size)

    def predict_with_mask(self, mask, invert_mask=False, *args, **kwargs):
        """Predict on the held input with the given mask
        (reference prediction.py:542-547)."""
        assert self.x is not None
        mask = jnp.asarray(mask)
        if invert_mask:
            mask = ~mask
        return self.predict(self.x, mask.reshape(*self.inp_mask_shape),
                            *args, **kwargs)

    def error_with_mask(self, mask, invert_mask=False, frame=-1, *args,
                        **kwargs):
        """Prediction error on the held input under the given mask
        (reference prediction.py:548-551). The default single-frame
        prediction only supports frame=-1; ``frame=None`` predicts and
        compares the full video (jnp indexing clamps out-of-range
        indices, so the explicit check restores the reference's
        IndexError)."""
        if frame is None:
            # full-video error (predict every frame, compare them all)
            x_pred = self.predict_with_mask(mask, invert_mask, frame=None,
                                            *args, **kwargs)
            return self._get_error(x_pred, self.x, dim=-3)
        x_pred = self.predict_with_mask(mask, invert_mask, *args, **kwargs)
        t = x_pred.shape[1]
        if not -t <= frame < t:
            raise IndexError(
                f'frame {frame} out of range for the {t}-frame prediction; '
                f'frame=None compares the full video')
        return self._get_error(x_pred[:, frame][:, None],
                               self.x[:, frame][:, None], dim=-3)

    def get_initial_mask(self, x):
        """Abstract hook, as in the reference (prediction.py:577-579 —
        itself a NotImplementedError)."""
        raise NotImplementedError(
            'Need to specify how to get the initial mask')

    def batch_predict_per_sample(self, x, masks, frame=-1, batch_size=None,
                                 sample_dim=None, **kwargs):
        """Micro-batched per-sample prediction (reference prediction.py:497-540).

        With sample_dim=0 the sample axis is already flattened into the
        batch; otherwise masks is [B, N, S].
        """
        if sample_dim != 0:
            s = masks.shape[-1]
        else:
            s = masks.shape[0]
        if batch_size is None:
            batch_size = s
        else:
            batch_size = max(1, batch_size // x.shape[0])
        ys = []
        for i in range(int(np.ceil(s / batch_size))):
            b0, b1 = i * batch_size, min((i + 1) * batch_size, s)
            if sample_dim != 0:
                ys.append(self.predict_per_sample(
                    x, masks[..., b0:b1], frame=frame, split_samples=True,
                    **kwargs))
            else:
                ys.append(self.predict(x[b0:b1], masks[b0:b1], frame=frame,
                                       **kwargs))
        return jnp.concatenate(ys, -1 if sample_dim != 0 else 0)

    def shift_patches_and_mask(self, x, mask, max_shift_fraction=0.1,
                               frame=-1, padding_mode='reflect'):
        """Translate one frame's pixels and its mask by a random
        patch-quantized shift via pad + center-crop (reference
        prediction.py:661-689). Consumes two host-RNG draws like the
        reference; replicates its quirk of dividing the mask's x-pad by
        the height patch size (identical for square patches)."""
        x = jnp.asarray(x)
        h, w = x.shape[-2:]
        if x.ndim == 5:
            x = x[:, frame]
        max_shift = [int(max_shift_fraction * s) for s in (h, w)]
        dy = int(self.rng.randint(-max_shift[0], max_shift[0] + 1))
        dx = int(self.rng.randint(-max_shift[1], max_shift[1] + 1))
        ph, pw = self.patch_size[-2], self.patch_size[-1]
        dy = (dy // ph) * ph
        dx = (dx // pw) * pw

        def _pad(p):
            return (2 * p, 0) if p > 0 else (0, -2 * p)

        def _shift2d(z, pad_lr, pad_tb, mode):
            pads = [(0, 0)] * (z.ndim - 2) + [pad_tb, pad_lr]
            zp = jnp.pad(z, pads, mode=mode)
            top = (zp.shape[-2] - z.shape[-2]) // 2
            left = (zp.shape[-1] - z.shape[-1]) // 2
            return zp[..., top:top + z.shape[-2], left:left + z.shape[-1]]

        x_shift = _shift2d(x, _pad(dx), _pad(dy), padding_mode)
        m = jnp.asarray(mask).reshape(x.shape[0], -1, h // ph, w // pw)
        if m.shape[1] > 1:
            m = m[:, frame][:, None]
        m_shift = _shift2d(m.astype(jnp.float32),
                           _pad(dx // ph), _pad(dy // pw),
                           padding_mode).astype(bool)
        return x_shift, m_shift

    def get_frame_pairs(self, x, frame=None):
        """Pairs (frame_t, target_frame) for every non-target frame
        (reference prediction.py:691-701)."""
        x = jnp.asarray(x)
        assert x.ndim == 5, x.shape
        t = x.shape[1]
        self.num_frame_pairs = t - 1
        self.target_frame = frame if frame is not None else (t // 2)
        return [jnp.stack([x[:, i], x[:, self.target_frame]], 1)
                for i in range(t) if i != self.target_frame]

    # ------------------------------------------------------------------
    # counterfactuals (reference prediction.py:760-814)
    # ------------------------------------------------------------------
    def _shift(self, x, mask, active_patches=None, shift=None, frame=1):
        """Shift active patches; returns (x_shift, mask_shift)
        (reference prediction.py:760-779)."""
        x = jnp.asarray(x)
        if active_patches is None:
            active_patches = jnp.ones_like(mask)
        if shift is None:
            shift = perturb.random_shift(self.next_key(),
                                         self.max_shift_fraction,
                                         x.shape[-2:], self.patch_size)
        shift = jnp.asarray(shift)
        self.shift = np.asarray(shift).tolist()
        self.shifts.append(np.asarray(shift))

        n_vis = int(np.asarray(
            ((~mask) | (~active_patches)).sum(-1)).max())

        def one(xb, p, a, key):
            return perturb.make_motion_counterfactual(
                xb, p, a, shift, key, self.patch_size, n_vis_target=n_vis,
                frame=frame, fix_passive=False)

        keys = jax.random.split(self.next_key(), x.shape[0])
        x_s, m_s = jax.vmap(one)(x, mask, active_patches, keys)
        return x_s, m_s

    def get_counterfactual_prediction(self, x, mask=None, active_patches=None,
                                      shift=None, fix_passive=False, **kwargs):
        x = jnp.asarray(x)
        if x.ndim == 3:
            x = x[None, None]
        elif x.ndim == 4:
            x = x[:, None]
        if x.shape[1] == 1:
            x = self.make_static_movie(x, t=2)
        self.set_input(x)
        if mask is None:
            mask = self.get_zeros_mask(x)
        if active_patches is None:
            active_patches = self.get_zeros_mask(x)
        if fix_passive:
            x = perturb.make_static(x, mask, self.patch_size)
        x_p, mask_p = self._shift(x, mask, active_patches, shift, frame=1)
        return self.predict(x_p, mask_p, frame=None, **kwargs)

    # ------------------------------------------------------------------
    # errors (reference prediction.py:324-343, 553-574)
    # ------------------------------------------------------------------
    def _get_error(self, pred, gt, dim=-3):
        """Elementwise error reduced over ``dim`` (reference
        prediction.py:324-329); trailing-frame aligned like the reference."""
        t = gt.shape[1]
        return self.error_func(pred[:, -t:], gt).sum(dim, keepdims=True)

    def predict_error(self, x=None, mask=None, target=None, frame=None,
                      dim=-3):
        if x is None:
            x = self.x
        if mask is None:
            mask = self.generate_mask(x)
        pred = self.predict(x, mask, frame=frame)
        if target is None:
            target = x
        target = jnp.asarray(target)
        if frame is not None:
            target = target[:, frame][:, None]
        return self.error_func(pred, target).sum(dim, keepdims=True)

    def get_error_on_target_region(self, x, mask, target_mask, target=None,
                                   average_error=True, frame=-1,
                                   aggregate_over_patches=True,
                                   patch_size=None, **kwargs):
        if target is None:
            target = x
        th, tw = self.mask_shape[-2:]
        if target_mask.ndim == 2:
            region = 1.0 - target_mask.reshape(
                x.shape[0], -1, th, tw).astype(jnp.float32)
        else:
            region = 1.0 - target_mask.astype(jnp.float32)
        pred = self.predict(x, mask, frame=frame, **kwargs)
        err = self._get_error(pred, target)
        if not aggregate_over_patches:
            return err
        ps = patch_size or self.patch_size
        b, t, _, h, w = err.shape
        err = err.reshape(b, t // ps[0], ps[0], 1, h // ps[1], ps[1],
                          w // ps[2], ps[2]).mean((2, 5, 7))[:, :, 0]
        err = err * region
        if not average_error:
            return err
        return err.sum((1, 2, 3)) / jnp.clip(region.sum((1, 2, 3)), min=1)

    # ------------------------------------------------------------------
    # keypoints (reference prediction.py:816-828)
    # ------------------------------------------------------------------
    def predict_keypoints_map(self, x, **kwargs):
        x = jnp.asarray(x)
        assert x.ndim == 5, x.shape
        if self.keypoint_predictor is None:
            return jnp.ones_like(x[:, 0:1, 0:1])
        return self.keypoint_predictor(self.keypoint_params, x, **kwargs)

    def predict_keypoints_distribution(self, x, power=8, eps=1e-3):
        v = self.predict_keypoints_map(x)
        v = jnp.squeeze(v, -3)
        v = jax.nn.sigmoid(v) ** power
        v = v - v.min((-2, -1), keepdims=True)
        return v / jnp.clip(v.max((-2, -1), keepdims=True), min=eps)

    def patchify_energy_density(self, density, mode='min', beta=None):
        density = boltzmann(density, beta)
        ps = self.patch_size
        if density.ndim == 5:
            b, t, c, h, w = density.shape
            d = density.reshape(b, t // ps[0], ps[0], c, h // ps[1], ps[1],
                                w // ps[2], ps[2])
            red = {'mean': jnp.mean, 'max': jnp.max, 'min': jnp.min}[mode]
            return red(d, axis=(2, 5, 7)).squeeze(2)
        b, c, h, w = density.shape
        d = density.reshape(b, c, h // ps[1], ps[1], w // ps[2], ps[2])
        red = {'mean': jnp.mean, 'max': jnp.max, 'min': jnp.min}[mode]
        return red(d, axis=(3, 5))

    def __call__(self, x, mask=None, frame=None, **kwargs):
        self.set_input(x, mask)
        if mask is None:
            self.mask = self.generate_mask(self.x)
        return self.predict(self.x, self.mask, frame=frame, **kwargs)

    def forward(self, *args, **kwargs):
        """torch-style alias of __call__ (reference prediction.py:830-836);
        delegates so subclass overrides of __call__ are honored."""
        return self(*args, **kwargs)


# -- visualization-support methods (referenced by the interface) -----------

def _masked_pred_patches(self, preds, mask, invert=False, fill_value=None):
    """Zero (or fill) everything except the visible patches
    (reference prediction.py:261-282)."""
    preds = jnp.asarray(preds)
    t = preds.shape[1]
    th, tw = self.mask_shape[-2:]
    m = mask.reshape(mask.shape[0], -1, th, tw)
    m_pix = mask_ops.upsample_masks(m, preds.shape[-2:]).astype(preds.dtype)
    if invert:
        m_pix = 1.0 - m_pix
    out = preds * m_pix[:, :, None]
    if fill_value is not None:
        fv = jnp.asarray(fill_value, preds.dtype).reshape(1, 1, -1, 1, 1)
        out = out + (1.0 - m_pix[:, :, None]) * fv
    return out


def _unmask_one_patch(mask, idx, mask_shape=None, frame=0):
    """Reveal the patch at idx (reference prediction.py:580-607)."""
    mask = jnp.asarray(mask)
    shape = mask.shape
    if mask_shape is None:
        return mask.at[:, idx].set(False)
    m = mask.reshape(-1, *mask_shape)
    if len(idx) == 2:
        idx = [frame] + list(idx)
    m = m.at[(slice(None),) + tuple(idx)].set(False)
    return m.reshape(shape)


def _mask_from_patch_idx_list(self, patch_idx_list, stride=None, b=0,
                              frame=-1):
    """Visible mask at the given patch positions (reference
    prediction.py:640-648). ``stride`` converts pixel coordinates to patch
    coordinates; the default follows the reference (image width / mask
    width) when an input is set, else 1 (patch coordinates)."""
    m = self.get_mask_image(self.get_zeros_mask(frame=frame))
    if stride is None:
        stride = (self.inp_shape[-1] // m.shape[-1]
                  if getattr(self, 'inp_shape', None) else 1)
    m = self.make_visible_from_patch_idx_list(
        m, patch_idx_list, stride=stride, b=b, t=frame)
    return m.reshape(m.shape[0], -1)


PredictorBasedGenerator.get_masked_pred_patches = _masked_pred_patches
PredictorBasedGenerator.unmask_one_patch = staticmethod(_unmask_one_patch)
PredictorBasedGenerator.generate_mask_from_patch_idx_list = \
    _mask_from_patch_idx_list


class MaeWrapper(PredictorBasedGenerator):
    """Wrapper for original single-image MAE models
    (reference prediction.py:838-907).

    ``predictor`` is any callable with the timm-MAE signature
    ``predictor(params, x, mask_ratio=..., mask=...) ->
    (loss, pred_patches, mask)`` plus an ``unpatchify(pred) -> image``;
    this wrapper handles frame select and imagenet (un)normalization.
    """

    def __init__(self, *args, unpatchify=None, **kwargs):
        super().__init__(*args, **kwargs)
        self._unpatchify = unpatchify

    def imagenet_normalize(self, x):
        """Single-image [B, 3, H, W] normalize (reference
        prediction.py:870-875)."""
        x = jnp.asarray(x)
        assert x.ndim == 4 and x.shape[1] == 3, x.shape
        return imagenet_normalize(x[:, None], temporal_dim=1)[:, 0]

    def imagenet_unnormalize(self, x):
        """Single-image [B, 3, H, W] unnormalize (reference
        prediction.py:877-882)."""
        x = jnp.asarray(x)
        assert x.ndim == 4 and x.shape[1] == 3, x.shape
        return imagenet_unnormalize(x[:, None], temporal_dim=1)[:, 0]

    def predict(self, x=None, mask=None, frame=0, mask_ratio=0.9, **kwargs):
        if x is None:
            x = self.x  # (the reference has `x = x` here — a latent no-op bug)
        x = jnp.asarray(x)
        is_video = x.ndim == 5
        if is_video:
            x = x[:, frame]
        if self.imagenet_normalize_inputs:
            x = imagenet_normalize(x[:, None], temporal_dim=1)[:, 0]
        _, y, mask_out = self.predictor(self.params, x,
                                        mask_ratio=mask_ratio, mask=mask)
        self.mask = mask_out
        if self._unpatchify is not None:
            y = self._unpatchify(y)
        if self.imagenet_normalize_inputs:
            y = imagenet_unnormalize(y[:, None], temporal_dim=1)[:, 0]
        if is_video:
            y = y[:, None]
        return y
