"""Counterfactual flow sampling — the core Spelke-segmentation workload.

TPU-native re-design of reference cwm/models/segmentation.py:23-547. The
reference builds counterfactuals with a Python loop over B*S samples
(segmentation.py:324-338) and chains predictor + RAFT through separate
module calls; here one jitted program fuses: counterfactual construction
(vmapped over samples) -> masked-ViT prediction -> RAFT flow probe. The
sample axis is a real array axis end to end, which is also the axis the
parallel/ package shards across chips.
"""
from __future__ import annotations

import copy
import functools
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..masking import generators
from ..models.raft.raft import RAFT, apply_raft_video
from ..ops.sampling import boltzmann
from . import perturbation as perturb
from .filters import FlowSampleFilter, flow_sample_filter
from .prediction import PredictorBasedGenerator, predict_video


@functools.partial(jax.jit, static_argnums=(0, 2, 9, 10, 11, 12, 13))
def counterfactual_videos_and_flows(vmae_model, vmae_params, raft_model,
                                    raft_params, x, passive, active, shifts,
                                    keys, n_vis: int, normalize: bool,
                                    raft_iters: int, fix_passive: bool,
                                    t_dim: int = 2):
    """Fused counterfactual step.

    x [B,T,C,H,W]; passive/active bool [B,N,S]; shifts int [B,S,2] (patch
    units); keys uint32 [B,S,2]. Returns (videos [B*S,T,C,H,W],
    flows [B*S,1,2,H,W], masks [B*S,N]).
    """
    b, t, c, h, w = x.shape
    s = passive.shape[-1]

    def one(xb, p, a, shift, key):
        return perturb.make_motion_counterfactual(
            xb, p, a, shift, key, vmae_model.full_patch_size,
            n_vis_target=n_vis, fix_passive=fix_passive)

    f = jax.vmap(one, in_axes=(None, 1, 1, 0, 0))
    f = jax.vmap(f, in_axes=(0, 0, 0, 0, 0))
    x_mocos, mask_mocos = f(x, passive, active, shifts, keys)
    x_mocos = x_mocos.reshape(b * s, t, c, h, w)
    mask_mocos = mask_mocos.reshape(b * s, -1)

    y = predict_video(vmae_model, vmae_params, x_mocos, mask_mocos, n_vis,
                      normalize, None, t_dim)
    flows = apply_raft_video(raft_model, raft_params, y, False, raft_iters,
                             True)
    return y, flows, mask_mocos


def compute_flow_corrs(flow_samples: jnp.ndarray,
                       flow_samples_swap: Optional[jnp.ndarray] = None,
                       downsample: int = 1,
                       take_top_k: Optional[int] = None,
                       do_spearman: bool = False,
                       thresh: Optional[float] = None,
                       use_covariance: bool = False,
                       eps: float = 1e-12,
                       binarize: bool = False,
                       normalize: bool = False,
                       zscore: bool = False,
                       range_thresh: Optional[float] = None) -> jnp.ndarray:
    """Pixel x pixel covariance / correlation of flow magnitude across
    counterfactual samples (reference segmentation.py:478-547), as one
    vmapped einsum-based reduction instead of a per-batch torch.cov loop.

    flow_samples: [B, C, H, W, S]. Returns [B, 1, H/ds, W/ds, H/ds, W/ds].
    """
    b, c, h, w, s = flow_samples.shape
    if s == 0:
        flow_samples = jnp.zeros((b, c, h, w, 1), jnp.float32)
        s = 1
    k = s if take_top_k is None else take_top_k
    ds = downsample

    def _ds(fs):
        fs = fs[..., :k]
        return fs.reshape(b, c, h // ds, ds, w // ds, ds, k).mean((3, 5))

    flow_inp = _ds(flow_samples)
    if flow_samples_swap is not None:
        flow_inp = jnp.concatenate([flow_inp, _ds(flow_samples_swap)], -1)
    # reference ChannelMSE is an RMS: sqrt(mean_c((x-0)^2)) (utils.py:510-513)
    flow_inp = jnp.sqrt((flow_inp ** 2).mean(1))
    flow_inp = flow_inp.reshape(b, -1, flow_inp.shape[-1])

    def per_batch(fi):
        if do_spearman:
            # deliberate single argsort (a permutation, not the rank
            # vector true Spearman needs): bit-parity with the reference
            # (cwm/models/segmentation.py:520-521 does exactly this)
            fi = jnp.argsort(fi, -1).astype(jnp.float32)
        if thresh is not None and not binarize:
            fi = fi * (fi > thresh).astype(fi.dtype)
        elif thresh is not None:
            fi = (fi > thresh).astype(jnp.float32)
        elif range_thresh is not None:
            fi = fi - fi.min(0, keepdims=True)
            rng = fi.max(0, keepdims=True)
            fi = (fi > (range_thresh * rng)).astype(jnp.float32)
        if normalize:
            fi = fi / jnp.clip(fi.max(0, keepdims=True), min=eps)
        if zscore:
            mn = fi.mean(0)
            std = jnp.clip(fi.std(0), min=eps)
            fi = (fi - mn[None]) / std[None]
        cc = jnp.cov(fi) if use_covariance else jnp.corrcoef(fi)
        return jnp.nan_to_num(cc, nan=0.0)

    corrs = jax.vmap(per_batch)(flow_inp)
    return corrs.reshape(b, 1, h // ds, w // ds, h // ds, w // ds)


class FlowGenerator(PredictorBasedGenerator):
    """Masked predictor + RAFT flow probe + counterfactual flow sampling
    (reference FlowGenerator, segmentation.py:23-547)."""

    default_flow_filter_params = {
        'filter_methods': ['patch_magnitude', 'flow_area', 'num_corners'],
        'flow_magnitude_threshold': 5.0,
        'flow_area_threshold': 0.75,
        'num_corners_threshold': 2,
    }
    default_patch_sampling_kwargs = {
        'energy_power': 1,
        'pool_mode': 'mean',
    }

    def __init__(self, *args,
                 flow_model: Optional[RAFT] = None,
                 flow_params=None,
                 flow_model_load_path: Optional[str] = None,
                 flow_model_kwargs={},
                 flow_sample_filter: Optional[FlowSampleFilter] = None,
                 raft_iters: int = 24,
                 patch_sampling_func=generators.RotatedTableEnergyMaskingGenerator,
                 patch_sampling_kwargs={},
                 engine: str = 'fast',
                 prefix_cache_size: int = 4,
                 prefix_pool=None,
                 suffix_pool=None,
                 fast_gelu: Optional[str] = None,
                 **kwargs):
        super().__init__(*args, **kwargs)
        assert engine in ('exact', 'fast'), engine
        self.engine = engine
        self.prefix_cache_size = prefix_cache_size
        # pooled-prefix mode (fast engine only): pool the decoder prefix
        # K/V panels pool x pool, weighting each pooled key pool^2-fold —
        # ~38% fewer suffix-attention score elements at pool=2 (the
        # measured throughput bound, PERF.md) for a quantified fidelity
        # cost (tests/test_fast_vmae.py, scripts/fidelity_report.py).
        # Default 'auto': grid-aware — production scale (e.g. ViT-L 4x4
        # @224, grid 56) engages the measured headline rung
        # (pool4+suffix4+tanh, fast_vmae.resolve_pools); small grids stay
        # exact-numerics. Integers pin a rung; 1 = off. Env overrides:
        # CWM_PREFIX_POOL / CWM_SUFFIX_POOL / CWM_FAST_GELU.
        def _pool_knob(value, env):
            if value is None:
                value = os.environ.get(env, 'auto') or 'auto'
            if value != 'auto':
                value = int(value)
                assert value >= 1, (env, value)
            return value

        self.prefix_pool = _pool_knob(prefix_pool, 'CWM_PREFIX_POOL')
        # suffix_pool likewise pools the PER-SAMPLE decoder keys/values
        # (queries stay full-res)
        self.suffix_pool = _pool_knob(suffix_pool, 'CWM_SUFFIX_POOL')
        if fast_gelu is None:
            fast_gelu = os.environ.get('CWM_FAST_GELU', 'auto') or 'auto'
        assert fast_gelu in ('auto', 'erf', 'tanh'), fast_gelu
        self.fast_gelu = fast_gelu
        self._prefix_lru = None  # built lazily on first fast chunk
        self._fast_params_src = None  # identity key: rebuilt on params swap
        self._fast_disabled = False  # set by _disable_fast_engine on failure
        self.raft_iters = raft_iters
        self.flow_params = None
        self.set_flow_model(flow_model=flow_model, flow_params=flow_params,
                            flow_model_load_path=flow_model_load_path,
                            **flow_model_kwargs)
        if flow_sample_filter is None:
            flow_sample_filter = FlowSampleFilter(
                **self.default_flow_filter_params)
        self.flow_sample_filter = flow_sample_filter

        self._patch_sampling_func = patch_sampling_func
        self._patch_sampling_kwargs = copy.deepcopy(
            self.default_patch_sampling_kwargs)
        self._patch_sampling_kwargs.update(patch_sampling_kwargs)
        self.patch_sampler = None
        self.set_patch_sampler()

    # ------------------------------------------------------------------
    def set_flow_model(self, flow_model=None, flow_params=None,
                       flow_model_load_path=None, **kwargs):
        """Swap the flow probe (reference segmentation.py:71-84): with no
        model given, build the default multiframe RAFT and load weights
        from ``flow_model_load_path`` via the torch converter."""
        if flow_model is None:
            flow_model = RAFT(iters=self.raft_iters, **kwargs)
        self.flow_model = flow_model
        if flow_params is None and flow_model_load_path is not None:
            from ..utils.torch_convert import load_raft_checkpoint
            flow_params = load_raft_checkpoint(flow_model_load_path,
                                               small=flow_model.small)
        if flow_params is not None:
            self.flow_params = flow_params

    def set_raft_iters(self, iters=None):
        self.raft_iters = iters

    def set_flow_sample_filter(self, params=None):
        self.flow_sample_filter = (None if params is None
                                   else FlowSampleFilter(**params))

    def set_patch_sampler(self, num_visible=1, mask_ratio=None, **kwargs):
        if self.patch_sampler is None or kwargs:
            kw = copy.deepcopy(self._patch_sampling_kwargs)
            kw.update(kwargs)
            self.patch_sampler = self._patch_sampling_func(
                input_size=self.mask_shape, mask_ratio=(mask_ratio or 0),
                seed=int(self.rng.randint(9999)), always_batch=True, **kw)
        if mask_ratio is not None:
            self.patch_sampler.mask_ratio = mask_ratio
        elif num_visible is not None:
            cf = getattr(self.patch_sampler, 'cf', 1)
            self.patch_sampler.num_visible = num_visible * cf ** 2

    def sample_patches_from_energy(self, energy=None, num_samples=10,
                                   num_visible=1, beta=None, **kwargs):
        """[B, N, S] masks with ~num_visible patches sampled per energy map
        (reference segmentation.py:118-128)."""
        self.set_patch_sampler(num_visible, **kwargs)
        if num_visible == 0:
            return jnp.stack([self.get_zeros_mask()
                              for _ in range(num_samples)], -1)
        if energy is None:
            assert self.x is not None
            energy = jnp.ones_like(self.x[:, 0, 0:1])
        energy = boltzmann(energy, beta)
        masks = jnp.stack([self.patch_sampler(energy, key=self.next_key())
                           for _ in range(num_samples)], -1)
        return masks

    # ------------------------------------------------------------------
    @staticmethod
    def batch_to_samples(flows, t=0, b=1):
        assert flows.ndim == 5, flows.shape
        bs = flows.shape[0]
        s = bs // b
        f = flows[:, t].reshape(b, s, *flows.shape[2:])
        return jnp.moveaxis(f, 1, -1)

    def _batch_to_samples(self, flows, t=0):
        assert self.x is not None
        if flows.ndim != 5:
            flows = flows[:, None]
            t = 0
        return self.batch_to_samples(flows, t=t, b=self.x.shape[0])

    def predict_flow(self, vid, backward=False, iters=None, **kwargs):
        if iters is not None:
            self.set_raft_iters(iters)
        return apply_raft_video(self.flow_model, self.flow_params,
                                jnp.asarray(vid), backward, self.raft_iters,
                                True)

    def predict_video_and_flow(self, x=None, mask=None, backward=False,
                               propagate_error=False, **kwargs):
        """Sliding frame-pair prediction + flow (reference
        segmentation.py:170-197)."""
        if x is None:
            x = self.x
        if mask is None:
            mask = self.mask
        x = jnp.asarray(x)
        t = x.shape[1]
        dt = self.sequence_length
        preds = [x[:, 0:1]]
        for i in range(t - dt + 1):
            preds.append(self.predict(x[:, i:i + dt], mask, frame=1, **kwargs))
        x_pred = jnp.concatenate(preds, 1)
        if propagate_error:
            f_pred = self.predict_flow(x_pred, backward)
        else:
            fp = []
            for i in range(t - dt + 1):
                pair = jnp.concatenate(
                    [x[:, i:i + 1], x_pred[:, i + 1:i + 2], x[:, i + 2:i + dt]], 1)
                fp.append(self.predict_flow(pair, backward))
            f_pred = jnp.concatenate(fp, 1)
        return x_pred, f_pred

    def predict_video_and_flow_per_sample(self, x, masks, backward=False,
                                          **kwargs):
        """(reference segmentation.py:210-245)."""
        assert masks.ndim == 3
        b, _, s = masks.shape
        ys = self.predict_per_sample(x, masks, frame=None,
                                     split_samples=False, **kwargs)
        flows = self.predict_flow(ys, backward)
        ys_s = jnp.moveaxis(ys.reshape(b, s, *ys.shape[1:]), 1, -1)
        flows_s = jnp.moveaxis(flows.reshape(b, s, *flows.shape[1:]), 1, -1)
        return ys_s, flows_s

    def predict_flow_per_sample(self, x, masks, backward=False, **kwargs):
        """Flows of the per-sample predictions, sample axis last
        (reference segmentation.py:199-208; extra kwargs route to
        predict_flow, e.g. ``iters``, like the reference)."""
        assert masks.ndim == 3
        s = masks.shape[-1]
        ys = self.predict_per_sample(x, masks, frame=None,
                                     split_samples=False)
        flows = self.predict_flow(ys, backward, **kwargs)
        return jnp.moveaxis(flows.reshape(-1, s, *flows.shape[1:]), 1, -1)

    # ------------------------------------------------------------------
    def compute_flow_samples_magnitude(self, flows, normalize=True, dim=-4,
                                       eps=1e-2):
        mags = jnp.sqrt((flows ** 2).sum(dim, keepdims=True))
        if normalize:
            mags = mags - mags.min((-3, -2), keepdims=True)
            mags = mags / jnp.clip(mags.max((-3, -2), keepdims=True), min=eps)
        return mags

    def compute_mean_motion_map(self, flows, normalize_per_sample=False,
                                normalize=True, dim=-4, eps=1e-2):
        """(reference segmentation.py:257-276)."""
        if flows.ndim == 5:
            mags = self.compute_flow_samples_magnitude(
                flows, normalize=normalize_per_sample, dim=dim, eps=eps)
            motion = mags.mean(-1)
        else:
            motion = flows
            normalize = True
        if normalize:
            motion = motion - motion.min((-2, -1), keepdims=True)
            motion = motion / jnp.clip(motion.max((-2, -1), keepdims=True),
                                       min=eps)
        return motion

    # ------------------------------------------------------------------
    def reset_shifts(self):
        self.shifts = []

    def _draw_shifts(self, num_samples):
        """[S, 2] random nonzero patch-unit shifts."""
        keys = jax.random.split(self.next_key(), num_samples)
        shifts = jax.vmap(lambda k: perturb.random_shift(
            k, self.max_shift_fraction, self.x.shape[-2:],
            self.patch_size))(keys)
        return shifts

    def _prep_shifts(self, shifts, num_samples):
        if shifts is None:
            return self._draw_shifts(num_samples)
        # reference convention (perturbation.py:180-207): tensors/arrays are
        # [D=2, S]; lists/tuples are [S][2] (or a single [dy, dx] pair)
        is_array = hasattr(shifts, 'shape')
        shifts = np.asarray(shifts)
        if is_array and shifts.ndim == 2:
            assert shifts.shape[0] == 2, shifts.shape
            shifts = shifts.T
        if shifts.ndim == 1:
            shifts = shifts[None]
        if shifts.shape[0] == 1 and num_samples > 1:
            shifts = np.tile(shifts, (num_samples, 1))
        assert shifts.shape == (num_samples, 2), (shifts.shape, num_samples)
        return jnp.asarray(shifts.astype(np.int32))

    def _n_vis_target(self, passive, active):
        """Static visible-count target: max over (b, s) of the unshifted
        combined mask's visible count (the reference's rectangularizer-'min'
        target, prediction.py:421 + masking.py:112-115)."""
        p = np.asarray(passive)
        a = np.asarray(active)
        n = p.shape[1]
        npf = n // self.sequence_length
        vis_f0 = (~p[:, :npf] | ~a[:, :npf]).sum(1)
        vis_f1 = ((~p[:, npf:] & a[:, npf:]) | ~a[:, npf:]).sum(1)
        return int((vis_f0 + vis_f1).max())

    def create_motion_counterfactuals(self, x, masks, active_patches=None,
                                      shifts=None, frame=1, num_samples=None,
                                      fix_passive=True, reset_shifts=False):
        """Batched counterfactual construction (reference
        segmentation.py:278-344). Returns (x [B*S,T,C,H,W], mask [B*S,N])."""
        if reset_shifts or getattr(self, 'shifts', None) is None:
            self.reset_shifts()
        x = jnp.asarray(x)
        if masks.ndim == 2:
            assert num_samples is not None
            masks = jnp.tile(masks[..., None], (1, 1, num_samples))
        num_samples = masks.shape[-1]
        if active_patches is None:
            active_patches = jnp.ones_like(masks)
        elif active_patches.ndim == 2:
            active_patches = jnp.tile(active_patches[..., None],
                                      (1, 1, masks.shape[-1]))
        b, n, s = masks.shape
        shifts = self._prep_shifts(shifts, s)
        self.shifts.extend([np.asarray(sh) for sh in shifts])

        if fix_passive:
            x = self.make_static_movie(x[:, 0:1], t=2)

        n_vis = self._n_vis_target(
            jnp.moveaxis(masks, -1, 1).reshape(-1, n),
            jnp.moveaxis(active_patches, -1, 1).reshape(-1, n))
        keys = jax.random.split(self.next_key(), b * s).reshape(b, s, 2)
        shifts_b = jnp.broadcast_to(shifts[None], (b, s, 2))

        def one(xb, p, a, shift, key):
            return perturb.make_motion_counterfactual(
                xb, p, a, shift, key, self.patch_size, n_vis_target=n_vis,
                frame=frame, fix_passive=False)

        f = jax.vmap(one, in_axes=(None, 1, 1, 0, 0))
        f = jax.vmap(f, in_axes=(0, 0, 0, 0, 0))
        x_out, mask_out = f(x, masks, active_patches, shifts_b, keys)
        return (x_out.reshape(b * s, *x.shape[1:]),
                mask_out.reshape(b * s, n))

    def _disable_fast_engine(self, exc):
        """Degrade to the exact per-sample path after a fast-engine
        failure. ``engine='fast'`` is the default, so a failure must never
        strand the caller — the exact path computes the same quantities,
        just without prefix sharing.

        Two failure classes with different blast radii:

        * ``ValueError`` — an engine *precondition* miss (prompt shape the
          prefix factorization does not support, e.g. a mask touching
          frame 0 that slipped past the fast_ok checks). The engine is
          healthy; only THIS prompt is unsupported → fall back for this
          call, leave the engine enabled. Permanently disabling here was
          the r04 degrade-poisoning bug: one factual /predict silently
          cost every later counterfactual its 2-4x fast-path speedup.
        * anything else (Pallas compile failure on local hardware, XLA
          runtime fault, OOM) — the engine itself is broken → disable
          permanently and free its device state. Kernel-level degrades
          (CWM_FLASH_TWO_SOURCE=0, CWM_RAFT_LANES=0) remain the
          finer-grained alternatives."""
        import warnings
        if isinstance(exc, ValueError):
            warnings.warn(
                'shared-prefix fast engine does not support this prompt '
                f'({exc}); using the exact per-sample path for this call '
                'only. The fast engine stays enabled for supported '
                'prompts.', RuntimeWarning)
            return
        warnings.warn(
            'shared-prefix fast engine failed '
            f'({type(exc).__name__}: {exc}); falling back to the exact '
            "per-sample path for this generator. Pass engine='exact' (or "
            'set CWM_FLASH_TWO_SOURCE=0 / CWM_RAFT_LANES=0 for kernel-level '
            'degrades) to silence this.', RuntimeWarning)
        self._fast_disabled = True
        self._clear_fast_state()

    def _clear_fast_state(self):
        """Drop the fast-engine device state (stacked params + prefix-KV
        LRU) so the exact fallback gets its HBM back; overridden by the
        conjoined generator to also drop its cast params/LRU."""
        self._prefix_lru = None
        self._fast_params_src = None
        self._fast_params = None

    def _pool_config(self, h: int, w: int):
        """Resolve the ('auto'-capable) pooling/gelu knobs for a dispatch
        at image size (h, w) — see fast_vmae.resolve_pools. Returns
        (prefix_pool, suffix_pool, gelu)."""
        from ..models import fast_vmae
        ph, pw = self.patch_size[-2:]
        return fast_vmae.resolve_pools(h // ph, w // pw, self.prefix_pool,
                                       self.suffix_pool, self.fast_gelu)

    def _ensure_fast_engine(self):
        """Lazy init of the shared-prefix engine state, keyed on params
        identity: swapping G.params rebuilds the stacked weights and drops
        prefixes cached from the old ones."""
        from ..models import fast_vmae
        if (self._prefix_lru is None
                or self._fast_params_src is not self.params):
            self._fast_params_src = self.params
            self._fast_params = fast_vmae.stack_vmae_params(
                self.predictor, self.params)
            self._use_flash = jax.default_backend() == 'tpu'
            self._prefix_lru = fast_vmae.PrefixLru(
                self.predictor, self._fast_params, self._use_flash,
                self.imagenet_normalize_inputs,
                size=self.prefix_cache_size)

    def predict(self, x=None, mask=None, frame=-1, **kwargs):
        """Single prediction; with ``engine='fast'`` and the interactive
        workload shape (B=1 two-frame movie, frame 0 fully visible, plain
        VMAE predictor) this routes through the shared-prefix engine +
        PrefixLru — the interface's per-click path pays only the frame-1
        suffix pass once the scene prefix is cached."""
        if x is None:
            x = self.x
        if mask is None:
            mask = (self.mask if self.mask is not None
                    else self.generate_mask(x))
        x = jnp.asarray(x)
        if x.ndim == 4:
            x = x[:, None]
        mask = jnp.asarray(mask).reshape(x.shape[0], -1)
        mask, n_vis = self._equalize(mask)
        n0 = getattr(self.predictor, 'num_patches_per_frame', 0)
        fast_ok = (self.engine == 'fast' and not self._fast_disabled
                   and not kwargs
                   and hasattr(self.predictor, 'encoder_depth')
                   and self.temporal_dim == 2
                   and x.shape[0] == 1 and x.shape[1] == 2 and n0
                   and not bool(np.asarray(mask[:, :n0]).any()))
        if fast_ok:
            try:
                from ..models import fast_vmae
                self._ensure_fast_engine()
                cache, _ = self._prefix_lru.get(x[0:1, 0])
                ppool, spool, gelu = self._pool_config(*x.shape[-2:])
                vid = fast_vmae.predict_videos_shared_prefix(
                    self.predictor, self._fast_params, self._use_flash,
                    n_vis, self.imagenet_normalize_inputs, x, mask, cache,
                    prefix_pool=ppool, suffix_pool=spool, gelu=gelu)
                # surface async execution faults (not just compile errors)
                # inside this try so they degrade too; no-op on axon
                jax.block_until_ready(vid)
                if frame is not None:
                    f = frame % vid.shape[1]
                    vid = vid[:, f:f + 1]
                return vid
            except Exception as e:  # degrade, never strand the caller
                self._disable_fast_engine(e)
        return predict_video(
            self.predictor, self.params, x, mask, n_vis,
            self.imagenet_normalize_inputs, frame, self.temporal_dim)

    def _counterfactual_chunk(self, x, passive, active, shifts, keys,
                              n_vis, iters, fix_passive):
        """One fused jitted chunk; overridden by context-conditioned
        generators (pipelines/imu.py). With ``engine='fast'`` (and the
        workload shape the engine supports: one scene, fix_passive) this
        routes through the shared-prefix engine with a per-image
        PrefixCache LRU — repeat prompts on the same image (the interactive
        interface workload) skip the whole frame-0 pass."""
        n0 = self.predictor.num_patches_per_frame
        # the prefix factorization requires frame 0 fully visible in every
        # sample's prompt: the combined mask is (passive & active) per
        # make_motion_counterfactual, so any frame-0 token masked in BOTH
        # prompt sets breaks the assumption -> fall back to the exact path
        fast_ok = (self.engine == 'fast' and not self._fast_disabled
                   and self.temporal_dim == 2
                   and x.shape[0] == 1 and fix_passive
                   and not bool(np.asarray(
                       passive[:, :n0] & active[:, :n0]).any()))
        if fast_ok:
            try:
                self._ensure_fast_engine()
                cache, _ = self._prefix_lru.get(x[0:1, 0])
                from ..models import fast_vmae
                # env resolved per call (not cached) so the documented
                # degrade knob CWM_FLASH_TWO_SOURCE=0 takes effect
                # mid-session
                ppool, spool, gelu = self._pool_config(*x.shape[-2:])
                n_sfx_pad = fast_vmae.sfx_bucket(
                    n_vis - n0, self.predictor.num_patches - n0)
                out = counterfactual_videos_and_flows_fast(
                    self.predictor, self._fast_params, self.flow_model,
                    self.flow_params, x, passive, active, shifts, keys,
                    n_sfx_pad, self.imagenet_normalize_inputs, iters, True,
                    self._use_flash,
                    fast_vmae.resolve_two_source(self._use_flash),
                    prefix_cache=cache, prefix_pool=ppool,
                    suffix_pool=spool, gelu=gelu, n_vis=n_vis)
                # surface async execution faults (not just compile errors)
                # inside this try so they degrade too; no-op on axon
                return jax.block_until_ready(out)
            except Exception as e:  # degrade, never strand the caller
                self._disable_fast_engine(e)
        return counterfactual_videos_and_flows(
            self.predictor, self.params, self.flow_model, self.flow_params,
            x, passive, active, shifts, keys, n_vis,
            self.imagenet_normalize_inputs, iters, fix_passive,
            self.temporal_dim)

    def predict_counterfactual_videos_and_flows(
            self, x, active_patches, passive_patches=None, shifts=None,
            num_samples=8, sample_batch_size=8, fix_passive=True,
            max_shift_fraction=None, frame=1, raft_iters=None,
            backward=False, **kwargs):
        """The central API (reference segmentation.py:346-432).

        Returns (videos [B*S, 2, C, H, W], flows [B*S, 1, 2, H, W]).
        """
        x = jnp.asarray(x)
        if x.ndim == 3:
            x = jnp.broadcast_to(x[None, None], (1, 2, *x.shape))
            fix_passive = True
        elif x.ndim == 4:
            x = jnp.broadcast_to(x[:, None], (x.shape[0], 2, *x.shape[1:]))
            fix_passive = True
        elif x.ndim == 5 and x.shape[1] == 1:
            x = jnp.broadcast_to(x, (x.shape[0], 2, *x.shape[2:]))
        x = x[:, 0:2]
        self.set_input(x)
        self.reset_shifts()
        if max_shift_fraction is not None:
            self.max_shift_fraction = max_shift_fraction

        if passive_patches is None:
            passive_patches = self.get_zeros_mask()[..., None]
        elif passive_patches.ndim == 2:
            passive_patches = passive_patches[..., None]
        if active_patches.ndim == 2:
            active_patches = active_patches[..., None]

        s = max(active_patches.shape[-1], passive_patches.shape[-1])
        if s == 1 and num_samples > 1:
            s = num_samples
        if shifts is not None:
            s = (len(shifts) if not hasattr(shifts, 'shape')
                 else np.asarray(shifts).reshape(-1, 2).shape[0])
        shifts = self._prep_shifts(shifts, s)
        self.shifts.extend([np.asarray(sh) for sh in shifts])

        if active_patches.shape[-1] == 1 and s > 1:
            active_patches = jnp.tile(active_patches, (1, 1, s))
        if passive_patches.shape[-1] == 1 and s > 1:
            passive_patches = jnp.tile(passive_patches, (1, 1, s))
        assert active_patches.shape[-1] == passive_patches.shape[-1] == s

        b, n = x.shape[0], active_patches.shape[1]
        n_vis = self._n_vis_target(
            jnp.moveaxis(passive_patches, -1, 1).reshape(-1, n),
            jnp.moveaxis(active_patches, -1, 1).reshape(-1, n))
        iters = raft_iters if raft_iters is not None else self.raft_iters

        # microbatch over samples
        chunk = sample_batch_size or s
        chunk = max(1, chunk // b)
        # backward=True replaces the chunks' forward flows wholesale (the
        # post-loop predict_flow below); run the fused in-chunk RAFT at 1
        # iteration so the discarded probe costs ~nothing instead of
        # doubling the dominant RAFT work
        chunk_iters = 1 if backward else iters
        ys, flows = [], []
        for i in range(int(np.ceil(s / chunk))):
            s0, s1 = i * chunk, min((i + 1) * chunk, s)
            keys = jax.random.split(self.next_key(),
                                    b * (s1 - s0)).reshape(b, s1 - s0, 2)
            sh = jnp.broadcast_to(shifts[None, s0:s1], (b, s1 - s0, 2))
            y, fl, _ = self._counterfactual_chunk(
                x, passive_patches[..., s0:s1], active_patches[..., s0:s1],
                sh, keys, n_vis, chunk_iters, fix_passive)
            ys.append(y.reshape(b, s1 - s0, *y.shape[1:]))
            flows.append(fl.reshape(b, s1 - s0, *fl.shape[1:]))
        y = jnp.concatenate(ys, 1).reshape(b * s, 2, *x.shape[2:])
        fl = jnp.concatenate(flows, 1)
        fl = fl.reshape(b * s, *fl.shape[2:])
        if backward:
            fl = self.predict_flow(y, backward=True, iters=iters)
        return y, fl

    def sample_counterfactual_motion_map(self, x,
                                         active_sampling_distribution=None,
                                         passive_sampling_distribution=None,
                                         active_patches=None,
                                         passive_patches=None,
                                         num_active_patches=1,
                                         num_passive_patches=0,
                                         num_samples=8, sample_batch_size=8,
                                         patch_sampling_kwargs={},
                                         do_filter=True, **kwargs):
        """(reference segmentation.py:434-476). Returns
        (flows [B,2,H,W,S], active [B,N,S], passive [B,N,S])."""
        self.set_input(x)
        if active_patches is None:
            active_patches = self.sample_patches_from_energy(
                energy=active_sampling_distribution, num_samples=num_samples,
                num_visible=num_active_patches, **patch_sampling_kwargs)
        if passive_patches is None:
            passive_patches = self.sample_patches_from_energy(
                energy=passive_sampling_distribution, num_samples=num_samples,
                num_visible=num_passive_patches, **patch_sampling_kwargs)

        ys, flows = self.predict_counterfactual_videos_and_flows(
            x, active_patches=active_patches, passive_patches=passive_patches,
            num_samples=num_samples, sample_batch_size=sample_batch_size,
            fix_passive=True, **kwargs)
        flows = self._batch_to_samples(flows)
        if self.flow_sample_filter is not None and do_filter:
            flows, _ = self.flow_sample_filter(flows, active_patches)
        return flows, active_patches, passive_patches

    compute_flow_corrs = staticmethod(compute_flow_corrs)


def _flowshow(self, flow, set_max_speed=True, frame=0, ax=None, title=None,
              fontsize=12, **kwargs):
    """Render a flow field as RGB (reference segmentation.py:155-168)."""
    from ..ops.flow_viz import flow_to_rgb
    from ..vis_utils import imshow
    flow = jnp.asarray(flow)
    if flow.ndim == 5:
        flow = flow[:, frame]
    max_speed = 1.0
    if set_max_speed:
        max_speed = float(jnp.sqrt((flow ** 2).sum(-3)).max())
        self._last_max_speed = max_speed
    else:
        max_speed = getattr(self, '_last_max_speed', 1.0)
    rgb = flow_to_rgb(flow, max_speed=max(max_speed, 1e-6))
    return imshow(np.asarray(rgb), ax=ax, title=title, fontsize=fontsize,
                  **kwargs)


def _get_error_maps(self, x, mask, frame=1, **kwargs):
    """True vs predicted flow and their error (the reference interface calls
    a G.get_error_maps that does not exist anywhere in the reference tree —
    interface.py:624 — implemented here working)."""
    x = jnp.asarray(x)
    if x.ndim == 4:
        x = x[:, None]
    if x.shape[1] == 1:
        x = jnp.broadcast_to(x, (x.shape[0], 2, *x.shape[2:]))
    self.set_input(x)
    flow_true = self.predict_flow(x)
    y = self.predict(x, mask, frame=None, **kwargs)
    flow_pred = self.predict_flow(y)
    err = jnp.sqrt(((flow_true - flow_pred) ** 2).sum(2))
    return {'flow_true': flow_true, 'flow_pred': flow_pred,
            'flow_error': err, 'pred': y}


FlowGenerator.flowshow = _flowshow
FlowGenerator.get_error_maps = _get_error_maps


@functools.partial(jax.jit,
                   static_argnums=(0, 2, 9, 10, 11, 12, 13, 14, 16, 17,
                                   18))
def counterfactual_videos_and_flows_fast(vmae_model, fast_params, raft_model,
                                         raft_params, x, passive, active,
                                         shifts, keys, n_sfx_pad: int,
                                         normalize: bool, raft_iters: int,
                                         fix_passive: bool, use_flash: bool,
                                         two_source: bool = False,
                                         prefix_cache=None,
                                         prefix_pool: int = 1,
                                         suffix_pool: int = 1,
                                         gelu: str = 'erf',
                                         n_vis=None):
    """Shared-prefix fast path of counterfactual_videos_and_flows for the
    production workload shape: B=1, frame 0 fully visible and identical
    across samples (fix_passive). The ViT runs via the prefix-isolated
    engine (models/fast_vmae.py: frame-0 encode/decode once per batch,
    per-sample work only on the frame-1 tokens) and RAFT shares the frame-0
    feature/context encoders across samples. Per-sim FLOPs drop ~5x at
    S=16; fidelity vs the exact path is quantified in
    tests/test_fast_vmae.py and scripts/fidelity_report.py.

    fast_params: stack_vmae_params(vmae_model, params). Other args/returns
    as counterfactual_videos_and_flows with B=1. prefix_cache: optional
    fast_vmae.make_prefix_cache(...) of this scene's frame 0 (serving layers
    key it by image hash; skips the per-scene prefix passes entirely).

    n_sfx_pad: STATIC bucketed suffix width (fast_vmae.sfx_bucket) — the
    prompt-size part of the program key. n_vis: the rectangularizer's
    per-sample visible-count target, TRACED — every prompt size within a
    bucket shares one compiled program (the serving warmup compiles one
    program per bucket instead of one per click count).
    """
    from ..models.fast_vmae import _predict_videos_core
    from ..models.raft.raft import apply_raft_shared0

    if n_vis is None:
        raise TypeError(
            'counterfactual_videos_and_flows_fast: n_vis is required — '
            'pass the rectangularizer target as n_vis=<count> and the '
            'static bucketed width (fast_vmae.sfx_bucket(n_vis - n0, n1)) '
            'positionally as n_sfx_pad; without it per-sample visible '
            'counts are data-dependent and can exceed the bucket width')
    b, t, c, h, w = x.shape
    assert b == 1, 'fast path is per-scene; vmap/shard the scene axis'
    s = passive.shape[-1]

    def one(xb, p, a, shift, key):
        return perturb.make_motion_counterfactual(
            xb, p, a, shift, key, vmae_model.full_patch_size,
            n_vis_target=n_vis, fix_passive=fix_passive)

    f = jax.vmap(one, in_axes=(None, 1, 1, 0, 0))
    x_mocos, mask_mocos = f(x[0], passive[0], active[0], shifts[0], keys[0])

    y = _predict_videos_core(vmae_model, fast_params, use_flash, two_source,
                             n_sfx_pad, normalize, x_mocos, mask_mocos,
                             prefix_cache, prefix_pool, suffix_pool, gelu)
    flows = apply_raft_shared0(raft_model, raft_params, y, raft_iters, True)
    return y, flows, mask_mocos


@functools.partial(jax.jit, static_argnums=(0, 2, 8, 9, 10, 11, 12, 13))
def counterfactual_videos_and_flows_fast_multi(vmae_model, fast_params,
                                               raft_model, raft_params,
                                               x, passive, active,
                                               shifts, n_sfx_pad: int,
                                               normalize: bool,
                                               raft_iters: int,
                                               fix_passive: bool,
                                               use_flash: bool,
                                               two_source: bool,
                                               keys, prefix_cache,
                                               n_vis=None):
    """Multi-SCENE fast dispatch: each sample carries its OWN scene.

    x [S, T, C, H, W] per-sample scene videos; passive/active [S, N];
    shifts [S, 2]; keys [S] PRNG keys; prefix_cache a REQUIRED stacked
    per-sample cache (fast_vmae.stack_prefix_caches — scene i's cache at
    row i). Used by the serving layer to merge concurrent warm-prefix
    requests on DIFFERENT images into one program: the per-sample-prefix
    route of the two-source kernel (flash_attention_prefix, s0=S) reads
    each row's panels in place. RAFT runs the standard per-sample path
    (frame 0 differs per sample, nothing to share). Returns as
    counterfactual_videos_and_flows_fast.

    HBM note: the stacked cache materializes one prefix KV set per sample
    (~0.3 GB/sample at ViT-L) — callers cap the distinct-scene batch
    (scripts/serve.py --max-scene-batch).
    """
    from ..models.fast_vmae import _predict_videos_core
    from ..models.raft.raft import apply_raft_video

    if n_vis is None:
        raise TypeError(
            'counterfactual_videos_and_flows_fast_multi: n_vis is required '
            '(see counterfactual_videos_and_flows_fast)')

    def one(xb, p, a, shift, key):
        return perturb.make_motion_counterfactual(
            xb, p, a, shift, key, vmae_model.full_patch_size,
            n_vis_target=n_vis, fix_passive=fix_passive)

    x_mocos, mask_mocos = jax.vmap(one)(x, passive, active, shifts, keys)

    y = _predict_videos_core(vmae_model, fast_params, use_flash, two_source,
                             n_sfx_pad, normalize, x_mocos, mask_mocos,
                             prefix_cache)
    flows = apply_raft_video(raft_model, raft_params, y, iters=raft_iters,
                             scale_inputs=True)
    return y, flows, mask_mocos
