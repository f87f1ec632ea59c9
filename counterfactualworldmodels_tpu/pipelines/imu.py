"""IMU-aware generators: predict IMU from video, and condition the masked
predictor on IMU context.

Re-design of reference cwm/models/segmentation.py:549-967 (ImuGenerator /
ImuConditionedFlowGenerator). The two-model pipeline:

1. flow2imu (ConjoinedVMAE, main stream = RAFT fwd+bwd flow + RGB) predicts
   ~2s of IMU from a frame pair — used with a *static* movie to get the
   "no head motion" IMU embedding (reference segmentation.py:873-877).
2. The IMU-conditioned predictor (padded ConjoinedVMAE) consumes RGB patches
   + the predicted IMU as context for counterfactual generation.

The counterfactual step fuses construction + conjoined forward + scatter +
RAFT into one jitted program, with the IMU context tiled over the sample
axis (reference segmentation.py:199-245 tiling).
"""
from __future__ import annotations

import functools
import numpy as np
import jax
import jax.numpy as jnp
from einops import rearrange

from ..masking import generators as maskgen
from ..models.conjoined import ConjoinedPredictorWrapper
from ..models.raft.raft import apply_raft_shared0, apply_raft_video
from ..ops.normalization import imagenet_normalize, imagenet_unnormalize
from . import perturbation as perturb
from .prediction import scatter_pred_patches
from .segmentation import FlowGenerator


@functools.partial(jax.jit, static_argnums=(0, 6, 7, 8))
def _conjoined_predict_video(wrapper: ConjoinedPredictorWrapper, params,
                             x, mask, x_context, mask_context,
                             n_vis: int, n_vis_c: int, normalize: bool):
    """Jitted conjoined factual prediction: preprocess -> two-stream forward
    -> strip padding -> scatter into video.

    n_vis counts *real* visible main-stream tokens (padding nulls excluded);
    n_vis_c is the full context visible count (incl. dummy/null tokens).
    """
    xm = imagenet_normalize(x, temporal_dim=1) if normalize else x
    xm = jnp.swapaxes(xm, 1, 2)
    (x_m, mask_m), (x_c, mask_c) = wrapper.get_stream_inputs(
        xm, mask, x_context, mask_context)
    model = wrapper.model
    n_vis_pad = n_vis + (model.main.min_padding_tokens
                         if model.main.padded else 0)
    y = model.apply({'params': params}, x_m, mask_m, x_c, mask_c,
                    n_vis_pad, n_vis_c, output_main=True,
                    output_context=False)
    n_real_masked = model.main.num_patches - n_vis
    y = y[:, :n_real_masked]
    return scatter_pred_patches(y, x, mask, n_vis, wrapper.patch_size)


def _imu_tokens_to_stream(y, pt: int):
    """[B, T, pt*c] IMU tokens -> [B, c, T*pt] channel-major stream (the
    reference's reshape_output, segmentation.py:646-650); shared by both
    generator classes so the layout cannot drift between them."""
    c = y.shape[-1] // pt
    return jnp.asarray(rearrange(np.asarray(y),
                                 'b t (pt c) -> b c (t pt)', c=c, pt=pt))


class ImuGenerator(FlowGenerator):
    """Wrap predictors that input/output IMU in addition to RGB
    (reference segmentation.py:549-754)."""

    def __init__(self, *args, head_mask_generator=None, head_mask_ratio=0,
                 always_use_predicted=False, require_none_missing=False,
                 **kwargs):
        super().__init__(*args, **kwargs)
        assert isinstance(self.predictor, ConjoinedPredictorWrapper), \
            'ImuGenerator wraps conjoined two-stream predictors'
        self.num_head_tokens = self.predictor.num_head_tokens
        if self.mask_generator is None:
            t, h, w = self.predictor.mask_size
            self.mask_generator = maskgen.MaskingGenerator(
                input_size=(t, h, w), mask_ratio=0, always_batch=True)
        if head_mask_generator is not None:
            self.head_mask_generator = head_mask_generator
        else:
            self.set_head_mask_generator()
            self.head_mask_generator.mask_ratio = head_mask_ratio
        self._always_use_predicted = always_use_predicted
        self._require_none_missing = require_none_missing
        self.missing_imu = None

    # -- reference API surface ------------------------------------------
    @property
    def head_tubelet_size(self):
        return self.predictor.model.context.imu_tubelet

    @property
    def head_motion_channels(self):
        return self.predictor.model.context.in_chans

    def set_head_mask_generator(self):
        """(Re)build the default head-motion mask generator
        (reference segmentation.py:586-594)."""
        self.head_mask_generator = maskgen.MissingDataImuMaskGenerator(
            input_size=self.num_head_tokens, mask_ratio=0,
            full_mask_prob=0, full_vis_prob=0, truncation_mode='none')

    def set_head_mask_params(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self.head_mask_generator, k, v)

    def set_mode(self, mode='output'):
        if mode not in ('output', 'input'):
            # reference segmentation.py:599-605 raises on unknown modes
            raise ValueError('%s is not a known mode' % mode)
        self.set_head_mask_params(
            mask_ratio=1.0 if mode == 'output' else 0.0)

    def input_mode(self):
        self.set_mode('input')

    def output_mode(self):
        self.set_mode('output')

    def reshape_input(self, x, tubelet_size=None):
        pt = tubelet_size or self.head_tubelet_size
        return rearrange(np.asarray(x), 'b c (t pt) -> b t (pt c)', pt=pt)

    def reshape_output(self, y, tubelet_size=None):
        return _imu_tokens_to_stream(y, tubelet_size
                                     or self.head_tubelet_size)

    def predict(self, x=None, mask=None, frame=None, x_context=None,
                mask_context=None, **kwargs):
        """Factual main-stream prediction through the conjoined
        two-stream wrapper. The inherited single-stream path
        (prediction.predict_video) cannot drive a
        ConjoinedPredictorWrapper; this override feeds the IMU context
        stream, defaulting to a zeroed fully-masked IMU (the reference's
        fake head motion, segmentation.py:818-832). The reference's own
        ImuGenerator inherits an equally unusable single-stream predict."""
        if x is None:
            x = self.x
        x = jnp.asarray(x)
        if x.ndim == 4:
            x = x[:, None]
        w = self.predictor
        if w.model.main.in_chans != x.shape[2]:
            raise TypeError(
                f'{type(self).__name__}.predict reconstructs the main '
                'stream into the input video, which requires the conjoined '
                f'main stream to consume the raw video (model in_chans '
                f'{w.model.main.in_chans} != input channels {x.shape[2]}); '
                'this wrapper preprocesses its main input — use '
                'predict_imu / predict_imu_from_video instead')
        if mask is None:
            mask = (self.mask if self.mask is not None
                    else self.generate_mask(x))
        mask = jnp.asarray(mask).reshape(x.shape[0], -1)
        mask, n_vis = self._equalize(mask)
        b = x.shape[0]
        if x_context is None:
            x_context = jnp.zeros(
                (b, self.head_motion_channels,
                 self.head_tubelet_size * self.num_head_tokens),
                jnp.float32)
            if mask_context is None:
                mask_context = jnp.ones((b, self.num_head_tokens),
                                        dtype=bool)
        if mask_context is None:
            mask_context = jnp.zeros((b, self.num_head_tokens), dtype=bool)
        n_vis_c = w._static_n_vis(mask_context, w.model.context)
        if w.model.context.is_imu and w.model.context.concat_dummy_token:
            n_vis_c += 1
        vid = _conjoined_predict_video(
            w, w.params, x, mask, x_context, mask_context, n_vis, n_vis_c,
            self.imagenet_normalize_inputs)
        if frame is not None:
            f = frame % vid.shape[1]
            vid = vid[:, f:f + 1]
        return vid

    def _counterfactual_chunk(self, *args, **kwargs):
        raise TypeError(
            'ImuGenerator wraps a conjoined predictor for IMU prediction '
            '(predict_imu / predict); for IMU-conditioned counterfactual '
            'generation use ImuConditionedFlowGenerator')

    # --------------------------------------------------------------------
    def _context_outputs(self, x, mask, imu, imu_mask):
        """Run the conjoined predictor, return context-stream predictions
        for all IMU tokens in order [B, M, pt*c]."""
        w = self.predictor
        xm = jnp.asarray(x)
        if self.imagenet_normalize_inputs:
            xm = imagenet_normalize(xm, temporal_dim=2)  # x in [B,C,T,H,W]
        y_c = w(xm, mask, x_context=imu, mask_context=imu_mask,
                output_main=False, output_context=True)
        return y_c

    def get_imu_input(self, inp_dict, imu_mode='input', missing_thresh=0.5):
        """Unpack a dataset example into the model's IMU inputs
        (reference segmentation.py:612-639). Returns
        [video_unnormalized, imu, missing_imu, imu_mask, timestamps];
        ``imu_mode`` sets the head mask ratio ('input' = IMU visible,
        'output' = IMU fully masked)."""
        if imu_mode is not None:
            self.set_mode(imu_mode)
        video = jnp.asarray(inp_dict['video'])
        imu = jnp.asarray(inp_dict['imu'])
        add_batch = imu.ndim != 3
        if add_batch:
            video, imu = video[None], imu[None]
        missing = jnp.asarray(inp_dict.get(
            'imu_missing_data', jnp.zeros(imu.shape, bool)))
        if add_batch and missing.ndim == imu.ndim - 1:
            missing = missing[None]
        # dataset examples hold video time-first [B, T, C, H, W]; the
        # reference's transpose pair (segmentation.py:625) only adapts
        # that layout to its channel-first imagenet_unnormalize and
        # transposes straight back (its t_dim != 2 branch is dead — it
        # reads an unassigned variable and NameErrors)
        x = imagenet_unnormalize(video, temporal_dim=1)
        if self.t_dim == 2:
            # IMU to the context stream's channel-first [B, D, L]
            imu = jnp.swapaxes(imu, 1, 2)
        missing_tok = missing.reshape(missing.shape[0],
                                      self.num_head_tokens, -1)
        missing_frac = missing_tok.astype(jnp.float32).mean(-1) \
            > missing_thresh
        imu_mask = self.head_mask_generator(missing_frac,
                                            key=self.next_key())
        ts = inp_dict.get('video_ts')
        if ts is not None:
            ts = jnp.asarray(ts)
            if add_batch and ts.ndim == 1:
                ts = ts[None]
        return [x, imu, missing_tok, imu_mask, ts]

    def predict_imu(self, inp_dict, imu_mask_ratio=1, get_labels=True,
                    missing_thresh=0.5, **kwargs):
        """Predict IMU tokens from video (reference segmentation.py:652-717).

        inp_dict: {'video': [B,C,T,H,W] (normalized per wrapper config),
                   'imu': [B,6,L], 'imu_missing_data': [B,6,L] bool-ish}.
        """
        video = jnp.asarray(inp_dict['video'])
        imu = jnp.asarray(inp_dict['imu'])
        missing = jnp.asarray(inp_dict.get(
            'imu_missing_data', jnp.zeros_like(imu, dtype=bool)))
        b = video.shape[0]

        # deliberate raw reshape of the channel-major [B, 6, L] missing
        # array (NOT the reshape_input token layout): bit-parity with the
        # reference, which views it the same way without transposing
        # (cwm/models/segmentation.py:631-633)
        missing_tok = missing.reshape(b, self.num_head_tokens, -1)
        self.missing_imu = missing_tok
        missing_frac = missing_tok.astype(jnp.float32).mean(-1) > missing_thresh
        self.set_head_mask_params(mask_ratio=imu_mask_ratio)
        imu_mask = self.head_mask_generator(missing_frac,
                                            key=self.next_key())
        if imu_mask_ratio == 1:
            imu_mask = jnp.ones_like(imu_mask)

        self.mask = self.mask_generator(video, key=self.next_key())
        y_c = self._context_outputs(jnp.swapaxes(video, 1, 2)
                                    if video.shape[1] != 3 else video,
                                    self.mask, imu, imu_mask)

        # reassemble: predicted values at masked tokens, truth at visible
        labels = self.reshape_input(imu)  # [B, M, pt*c]
        m = self.predictor.model.context
        order = np.asarray(jax.vmap(jnp.argsort)(
            jnp.concatenate([imu_mask,
                             jnp.zeros((b, m.max_padding_tokens), bool)
                             if m.padded else
                             jnp.zeros((b, 0), bool)], -1).astype(jnp.uint8)))
        y_np = np.asarray(y_c)
        pred = np.array(labels)
        n_vis = int((~np.asarray(imu_mask)).sum(-1).max()) + \
            (m.min_padding_tokens if m.padded else 0)
        for bi in range(b):
            masked_idx = [i for i in order[bi, n_vis:] if i < m.num_patches]
            for k, tok in enumerate(masked_idx):
                pred[bi, tok] = y_np[bi, k]
        pred = jnp.asarray(pred)
        if get_labels:
            return pred, jnp.asarray(labels)
        return pred

    @property
    def any_imu(self):
        if self.missing_imu is None:
            return None
        return ~(np.asarray(self.missing_imu).min((-2, -1)).astype(bool))

    @property
    def full_imu(self):
        if self.missing_imu is None:
            return None
        return ~(np.asarray(self.missing_imu).max((-2, -1)).astype(bool))

    def __call__(self, inp_dict, imu_mask_ratio=1, **kwargs):
        """Predicted IMU where missing, true IMU where present
        (reference segmentation.py:731-754)."""
        pred, labels = self.predict_imu(inp_dict,
                                        imu_mask_ratio=imu_mask_ratio,
                                        get_labels=True)
        if self._always_use_predicted:
            out = pred
        elif self._require_none_missing:
            out = jnp.where(jnp.asarray(self.full_imu)[:, None, None],
                            labels, pred)
        else:
            out = jnp.where(jnp.asarray(self.any_imu)[:, None, None],
                            labels, pred)
        if self._always_use_predicted:
            missing = jnp.zeros_like(jnp.asarray(self.missing_imu))
        else:
            missing = jnp.where(jnp.asarray(self.any_imu)[:, None, None],
                                jnp.asarray(self.missing_imu),
                                jnp.zeros_like(jnp.asarray(self.missing_imu)))
        return out, missing

    forward = __call__


class ImuConditionedFlowGenerator(FlowGenerator):
    """Two-model pipeline: flow2imu head-motion predictor + IMU-conditioned
    masked predictor (reference segmentation.py:756-967)."""

    def __init__(self, *args, predictor: ConjoinedPredictorWrapper,
                 head_motion_predictor: ConjoinedPredictorWrapper,
                 head_motion_kwargs=None, **kwargs):
        super().__init__(*args, predictor=predictor, **kwargs)
        hm_kwargs = dict(head_motion_kwargs or {})
        hm_kwargs.setdefault('imagenet_normalize_inputs',
                             self.imagenet_normalize_inputs)
        hm_kwargs.setdefault('flow_model', self.flow_model)
        hm_kwargs.setdefault('flow_params', self.flow_params)
        self.head_motion_generator = ImuGenerator(
            predictor=head_motion_predictor, head_mask_ratio=1, **hm_kwargs)
        self._conj_prefix_lru = None  # built lazily on first fast chunk
        self._conj_params_src = None  # identity key: rebuilt on params swap

    @property
    def num_head_tokens(self):
        return self.head_motion_generator.num_head_tokens

    @property
    def head_tubelet_size(self):
        return self.head_motion_generator.head_tubelet_size

    @property
    def head_motion_channels(self):
        return self.head_motion_generator.head_motion_channels

    def get_fake_head_motion(self, x):
        """Zeroed IMU + fully-masked IMU mask (reference
        segmentation.py:818-832)."""
        b = x.shape[0]
        hm = jnp.zeros((b, self.head_motion_channels,
                        self.head_tubelet_size * self.num_head_tokens),
                       jnp.float32)
        h_mask = jnp.ones((b, self.num_head_tokens), dtype=bool)
        return hm, h_mask

    def predict_imu_from_video(self, x, timestamps=None):
        """flow2imu forward (reference segmentation.py:834-871).

        x: [B, T, C, H, W] wrapper layout, raw [0,1] values. Returns
        [B, M, pt*c] predicted IMU tokens.
        """
        x = jnp.asarray(x)
        fake_imu, imu_mask = self.get_fake_head_motion(x)
        g = self.head_motion_generator
        mask = g.mask_generator(x, key=self.next_key())
        xm = imagenet_normalize(x, temporal_dim=1) \
            if g.imagenet_normalize_inputs else x
        xm = jnp.swapaxes(xm, 1, 2)
        y_c = g.predictor(xm, mask, x_context=fake_imu,
                          mask_context=imu_mask, output_main=False,
                          output_context=True)
        return y_c

    def get_static_imu(self, x=None, timestamps=None):
        """IMU of a static scene (reference segmentation.py:873-877)."""
        if x is None:
            x = self.x
        x = jnp.asarray(x)
        static = jnp.tile(x[:, 0:1], (1, x.shape[1], 1, 1, 1))
        return self.predict_imu_from_video(static, timestamps=timestamps)

    def get_zeros_imu(self, x=None, timestamps=None):
        """Zeros in predict_imu_from_video's [B, M, pt*c] token layout.
        The reference runs a full flow2imu forward (incl. RAFT
        preprocessing) just to zeros_like it (segmentation.py:879-883);
        the shape is static from the head-model config, so build it
        directly."""
        if x is None:
            x = self.x
        return jnp.zeros(
            (jnp.asarray(x).shape[0], self.num_head_tokens,
             self.head_tubelet_size * self.head_motion_channels),
            jnp.float32)

    def reshape_output(self, y, tubelet_size=None):
        return _imu_tokens_to_stream(y, tubelet_size
                                     or self.head_tubelet_size)

    def _get_head_motion(self, x, head_motion=None, static_head_motion=True,
                         timestamps=None):
        if head_motion is not None:
            return head_motion
        self.set_input(x)
        if static_head_motion:
            return self.get_static_imu(timestamps=timestamps)
        return self.predict_imu_from_video(self.x, timestamps=timestamps)

    def _clear_fast_state(self):
        """Also drop the conjoined engine's device state (cast params +
        per-(scene, IMU) prefix-KV LRU, ~0.3 GB/scene at ViT-L) so the
        exact fallback gets its HBM back."""
        super()._clear_fast_state()
        self._conj_prefix_lru = None
        self._conj_params_src = None
        self._conj_params = None

    def _ensure_conj_fast(self):
        """Lazy init of the conjoined shared-prefix engine state, keyed on
        params identity (rebuilt on swap). The engine's compute dtype rides
        the param leaves, so cast once to the model's dtype (bf16 on TPU)."""
        from ..models import fast_conjoined
        w = self.predictor
        if (self._conj_prefix_lru is None
                or self._conj_params_src is not w.params):
            self._conj_params_src = w.params
            self._use_flash = jax.default_backend() == 'tpu'
            self._conj_params = (
                w.params if w.model.dtype == jnp.float32 else
                fast_conjoined.cast_params(w.params, w.model.dtype))
            self._conj_prefix_lru = fast_conjoined.ConjoinedPrefixLru(
                w, self._conj_params, self._use_flash,
                self.imagenet_normalize_inputs,
                size=self.prefix_cache_size)

    # -- conditioned prediction ------------------------------------------
    def predict(self, x=None, mask=None, frame=-1, x_context=None,
                mask_context=None, static_head_motion=True,
                mask_head_motion=False, **kwargs):
        """Factual prediction with IMU context. With ``x_context=None``
        the head motion is predicted per ``static_head_motion`` (static
        scene embedding vs. video-predicted) and ``mask_head_motion``
        fully masks it — the same conditioning knobs as
        predict_counterfactual_videos_and_flows (reference interface
        paths drive both)."""
        if x is None:
            x = self.x
        x = jnp.asarray(x)
        if x.ndim == 4:
            x = x[:, None]
        if mask is None:
            mask = self.mask if self.mask is not None else self.generate_mask(x)
        mask = jnp.asarray(mask).reshape(x.shape[0], -1)
        mask, n_vis = self._equalize(mask)
        if x_context is None:
            h = self._get_head_motion(
                x, static_head_motion=static_head_motion)
            x_context = self.reshape_output(h)
        if mask_context is None:
            mask_context = jnp.zeros((x.shape[0], self.num_head_tokens),
                                     dtype=bool)
            if mask_head_motion:
                mask_context = ~mask_context
        w = self.predictor
        n0 = w.model.main.num_patches // w.model.main.num_frames
        # engine='fast': per-click route through the conjoined shared-prefix
        # engine (warm ConjoinedPrefixLru -> only the frame-1 suffix runs)
        fast_ok = (self.engine == 'fast' and not self._fast_disabled
                   and x.shape[0] == 1
                   and x.shape[1] == 2
                   and not bool(np.asarray(mask[:, :n0]).any())
                   and not bool(np.asarray(mask_context).any()))
        if fast_ok:
            from ..models import fast_conjoined
            if fast_conjoined.conjoined_fast_supported(w.model):
                try:
                    self._ensure_conj_fast()
                    cache, _ = self._conj_prefix_lru.get(x, x_context)
                    vid = fast_conjoined.predict_videos_conjoined_prefix(
                        w, self._conj_params, x, mask, x_context,
                        mask_context, n_vis,
                        self.imagenet_normalize_inputs, self._use_flash,
                        cache=cache)
                    # surface async execution faults inside this try so
                    # they degrade too; no-op on axon
                    jax.block_until_ready(vid)
                    if frame is not None:
                        f = frame % vid.shape[1]
                        vid = vid[:, f:f + 1]
                    return vid
                except Exception as e:  # degrade, never strand the caller
                    self._disable_fast_engine(e)
        n_vis_c = w._static_n_vis(mask_context, w.model.context)
        if w.model.context.is_imu and w.model.context.concat_dummy_token:
            n_vis_c += 1
        vid = _conjoined_predict_video(
            w, w.params, x, mask, x_context, mask_context, n_vis, n_vis_c,
            self.imagenet_normalize_inputs)
        if frame is not None:
            f = frame % vid.shape[1]
            vid = vid[:, f:f + 1]
        return vid

    def predict_imu_video_and_flow(self, x, mask=None, timestamps=None,
                                   head_motion=None, mask_head_motion=False,
                                   static_head_motion=False,
                                   return_head_motion=False, **kwargs):
        """(reference segmentation.py:885-929)."""
        self.set_input(x)
        if mask is None:
            self.mask = self.generate_mask(self.x)
        else:
            self.mask = jnp.asarray(mask)
        h = self._get_head_motion(self.x, head_motion, static_head_motion,
                                  timestamps)
        if return_head_motion:
            return h
        h_mask = jnp.zeros((h.shape[0], self.num_head_tokens), dtype=bool)
        if mask_head_motion:
            h_mask = ~h_mask
        y = self.predict(self.x, self.mask, frame=None,
                         x_context=self.reshape_output(h),
                         mask_context=h_mask)
        flow = self.predict_flow(y)
        return y, flow

    def predict_counterfactual_videos_and_flows(self, x, *args,
                                                head_motion=None,
                                                timestamps=None,
                                                mask_head_motion=False,
                                                static_head_motion=True,
                                                **kwargs):
        """Counterfactuals with IMU context injected
        (reference segmentation.py:931-963)."""
        # normalize to [B, 2, C, H, W] BEFORE set_input (the parent does
        # this inside super(); doing it only there would crash set_input
        # on 3-D inputs and hand _get_head_motion a 1-frame movie)
        x = jnp.asarray(x)
        if x.ndim == 3:
            x = jnp.broadcast_to(x[None, None], (1, 2, *x.shape))
        elif x.ndim == 4:
            x = jnp.broadcast_to(x[:, None], (x.shape[0], 2, *x.shape[1:]))
        elif x.ndim == 5 and x.shape[1] == 1:
            x = jnp.broadcast_to(x, (x.shape[0], 2, *x.shape[2:]))
        self.set_input(x)
        h = self._get_head_motion(self.x, head_motion, static_head_motion,
                                  timestamps)
        h_mask = jnp.zeros((h.shape[0], self.num_head_tokens), dtype=bool)
        if mask_head_motion:
            h_mask = ~h_mask
        self._x_context = self.reshape_output(h)
        self._mask_context = h_mask
        return super().predict_counterfactual_videos_and_flows(
            x, *args, **kwargs)

    def _counterfactual_chunk(self, x, passive, active, shifts, keys, n_vis,
                              iters, fix_passive):
        """Override the fused step to push the IMU context through. With
        ``engine='fast'`` on the supported workload shape (one scene,
        fix_passive, frame 0 fully visible, shared fully-visible IMU
        context — the reference movability demo loop) this routes through
        the conjoined shared-prefix engine (models/fast_conjoined.py) with
        a per-(scene, IMU) ConjoinedPrefixCache LRU."""
        s = keys.shape[1]
        w = self.predictor
        n0 = w.model.main.num_patches // w.model.main.num_frames
        frame0_clear = not bool(np.asarray(
            passive[:, :n0] & active[:, :n0]).any())
        fast_ok = (self.engine == 'fast' and not self._fast_disabled
                   and x.shape[0] == 1 and fix_passive
                   and frame0_clear
                   and not bool(np.asarray(self._mask_context).any()))
        if fast_ok:
            from ..models import fast_conjoined
            if fast_conjoined.conjoined_fast_supported(w.model):
                try:
                    self._ensure_conj_fast()
                    cache, _ = self._conj_prefix_lru.get(x, self._x_context)
                    out = _imu_counterfactual_step_fast(
                        w, self._conj_params, self.flow_model,
                        self.flow_params, x, passive, active, shifts, keys,
                        self._x_context, self._mask_context, n_vis,
                        self.imagenet_normalize_inputs, iters,
                        self._use_flash,
                        fast_conjoined.resolve_two_source(self._use_flash),
                        cache)
                    # surface async execution faults inside this try so
                    # they degrade too; no-op on axon
                    return jax.block_until_ready(out)
                except Exception as e:  # degrade, never strand the caller
                    self._disable_fast_engine(e)
        x_context = jnp.repeat(self._x_context, s, axis=0)
        mask_context = jnp.repeat(self._mask_context, s, axis=0)
        n_vis_c = w._static_n_vis(self._mask_context, w.model.context)
        if w.model.context.is_imu and w.model.context.concat_dummy_token:
            n_vis_c += 1
        return _imu_counterfactual_step(
            w, w.params, self.flow_model, self.flow_params, x, passive,
            active, shifts, keys, x_context, mask_context, n_vis, n_vis_c,
            self.imagenet_normalize_inputs, iters, fix_passive,
            x.shape[0] == 1 and fix_passive and frame0_clear)


def _imu_sfx_pad(wrapper, n_vis: int) -> int:
    """Static bucketed suffix width for the conjoined engine
    (fast_vmae.sfx_bucket over the frame-1 visible count)."""
    from ..models.fast_vmae import sfx_bucket
    m = wrapper.model.main
    n0 = m.num_patches // m.num_frames
    return sfx_bucket(n_vis - n0, m.num_patches - n0)


@functools.partial(jax.jit, static_argnums=(0, 2, 11, 12, 13, 14, 15))
def _imu_counterfactual_step_fast(wrapper, params, raft_model, raft_params,
                                  x, passive, active, shifts, keys,
                                  x_context, mask_context, n_vis: int,
                                  normalize: bool, raft_iters: int,
                                  use_flash: bool, two_source: bool,
                                  prefix_cache=None):
    """Shared-prefix fast path of _imu_counterfactual_step for the
    production workload shape: B=1, fix_passive, frame 0 fully visible,
    IMU context shared and fully visible. The conjoined forward runs via
    the prefix-isolated engine (models/fast_conjoined.py) and RAFT shares
    the frame-0 feature/context encoders across samples.

    x_context/mask_context are the UNtiled [1, ...] shared context.
    prefix_cache: optional fast_conjoined.make_conjoined_prefix_cache(...)
    for this (scene, IMU) pair — skips the whole prefix pass.
    """
    from ..models.fast_conjoined import _conjoined_videos_core

    b, t, c, h, w_ = x.shape
    assert b == 1, 'fast path is per-scene; vmap/shard the scene axis'

    def one(xb, p, a, shift, key):
        return perturb.make_motion_counterfactual(
            xb, p, a, shift, key, wrapper.patch_size, n_vis_target=n_vis,
            fix_passive=True)

    f = jax.vmap(one, in_axes=(None, 1, 1, 0, 0))
    x_mocos, mask_mocos = f(x[0], passive[0], active[0], shifts[0], keys[0])

    # _conjoined_videos_core takes the STATIC bucketed suffix width, not
    # the raw visible-token target (fcc13e2 moved bucketing out of the
    # core; passing n_vis raw overflows pad_vis1_idx whenever
    # n_vis > frame-1 patches — i.e. on every frame-0-visible prompt)
    n_sfx_pad = _imu_sfx_pad(wrapper, n_vis)
    y = _conjoined_videos_core(wrapper, params, x_mocos, mask_mocos,
                               x_context, mask_context, n_sfx_pad,
                               normalize, use_flash, two_source,
                               prefix_cache)
    flows = apply_raft_shared0(raft_model, raft_params, y, raft_iters, True)
    return y, flows, mask_mocos


@functools.partial(jax.jit, static_argnums=(0, 2, 11, 12, 13, 14, 15))
def _imu_counterfactual_multi_step_fast(wrapper, params, raft_model,
                                        raft_params, x, passive, active,
                                        shifts, keys, x_context,
                                        mask_context, n_vis: int,
                                        normalize: bool, raft_iters: int,
                                        use_flash: bool, two_source: bool,
                                        prefix_cache):
    """Multi-SCENE variant of _imu_counterfactual_step_fast: each sample
    carries its OWN (scene, IMU context) pair.

    x [S, T, C, H, W] per-sample scenes; passive/active [S, N]; shifts
    [S, 2]; keys [S]; x_context per-sample IMU [S, ...]; mask_context
    [S, M] all-False; prefix_cache a REQUIRED stacked cache
    (fast_conjoined.stack_conjoined_prefix_caches — scene i's cache at
    row i). RAFT runs the standard per-sample path (frame 0 differs per
    sample). Used by the serving layer to merge concurrent warm-prefix
    IMU-conditioned requests on different images into one program."""
    from ..models.fast_conjoined import _conjoined_videos_core

    def one(xb, p, a, shift, key):
        return perturb.make_motion_counterfactual(
            xb, p, a, shift, key, wrapper.patch_size, n_vis_target=n_vis,
            fix_passive=True)

    x_mocos, mask_mocos = jax.vmap(one)(x, passive, active, shifts, keys)

    y = _conjoined_videos_core(wrapper, params, x_mocos, mask_mocos,
                               x_context, mask_context,
                               _imu_sfx_pad(wrapper, n_vis), normalize,
                               use_flash, two_source, prefix_cache)
    flows = apply_raft_video(raft_model, raft_params, y, iters=raft_iters,
                             scale_inputs=True)
    return y, flows, mask_mocos


@functools.partial(jax.jit, static_argnums=(0, 2, 11, 12, 13, 14, 15, 16))
def _imu_counterfactual_step(wrapper, params, raft_model, raft_params, x,
                             passive, active, shifts, keys, x_context,
                             mask_context, n_vis: int, n_vis_c: int,
                             normalize: bool, raft_iters: int,
                             fix_passive: bool, shared0_ok: bool = False):
    """Fused: build counterfactuals -> conjoined (IMU-conditioned) forward
    -> scatter -> RAFT. The IMU context is pre-tiled over samples.

    shared0_ok: the CALLER asserts every sample's reconstructed frame 0 is
    identical (one scene, fix_passive, AND no frame-0 patch masked — this
    exact path is also the fallback for frame-0-masking prompts, whose
    per-sample frame-0 predictions differ, so b==1 and fix_passive alone
    are NOT sufficient); only then may RAFT share the frame-0
    feature/context encoder passes."""
    b, t, c, h, w_ = x.shape
    s = passive.shape[-1]
    patch_size = wrapper.patch_size

    def one(xb, p, a, shift, key):
        return perturb.make_motion_counterfactual(
            xb, p, a, shift, key, patch_size, n_vis_target=n_vis,
            fix_passive=fix_passive)

    f = jax.vmap(one, in_axes=(None, 1, 1, 0, 0))
    f = jax.vmap(f, in_axes=(0, 0, 0, 0, 0))
    x_mocos, mask_mocos = f(x, passive, active, shifts, keys)
    x_mocos = x_mocos.reshape(b * s, t, c, h, w_)
    mask_mocos = mask_mocos.reshape(b * s, -1)

    y = _conjoined_predict_video(
        wrapper, params, x_mocos, mask_mocos, x_context, mask_context,
        n_vis, n_vis_c, normalize)
    if shared0_ok and b == 1 and fix_passive:
        # frame 0 identical across samples (caller-verified): share the
        # frame-0 fnet/cnet passes (numerics identical, see
        # apply_raft_shared0)
        flows = apply_raft_shared0(raft_model, raft_params, y, raft_iters,
                                   True)
    else:
        flows = apply_raft_video(raft_model, raft_params, y, False,
                                 raft_iters, True)
    return y, flows, mask_mocos
