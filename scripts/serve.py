#!/usr/bin/env python
"""HTTP serving for counterfactual world models.

A small stdlib-only server exposing the CWM inference surface:

    GET  /health                 -> {"status": "ok", "backend": "tpu"}
    POST /predict                -> factual prediction
    POST /counterfactual         -> counterfactual simulation + flow + segment

Request JSON (both POSTs):
    {"image": [[...]] float [H, W, 3] in [0, 1] (or nested list [3, H, W]),
     "active": [[row, col], ...]   frame-1 patch-grid coordinates,
     "passive": [[row, col], ...]  optional static patches,
     "shift": [dy, dx]             patch-unit shift (counterfactual only),
     "num_samples": int            optional, counterfactual only}

Responses return base64 PNGs ("prediction", and for counterfactuals
"flow_rgb" + "segment") plus the raw segment as a nested list.

One model owner thread serializes device work (requests queue behind a
lock); prediction programs are jit-cached after the first call per shape.

Usage:
    python scripts/serve.py --model tiny --img-size 64 --port 8731
    curl -s localhost:8731/health
"""
import argparse
import base64
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def build_generator(args):
    import jax
    import jax.numpy as jnp
    from counterfactualworldmodels_tpu.models import vmae
    from counterfactualworldmodels_tpu.models.raft.raft import (
        RAFT, init_raft_params)
    from counterfactualworldmodels_tpu.pipelines import FlowGenerator
    from counterfactualworldmodels_tpu.utils.cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    attn = 'flash' if on_tpu else 'dense'
    if args.model == 'tiny':
        model = vmae.PretrainVisionTransformer(
            img_size=(args.img_size, args.img_size), patch_size=(8, 8),
            encoder_embed_dim=96, encoder_depth=2, encoder_num_heads=2,
            decoder_embed_dim=64, decoder_depth=1, decoder_num_heads=2,
            mlp_ratio=2.0, qkv_bias=True, num_frames=2, tubelet_size=1,
            dtype=dtype)
    elif args.model == 'base':
        model = vmae.base_8x8patch_2frames_1tube(dtype=dtype, attn_impl=attn)
    else:
        model = vmae.large_4x4patch_2frames_1tube(dtype=dtype, attn_impl=attn)

    if args.params:
        from counterfactualworldmodels_tpu.utils.checkpoint import load_params
        params = load_params(os.path.abspath(args.params))
    else:
        params = vmae.init_params(model, jax.random.PRNGKey(0))
    raft = RAFT(iters=args.raft_iters, dtype=dtype)
    if args.raft_params:
        from counterfactualworldmodels_tpu.utils.checkpoint import load_params
        raft_params = load_params(os.path.abspath(args.raft_params))
    else:
        raft_params = init_raft_params(raft, jax.random.PRNGKey(1),
                                       hw=max(64, args.img_size))
    # engine/prefix_cache_size flow into the generator so its OWN fast
    # routes (FlowGenerator.predict per-click shared-prefix path + LRU)
    # engage, not just the service-level dispatches
    return FlowGenerator(predictor=model, params=params, flow_model=raft,
                         flow_params=raft_params, raft_iters=args.raft_iters,
                         imagenet_normalize_inputs=True, seed=args.seed,
                         engine=getattr(args, 'engine', 'fast'),
                         prefix_cache_size=getattr(args, 'prefix_cache_size',
                                                   4))


def build_imu_generator(args):
    """IMU-conditioned movability predictor (the reference flagship demo
    composition, segmentation.py:756-967 + movability.py): the imu400
    conjoined predictor + the flow2imu head-motion model, wrapped in
    ImuConditionedMovabilityPredictor so /counterfactual and /movability
    both work. engine='fast' routes through the conjoined shared-prefix
    engine (models/fast_conjoined.py)."""
    import jax
    import jax.numpy as jnp
    from counterfactualworldmodels_tpu.models import conjoined as conj
    from counterfactualworldmodels_tpu.models.raft.raft import (
        RAFT, init_raft_params)
    from counterfactualworldmodels_tpu.pipelines.movability import (
        make_imu_conditioned_movability_predictor)
    from counterfactualworldmodels_tpu.utils.cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    attn = 'flash' if on_tpu else 'dense'
    raft = RAFT(iters=args.raft_iters, dtype=dtype)
    if args.raft_params:
        from counterfactualworldmodels_tpu.utils.checkpoint import load_params
        raft_params = load_params(os.path.abspath(args.raft_params))
    else:
        raft_params = init_raft_params(raft, jax.random.PRNGKey(1),
                                       hw=max(64, args.img_size))

    if args.model == 'tiny':
        sz = args.img_size
        ctx = conj.StreamSpec(
            is_imu=True, in_chans=6, sequence_length=48, imu_tubelet=8,
            encoder_embed_dim=32, encoder_depth=2, encoder_num_heads=4,
            decoder_embed_dim=24, decoder_depth=2, decoder_num_heads=4,
            decoder_num_classes=48, mlp_ratio=2.0, concat_dummy_token=False,
            padded=True, max_padding_tokens=6)
        main = conj.StreamSpec(
            img_size=(sz, sz), patch_size=(8, 8), in_chans=3, num_frames=2,
            encoder_embed_dim=48, encoder_depth=2, encoder_num_heads=4,
            decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=4,
            mlp_ratio=2.0, padded=True, max_padding_tokens=8)
        imu_cond = conj.ConjoinedVMAE(
            main=main, context=ctx,
            conjoin_encoder_layers=((0, 0), (-1, -1)),
            conjoin_decoder_layers=((0, 0), (1, 1)),
            dtype=dtype, attn_impl=attn)
        f2i_ctx = conj.StreamSpec(
            is_imu=True, in_chans=6, sequence_length=48, imu_tubelet=8,
            encoder_embed_dim=32, encoder_depth=2, encoder_num_heads=4,
            decoder_embed_dim=24, decoder_depth=2, decoder_num_heads=4,
            decoder_num_classes=48, mlp_ratio=2.0, concat_dummy_token=True)
        f2i_main = conj.StreamSpec(
            img_size=(sz, sz), patch_size=(8, 8), in_chans=7, num_frames=1,
            encoder_embed_dim=48, encoder_depth=2, encoder_num_heads=4,
            decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=4,
            mlp_ratio=2.0, decoder_num_classes=448)
        flow2imu = conj.ConjoinedVMAE(
            main=f2i_main, context=f2i_ctx,
            conjoin_encoder_layers=((0, 0), (-1, -1)),
            conjoin_decoder_layers=((0, 0), (1, 1)),
            dtype=dtype, attn_impl=attn)
    else:
        if args.img_size != 224:
            raise SystemExit('--imu-conditioned base/large requires '
                             '--img-size 224 (the released imu400 config)')
        imu_cond = conj.imu400_base_4x4patch_2frames_1tube(
            dtype=dtype, attn_impl=attn)
        flow2imu = conj.imu400_8x8patch_2frames_1tube_flowbackrgb01(
            dtype=dtype, attn_impl=attn)

    def load_or_init(model, path, key):
        if path:
            from counterfactualworldmodels_tpu.utils.checkpoint import (
                load_params)
            return load_params(os.path.abspath(path))
        return conj.init_conjoined_params(model, jax.random.PRNGKey(key))

    imu_cond_w = conj.ConjoinedPredictorWrapper(
        imu_cond, params=load_or_init(imu_cond, args.params, 0),
        main_input='rgb01', context_input='imu')
    flow2imu_w = conj.ConjoinedPredictorWrapper(
        flow2imu, params=load_or_init(flow2imu, args.flow2imu_params, 2),
        main_input='flowback_rgb01',
        main_input_kwargs={'unnormalize': True, 'iters': args.raft_iters,
                           'flow_model': raft, 'flow_params': raft_params},
        context_input='imu')
    cls = make_imu_conditioned_movability_predictor()
    return cls(predictor=imu_cond_w, head_motion_predictor=flow2imu_w,
               flow_model=raft, flow_params=raft_params,
               raft_iters=args.raft_iters, imagenet_normalize_inputs=True,
               seed=args.seed, engine=args.engine,
               prefix_cache_size=getattr(args, 'prefix_cache_size', 4),
               initialize_from_keypoints=False,
               num_initial_samples=args.movability_samples,
               num_samples_per_iteration=args.movability_samples,
               num_iters=args.movability_iters,
               sample_batch_size=args.movability_samples)


def _png_b64(arr):
    """[H, W, 3] or [H, W] float array in [0, 1] -> base64 PNG."""
    import numpy as np
    from PIL import Image
    a = np.asarray(arr)
    if a.ndim == 2:
        a = np.stack([a] * 3, -1)
    img = Image.fromarray((np.clip(a, 0, 1) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, 'PNG')
    return base64.b64encode(buf.getvalue()).decode()


class CwmService:
    def __init__(self, G, img_size, engine='fast', prefix_cache_size=4,
                 seed=0, batch_window_ms=5.0, max_batch_samples=64,
                 max_scene_batch=8):
        self.G = G
        self.img_size = img_size
        self.engine = engine
        self.lock = threading.Lock()
        self.seed = seed
        self._req_counter = 0
        # fast_vmae.PrefixLru: repeat requests on the same image (the
        # interactive probing workload) skip the frame-0 prefix pass
        self._fp = None
        self._lru = None
        self.prefix_cache_size = prefix_cache_size
        # micro-batch concurrent same-scene counterfactuals into one
        # S-dispatch (fast engine only; S buckets bound compile count)
        self._batcher = None
        self.max_batch_samples = int(max_batch_samples)
        if batch_window_ms > 0:
            from counterfactualworldmodels_tpu.utils.batching import (
                MicroBatcher)
            # weight = the request's sample count, so max_batch_samples
            # caps SAMPLES per merged dispatch (not request count)
            self._batcher = MicroBatcher(self._dispatch_cf_batch,
                                         window_s=batch_window_ms / 1e3,
                                         max_items=self.max_batch_samples,
                                         weight=lambda item: item[4])
        # powers of two up to the sample cap, plus the cap itself: every
        # legal s_total (<= max_batch_samples) pads UP to a bucket
        self._s_buckets = self._pow2_buckets(self.max_batch_samples)
        # mixed-scene dispatches stack one prefix KV set PER SAMPLE
        # (~0.3 GB/sample at ViT-L) -> cap their batch separately
        self.max_scene_batch = int(max_scene_batch)
        self.scene_batches = 0      # mixed-scene dispatches run

    @staticmethod
    def _pow2_buckets(cap):
        """(1, 2, 4, ..., cap) — cap included even when not a power of
        two, so padding never clamps below a legal batch size."""
        b, v = {1, int(cap)}, 1
        while v < cap:
            v *= 2
            b.add(min(v, int(cap)))
        return tuple(sorted(b))

    def _scene_buckets(self):
        """Pad buckets for MIXED-scene dispatches: the standard powers of
        two up to the cap, plus the cap itself — mixed chunks never
        exceed max_scene_batch samples (single over-cap items route
        through the same-scene path), so padding never clamps BELOW the
        chunk size for any --max-scene-batch value."""
        return sorted({b for b in self._s_buckets
                       if b < self.max_scene_batch}
                      | {self.max_scene_batch})

    @property
    def prefix_hits(self):
        return self._lru.hits if self._lru else 0

    @property
    def prefix_misses(self):
        return self._lru.misses if self._lru else 0

    def _prefix_for(self, x):
        """x: [1, C, H, W] in [0, 1]. Returns (cache, hit: bool)."""
        from counterfactualworldmodels_tpu.models.fast_vmae import (
            stack_vmae_params, PrefixLru)
        if self._lru is None:
            import jax
            self._fp = stack_vmae_params(self.G.predictor, self.G.params)
            self._lru = PrefixLru(self.G.predictor, self._fp,
                                  jax.default_backend() == 'tpu',
                                  self.G.imagenet_normalize_inputs,
                                  size=self.prefix_cache_size)
        return self._lru.get(x)

    def _parse_image(self, req):
        import numpy as np
        import jax.numpy as jnp
        img = np.asarray(req['image'], np.float32)
        if img.ndim != 3:
            raise ValueError(f'image must be rank 3, got {img.shape}')
        if img.shape[-1] == 3:                     # HWC -> CHW
            img = img.transpose(2, 0, 1)
        if img.shape[-2:] != (self.img_size, self.img_size):
            import jax
            img = np.asarray(jax.image.resize(
                jnp.asarray(img), (3, self.img_size, self.img_size),
                'bilinear'))
        return jnp.asarray(img)[None]              # [1, 3, H, W]

    def _patch_mask(self, coords, grid, n):
        import numpy as np
        mask = np.ones((1, n), dtype=bool)
        mask[0, :n // 2] = False
        for r, c_ in (coords or []):
            mask[0, n // 2 + (int(r) % grid) * grid + (int(c_) % grid)] = \
                False
        return mask

    def predict(self, req):
        import numpy as np
        import jax.numpy as jnp
        self._sync_generator_degrade()
        x = self._parse_image(req)
        G = self.G
        n = G.predictor.num_patches
        grid = G.mask_shape[-1]
        mask = self._patch_mask(req.get('active'), grid, n)
        with self.lock:
            video = jnp.broadcast_to(x[:, None], (1, 2, *x.shape[1:]))
            pred = G.predict(video, jnp.asarray(mask), frame=1)
            pred = np.asarray(pred[0, 0]).transpose(1, 2, 0)
        return {'prediction': _png_b64(pred)}

    def _parse_cf_request(self, req):
        """Shared request parsing for both engines.

        Returns (x [1,C,H,W], active [1,N] np.bool_, passive [1,N] np.bool_,
        shift [dy,dx], num_samples). Patch masks follow the library
        convention: True = masked, the *visible* entries are the prompt
        patches; frame 0 is always visible."""
        x = self._parse_image(req)
        if not req.get('active'):
            raise ValueError('counterfactual requires "active" patches')
        n = self.G.predictor.num_patches
        grid = self.G.mask_shape[-1]
        active = self._patch_mask(req.get('active'), grid, n)
        passive = self._patch_mask(req.get('passive'), grid, n)
        s = int(req.get('num_samples', 1))
        if not 1 <= s <= self.max_batch_samples:
            # over-cap requests would exceed every compile bucket (and the
            # per-dispatch HBM budget); the cap is the documented contract
            raise ValueError(f'num_samples must be in '
                             f'[1, {self.max_batch_samples}], got {s}')
        return (x, active, passive, req.get('shift', [0, 2]), s)

    def _cf_response(self, sim, flow0, seg, **extra):
        """Shared response assembly: simulation/flow/segment PNGs + raw."""
        import numpy as np
        import jax.numpy as jnp
        from counterfactualworldmodels_tpu.ops.flow_viz import flow_to_rgb
        rgb = np.asarray(flow_to_rgb(
            flow0, max_speed=max(float(jnp.abs(flow0).max()),
                                 1e-3))).transpose(1, 2, 0)
        seg = np.asarray(seg)
        return {'simulation': _png_b64(np.asarray(sim)),
                'flow_rgb': _png_b64(rgb), 'segment': _png_b64(seg),
                'segment_raw': np.round(seg, 4).tolist(), **extra}

    def _counterfactual_fast(self, parsed):
        """Shared-prefix engine route: per-image PrefixCache LRU + the
        fused fast pipeline (segmentation.counterfactual_videos_and_flows
        _fast). Takes the already-parsed request (request validation
        happens in counterfactual(), OUTSIDE the engine-degrade try, so a
        malformed request can never flip the engine); same response
        schema as the exact route.

        Concurrent requests sharing n_vis are micro-batched: same-scene
        requests concatenate along the engine's S axis and run as ONE
        dispatch (utils/batching.py) riding the shared-prefix
        S-amortization; requests on DIFFERENT images merge via stacked
        per-sample prefix caches (the multi-scene warm path,
        segmentation.counterfactual_videos_and_flows_fast_multi)."""
        x, active_np, passive_np, shift, s = parsed
        # visible = union of the two prompt sets (matches the exact route's
        # _n_vis_target; a sum would double-count patches listed in both and
        # make the rectangularizer leak extra ground-truth patches)
        n_vis = int((~(active_np & passive_np)).sum())
        item = (x, active_np, passive_np, shift, s)
        if self._batcher is None:
            return self._dispatch_cf_batch((None, n_vis), [item])[0]
        return self._batcher.run(('cf', n_vis), item)

    def _dispatch_cf_batch(self, key, items):
        """Route a closed batch: all-same-image -> the shared-prefix
        S-dispatch; mixed images -> multi-scene chunks capped at
        max_scene_batch samples each (stacked caches are per-sample)."""
        import numpy as np
        _, n_vis = key
        imgs = [np.asarray(x) for (x, *_r) in items]
        same = all(i.shape == imgs[0].shape and (i == imgs[0]).all()
                   for i in imgs[1:])
        if same:
            return self._dispatch_same_scene(n_vis, items)
        out, chunk, cnt = [], [], 0
        for it in items:
            s = it[4]
            if chunk and cnt + s > self.max_scene_batch:
                out.extend(self._dispatch_chunk(n_vis, chunk))
                chunk, cnt = [], 0
            chunk.append(it)
            cnt += s
        if chunk:
            out.extend(self._dispatch_chunk(n_vis, chunk))
        return out

    def _dispatch_chunk(self, n_vis, items):
        import numpy as np
        imgs = [np.asarray(x) for (x, *_r) in items]
        if len(items) == 1 or all(
                i.shape == imgs[0].shape and (i == imgs[0]).all()
                for i in imgs[1:]):
            return self._dispatch_same_scene(n_vis, items)
        return self._dispatch_multi_scene(n_vis, items)

    def _sfx_pad(self, n_vis):
        """Static bucketed suffix width for a dispatch (the prompt-size
        part of the program key — fast_vmae.sfx_bucket); warmup compiles
        one program per bucket, so any click count within a warmed bucket
        skips the first-request compile."""
        from counterfactualworldmodels_tpu.models.fast_vmae import sfx_bucket
        n0 = self.G.predictor.num_patches_per_frame
        return sfx_bucket(n_vis - n0, self.G.predictor.num_patches - n0)

    def _dispatch_multi_scene(self, n_vis, items):
        """ONE fused dispatch for concurrent prompts on DIFFERENT images:
        per-sample scenes + stacked per-sample prefix caches (sample i
        attends scene i's own prefix — the s0=S route of the two-source
        kernel). items as in _dispatch_same_scene but with mixed x."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from counterfactualworldmodels_tpu.models.fast_vmae import (
            resolve_two_source, stack_prefix_caches)
        from counterfactualworldmodels_tpu.pipelines.segmentation import (
            counterfactual_videos_and_flows_fast_multi)
        from counterfactualworldmodels_tpu.utils.batching import (
            pad_to_bucket)
        G = self.G
        counts = [s for (_, _, _, _, s) in items]
        s_total = sum(counts)
        s_pad = pad_to_bucket(s_total, self._scene_buckets())
        assert s_pad >= s_total, (s_pad, s_total)
        rows = []                       # per-sample (x, act, pas, shift)
        for (x, a, p, shift, s) in items:
            rows.extend([(x, a[0], p[0], shift)] * s)
        rows.extend([rows[-1]] * (s_pad - s_total))
        act = np.stack([r[1] for r in rows])
        pas = np.stack([r[2] for r in rows])
        shf = np.asarray([r[3] for r in rows], np.int32)
        with self.lock:
            self._req_counter += 1
            keys = jax.random.split(
                jax.random.PRNGKey(self.seed + self._req_counter), s_total)
            if s_pad > s_total:
                keys = jnp.concatenate(
                    [keys, jnp.repeat(keys[-1:], s_pad - s_total, 0)], 0)
            # one LRU probe (sha1 over the image bytes) per distinct
            # request, expanded to its samples — not one per row
            caches, hits = [], []
            for (x_i, *_r), s in zip(items, counts):
                c, h = self._prefix_for(x_i)
                caches.extend([c] * s)
                hits.extend([h] * s)
            caches.extend([caches[-1]] * (s_pad - s_total))
            hits.extend([hits[-1]] * (s_pad - s_total))
            stacked = stack_prefix_caches(caches)
            xs = jnp.concatenate(
                [jnp.broadcast_to(r[0][:, None], (1, 2, *r[0].shape[1:]))
                 for r in rows])
            use_flash = jax.default_backend() == 'tpu'
            ys, flows, _ = counterfactual_videos_and_flows_fast_multi(
                G.predictor, self._fp, G.flow_model, G.flow_params, xs,
                jnp.asarray(pas), jnp.asarray(act), jnp.asarray(shf),
                self._sfx_pad(n_vis), G.imagenet_normalize_inputs,
                G.raft_iters, True, use_flash,
                resolve_two_source(use_flash), keys, stacked, n_vis=n_vis)
            self.scene_batches += 1
            out, off = [], 0
            for s in counts:
                fl = flows[off:off + s]          # [s, 1, 2, H, W]
                flows_s = jnp.moveaxis(fl[:, 0], 0, -1)[None]
                seg = G.compute_mean_motion_map(flows_s)[0, 0]
                out.append(self._cf_response(
                    np.asarray(ys[off, 1], np.float32).transpose(1, 2, 0),
                    fl[0, 0], seg, prefix_cache_hit=hits[off],
                    engine='fast', batched_samples=s_pad,
                    scene_batched=len(items)))
                off += s
        return out

    def _dispatch_same_scene(self, n_vis, items):
        """One fused fast dispatch for a batch of same-scene requests;
        returns one response per item. items: (x, active_np, passive_np,
        shift, s) with identical x across the batch."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from counterfactualworldmodels_tpu.models.fast_vmae import (
            resolve_two_source)
        from counterfactualworldmodels_tpu.pipelines.segmentation import (
            counterfactual_videos_and_flows_fast)
        from counterfactualworldmodels_tpu.utils.batching import (
            pad_to_bucket)
        G = self.G
        x = items[0][0]
        counts = [s for (_, _, _, _, s) in items]
        s_total = sum(counts)
        s_pad = (s_total if self._batcher is None
                 else pad_to_bucket(s_total, self._s_buckets))
        # per-request cap + sample-weighted batching keep s_total within
        # max_batch_samples, whose bucket list includes the cap itself
        assert s_pad >= s_total, (s_pad, s_total)
        act = np.concatenate(
            [np.repeat(a[..., None], s, axis=-1)
             for (_, a, _, _, s) in items], axis=-1)
        pas = np.concatenate(
            [np.repeat(p[..., None], s, axis=-1)
             for (_, _, p, _, s) in items], axis=-1)
        shf = np.concatenate(
            [np.tile(np.asarray(shift, np.int32)[None, None], (1, s, 1))
             for (_, _, _, shift, s) in items], axis=1)
        if s_pad > s_total:                      # repeat the last column
            act = np.concatenate(
                [act, np.repeat(act[..., -1:], s_pad - s_total, -1)], -1)
            pas = np.concatenate(
                [pas, np.repeat(pas[..., -1:], s_pad - s_total, -1)], -1)
            shf = np.concatenate(
                [shf, np.repeat(shf[:, -1:], s_pad - s_total, 1)], 1)
        active = jnp.asarray(act)
        passive = jnp.asarray(pas)
        shifts = jnp.asarray(shf)
        with self.lock:
            self._req_counter += 1
            # keys split by s_total (not s_pad) and padded by repetition:
            # the pad bucket never changes the real samples' numerics
            keys = jax.random.split(
                jax.random.PRNGKey(self.seed + self._req_counter), s_total)
            if s_pad > s_total:
                keys = jnp.concatenate(
                    [keys, jnp.repeat(keys[-1:], s_pad - s_total, 0)], 0)
            keys = keys.reshape(1, s_pad, 2)
            cache, hit = self._prefix_for(x)
            video = jnp.broadcast_to(x[:, None], (1, 2, *x.shape[1:]))
            use_flash = jax.default_backend() == 'tpu'
            ys, flows, _ = counterfactual_videos_and_flows_fast(
                G.predictor, self._fp, G.flow_model, G.flow_params, video,
                passive, active, shifts, keys, self._sfx_pad(n_vis),
                G.imagenet_normalize_inputs, G.raft_iters, True, use_flash,
                resolve_two_source(use_flash), prefix_cache=cache,
                n_vis=n_vis)
            extra = ({} if self._batcher is None
                     else {'batched_samples': s_pad})
            out, off = [], 0
            for s in counts:
                fl = flows[off:off + s]          # [s, 1, 2, H, W]
                flows_s = jnp.moveaxis(fl[:, 0], 0, -1)[None]
                seg = G.compute_mean_motion_map(flows_s)[0, 0]
                out.append(self._cf_response(
                    np.asarray(ys[off, 1], np.float32).transpose(1, 2, 0),
                    fl[0, 0], seg, prefix_cache_hit=hit, engine='fast',
                    **extra))
                off += s
        return out

    def counterfactual(self, req):
        import numpy as np
        import jax.numpy as jnp
        self._sync_generator_degrade()
        # parse/validate BEFORE the engine-degrade try: a malformed
        # request surfaces as a 400 and can never flip the engine
        parsed = self._parse_cf_request(req)
        if self.engine == 'fast':
            try:
                return self._counterfactual_fast(parsed)
            except Exception as e:
                self._degrade_to_exact(e)
        x, active, passive_np, shift, s = parsed
        G = self.G
        passive = jnp.asarray(passive_np) if req.get('passive') else None
        with self.lock:
            self._req_counter += 1
            ys, flows = G.predict_counterfactual_videos_and_flows(
                x, active_patches=jnp.asarray(active),
                passive_patches=passive,
                shifts=[tuple(shift)] * s, num_samples=s,
                sample_batch_size=s)
            seg = G.compute_mean_motion_map(G._batch_to_samples(flows))[0, 0]
            return self._cf_response(
                np.asarray(ys[0, 1]).transpose(1, 2, 0), flows[0, 0], seg)

    # ---- startup warmup (pre-compile the serving programs) ----

    def _snapshot_counters(self):
        b = self._batcher
        return {'req': self._req_counter, 'scene': self.scene_batches,
                'batches': b.batches if b else 0,
                'batched_items': b.batched_items if b else 0,
                # routes through the generator API advance its internal
                # PRNG (next_key); restore it so post-warmup requests use
                # the same sample keys as on a cold server
                'g_key': getattr(self.G, '_key', None)}

    def _restore_counters(self, s):
        self._req_counter = s['req']
        self.scene_batches = s['scene']
        if self._batcher is not None:
            self._batcher.batches = s['batches']
            self._batcher.batched_items = s['batched_items']
        if s['g_key'] is not None:
            self.G._key = s['g_key']

    def _clear_prefix_state(self):
        """Drop the synthetic warmup scenes from the prefix LRUs (the
        service-level one AND any generator-internal ones, e.g. the
        per-click predict route's) — frees their pinned device KV — and
        zero the hit/miss counters."""
        lrus = [self._lru]
        lrus += [getattr(self.G, a, None)
                 for a in ('_prefix_lru', '_conj_prefix_lru')]
        for lru in lrus:
            if lru is not None:
                lru._entries.clear()
                lru.hits = lru.misses = 0

    def _degrade_to_exact(self, exc):
        """Flip the service (and its generator) to the exact engine after
        a fast-engine failure (e.g. a Pallas kernel that fails to compile
        on this hardware). Requests are then re-served on the exact path
        instead of surfacing a permanent 500; mirrors
        FlowGenerator._disable_fast_engine."""
        import warnings
        warnings.warn(
            f'fast serving engine failed ({type(exc).__name__}: {exc}); '
            'serving degrades to the exact engine', RuntimeWarning)
        G = self.G
        # under the service lock: concurrent dispatches must not observe
        # a half-cleared _fp/_lru (exceptions release the lock before the
        # caller reaches this, so acquiring here cannot deadlock)
        with self.lock:
            self.engine = 'exact'
            G._fast_disabled = True
            if hasattr(G, '_clear_fast_state'):
                G._clear_fast_state()
            self._lru = None
            self._fp = None

    def _sync_generator_degrade(self):
        """Mirror a generator-internal degrade (FlowGenerator swallows
        fast-engine failures and falls back on its own) into the service
        engine label, so responses and /stats report the engine actually
        computing."""
        if self.engine == 'fast' and getattr(self.G, '_fast_disabled',
                                             False):
            import warnings
            warnings.warn(
                'generator degraded its fast engine internally; serving '
                'engine label follows to exact', RuntimeWarning)
            with self.lock:
                self.engine = 'exact'
                self._lru = None
                self._fp = None

    def _mixed_warm_ready(self):
        return True

    def _warm_mixed_dispatch(self, n_vis, items):
        return self._dispatch_multi_scene(n_vis, items)

    def warmup(self, buckets=(1, 4, 16), active_counts=(1, 5, 9),
               log=print):
        """Pre-compile the serving programs before accepting traffic.

        Runs one dispatch per (route, padded batch size) on synthetic
        scenes: the /predict program, the counterfactual dispatch at each
        S bucket in ``buckets``, and — fast engine with micro-batching on
        — the mixed-scene stacked-cache dispatch at each scene bucket up
        to max(buckets). On TPU the first compile per shape costs tens of
        seconds; paying all of them at startup (under the persistent XLA
        compilation cache) keeps the first real requests at steady-state
        latency. Programs are additionally keyed by the BUCKETED
        visible-patch count (fast_vmae.sfx_bucket: prompt sizes 1-4 share
        the width-4 program, 5-8 the width-8, 9-16 the width-16, ...):
        ``active_counts`` lists one prompt size per bucket to warm (k
        total distinct prompt patches -> n_vis = n_patches//2 + k for the
        plain service; the split between active and passive does not
        change the program, only the union count's bucket does). The
        default (1, 5, 9) warms buckets 4/8/16, so ANY click count from
        1 to 16 hits an already-compiled program; prompts in an un-warmed
        bucket pay one compile on first use (then cached persistently).

        Service counters are restored and the prefix caches cleared
        afterwards (``_req_counter`` resets, so request numerics match an
        un-warmed server). Returns [(route, batch_size, seconds), ...].
        """
        import time
        import numpy as np
        g = self.img_size
        yy, xx = np.meshgrid(np.linspace(0., 1., g, dtype=np.float32),
                             np.linspace(0., 1., g, dtype=np.float32),
                             indexing='ij')

        def synth(i):
            base = (yy * (i + 1) + xx) % 1.0
            return np.stack([base, 0.25 + 0.5 * base, 1.0 - base],
                            -1).round(3).tolist()

        saved = self._snapshot_counters()
        warmed = []

        def run(route, batch, fn):
            if log:
                log(f'warmup {route} batch={batch}: compiling...')
            t0 = time.perf_counter()
            try:
                fn()
            except Exception as e:   # warmup must not kill startup
                if log:
                    log(f'warmup {route} batch={batch} SKIPPED: '
                        f'{type(e).__name__}: {e}')
                return
            dt = time.perf_counter() - t0
            warmed.append((route, int(batch), round(dt, 3)))
            if log:
                log(f'warmup {route} batch={batch}: {dt:.1f}s')

        img0 = synth(0)
        run('predict', 1,
            lambda: self.predict({'image': img0, 'active': [[0, 0]]}))
        for b in buckets:
            for k in active_counts:
                # distinct patch coords (duplicates would shrink the
                # union count below k and warm the wrong bucket)
                req = {'image': img0,
                       'active': [[j // 4, j % 4]
                                  for j in range(int(k))],
                       'shift': [0, 1], 'num_samples': int(b)}
                run(f'counterfactual[{self.engine}]', b,
                    lambda req=req: self.counterfactual(dict(req)))
        if (self.engine == 'fast' and self._batcher is not None
                and self._mixed_warm_ready()):
            # mixed-scene dispatches only arise from >=2 merged items, so
            # their programs are keyed by scene buckets >= 2
            for sb in [s for s in self._scene_buckets()
                       if 2 <= s <= max(max(buckets), 2)]:
                items = []
                for i in range(int(sb)):
                    x, a, p, shift, _ = self._parse_cf_request(
                        {'image': synth(i), 'active': [[1, 2]],
                         'shift': [0, 1], 'num_samples': 1})
                    items.append((x, a, p, shift, 1))
                n_vis = int((~(items[0][1] & items[0][2])).sum())
                run('mixed-scene', sb,
                    lambda it=items, nv=n_vis:
                        self._warm_mixed_dispatch(nv, it))
        self._restore_counters(saved)
        self._clear_prefix_state()
        return warmed


class ImuCwmService(CwmService):
    """Serving surface over the IMU-conditioned movability predictor.

    /counterfactual routes through the generator API (with engine='fast'
    the conjoined shared-prefix engine + ConjoinedPrefixLru engage inside
    pipelines/imu.py); /movability runs the full iterated sampling loop.
    The IMU context is the predicted static-scene embedding
    (static_head_motion=True, reference segmentation.py:873-877)."""

    @property
    def prefix_hits(self):
        lru = getattr(self.G, '_conj_prefix_lru', None)
        return lru.hits if lru else 0

    @property
    def prefix_misses(self):
        lru = getattr(self.G, '_conj_prefix_lru', None)
        return lru.misses if lru else 0

    def _static_imu_for(self, x):
        """Image-hash-keyed cache of the predicted static-scene IMU: the
        flow2imu forward + RAFT preprocessing is scene-constant, so repeat
        requests (and every movability iteration) must not re-pay it —
        same pattern as the prefix LRU."""
        import collections
        import hashlib
        import numpy as np
        import jax.numpy as jnp
        if not hasattr(self, '_imu_cache'):
            self._imu_cache = collections.OrderedDict()
        a = np.asarray(x)
        key = hashlib.sha1(
            repr((a.shape, a.dtype.str)).encode() + a.tobytes()).hexdigest()
        if key in self._imu_cache:
            self._imu_cache.move_to_end(key)
            return self._imu_cache[key]
        video = jnp.broadcast_to(x[:, None], (1, 2, *x.shape[1:]))
        h = self.G.get_static_imu(video)
        self._imu_cache[key] = h
        if len(self._imu_cache) > self.prefix_cache_size:
            self._imu_cache.popitem(last=False)
        return h

    def _imu_n_vis(self, active, passive):
        """The generator's internal rectangularizer target for ONE prompt
        column (segmentation._n_vis_target) — the batch key, so merged
        columns share the same static visible count as their serial runs."""
        import numpy as np
        p, a = np.asarray(passive), np.asarray(active)
        npf = p.shape[1] // self.G.sequence_length
        vis_f0 = (~p[:, :npf] | ~a[:, :npf]).sum()
        vis_f1 = ((~p[:, npf:] & a[:, npf:]) | ~a[:, npf:]).sum()
        return int(vis_f0 + vis_f1)

    def _dispatch_cf_batch(self, key, items):
        """IMU route: all-same-image batches take the public-API
        S-dispatch; mixed images merge via stacked conjoined caches
        (engine='fast' only), chunked under max_scene_batch."""
        import numpy as np
        _, n_vis = key
        imgs = [np.asarray(x) for (x, *_r) in items]
        same = all(i.shape == imgs[0].shape and (i == imgs[0]).all()
                   for i in imgs[1:])
        if same:
            return self._dispatch_imu_scene(items)
        if self.engine != 'fast' or not self._imu_fast_ready():
            # no stacked-cache route: serve per image, preserving order
            out, group = [], [items[0]]
            for it in items[1:]:
                a = np.asarray(it[0])
                g0 = np.asarray(group[0][0])
                if a.shape == g0.shape and (a == g0).all():
                    group.append(it)
                else:
                    out.extend(self._dispatch_imu_scene(group))
                    group = [it]
            out.extend(self._dispatch_imu_scene(group))
            return out
        out, chunk, cnt = [], [], 0
        for it in items:
            s = it[4]
            if chunk and cnt + s > self.max_scene_batch:
                out.extend(self._dispatch_imu_chunk(n_vis, chunk))
                chunk, cnt = [], 0
            chunk.append(it)
            cnt += s
        if chunk:
            out.extend(self._dispatch_imu_chunk(n_vis, chunk))
        return out

    def _imu_fast_ready(self):
        """True when the conjoined shared-prefix engine supports the
        model (fast_conjoined.conjoined_fast_supported)."""
        from counterfactualworldmodels_tpu.models.fast_conjoined import (
            conjoined_fast_supported)
        return (not getattr(self.G, '_fast_disabled', False)
                and conjoined_fast_supported(self.G.predictor.model))

    def _clear_prefix_state(self):
        super()._clear_prefix_state()
        if hasattr(self, '_imu_cache'):
            self._imu_cache.clear()

    def _mixed_warm_ready(self):
        return self._imu_fast_ready()

    def _warm_mixed_dispatch(self, n_vis, items):
        return self._dispatch_imu_multi_scene(n_vis, items)

    def _dispatch_imu_chunk(self, n_vis, items):
        import numpy as np
        imgs = [np.asarray(x) for (x, *_r) in items]
        if len(items) == 1 or all(
                i.shape == imgs[0].shape and (i == imgs[0]).all()
                for i in imgs[1:]):
            return self._dispatch_imu_scene(items)
        return self._dispatch_imu_multi_scene(n_vis, items)

    def _dispatch_imu_multi_scene(self, n_vis, items):
        """ONE fused conjoined dispatch for concurrent IMU-conditioned
        prompts on DIFFERENT images: per-sample (scene, IMU) pairs +
        stacked conjoined caches (fast_conjoined.
        stack_conjoined_prefix_caches); RAFT per-sample."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from counterfactualworldmodels_tpu.models.fast_conjoined import (
            resolve_two_source, stack_conjoined_prefix_caches)
        from counterfactualworldmodels_tpu.pipelines.imu import (
            _imu_counterfactual_multi_step_fast)
        from counterfactualworldmodels_tpu.utils.batching import (
            pad_to_bucket)
        G = self.G
        counts = [s for (_, _, _, _, s) in items]
        s_total = sum(counts)
        s_pad = pad_to_bucket(s_total, self._scene_buckets())
        assert s_pad >= s_total, (s_pad, s_total)
        rows = []                       # per-sample (x, act, pas, shift)
        for (x, a, p, shift, s) in items:
            rows.extend([(x, a[0], p[0], shift)] * s)
        rows.extend([rows[-1]] * (s_pad - s_total))
        act = np.stack([r[1] for r in rows])
        pas = np.stack([r[2] for r in rows])
        shf = np.asarray([r[3] for r in rows], np.int32)
        with self.lock:
            self._req_counter += 1
            keys = jax.random.split(
                jax.random.PRNGKey(self.seed + self._req_counter), s_total)
            if s_pad > s_total:
                keys = jnp.concatenate(
                    [keys, jnp.repeat(keys[-1:], s_pad - s_total, 0)], 0)
            G._ensure_conj_fast()
            # one static-IMU + conjoined-LRU probe per distinct request
            # (both sha1 the full image), expanded to its samples
            caches, ctxs = [], []
            for (x_i, *_r), s in zip(items, counts):
                video = jnp.broadcast_to(x_i[:, None],
                                         (1, 2, *x_i.shape[1:]))
                ctx = G.reshape_output(self._static_imu_for(x_i))
                cache, _ = G._conj_prefix_lru.get(video, ctx)
                caches.extend([cache] * s)
                ctxs.extend([ctx] * s)
            caches.extend([caches[-1]] * (s_pad - s_total))
            ctxs.extend([ctxs[-1]] * (s_pad - s_total))
            stacked = stack_conjoined_prefix_caches(caches)
            xs = jnp.concatenate(
                [jnp.broadcast_to(r[0][:, None], (1, 2, *r[0].shape[1:]))
                 for r in rows])
            x_context = jnp.concatenate(ctxs)
            mask_context = jnp.zeros(
                (s_pad, self.G.num_head_tokens), dtype=bool)
            use_flash = G._use_flash
            ys, flows, _ = _imu_counterfactual_multi_step_fast(
                G.predictor, G._conj_params, G.flow_model, G.flow_params,
                xs, jnp.asarray(pas), jnp.asarray(act), jnp.asarray(shf),
                keys, x_context, mask_context, n_vis,
                G.imagenet_normalize_inputs, G.raft_iters, use_flash,
                resolve_two_source(use_flash), stacked)
            self.scene_batches += 1
            out, off = [], 0
            for s in counts:
                fl = flows[off:off + s]          # [s, 1, 2, H, W]
                flows_s = jnp.moveaxis(fl[:, 0], 0, -1)[None]
                seg = G.compute_mean_motion_map(flows_s)[0, 0]
                out.append(self._cf_response(
                    np.asarray(ys[off, 1], np.float32).transpose(1, 2, 0),
                    fl[0, 0], seg, engine=self.engine, imu_conditioned=True,
                    batched_samples=s_pad, scene_batched=len(items)))
                off += s
        return out

    def _dispatch_imu_scene(self, items):
        """One generator call for a batch of same-scene IMU-conditioned
        requests: prompt columns concatenate along the S axis of the
        public API (per-sample active/passive/shift), which routes through
        the conjoined shared-prefix engine + ConjoinedPrefixLru when
        engine='fast'. items as in CwmService._dispatch_same_scene."""
        import numpy as np
        import jax.numpy as jnp
        from counterfactualworldmodels_tpu.utils.batching import (
            pad_to_bucket)
        G = self.G
        x = items[0][0]
        counts = [s for (_, _, _, _, s) in items]
        s_total = sum(counts)
        s_pad = (s_total if self._batcher is None
                 else pad_to_bucket(s_total, self._s_buckets))
        # cap + sample-weighted batching guarantee one padded dispatch
        assert s_pad >= s_total, (s_pad, s_total)
        act = np.concatenate(
            [np.repeat(a[..., None], s, axis=-1)
             for (_, a, _, _, s) in items], axis=-1)
        pas = np.concatenate(
            [np.repeat(p[..., None], s, axis=-1)
             for (_, _, p, _, s) in items], axis=-1)
        shifts = []
        for (_, _, _, shift, s) in items:
            shifts.extend([tuple(shift)] * s)
        if s_pad > s_total:                      # repeat the last column
            act = np.concatenate(
                [act, np.repeat(act[..., -1:], s_pad - s_total, -1)], -1)
            pas = np.concatenate(
                [pas, np.repeat(pas[..., -1:], s_pad - s_total, -1)], -1)
            shifts.extend([shifts[-1]] * (s_pad - s_total))
        with self.lock:
            self._req_counter += 1
            head = self._static_imu_for(x)
            ys, flows = G.predict_counterfactual_videos_and_flows(
                x, active_patches=jnp.asarray(act),
                passive_patches=jnp.asarray(pas), shifts=shifts,
                num_samples=s_pad, sample_batch_size=s_pad,
                head_motion=head)
            out, off = [], 0
            for s in counts:
                fl = flows[off:off + s]          # [s, 1, 2, H, W]
                flows_s = jnp.moveaxis(fl[:, 0], 0, -1)[None]
                seg = G.compute_mean_motion_map(flows_s)[0, 0]
                out.append(self._cf_response(
                    np.asarray(ys[off, 1], np.float32).transpose(1, 2, 0),
                    fl[0, 0], seg, engine=self.engine, imu_conditioned=True,
                    batched_samples=s_pad))
                off += s
        return out

    def counterfactual(self, req):
        import numpy as np
        import jax.numpy as jnp
        self._sync_generator_degrade()
        # parse/validate BEFORE the engine-degrade try (bad request -> 400)
        x, active, passive_np, shift, s = self._parse_cf_request(req)
        G = self.G
        if self._batcher is not None:
            item = (x, active, passive_np, shift, s)
            n_vis = self._imu_n_vis(active, passive_np)
            if self.engine == 'fast':
                try:
                    out = self._batcher.run(('imu', n_vis), item)
                    self._sync_generator_degrade()
                    return out
                except Exception as e:
                    # only the direct stacked-cache route can raise here
                    # (the generator API degrades internally); retry on
                    # the exact routing
                    self._degrade_to_exact(e)
            return self._batcher.run(('imu', n_vis), item)
        passive = jnp.asarray(passive_np) if req.get('passive') else None
        with self.lock:
            self._req_counter += 1
            head = self._static_imu_for(x)
            ys, flows = G.predict_counterfactual_videos_and_flows(
                x, active_patches=jnp.asarray(active),
                passive_patches=passive, shifts=[tuple(shift)] * s,
                num_samples=s, sample_batch_size=s, head_motion=head)
            seg = G.compute_mean_motion_map(G._batch_to_samples(flows))[0, 0]
            return self._cf_response(
                np.asarray(ys[0, 1], np.float32).transpose(1, 2, 0),
                flows[0, 0], seg, engine=self.engine, imu_conditioned=True)

    def movability(self, req):
        """{image, iters?} -> movability map (reference
        movability.py:299-360 loop over IMU-conditioned counterfactuals)."""
        import numpy as np
        import jax.numpy as jnp
        self._sync_generator_degrade()
        x = self._parse_image(req)
        with self.lock:
            self._req_counter += 1
            head = self._static_imu_for(x)
            video = jnp.broadcast_to(x[:, None], (1, 2, *x.shape[1:]))
            out = self.G(video, head_motion=head,
                         num_iters=req.get('iters'))
            m = np.asarray(out[0, 0], np.float32)
        rng = float(m.max() - m.min())
        return {'movability': _png_b64((m - m.min()) / max(rng, 1e-6)),
                'movability_raw': np.round(m, 4).tolist(),
                'engine': self.engine}


def make_handler(service, backend):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):
            print('%s - %s' % (self.address_string(), fmt % a))

        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/health':
                self._send(200, {'status': 'ok', 'backend': backend})
            elif self.path == '/stats':
                b = service._batcher
                self._send(200, {
                    'engine': service.engine,
                    'requests': service._req_counter,
                    'prefix_cache': {'hits': service.prefix_hits,
                                     'misses': service.prefix_misses,
                                     'size': service.prefix_cache_size},
                    'micro_batching': (
                        None if b is None else
                        {'dispatches': b.batches,
                         'requests_batched': b.batched_items,
                         'scene_batches': service.scene_batches,
                         'window_ms': round(b.window_s * 1e3, 2)})})
            else:
                self._send(404, {'error': f'unknown path {self.path}'})

        def do_POST(self):
            try:
                length = int(self.headers.get('Content-Length', 0))
                req = json.loads(self.rfile.read(length) or b'{}')
            except (ValueError, json.JSONDecodeError) as e:
                return self._send(400, {'error': f'bad JSON: {e}'})
            try:
                if self.path == '/predict':
                    self._send(200, service.predict(req))
                elif self.path == '/counterfactual':
                    self._send(200, service.counterfactual(req))
                elif (self.path == '/movability'
                        and hasattr(service, 'movability')):
                    self._send(200, service.movability(req))
                else:
                    self._send(404, {'error': f'unknown path {self.path}'})
            except (ValueError, KeyError) as e:
                self._send(400, {'error': str(e)})
            except Exception as e:  # noqa: BLE001 - surface to the client
                self._send(500, {'error': f'{type(e).__name__}: {e}'})
    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='base',
                    choices=['tiny', 'base', 'large'])
    ap.add_argument('--img-size', type=int, default=224)
    ap.add_argument('--params', default=None, help='orbax checkpoint dir')
    ap.add_argument('--raft-params', default=None)
    ap.add_argument('--raft-iters', type=int, default=24)
    ap.add_argument('--imu-conditioned', action='store_true',
                    help='serve the IMU-conditioned movability pipeline '
                         '(the reference flagship demo): conjoined imu400 '
                         'predictor + flow2imu head-motion model; adds the '
                         '/movability endpoint')
    ap.add_argument('--flow2imu-params', default=None,
                    help='orbax checkpoint dir for the flow2imu model '
                         '(--imu-conditioned only)')
    ap.add_argument('--movability-samples', type=int, default=16)
    ap.add_argument('--movability-iters', type=int, default=2)
    ap.add_argument('--port', type=int, default=8731)
    ap.add_argument('--host', default='127.0.0.1')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--prefix-cache-size', type=int, default=4,
                    help='PrefixCache LRU entries (each pins the per-layer '
                         'prefix KV of one image in device memory)')
    ap.add_argument('--batch-window-ms', type=float, default=5.0,
                    help='micro-batch window: concurrent counterfactual '
                         'requests sharing n_vis within this window merge '
                         'into one dispatch — same-scene along the S axis, '
                         'mixed scenes via stacked per-sample prefix '
                         'caches (fast engine only; 0 disables)')
    ap.add_argument('--max-batch-samples', type=int, default=64,
                    help='max total samples per micro-batched dispatch')
    ap.add_argument('--max-scene-batch', type=int, default=8,
                    help='max samples per MIXED-scene dispatch (each '
                         'sample pins its own prefix KV, ~0.3 GB at '
                         'ViT-L; larger batches split into chunks)')
    ap.add_argument('--engine', default='fast',
                    choices=['fast', 'exact'],
                    help='fast = shared-prefix engine with a per-image '
                         'PrefixCache LRU. Fidelity vs exact: corr 1.0 at '
                         'random init AND at trained weights (PERF.md; '
                         'prefix isolation is a real modeling change — '
                         'released-checkpoint validation pending egress, '
                         'PARITY_CHECKPOINTS.md). Use --engine exact for '
                         'bit-parity with the reference forward. A fast-'
                         'engine failure at runtime degrades the service '
                         'to exact automatically (one warning).')
    ap.add_argument('--warmup', action='store_true',
                    help='pre-compile the serving programs before binding '
                         'the port: one dispatch per route x batch bucket '
                         'on synthetic scenes (first TPU compile per shape '
                         'is tens of seconds; pay it at startup under the '
                         'persistent XLA cache, not on the first users)')
    ap.add_argument('--warmup-buckets', default='1,4,16',
                    help='comma-separated S buckets to warm (--warmup)')
    ap.add_argument('--warmup-prompt-sizes', default='1,5,9',
                    help='comma-separated prompt patch counts to warm '
                         '(--warmup): programs are keyed by the BUCKETED '
                         'active+passive union count (fast_vmae.sfx_bucket '
                         '4/8/16/...), so one size per bucket suffices — '
                         'the default covers any click count from 1 to 16')
    args = ap.parse_args()

    import jax
    if args.imu_conditioned:
        G = build_imu_generator(args)
        service = ImuCwmService(G, args.img_size, engine=args.engine,
                                prefix_cache_size=args.prefix_cache_size,
                                seed=args.seed,
                                batch_window_ms=args.batch_window_ms,
                                max_batch_samples=args.max_batch_samples,
                                max_scene_batch=args.max_scene_batch)
    else:
        G = build_generator(args)
        service = CwmService(G, args.img_size, engine=args.engine,
                             prefix_cache_size=args.prefix_cache_size,
                             seed=args.seed,
                             batch_window_ms=args.batch_window_ms,
                             max_batch_samples=args.max_batch_samples,
                             max_scene_batch=args.max_scene_batch)
    backend = jax.default_backend()
    if args.warmup:
        buckets = tuple(int(v) for v in args.warmup_buckets.split(',') if v)
        sizes = tuple(int(v) for v in args.warmup_prompt_sizes.split(',')
                      if v)
        print(f'warming up {len(buckets)} buckets x {len(sizes)} prompt '
              f'sizes (backend={backend})...', flush=True)
        warmed = service.warmup(buckets=buckets, active_counts=sizes)
        total = sum(dt for (_, _, dt) in warmed)
        print(f'warmup done: {len(warmed)} programs in {total:.1f}s',
              flush=True)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(service, backend))
    mode = 'imu-conditioned ' if args.imu_conditioned else ''
    print(f'serving {mode}{args.model} @ {args.img_size}px on '
          f'http://{args.host}:{args.port} (backend={backend})', flush=True)
    server.serve_forever()


if __name__ == '__main__':
    main()
