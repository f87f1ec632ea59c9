"""Iterative patch selection for Spelke-segment growing.

The reference interface exposes a ``patch_selector`` hook (interface.py:
117-120, 644-677) whose algorithm is not included in the reference repo.
This provides a working default: starting from user-selected active patches,
alternately (a) sample motion counterfactuals and (b) extend the active set
with the highest-affinity patch (and the passive set with the
lowest-affinity patch), where affinity is the normalized mean counterfactual
flow magnitude — the same statistic the movability estimator uses
(segmentation.py:257-276).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class IterativePatchSelector:
    """Grow active/passive patch sets from counterfactual flow agreement.

    Call signature matches the interface hook:
    ``selector(x, init_actives=..., init_passives=...) ->
    (flow_samples [B,2,H,W,S], actives [B,N,S], passives [B,N,S])``.
    """

    def __init__(self, generator, num_iters: int = 3,
                 samples_per_iter: int = 4, num_passive: int = 1,
                 sample_batch_size: int = 8, affinity_power: float = 1.0,
                 do_filter: bool = True):
        self.G = generator
        self.num_iters = num_iters
        self.samples_per_iter = samples_per_iter
        self.num_passive = num_passive
        self.sample_batch_size = sample_batch_size
        self.affinity_power = affinity_power
        self.do_filter = do_filter
        self.filter_masks = None

    def compute_affinity_targets_from_samples(self, flow_samples):
        """flow_samples [B, 2, H, W, S] -> (affinity [B, H, W], mags, mask).

        Affinity = minmax-normalized mean flow magnitude over samples.
        """
        mags = jnp.sqrt((flow_samples ** 2).sum(1))   # [B,H,W,S]
        mean = mags.mean(-1)
        mn = mean.min((-2, -1), keepdims=True)
        mx = mean.max((-2, -1), keepdims=True)
        aff = (mean - mn) / jnp.clip(mx - mn, min=1e-6)
        return aff ** self.affinity_power, mags, None

    def _patch_pool(self, aff):
        """Pixel affinity [B,H,W] -> patch-grid affinity [B,h,w]."""
        ph, pw = self.G.patch_size[-2:]
        b, h, w = aff.shape
        return aff.reshape(b, h // ph, ph, w // pw, pw).mean((2, 4))

    def __call__(self, x, init_actives=None, init_passives=None,
                 make_static=True, **kwargs):
        x = jnp.asarray(x)
        if x.ndim == 4:
            x = x[:, None]
        if x.shape[1] == 1:
            x = jnp.broadcast_to(x, (x.shape[0], 2, *x.shape[2:]))
        elif make_static:
            # counterfactuals probe motion FROM a static scene: replace
            # every frame with frame 0 (the flag was previously ignored
            # for real multi-frame movies)
            x = jnp.broadcast_to(x[:, 0:1], x.shape)
        self.G.set_input(x)
        b = x.shape[0]
        t_grid, gh, gw = self.G.mask_shape
        n_per = gh * gw

        actives = (jnp.asarray(init_actives) if init_actives is not None
                   else self.G.get_zeros_mask())
        passives = (jnp.asarray(init_passives) if init_passives is not None
                    else self.G.get_zeros_mask())
        actives = actives.reshape(b, -1)
        passives = passives.reshape(b, -1)

        all_flows = []
        actives_per_iter = [actives]
        passives_per_iter = [passives]
        filter_masks = []
        for it in range(self.num_iters):
            ys, flows = self.G.predict_counterfactual_videos_and_flows(
                x, active_patches=actives, passive_patches=passives,
                num_samples=self.samples_per_iter,
                sample_batch_size=self.sample_batch_size, fix_passive=True,
                **kwargs)
            flows_s = self.G._batch_to_samples(flows)
            if self.do_filter and self.G.flow_sample_filter is not None:
                a_tiled = jnp.tile(actives[..., None],
                                   (1, 1, flows_s.shape[-1]))
                flows_s, fmask = self.G.flow_sample_filter(flows_s, a_tiled)
                filter_masks.append(fmask)
            all_flows.append(flows_s)

            aff, _, _ = self.compute_affinity_targets_from_samples(
                jnp.concatenate(all_flows, -1))
            patch_aff = self._patch_pool(aff).reshape(b, n_per)

            # grow: next active = strongest non-active patch; next passive =
            # weakest patch outside both sets
            a_f1 = actives.reshape(b, t_grid, n_per)[:, -1]
            p_f1 = passives.reshape(b, t_grid, n_per)[:, -1]
            taken = (~a_f1) | (~p_f1)
            grow = jnp.where(taken, -jnp.inf, patch_aff).argmax(-1)
            shrink_scores = jnp.where(taken, jnp.inf, patch_aff)
            shrink_scores = shrink_scores.at[jnp.arange(b), grow].set(jnp.inf)
            shrink = shrink_scores.argmin(-1)

            a_new = np.asarray(actives).reshape(b, t_grid, n_per).copy()
            p_new = np.asarray(passives).reshape(b, t_grid, n_per).copy()
            for bi in range(b):
                a_new[bi, -1, int(grow[bi])] = False
                if self.num_passive > 0:
                    p_new[bi, -1, int(shrink[bi])] = False
            actives = jnp.asarray(a_new.reshape(b, -1))
            passives = jnp.asarray(p_new.reshape(b, -1))
            actives_per_iter.append(actives)
            passives_per_iter.append(passives)

        self.filter_masks = (jnp.concatenate(filter_masks, -1)
                             if filter_masks else
                             jnp.zeros((b, 0), dtype=bool))
        flow_samples = jnp.concatenate(all_flows, -1)
        return (flow_samples,
                jnp.stack(actives_per_iter, -1),
                jnp.stack(passives_per_iter, -1))
