"""RAFT training: supervised flow + keypoint-head distillation, TPU-native.

The reference ships RAFT as inference-only vendored code and downloads
trained weights (cwm/models/raft/download_raft_checkpoints.sh); its
keypoint predictor is "RAFT retrained with output_dim=1"
(cwm/models/raft/raft_model.py:152-159, README.md:78) but the training
that produced it is not published. This module supplies both objectives
the checkpoints imply:

- **flow**: exponentially gamma-weighted L1 over every GRU iteration's
  upsampled flow against ground truth (the weighting semantics of the
  reference's own MaskedSequenceLoss, cwm/models/utils.py:742-757),
  with the standard invalid-pixel / max-flow exclusion.
- **keypoint**: BCE-with-logits distillation of the ``output_dim=1``
  head against a dense target map (e.g. a movability/motion map from the
  counterfactual pipeline — how the released keypoint checkpoint was
  distilled per the paper), on a single repeated image like the
  reference's single-image forward (raft_model.py:287-288).

Ground-truth flow for self-contained training comes from
``synthetic_flow_batch``: smooth random warp fields applied by backward
warping, exact for locally-constant flow (pure translations are exact;
use them for convergence tests).

Everything is a pure function over (params, batch); multi-chip is dp
sharding over the batch with replicated conv params — XLA inserts the
gradient psums from the shardings.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.raft.raft import RAFT
from ..ops.misc import masked_bce_loss, masked_per_pixel_loss, \
    masked_sequence_loss, l1_loss
from .. import parallel
from .train import TrainState


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def raft_sequence_loss(flow_seq, flow_gt, valid=None, gamma: float = 0.8,
                       max_flow: float = 400.0):
    """Gamma-weighted L1 over the iteration sequence.

    flow_seq: [iters, B, 2, H, W] per-iteration upsampled predictions;
    flow_gt: [B, 2, H, W]; valid: optional [B, H, W] bool/float. Pixels
    whose ground-truth magnitude exceeds ``max_flow`` are excluded (the
    standard RAFT-training exclusion of unmatched/occluded labels).
    Weighting follows the reference's MaskedSequenceLoss
    (cwm/models/utils.py:742-757): iteration i of n gets gamma**(n-1-i).
    """
    mag = jnp.sqrt((flow_gt ** 2).sum(1))
    v = (mag < max_flow)
    if valid is not None:
        v = v & (valid > 0.5)
    v = v[:, None].astype(flow_gt.dtype)  # [B, 1, H, W]
    seq = [flow_seq[i] for i in range(flow_seq.shape[0])]
    return masked_sequence_loss(
        seq, flow_gt, v, gamma=gamma,
        loss_func=functools.partial(masked_per_pixel_loss, loss_fn=l1_loss))


def end_point_error(flow_pred, flow_gt, valid=None):
    """Mean per-image L2 flow error over valid pixels (per-sample
    normalization, so the metric decomposes linearly over microbatches —
    gradient accumulation reports the same value as the full batch).
    flow_*: [B, 2, H, W]."""
    epe = jnp.sqrt(((flow_pred - flow_gt) ** 2).sum(1))
    if valid is None:
        return epe.mean()
    v = valid.astype(epe.dtype)
    per = (epe * v).sum((-2, -1)) / jnp.clip(v.sum((-2, -1)), min=1)
    return per.mean()


def raft_flow_loss(model: RAFT, params, image1, image2, flow_gt,
                   valid=None, gamma: float = 0.8, max_flow: float = 400.0,
                   iters: Optional[int] = None):
    """Sequence loss + final-iteration EPE for one batch.

    image1/image2: [B, 3, H, W] in [0, 255] (the model's own input
    convention); flow_gt [B, 2, H, W] in pixels, channel 0 = x.
    """
    _, flow_up, flow_seq = model.apply({'params': params}, image1, image2,
                                       iters, True)
    loss = raft_sequence_loss(flow_seq, flow_gt, valid, gamma, max_flow)
    epe = end_point_error(flow_up, flow_gt, valid)
    return loss, epe


def keypoint_distill_loss(model: RAFT, params, image, target,
                          iters: Optional[int] = None):
    """BCE-with-logits of the output_dim=1 head against a dense [0, 1]
    target map. image [B, 3, H, W] in [0, 255]; target [B, 1, H, W].
    The image is fed as both frames, matching the reference's
    single-image keypoint forward (raft_model.py:287-288)."""
    _, logits = model.apply({'params': params}, image, image, iters)
    ones = jnp.ones_like(target)
    return masked_bce_loss(logits, target, ones, with_logits=True).mean()


# ---------------------------------------------------------------------------
# train steps
# ---------------------------------------------------------------------------

def make_raft_train_step(model: RAFT, optimizer, gamma: float = 0.8,
                         max_flow: float = 400.0,
                         iters: Optional[int] = None, remat: bool = True,
                         accum_steps: int = 1):
    """Returns train_step(state, image1, image2, flow_gt, valid)
    -> (state, {'loss', 'epe', 'grad_norm'}); accum_steps > 1
    scan-accumulates microbatch gradients in-program."""
    # The Pallas corr-lookup kernels (TPU inference default) define no
    # VJP; training must run the pure-jnp gather formulation.
    if model.corr_lookup is None:
        model = model.clone(corr_lookup='gather')

    def loss_fn(params, image1, image2, flow_gt, valid):
        return raft_flow_loss(model, params, image1, image2, flow_gt,
                              valid, gamma, max_flow, iters)
    if remat:
        loss_fn = jax.checkpoint(loss_fn)

    def train_step(state: TrainState, image1, image2, flow_gt, valid):
        if accum_steps > 1:
            from .train import accumulated_grads
            loss, epe, grads = accumulated_grads(
                loss_fn, state.params, accum_steps,
                image1, image2, flow_gt, valid, has_aux=True)
        else:
            (loss, epe), grads = jax.value_and_grad(
                lambda p: loss_fn(p, image1, image2, flow_gt, valid),
                has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(state.step + 1, params, opt_state),
                {'loss': loss, 'epe': epe,
                 'grad_norm': optax.global_norm(grads)})

    return train_step


def make_keypoint_distill_step(model: RAFT, optimizer,
                               iters: Optional[int] = None,
                               remat: bool = True):
    """Returns train_step(state, image, target) for the output_dim=1
    keypoint head (``model.output_dim`` must be set)."""
    assert model.output_dim is not None, \
        'keypoint distillation needs a RAFT built with output_dim'
    if model.corr_lookup is None:  # Pallas lookups have no VJP (see above)
        model = model.clone(corr_lookup='gather')

    def loss_fn(params, image, target):
        return keypoint_distill_loss(model, params, image, target, iters)
    if remat:
        loss_fn = jax.checkpoint(loss_fn)

    def train_step(state: TrainState, image, target):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, image, target))(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(state.step + 1, params, opt_state),
                {'loss': loss, 'grad_norm': optax.global_norm(grads)})

    return train_step


def init_raft_train_state(model: RAFT, optimizer, key=None,
                          hw: int = 64) -> TrainState:
    from ..models.raft.raft import init_raft_params
    params = init_raft_params(model, key, hw=hw)
    return TrainState(jnp.zeros((), jnp.int32), params,
                      optimizer.init(params))


def make_sharded_raft_train_step(model: RAFT, optimizer, mesh: Mesh,
                                 keypoint: bool = False, **step_kwargs):
    """dp-sharded RAFT training: the batch shards over 'dp', the conv
    parameters replicate (RAFT has no tensor-parallel axis worth cutting
    — its matmuls are convolutions over small channel dims), and XLA
    inserts the gradient psum from the shardings.

    Returns (jitted_step, shard_state, data_sharding); the step has the
    same signature as the unsharded one.
    """
    step_fn = (make_keypoint_distill_step(model, optimizer, **step_kwargs)
               if keypoint else
               make_raft_train_step(model, optimizer, **step_kwargs))
    data_sharding = NamedSharding(mesh, P('dp'))
    repl = NamedSharding(mesh, P())

    def shard_state(state: TrainState) -> TrainState:
        p_sh = parallel.replicate(state.params, mesh)
        params = jax.tree_util.tree_map(jax.device_put, state.params, p_sh)
        o_sh = parallel.opt_state_shardings(state.opt_state, p_sh, mesh)
        opt_state = jax.tree_util.tree_map(jax.device_put, state.opt_state,
                                           o_sh)
        return TrainState(jax.device_put(state.step, repl), params,
                          opt_state)

    jitted = jax.jit(step_fn, donate_argnums=(0,))
    return jitted, shard_state, data_sharding


# ---------------------------------------------------------------------------
# synthetic ground-truth flow
# ---------------------------------------------------------------------------

def synthetic_flow_batch(key, images, cells: int = 4, max_mag: float = 8.0,
                         translation_only: bool = False):
    """Build (image1, image2, flow_gt, valid) from a batch of images.

    images: [B, 3, H, W] in [0, 255]. A smooth random field g (bilinear
    upsampling of a [cells, cells] grid of uniform draws in
    [-max_mag, max_mag]) defines image2 by backward warping
    image2(y) = image1(y - g(y)); the ground-truth forward flow is then
    g itself, exact where g is locally constant (everywhere, when
    ``translation_only`` draws one vector per image). ``valid`` marks
    pixels whose warp source stayed inside the frame.
    """
    b, _, h, w = images.shape
    if translation_only:
        vec = jax.random.uniform(key, (b, 2, 1, 1), minval=-max_mag,
                                 maxval=max_mag)
        flow = jnp.broadcast_to(vec, (b, 2, h, w))
    else:
        low = jax.random.uniform(key, (b, 2, cells, cells),
                                 minval=-max_mag, maxval=max_mag)
        flow = jax.image.resize(low, (b, 2, h, w), 'bilinear')

    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')

    def warp_one(img, f):
        cy = yy - f[1]
        cx = xx - f[0]
        out = jax.vmap(lambda ch: jax.scipy.ndimage.map_coordinates(
            ch, [cy, cx], order=1, mode='nearest'))(img)
        valid = ((cy >= 0) & (cy <= h - 1) & (cx >= 0) & (cx <= w - 1))
        return out, valid

    image2, valid = jax.vmap(warp_one)(images, flow)
    return images, image2, flow, valid
