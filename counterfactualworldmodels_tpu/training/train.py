"""VMAE masked-prediction pretraining, multi-chip via pjit shardings.

The reference publishes no training code (README.md:85 "Coming Soon"); this
module supplies the TPU-native training loop its checkpoints imply: the
temporally-factored masking policy (masking.py:478-545 semantics), MSE on
masked patch pixels against the (optionally per-patch-normalized) target
(the VideoMAE objective the reference's get_masked_targets supports,
vmae.py:483-537), AdamW, and dp x tp sharding with XLA-inserted collectives.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..masking.generators import rotated_table_uniform_mask
from ..models.vmae import PretrainVisionTransformer, mask_order, take_tokens
from ..ops.normalization import imagenet_normalize
from ..ops.patches import patchify
from .. import parallel


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_optimizer(learning_rate=1.5e-4, weight_decay=0.05,
                   warmup_steps=1000, total_steps=100_000,
                   b1=0.9, b2=0.95, clip_norm=1.0, mu_dtype=None):
    """mu_dtype: dtype of Adam's first moment (e.g. jnp.bfloat16 halves
    that buffer's HBM; the second moment and params stay f32 — the
    optax-recommended mixed-precision Adam layout)."""
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1))
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay,
                    mu_dtype=mu_dtype))


def apply_remat(loss_fn, remat):
    """Rematerialization ladder for a loss function.

    False: save everything (fastest when activations fit HBM).
    True/'full': jax.checkpoint over the whole loss — minimum memory,
    recomputes the entire forward during the backward (~+1/3 FLOPs).
    'dots': policy remat — matmul/attention OUTPUTS are saved, only the
    cheap elementwise/norm ops recompute: near-no-remat speed at a
    fraction of no-remat's activation memory (the MXU results that
    dominate HBM in a ViT are exactly what the backward needs anyway).
    """
    if not remat:
        return loss_fn
    if remat in (True, 'full'):
        return jax.checkpoint(loss_fn)
    if remat == 'dots':
        return jax.checkpoint(
            loss_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    raise ValueError(f'remat must be False, True/"full", or "dots": {remat}')


def masked_prediction_loss(model: PretrainVisionTransformer, params, x, mask,
                           n_vis: int, normalize_inputs: bool = True,
                           normalize_targets: bool = True,
                           eps: float = 1e-6):
    """MSE on masked patch pixels. x: [B, T, C, H, W] in [0, 1], or raw
    uint8 [B, T, H, W, C] loader batches (out_dtype='u8'): the normalize
    + layout transpose then run INSIDE the jitted step, where XLA fuses
    them into the patch embed — the host moves 4x fewer bytes."""
    if x.dtype == jnp.uint8:
        from ..data.shards import u8_to_chw_01
        x = u8_to_chw_01(x)
    xm = imagenet_normalize(x, temporal_dim=1) if normalize_inputs else x
    pred = model.apply({'params': params}, jnp.swapaxes(xm, 1, 2), mask,
                       n_vis)
    target = patchify(xm, model.full_patch_size, temporal_dim=1)
    if normalize_targets:
        mean = target.mean(-1, keepdims=True)
        var = target.var(-1, keepdims=True)
        target = (target - mean) / jnp.sqrt(var + eps)
    order = mask_order(mask)
    target_masked = take_tokens(target, order[:, n_vis:])
    return ((pred - target_masked) ** 2).mean()


def accumulated_grads(loss_fn, params, accum_steps: int, *batch_args,
                      has_aux: bool = False):
    """Gradient accumulation over ``accum_steps`` equal microbatches.

    loss_fn(params, *microbatch) -> scalar (or (scalar, aux) with
    ``has_aux``, aux a scalar); every array in ``batch_args`` splits on
    its leading axis. Microbatch gradients are scan-accumulated
    in-program (one dispatch, peak activation memory of ONE microbatch)
    and averaged — for mean-type losses over equal microbatches this
    equals the full-batch gradient exactly (up to float associativity).
    Returns (loss, aux, grads), loss/aux averaged over microbatches.
    """
    assert accum_steps >= 1

    def split(a):
        b = a.shape[0]
        assert b % accum_steps == 0, (a.shape, accum_steps)
        return a.reshape(accum_steps, b // accum_steps, *a.shape[1:])

    micro = tuple(split(jnp.asarray(a)) for a in batch_args)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=has_aux)

    def body(carry, mb):
        loss_acc, aux_acc, g_acc = carry
        out, grads = grad_fn(params, *mb)
        loss, aux = out if has_aux else (out, 0.0)
        g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
        return (loss_acc + loss, aux_acc + aux, g_acc), None

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    (loss_sum, aux_sum, g_sum), _ = jax.lax.scan(
        body, (jnp.zeros(()), jnp.zeros(()), zeros), micro)
    grads = jax.tree_util.tree_map(lambda g: g / accum_steps, g_sum)
    return (loss_sum / accum_steps,
            (aux_sum / accum_steps if has_aux else None), grads)


def make_train_step(model: PretrainVisionTransformer, optimizer,
                    n_vis: int, normalize_inputs: bool = True,
                    normalize_targets: bool = True, remat: bool = True,
                    mask_fn=None, accum_steps: int = 1):
    """Returns a pure train_step(state, x, mask) -> (state, metrics).

    mask_fn: optional ``(key, batch_size) -> bool [B, N]`` mask sampler
    (e.g. a partial of ``rotated_table_uniform_mask``). When given, the
    returned step takes a PRNG key in place of a mask and samples the
    mask INSIDE the jitted program: one XLA dispatch per step instead of
    dozens of eager mask ops (each a host round-trip on the axon
    remote-dispatch path) plus a host->device mask transfer.

    accum_steps > 1 splits the batch into that many microbatches and
    scan-accumulates gradients in-program (peak activation memory of one
    microbatch; identical update to the full-batch step for this
    mean loss).
    """
    loss_fn = apply_remat(functools.partial(
        masked_prediction_loss, model,
        n_vis=n_vis, normalize_inputs=normalize_inputs,
        normalize_targets=normalize_targets), remat)

    def train_step(state: TrainState, x, mask):
        if accum_steps > 1:
            loss, _, grads = accumulated_grads(loss_fn, state.params,
                                               accum_steps, x, mask)
        else:
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, x, mask))(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (TrainState(state.step + 1, params, opt_state),
                {'loss': loss, 'grad_norm': gnorm})

    if mask_fn is None:
        return train_step

    def train_step_keyed(state: TrainState, x, key):
        return train_step(state, x, mask_fn(key, x.shape[0]))

    return train_step_keyed


def init_train_state(model: PretrainVisionTransformer, optimizer, key,
                     n_vis: Optional[int] = None) -> TrainState:
    from ..models.vmae import init_params
    params = init_params(model, key, n_vis=n_vis)
    return TrainState(jnp.zeros((), jnp.int32), params,
                      optimizer.init(params))


def make_sharded_train_step(model: PretrainVisionTransformer, optimizer,
                            mesh: Mesh, n_vis: int, remat: bool = True,
                            mask_fn=None, **loss_kwargs):
    """jit the train step with dp sharding on data and tp sharding on
    parameters; XLA inserts the psum/all-gather collectives.

    mask_fn as in make_train_step: step takes (state, x, key) and the
    replicated key yields an identical mask on every dp shard, sliced by
    the data sharding inside the program.

    Returns (jitted_step, shard_state, data_sharding).
    """
    step_fn = make_train_step(model, optimizer, n_vis, remat=remat,
                              mask_fn=mask_fn, **loss_kwargs)
    data_sharding = NamedSharding(mesh, P('dp'))
    repl = NamedSharding(mesh, P())

    def shard_state(state: TrainState) -> TrainState:
        p_sh = parallel.param_shardings(state.params, mesh)
        params = jax.tree_util.tree_map(jax.device_put, state.params, p_sh)
        # adam moments mirror the param tree and take the param shardings;
        # counts/scalars replicate
        o_sh = parallel.opt_state_shardings(state.opt_state, p_sh, mesh)
        opt_state = jax.tree_util.tree_map(jax.device_put, state.opt_state,
                                           o_sh)
        return TrainState(jax.device_put(state.step, repl), params, opt_state)

    jitted = jax.jit(step_fn, donate_argnums=(0,))
    return jitted, shard_state, data_sharding


def make_batch_masks(key, model: PretrainVisionTransformer, batch_size: int,
                     mask_ratio: float = 0.9):
    """Training masks with the rotated-table policy; returns (mask, n_vis)."""
    t, h, w = model.mask_size
    mask = rotated_table_uniform_mask(key, (t, h, w), mask_ratio,
                                      batch_size=batch_size)
    n = model.num_patches
    n_per_frame = n // t
    n_vis = (t - 1) * n_per_frame + (n_per_frame -
                                     int(mask_ratio * n_per_frame))
    return mask, n_vis


def make_cmae_train_step(model, optimizer, n_vis: int,
                         group_masked_counts, remat: bool = True,
                         mask_fn=None, accum_steps: int = 1):
    """Train step for ChannelMae (masked channel-group reconstruction,
    reference cmae.py:526-547 objective). Returns
    train_step(state, x, mask) -> (state, metrics); with mask_fn
    (``(key, batch_size) -> mask``, e.g. a group_uniform_mask partial)
    the step takes a PRNG key and samples the mask in-program
    (see make_train_step)."""
    from ..models.cmae import channel_mae_train_loss

    def loss_fn(params, x, mask):
        return channel_mae_train_loss(model, params, x, mask, n_vis,
                                      group_masked_counts)
    loss_fn = apply_remat(loss_fn, remat)

    def train_step(state: TrainState, x, mask):
        if accum_steps > 1:
            loss, _, grads = accumulated_grads(loss_fn, state.params,
                                               accum_steps, x, mask)
        else:
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, x, mask))(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(state.step + 1, params, opt_state),
                {'loss': loss, 'grad_norm': optax.global_norm(grads)})

    if mask_fn is None:
        return train_step

    def train_step_keyed(state: TrainState, x, key):
        return train_step(state, x, mask_fn(key, x.shape[0]))

    return train_step_keyed


def init_cmae_train_state(model, optimizer, key, x_shape, mask, n_vis,
                          group_masked_counts) -> TrainState:
    """Initialize ChannelMae params + optimizer state."""
    x0 = jnp.zeros(x_shape, jnp.float32)
    params = model.init(key, x0, mask, n_vis, group_masked_counts,
                        method=model.forward_groups)['params']
    return TrainState(jnp.zeros((), jnp.int32), params,
                      optimizer.init(params))


def make_sharded_cmae_train_step(model, optimizer, mesh: Mesh, n_vis: int,
                                 group_masked_counts, remat: bool = True,
                                 mask_fn=None, accum_steps: int = 1):
    """dp x tp sharded ChannelMae training: batches shard over 'dp';
    the encoder/decoder blocks share the VMAE Block parameter layout so
    VMAE_PARTITION_RULES apply unchanged (channel heads / patch embeds
    replicate via the catch-all). Returns (jitted_step, shard_state,
    data_sharding) with step(state, x, mask) like the unsharded one."""
    step_fn = make_cmae_train_step(model, optimizer, n_vis,
                                   group_masked_counts, remat=remat,
                                   mask_fn=mask_fn, accum_steps=accum_steps)
    data_sharding = NamedSharding(mesh, P('dp'))
    repl = NamedSharding(mesh, P())

    def shard_state(state: TrainState) -> TrainState:
        p_sh = parallel.param_shardings(state.params, mesh)
        params = jax.tree_util.tree_map(jax.device_put, state.params, p_sh)
        o_sh = parallel.opt_state_shardings(state.opt_state, p_sh, mesh)
        opt_state = jax.tree_util.tree_map(jax.device_put, state.opt_state,
                                           o_sh)
        return TrainState(jax.device_put(state.step, repl), params,
                          opt_state)

    jitted = jax.jit(step_fn, donate_argnums=(0,))
    return jitted, shard_state, data_sharding


def conjoined_prediction_loss(model, params, x, mask, x_context,
                              mask_context, n_vis: int, n_vis_context: int,
                              normalize_inputs: bool = True,
                              normalize_targets: bool = True,
                              eps: float = 1e-6):
    """Masked-prediction MSE on the main (RGB) stream of a conjoined VMAE
    with context (e.g. IMU) conditioning. x: [B, C, T, H, W] raw [0, 1]
    (imagenet-normalized here by default, matching every inference path —
    _conjoined_predict_video, the fast engine, serving); the reference
    ships no conjoined training code — this is the objective its
    IMU-conditioned checkpoints imply."""
    xm = imagenet_normalize(x, temporal_dim=2) if normalize_inputs else x
    pred = model.apply({'params': params}, xm, mask, x_context, mask_context,
                       n_vis, n_vis_context)
    ps = (model.main.tubelet_size,) + tuple(model.main.patch_size)
    target = patchify(jnp.swapaxes(xm, 1, 2), ps, temporal_dim=1)
    if normalize_targets:
        mean = target.mean(-1, keepdims=True)
        var = target.var(-1, keepdims=True)
        target = (target - mean) / jnp.sqrt(var + eps)
    order = mask_order(mask)
    target_masked = take_tokens(target, order[:, n_vis:])
    n_real = target_masked.shape[1]
    return ((pred[:, :n_real] - target_masked) ** 2).mean()


def make_conjoined_train_step(model, optimizer, n_vis: int,
                              n_vis_context: int, remat: bool = True,
                              mask_fn=None, accum_steps: int = 1,
                              **loss_kwargs):
    """Train step for ConjoinedVMAE: step(state, x, mask, x_context,
    mask_context) -> (state, metrics); with mask_fn
    (``(key, batch_size) -> (mask, mask_context)``) the step takes
    (state, x, x_context, key) and samples both masks in-program
    (see make_train_step)."""
    def loss_fn(params, x, mask, xc, mc):
        return conjoined_prediction_loss(model, params, x, mask, xc, mc,
                                         n_vis, n_vis_context, **loss_kwargs)
    loss_fn = apply_remat(loss_fn, remat)

    def train_step(state: TrainState, x, mask, xc, mc):
        if accum_steps > 1:
            loss, _, grads = accumulated_grads(loss_fn, state.params,
                                               accum_steps, x, mask, xc, mc)
        else:
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, x, mask, xc, mc))(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(state.step + 1, params, opt_state),
                {'loss': loss, 'grad_norm': optax.global_norm(grads)})

    if mask_fn is None:
        return train_step

    def train_step_keyed(state: TrainState, x, xc, key):
        mask, mc = mask_fn(key, x.shape[0])
        return train_step(state, x, mask, xc, mc)

    return train_step_keyed


def make_sharded_conjoined_train_step(model, optimizer, mesh: Mesh,
                                      n_vis: int, n_vis_context: int,
                                      remat: bool = True, mask_fn=None,
                                      **loss_kwargs):
    """dp x tp sharded training for the conjoined (IMU-conditioned) family:
    batches shard over 'dp', per-stream block and cross-block parameters
    over 'tp' (parallel.CONJOINED_PARTITION_RULES); XLA inserts the
    gradient psums and tp all-reduces from the shardings.

    Returns (jitted_step, shard_state, data_sharding); step takes
    (state, x, mask, x_context, mask_context) like the unsharded one.
    """
    step_fn = make_conjoined_train_step(model, optimizer, n_vis,
                                        n_vis_context, remat=remat,
                                        mask_fn=mask_fn, **loss_kwargs)
    data_sharding = NamedSharding(mesh, P('dp'))
    repl = NamedSharding(mesh, P())

    def shard_state(state: TrainState) -> TrainState:
        p_sh = parallel.param_shardings(
            state.params, mesh, rules=parallel.CONJOINED_PARTITION_RULES)
        params = jax.tree_util.tree_map(jax.device_put, state.params, p_sh)
        o_sh = parallel.opt_state_shardings(state.opt_state, p_sh, mesh)
        opt_state = jax.tree_util.tree_map(jax.device_put, state.opt_state,
                                           o_sh)
        return TrainState(jax.device_put(state.step, repl), params, opt_state)

    jitted = jax.jit(step_fn, donate_argnums=(0,))
    return jitted, shard_state, data_sharding
