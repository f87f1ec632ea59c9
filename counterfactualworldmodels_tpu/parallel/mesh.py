"""Device mesh + sharding helpers.

The reference is single-process/single-device (SURVEY.md §2.3); this module
is the TPU-native scaling layer it lacks: a named mesh over (dp, tp) axes,
regex partition rules for the ViT parameter tree, and NamedShardings for the
counterfactual sample axis. Collectives are inserted by XLA from the
shardings — no hand-written NCCL-style communication.
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Dict[str, int], devices=None) -> Mesh:
    """Build a named mesh, e.g. make_mesh({'dp': 4, 'tp': 2})."""
    if devices is None:
        devices = jax.devices()
    names = tuple(axis_sizes.keys())
    shape = tuple(axis_sizes.values())
    n = int(np.prod(shape))
    assert len(devices) >= n, (len(devices), axis_sizes)
    dev = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev, names)


def sample_parallel_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the counterfactual sample axis (inference scaling)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return make_mesh({'samples': n}, devices)


# ---------------------------------------------------------------------------
# Parameter partitioning for the VMAE family: tensor-parallel over heads/MLP.
# Dense kernels are [in, out]; attention qkv_kernel is [D, 3, A].
# ---------------------------------------------------------------------------

VMAE_PARTITION_RULES: Sequence[Tuple[str, P]] = (
    # attention: qkv kernels are stored [D, 3, A] (models/layers.py) so the
    # 'tp' shards of the A axis are head-aligned whenever tp | num_heads and
    # never cross the q/k/v boundary
    (r'.*attn/qkv_kernel$', P(None, None, 'tp')),
    (r'.*attn/(q_bias|v_bias)$', P('tp')),
    (r'.*attn/proj/kernel$', P('tp', None)),
    (r'.*attn/proj/bias$', P()),
    # mlp: shard the hidden dim
    (r'.*mlp/fc1/kernel$', P(None, 'tp')),
    (r'.*mlp/fc1/bias$', P('tp')),
    (r'.*mlp/fc2/kernel$', P('tp', None)),
    (r'.*mlp/fc2/bias$', P()),
    # everything else replicated
    (r'.*', P()),
)


# Conjoined (two-stream, cross-attention coupled) family: the per-stream
# encoder/decoder blocks reuse the VMAE rules; the cross blocks
# (models/transformer.py CrossAttentionTransformerBlock, reference
# transformer.py:442-583) shard Megatron-style — values/projections split
# over heads, MLPs over the hidden dim. The packed qk kernels ([D, 2A],
# q|k concatenated on the out axis) stay replicated: they are a small
# fraction of cross-block FLOPs and a tp shard would straddle the q/k
# boundary. Replicated q/k -> full attention weights on every device; the
# head-sharded v einsum and in-dim-sharded projection then reduce via an
# XLA all-reduce.
CONJOINED_PARTITION_RULES: Sequence[Tuple[str, P]] = (
    (r'.*cross_attention/qk(_src)?/kernel$', P()),
    (r'.*cross_attention/v(_src)?/kernel$', P(None, 'tp')),
    (r'.*cross_attention/projection(_src)?/kernel$', P('tp', None)),
    (r'.*cross_attention/projection(_src)?/bias$', P()),
    (r'.*mlp_(trg|src)/layers_0/kernel$', P(None, 'tp')),
    (r'.*mlp_(trg|src)/layers_0/bias$', P('tp')),
    (r'.*mlp_(trg|src)/layers_2/kernel$', P('tp', None)),
) + tuple(VMAE_PARTITION_RULES)


def partition_spec_for(path: str, rules=VMAE_PARTITION_RULES) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path):
            return spec
    return P()


def _flatten_paths(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        path = f'{prefix}/{k}' if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_paths(v, path))
        else:
            out[path] = v
    return out


def param_shardings(params, mesh: Mesh, rules=VMAE_PARTITION_RULES):
    """Pytree of NamedShardings matching ``params`` via regex rules.

    tp-sharded specs fall back to replication when the named axis doesn't
    divide the parameter dim (small test models).
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    tp_size = axis_sizes.get('tp', 1)

    def spec_of(path, leaf):
        spec = partition_spec_for(path, rules)
        for dim, axis in enumerate(spec):
            if axis == 'tp':
                if 'tp' not in axis_sizes:
                    # a mesh without the axis cannot carry a 'tp' spec at
                    # all (NamedSharding would raise): replicate
                    return P()
                if dim >= leaf.ndim or leaf.shape[dim] % max(tp_size, 1):
                    if tp_size > 1:
                        import warnings
                        warnings.warn(
                            f'tp={tp_size} does not divide dim {dim} of '
                            f'{path} {leaf.shape}; replicating this param '
                            f'(no tensor parallelism for it)', stacklevel=2)
                    return P()
        return spec

    flat = _flatten_paths(params)
    specs = {path: NamedSharding(mesh, spec_of(path, leaf))
             for path, leaf in flat.items()}

    def rebuild(tree, prefix=''):
        out = {}
        for k, v in tree.items():
            path = f'{prefix}/{k}' if prefix else k
            out[k] = rebuild(v, path) if isinstance(v, dict) else specs[path]
        return out

    return rebuild(params)


def replicate(tree, mesh: Mesh):
    """Fully-replicated NamedShardings for a pytree."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: sh, tree)


def shard_params(params, mesh: Mesh, rules=VMAE_PARTITION_RULES):
    """Place a parameter pytree on the mesh per the partition rules."""
    shardings = param_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings)


def opt_state_shardings(opt_state, p_shardings, mesh: Mesh):
    """Shardings for an optax state tree: param-shaped subtrees (adam
    mu/nu and any other per-param moments mirror the param tree) get the
    param shardings; scalar leaves (step counts) are replicated.

    Matching is by tree structure: any dict node whose treedef equals the
    param tree's gets ``p_shardings`` wholesale.
    """
    repl = NamedSharding(mesh, P())
    pdef = jax.tree_util.tree_structure(p_shardings)

    def node(x):
        if isinstance(x, dict):
            if jax.tree_util.tree_structure(x) == pdef:
                return p_shardings
            return jax.tree_util.tree_map(lambda _: repl, x)
        return repl

    return jax.tree_util.tree_map(node, opt_state,
                                  is_leaf=lambda x: isinstance(x, dict))
