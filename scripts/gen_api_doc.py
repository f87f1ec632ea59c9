#!/usr/bin/env python
"""Generate docs/API.md: the public API surface, module by module.

Walks the package's modules, emitting each public class (with its public
methods) and function with its signature and first docstring line. The
output is committed (docs/API.md) so reference users can browse the
surface without importing anything; re-run this script after adding API.

    python scripts/gen_api_doc.py            # rewrites docs/API.md
"""
import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

PKG = 'counterfactualworldmodels_tpu'

# (module, one-line intro) in presentation order
MODULES = [
    ('', 'Top-level re-exports — `import counterfactualworldmodels_tpu as '
         'cwm` exposes the generator/interface classes directly.'),
    ('models.vmae', 'Masked video autoencoder (VMAE) model and the released '
                    'configurations.'),
    ('models.conjoined', 'Two-stream (RGB + context/IMU) conjoined VMAE.'),
    ('models.cmae', 'ChannelMAE family (channel-partitioned image MAE).'),
    ('models.transformer', 'Generic transformer blocks (cross/self '
                           'attention).'),
    ('models.preprocessor', 'Stream preprocessor registry (rgb01, flow, '
                            'imu, ...).'),
    ('models.layers', 'ViT building blocks (patch embed, attention, MLP).'),
    ('models.fast_vmae', 'Shared-prefix counterfactual engine (frame-0 '
                         'prefix cached per scene).'),
    ('models.fast_conjoined', 'Conjoined (IMU-conditioned) shared-prefix '
                              'engine.'),
    ('models.raft.raft', 'RAFT optical flow (correlation volume + GRU '
                         'refinement).'),
    ('masking.generators', 'Mask generator family (pure functions over '
                           'PRNG keys + stateful wrappers).'),
    ('masking.mask_ops', 'Mask post-processing (upsample, distances, '
                         'partitions, rectangularize).'),
    ('pipelines.prediction', 'PredictorBasedGenerator: masked prediction '
                             'wrapper API.'),
    ('pipelines.segmentation', 'FlowGenerator: counterfactual videos, '
                               'flows, motion covariance.'),
    ('pipelines.movability', 'MovabilityPredictor: iterated counterfactual '
                             'sampling.'),
    ('pipelines.imu', 'IMU-conditioned generators (two-model pipeline).'),
    ('pipelines.perturbation', 'Counterfactual constructions (shifts, '
                               'statics, markers).'),
    ('pipelines.filters', 'FlowSampleFilter: reject degenerate flow '
                          'samples.'),
    ('pipelines.patch_selector', 'Energy-based interactive patch '
                                 'selection.'),
    ('interface', 'Interactive matplotlib interface (the reference '
                  'cwm.interface).'),
    ('training.train', 'Training steps + optimizers for VMAE / conjoined '
                       '/ ChannelMAE (single and dp x tp sharded).'),
    ('training.raft', 'RAFT flow training (sequence loss, synthetic warp '
                      'batches, distillation).'),
    ('data.shards', 'Shard format + native (C++) clip loader with IMU '
                    'sidecars.'),
    ('parallel', 'Meshes, partition rules, sharded inference/training, '
                 'pp/sp forwards, multi-host init.'),
    ('ops.patches', 'Patchify / unpatchify.'),
    ('ops.pos_embed', 'Sin-cos positional embeddings.'),
    ('ops.flash_attention', 'Pallas TPU flash attention (single and '
                            'two-source prefix kernels).'),
    ('ops.flow_viz', 'Optical-flow color wheel rendering.'),
    ('ops.normalization', 'ImageNet (un)normalization.'),
    ('ops.sampling', 'Energy-weighted patch sampling.'),
    ('ops.coords', 'Coordinate grids and patch/pixel index maps.'),
    ('ops.misc', 'Misc tensor utilities mirrored from the reference.'),
    ('data.utils', 'Image/video IO helpers and demo utilities.'),
    ('utils.torch_convert', 'Reference .pth -> flax param conversion.'),
    ('utils.torch_export', 'Flax params -> reference .pth export.'),
    ('utils.checkpoint', 'Orbax checkpointing with rolling resume.'),
    ('utils.profiling', 'XLA trace capture + axon-safe timers.'),
    ('utils.batching', 'Leader-follower micro-batching (serving).'),
    ('utils.backend_guard', 'Dead-TPU-relay probe + CPU re-exec guard.'),
    ('utils.cache', 'Persistent XLA compilation cache.'),
    ('vis_utils', 'Plotting helpers (imshow grids, mask overlays).'),
]


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return '(...)'


def _doc1(obj):
    d = inspect.getdoc(obj)
    if not d:
        return ''
    line = d.strip().split('\n')[0].strip()
    return line


def _public_members(mod, modname):
    fns, classes = [], []
    for name in sorted(dir(mod)):
        if name.startswith('_'):
            continue
        obj = getattr(mod, name)
        home = getattr(obj, '__module__', None) or ''
        # only document symbols defined in (or re-exported into) the pkg;
        # jit-wrapped functions carry __module__/__wrapped__ via wraps
        if inspect.ismodule(obj) or not home.startswith(PKG):
            continue
        if inspect.isclass(obj):
            classes.append((name, obj))
        elif callable(obj):   # plain AND jax.jit-wrapped functions
            fns.append((name, obj))
    return classes, fns


def render_module(modname, intro, out):
    full = PKG if modname == '' else f'{PKG}.{modname}'
    try:
        mod = importlib.import_module(full)
    except Exception as e:  # keep the doc generable even if a dep is off
        out.append(f'## `{full}`\n\n*import failed: {type(e).__name__}*\n')
        return
    classes, fns = _public_members(mod, modname)
    if not classes and not fns:
        return
    out.append(f'## `{full}`\n')
    out.append(intro + '\n')
    for name, cls in classes:
        out.append(f'### class `{name}{_sig(cls)}`\n')
        d = _doc1(cls)
        if d:
            out.append(d + '\n')
        meths = []
        for m, fn in sorted(vars(cls).items()):
            if m.startswith('_') or not callable(fn):
                continue
            target = fn.__func__ if isinstance(fn, (staticmethod,
                                                    classmethod)) else fn
            if not callable(target):
                continue
            meths.append(f'- `.{m}{_sig(target)}`'
                         + (f' — {_doc1(target)}' if _doc1(target) else ''))
        if meths:
            out.extend(meths)
            out.append('')
    for name, fn in fns:
        d = _doc1(fn)
        out.append(f'- **`{name}{_sig(fn)}`**' + (f' — {d}' if d else ''))
    out.append('')


def main():
    out = [
        '# API reference',
        '',
        '`counterfactualworldmodels_tpu` public surface, module by module.',
        'Generated by `scripts/gen_api_doc.py` — regenerate after API',
        'changes. See `MIGRATION.md` for the side-by-side guide from the',
        'reference (`neuroailab/CounterfactualWorldModels`) and `README.md`',
        'for the architecture overview.',
        '',
    ]
    for modname, intro in MODULES:
        render_module(modname, intro, out)
    path = os.path.join(os.path.dirname(__file__), '..', 'docs', 'API.md')
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'w') as f:
        f.write('\n'.join(out).rstrip() + '\n')
    print(f'wrote {os.path.relpath(path)} '
          f'({len(chr(10).join(out).splitlines())} lines)')


if __name__ == '__main__':
    main()
