#!/usr/bin/env python
"""Convert the reference's released torch checkpoints to orbax.

Reads the .pth files fetched by scripts/download_checkpoints.sh, maps them
through utils/torch_convert.py (pure name/transpose mapping, golden-tested),
and writes orbax checkpoints that load directly via
utils.checkpoint.load_params — no torch needed at inference time after this.

Usage:
    python scripts/convert_checkpoints.py --ckpt-dir ./checkpoints \
        [--out-dir ./checkpoints/flax]

The reverse direction (--export): take an orbax checkpoint produced by
this framework (a train_* CLI or a prior conversion) and write a
reference-layout .pth the torch models load
(utils/torch_export.py; torch.load(path)['model'] format):

    python scripts/convert_checkpoints.py --export raft_small \
        --params /ckpt/flax/raft_small --out model.pth
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

CONVERSIONS = [
    # (torch file, converter, output name)
    ('cwm_baseVMAE_224px_8x8patches_2frames.pth', 'vmae', 'vmae_base_8x8'),
    ('cwm_largeVMAE_224px_4x4patches_2frames.pth', 'vmae', 'vmae_large_4x4'),
    ('cwm_IMUcond_conjVMAE_224px_4x4patches_2frames.pth', 'conjoined',
     'conj_imu_base_4x4'),
    ('flow2imu_conjVMAE_224px.pth', 'conjoined', 'flow2imu'),
    ('raft_checkpoints/raft-large.pth', 'raft', 'raft_large'),
    ('raft_checkpoints/raft-small.pth', 'raft_small', 'raft_small'),
    ('raft_consolidated_keypoint_predictor.pth', 'raft', 'raft_keypoints'),
]


EXPORT_FAMILIES = ('vmae', 'raft', 'raft_small', 'cmae',
                   'conjoined_imu400', 'conjoined_flow2imu')


def run_export(args):
    from counterfactualworldmodels_tpu.utils import torch_export as tx
    from counterfactualworldmodels_tpu.utils.checkpoint import load_params
    params = load_params(os.path.abspath(args.params))
    if isinstance(params, dict) and 'params' in params \
            and 'opt_state' in params:
        # a train_* CLI TrainState checkpoint: take just the parameters
        params = params['params']
    fam = args.export
    if fam == 'vmae':
        pt = tuple(int(v) for v in args.patch_size.split(','))
        if len(pt) == 2:
            pt = (1,) + pt
        sd = tx.export_vmae(params, in_chans=args.in_chans, patch_size=pt)
    elif fam in ('raft', 'raft_small'):
        sd = tx.export_raft(params, small=(fam == 'raft_small'))
    elif fam == 'cmae':
        part = tuple(int(v) for v in args.partition.split(','))
        ps = tuple(int(v) for v in args.patch_size.split(','))[-2:]
        sd = tx.export_channel_mae(params, part, ps)
    else:
        from counterfactualworldmodels_tpu.models import conjoined as jc
        factory = (jc.imu400_base_4x4patch_2frames_1tube
                   if fam == 'conjoined_imu400'
                   else jc.imu400_8x8patch_2frames_1tube_flowbackrgb01)
        wrapper = factory()
        model = getattr(wrapper, 'model', wrapper)
        sd = tx.export_conjoined(model, params)
    tx.save_torch_checkpoint(sd, args.out)
    print(f'{fam}: {len(sd)} tensors -> {args.out}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt-dir', default=None)
    ap.add_argument('--out-dir', default=None)
    ap.add_argument('--only', default=None,
                    help='comma-separated output names to convert')
    ap.add_argument('--export', default=None, choices=EXPORT_FAMILIES,
                    help='reverse direction: orbax params -> reference .pth')
    ap.add_argument('--params', default=None,
                    help='orbax checkpoint path (--export)')
    ap.add_argument('--out', default='model.pth',
                    help='output .pth path (--export)')
    ap.add_argument('--patch-size', default='1,8,8',
                    help='vmae (pt,ph,pw) / cmae (ph,pw) patch (--export)')
    ap.add_argument('--in-chans', type=int, default=3)
    ap.add_argument('--partition', default='3',
                    help='cmae channel-group sizes (--export)')
    args = ap.parse_args()
    if args.export:
        if not args.params:
            raise SystemExit('--export needs --params')
        return run_export(args)
    if not args.ckpt_dir:
        raise SystemExit('pass --ckpt-dir (convert) or --export')
    out_dir = args.out_dir or os.path.join(args.ckpt_dir, 'flax')
    os.makedirs(out_dir, exist_ok=True)
    only = set(args.only.split(',')) if args.only else None

    import torch
    from counterfactualworldmodels_tpu.utils import torch_convert as tc
    from counterfactualworldmodels_tpu.utils.checkpoint import save_params

    converters = {
        'vmae': tc.convert_vmae,
        'conjoined': tc.convert_conjoined,
        'raft': tc.convert_raft,
        'raft_small': lambda sd: tc.convert_raft(sd, small=True),
    }

    for fname, conv, out_name in CONVERSIONS:
        if only and out_name not in only:
            continue
        path = os.path.join(args.ckpt_dir, fname)
        if not os.path.exists(path) or os.path.getsize(path) == 0:
            # 0-byte = a failed download's -O target, not a checkpoint
            print(f'skip {out_name}: {path} not found')
            continue
        sd = torch.load(path, map_location='cpu', weights_only=False)
        if isinstance(sd, dict) and 'model' in sd:
            sd = sd['model']
        elif isinstance(sd, dict) and 'state_dict' in sd:
            sd = sd['state_dict']
        # strip DataParallel prefixes
        sd = {k[len('module.'):] if k.startswith('module.') else k: v
              for k, v in sd.items()}
        params = converters[conv](sd)
        out_path = os.path.abspath(os.path.join(out_dir, out_name))
        save_params(out_path, params)
        n = sum(p.size for p in __import__('jax').tree_util.tree_leaves(params))
        print(f'{out_name}: {n / 1e6:.1f}M params -> {out_path}')


if __name__ == '__main__':
    main()
