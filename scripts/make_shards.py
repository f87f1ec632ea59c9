#!/usr/bin/env python
"""Pack real videos / frame directories / arrays into CWMSHARD files.

The reference releases no training data pipeline (training is "Coming
Soon", /root/reference/README.md:83); its demos consume single frame
pairs. This CLI completes the training subsystem built in training/: it
turns raw sources into the packed shards `data/shards.py` loads (and the
C++ `clip_loader.cpp` prefetches), sampling T-frame clips with a fixed
inter-frame gap — the 2-frames-~150ms-apart convention of the released
VMAE configs (/root/reference/cwm/models/model_factory.py frame configs).

Sources (mixed freely on the command line):
  *.mp4/*.avi/*.mov/*.webm  decoded with OpenCV (imageio fallback)
  directory of images        sorted frames of ONE video (png/jpg/bmp)
  *.npy / *.npz              uint8/float [T,H,W,C] or [N,T,H,W,C]
                             (npz: first array in the file)

Per-video IMU sidecars: `--imu-suffix .imu.npy` looks for
`<video><suffix>` holding float32 [C, L_total] samples spanning the
video; each clip's window ([--imu-len] samples starting at the clip's
start time, IMU rate inferred as L_total/duration) lands in the shard's
`.imu` sidecar (data/shards.write_imu_sidecar), which
scripts/train_conjoined.py picks up automatically.

Examples:
  python scripts/make_shards.py vids/*.mp4 --out-dir shards/ \
      --clips-per-video 32 --size 224 --frame-gap 4
  python scripts/make_shards.py frames_dir/ --out-dir shards/ \
      --imu-suffix .imu.npy --imu-len 400
"""
import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

VIDEO_EXTS = ('.mp4', '.avi', '.mov', '.webm', '.mkv')
IMAGE_EXTS = ('.png', '.jpg', '.jpeg', '.bmp')


def parse_args():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument('sources', nargs='+',
                    help='video files, frame directories, or .npy/.npz')
    ap.add_argument('--out-dir', required=True)
    ap.add_argument('--prefix', default='clips',
                    help='shard filename prefix (clips-00000.shard)')
    ap.add_argument('--num-frames', type=int, default=2)
    ap.add_argument('--frame-gap', type=int, default=4,
                    help='stride between the clip frames in source frames')
    ap.add_argument('--size', type=int, default=224,
                    help='output H=W (short-side resize + center crop)')
    ap.add_argument('--clips-per-video', type=int, default=16,
                    help='clip start points sampled uniformly per source')
    ap.add_argument('--clips-per-shard', type=int, default=1024)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--imu-suffix', default=None,
                    help='per-video IMU file suffix (float32 [C, L_total])')
    ap.add_argument('--imu-len', type=int, default=400,
                    help='IMU samples per clip window (imu400 models: 400)')
    ap.add_argument('--fps', type=float, default=30.0,
                    help='assumed fps for frame-dir / array sources; '
                         'only affects IMU alignment when --imu-rate is '
                         'given (otherwise the IMU rate is inferred from '
                         'the stream spanning the video and fps cancels)')
    ap.add_argument('--imu-rate', type=float, default=None,
                    help='IMU samples per second; set this when the IMU '
                         'stream does NOT span exactly the video duration '
                         '(window start = clip_start/fps * imu_rate)')
    return ap.parse_args()


def _resize_center(frame: np.ndarray, size: int) -> np.ndarray:
    """uint8 HWC RGB -> [size, size] short-side resize + center crop.
    cv2 when available, PIL otherwise (frame-dir/array/imageio sources
    never needed OpenCV for decoding, so packing must not either)."""
    h, w = frame.shape[:2]
    scale = size / min(h, w)
    nh, nw = max(size, int(round(h * scale))), max(size, int(round(w * scale)))
    try:
        import cv2
        frame = cv2.resize(frame, (nw, nh), interpolation=cv2.INTER_AREA
                           if scale < 1 else cv2.INTER_LINEAR)
    except ImportError:
        from PIL import Image
        frame = np.asarray(Image.fromarray(frame).resize((nw, nh),
                                                         Image.BILINEAR))
    oy, ox = (nh - size) // 2, (nw - size) // 2
    return frame[oy:oy + size, ox:ox + size]


def _read_video(path: str):
    """-> (frames uint8 [T,H,W,C] RGB, fps)."""
    try:
        import cv2
        cap = cv2.VideoCapture(path)
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        frames = []
        while True:
            ok, bgr = cap.read()
            if not ok:
                break
            frames.append(bgr[:, :, ::-1])
        cap.release()
        if frames:
            return np.stack(frames), fps
    except Exception:
        pass
    import imageio.v3 as iio
    frames = iio.imread(path, plugin='pyav')
    meta = iio.immeta(path, plugin='pyav')
    return np.asarray(frames), float(meta.get('fps', 30.0))


def _read_frame_dir(path: str):
    from PIL import Image
    names = sorted(n for n in os.listdir(path)
                   if n.lower().endswith(IMAGE_EXTS))
    if not names:
        raise ValueError(f'no frames in {path}')
    frames = [np.asarray(Image.open(os.path.join(path, n)).convert('RGB'))
              for n in names]
    return np.stack(frames), None


def _read_array(path: str):
    if path.endswith('.npz'):
        with np.load(path) as z:
            arr = z[list(z.files)[0]]
    else:
        arr = np.load(path)
    if arr.ndim == 4:
        arr = arr[None]
    assert arr.ndim == 5, f'{path}: want [N,T,H,W,C] or [T,H,W,C], got {arr.shape}'
    if arr.dtype != np.uint8:
        arr = np.clip(arr * (255.0 if arr.max() <= 1.5 else 1.0),
                      0, 255).astype(np.uint8)
    return arr


def _load_imu(video_path: str, suffix: str):
    p = video_path.rstrip('/') + suffix
    if not os.path.exists(p):
        return None
    imu = np.asarray(np.load(p), np.float32)
    assert imu.ndim == 2, f'{p}: want [C, L_total], got {imu.shape}'
    return imu


def sample_clips(frames: np.ndarray, rng: np.random.RandomState, *,
                 num_frames: int, gap: int, size: int, k: int,
                 imu: np.ndarray = None, imu_len: int = 400,
                 fps: float = 30.0, imu_rate: float = None):
    """Sample k [T,size,size,3] clips (+ aligned [C,imu_len] windows).

    IMU alignment: with ``imu_rate`` (samples/sec) the window starts at
    clip_start_seconds * imu_rate = s / fps * imu_rate — use this when
    the IMU stream does NOT span exactly the video's duration. Without
    it, the rate is inferred proportionally (stream assumed to span the
    video), where fps cancels: i0 = s * L_total / t_total."""
    t_total = frames.shape[0]
    span = (num_frames - 1) * gap + 1
    if t_total < span:  # short source (e.g. pre-cut clips): contiguous
        gap, span = 1, num_frames
        if t_total < span:
            return [], []
    starts = rng.choice(t_total - span + 1,
                        size=min(k, t_total - span + 1), replace=False)
    clips, imus = [], []
    for s in sorted(starts):
        idx = s + np.arange(num_frames) * gap
        clip = np.stack([_resize_center(frames[i], size) for i in idx])
        clips.append(clip)
        if imu is not None:
            if imu_rate is not None:
                i0 = int(round(s / fps * imu_rate))
            else:
                # rate inferred from the stream spanning the whole video
                i0 = int(round(s * imu.shape[1] / t_total))
            i0 = min(i0, max(0, imu.shape[1] - imu_len))
            w = imu[:, i0:i0 + imu_len]
            if w.shape[1] < imu_len:  # stream shorter than a window
                w = np.pad(w, ((0, 0), (0, imu_len - w.shape[1])))
            imus.append(w)
    return clips, imus


def main():
    from counterfactualworldmodels_tpu.data.shards import (
        write_shard, write_imu_sidecar)
    args = parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)

    sources = []
    for s in args.sources:
        sources.extend(sorted(glob.glob(s)) or [s])

    pend_clips, pend_imus, shard_idx, total = [], [], 0, 0
    # sidecars follow the user's intent (--imu-suffix), not whether an
    # IMU-bearing source happened to appear before the first shard
    # boundary — otherwise earlier shards silently ship without sidecars
    any_imu = args.imu_suffix is not None

    def flush():
        nonlocal pend_clips, pend_imus, shard_idx, total
        if not pend_clips:
            return
        path = os.path.join(args.out_dir,
                            f'{args.prefix}-{shard_idx:05d}.shard')
        write_shard(path, np.stack(pend_clips))
        if any_imu:
            # sources without IMU contribute zero windows (missing-IMU
            # rows; the conjoined model's null-IMU path handles them)
            imus = [i if i is not None else
                    np.zeros((pend_imus_c[0], args.imu_len), np.float32)
                    for i in pend_imus]
            pend_imus_cs = {i.shape[0] for i in imus}
            assert len(pend_imus_cs) == 1, f'mixed IMU channel counts {pend_imus_cs}'
            write_imu_sidecar(path, np.stack(imus))
        print(f'{path}: {len(pend_clips)} clips'
              + (' + imu sidecar' if any_imu else ''))
        total += len(pend_clips)
        pend_clips, pend_imus = [], []
        shard_idx += 1

    pend_imus_c = [6]  # channel count of the first real IMU stream seen
    for src in sources:
        if os.path.isdir(src):
            frames, fps = _read_frame_dir(src)
            batches = [frames]
        elif src.lower().endswith(('.npy', '.npz')):
            batches = list(_read_array(src))
            fps = None
        elif src.lower().endswith(VIDEO_EXTS):
            frames, fps = _read_video(src)
            batches = [frames]
        else:
            print(f'skip (unknown type): {src}', file=sys.stderr)
            continue
        fps = fps or args.fps
        imu = _load_imu(src, args.imu_suffix) if args.imu_suffix else None
        if imu is not None:
            pend_imus_c[0] = imu.shape[0]
        for frames in batches:
            clips, imus = sample_clips(
                frames, rng, num_frames=args.num_frames, gap=args.frame_gap,
                size=args.size, k=args.clips_per_video, imu=imu,
                imu_len=args.imu_len, fps=fps, imu_rate=args.imu_rate)
            if not clips:
                print(f'skip (too short, <{(args.num_frames-1)*args.frame_gap+1}'
                      f' frames): {src}', file=sys.stderr)
                continue
            pend_clips.extend(clips)
            pend_imus.extend(imus if imus else [None] * len(clips))
            while len(pend_clips) >= args.clips_per_shard:
                extra_c = pend_clips[args.clips_per_shard:]
                extra_i = pend_imus[args.clips_per_shard:]
                pend_clips = pend_clips[:args.clips_per_shard]
                pend_imus = pend_imus[:args.clips_per_shard]
                flush()
                pend_clips, pend_imus = extra_c, extra_i
    flush()
    print(f'done: {total} clips in {shard_idx} shard(s) -> {args.out_dir}')


if __name__ == '__main__':
    main()
