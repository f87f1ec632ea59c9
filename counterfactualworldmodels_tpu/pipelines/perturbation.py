"""Counterfactual prompt construction: pure tensor edits of (video, mask).

TPU-native re-design of reference cwm/models/perturbation.py. The reference
applies perturbations with Python loops over the B*S sample batch
(cwm/models/segmentation.py:324-338); here every edit is a pure function of
(video, mask, shift) with traced shift values, so the whole construction
vmaps over the counterfactual sample axis and fuses into the jitted forward.

Conventions:
    video [B, T, C, H, W]; mask bool [B, N], True = masked, frame-major;
    shifts in *patch units* [dy, dx] (converted to pixels internally like
    reference perturbation.py:253-255).

Popcount discipline: :func:`shift_patches_and_mask` can push visible patches
off the image edge (they become masked — the reference pads masks with 1 at
perturbation.py:269-270). ``rectangularize_row`` restores an exact static
visible count by randomly revealing masked patches, the keyed equivalent of
the reference's RectangularizeMasks('min') pass (prediction.py:421).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..masking.mask_ops import upsample_masks
from ..ops.patches import canonical_patch_size


def translate2d(img: jnp.ndarray, shift, fill) -> jnp.ndarray:
    """Translate the last two dims by (dy, dx) (traced ints), filling with
    ``fill``: out[y, x] = img[y-dy, x-dx], out-of-bounds -> fill.

    Matches the reference's pad + center-crop construction
    (perturbation.py:227-264) for any |dy| < H, |dx| < W.
    """
    h, w = img.shape[-2:]
    dy, dx = shift[0], shift[1]
    pad = [(0, 0)] * (img.ndim - 2) + [(h, h), (w, w)]
    padded = jnp.pad(img, pad, constant_values=fill)
    start = [0] * (img.ndim - 2) + [h - dy, w - dx]
    return jax.lax.dynamic_slice(padded, start, img.shape)


def make_static_movie(x: jnp.ndarray, t: int = 2, frame: int = 0) -> jnp.ndarray:
    """Tile one frame into a T-frame static movie (reference prediction.py:731-739)."""
    if x.ndim == 4:
        x = x[:, None]
    return jnp.tile(x[:, frame % x.shape[1], None], (1, t, 1, 1, 1))


def make_static(x: jnp.ndarray, mask: jnp.ndarray, patch_size) -> jnp.ndarray:
    """Copy frame-0 content into the *visible* patches of frames t > 0
    (reference MakeStatic, perturbation.py:120-145). Masked patches keep
    their original content (they are replaced by predictions anyway).
    """
    pt, ph, pw = canonical_patch_size(patch_size)
    b, t, c, h, w = x.shape
    m = mask.reshape(b, -1, h // ph, w // pw)
    m_pix = upsample_masks(m, (h, w)).astype(x.dtype)[:, :, None]  # [B,T',1,H,W]
    if m.shape[1] != t:  # mask covers fewer frames: treat leading as masked
        lead = jnp.ones((b, t - m.shape[1], 1, h, w), x.dtype)
        m_pix = jnp.concatenate([lead, m_pix[:, -1:]], axis=1)
    return (1.0 - m_pix) * x[:, 0:1] + m_pix * x


def shift_frame_and_mask(x: jnp.ndarray, mask_frame: jnp.ndarray,
                         shift_patches, patch_size,
                         frame: int = 1):
    """Shift one frame's pixels and its (active) mask by a patch-unit vector.

    x: [T, C, H, W] single example video.
    mask_frame: bool [h, w] mask for the target frame (True = masked).
    shift_patches: [dy, dx] ints (traced ok), in patch widths.
    Returns (x_out [T,C,H,W], shifted_mask [h,w]).

    Semantics match reference ShiftPatchesAndMask.perturb
    (perturbation.py:245-289): the shifted content appears only at positions
    visible in the *shifted* mask; everywhere else the original frame stays.
    """
    _, ph, pw = canonical_patch_size(patch_size)
    shift_px = (shift_patches[0] * ph, shift_patches[1] * pw)
    x_f = x[frame]
    x_shifted = translate2d(x_f, shift_px, fill=0.0)
    m_shifted = translate2d(mask_frame, shift_patches, fill=True)
    m_pix = upsample_masks(m_shifted, x_f.shape[-2:]).astype(x_f.dtype)[None]
    merged = x_shifted * (1.0 - m_pix) + x_f * m_pix
    x_out = x.at[frame].set(merged)
    return x_out, m_shifted


def rectangularize_row(key, mask_row: jnp.ndarray, num_visible: int) -> jnp.ndarray:
    """Force one flat bool mask row to exactly ``num_visible`` visible
    entries by randomly revealing masked / re-masking visible entries."""
    n = mask_row.shape[0]
    noise = jax.random.uniform(key, (n,), minval=0.0, maxval=0.999)
    priority = (~mask_row).astype(jnp.float32) + noise
    order = jnp.argsort(-priority)
    rank = jnp.argsort(order)
    return rank >= num_visible


def make_motion_counterfactual(x: jnp.ndarray, passive: jnp.ndarray,
                               active: jnp.ndarray, shift: jnp.ndarray,
                               key, patch_size,
                               n_vis_target: Optional[int] = None,
                               frame: int = 1,
                               fix_passive: bool = True):
    """Build one counterfactual (video, mask) pair — the fused single-sample
    equivalent of reference create_motion_counterfactuals
    (segmentation.py:278-344) + the shifter call chain.

    x: [T, C, H, W] (a 2-frame movie; made static from frame 0 when
       ``fix_passive``).
    passive / active: bool [N] masks, True = masked; the *visible* entries
       are the passive / active patches.
    shift: [2] int patch-unit motion vector applied to the active patches.
    n_vis_target: static total visible count to rectangularize to (over all
       frames). None skips rectangularization.

    Returns (x_out [T,C,H,W], mask [N] bool).
    vmap over a leading sample/batch axis for the batched pipeline.
    """
    _, ph, pw = canonical_patch_size(patch_size)
    t, c, h, w = x.shape
    gh, gw = h // ph, w // pw
    n_per_frame = gh * gw

    if fix_passive:
        x = jnp.tile(x[0:1], (t, 1, 1, 1))

    # frame `frame` parts of the masks
    a = active.reshape(-1, gh, gw)
    p = passive.reshape(-1, gh, gw)
    a_f = a[frame]
    x_out, a_f_shifted = shift_frame_and_mask(x, a_f, shift, patch_size, frame)

    # combined mask per reference forward()+perturb()+min logic:
    # frame != target: visible = vis(P) | vis(A); target frame:
    # visible = (vis(P) & masked(A)) | vis(shift(A)).
    combined = p & a  # visible union, all frames
    target_mask = (p[frame] | ~a[frame]) & a_f_shifted
    mask = combined.at[frame].set(target_mask).reshape(-1)

    if n_vis_target is not None:
        # only adjust the target frame; other frames have exact counts
        lead = mask[:frame * n_per_frame]
        tail = mask[(frame + 1) * n_per_frame:]
        # visible counts outside the target frame are exact already; the
        # target frame absorbs the remaining quota
        vis_other = (~lead).sum() + (~tail).sum()
        quota = n_vis_target - vis_other
        f_mask = rectangularize_row(
            key, mask[frame * n_per_frame:(frame + 1) * n_per_frame], quota)
        mask = jnp.concatenate([lead, f_mask, tail])
    return x_out, mask


def multi_shift_patches_and_mask(x: jnp.ndarray, masks: jnp.ndarray,
                                 perturbation_points: Optional[jnp.ndarray],
                                 shifts_px: jnp.ndarray, patch_size,
                                 frame: int = 1):
    """Apply a sequence of pixel-space shifts to successive patch groups
    (reference MultiShiftPatchesAndMask, perturbation.py:644-779).

    x: [B, T, C, H, W]; masks: bool [B, N, S]; perturbation_points: bool
    [B, N, S] or None — True entries are the patches TO PERTURB (their
    content shifts; the code masks them in the prompt and passes the
    complement as passive, matching reference PatchPerturbation.forward,
    perturbation.py:103-107);
    shifts_px: int [S, 2] pixel shifts (fractional shifts rounded to patch
    units for the mask). Shifts are applied sequentially to the same video.
    Returns (x_out [B,T,C,H,W], mask [B,N]).
    """
    _, ph, pw = canonical_patch_size(patch_size)
    b, t, c, h, w = x.shape
    gh, gw = h // ph, w // pw
    s = masks.shape[-1]

    m_seq = masks
    if perturbation_points is None:
        p_seq = m_seq
        has_base = False
    else:
        m_seq = m_seq | perturbation_points
        p_seq = ~perturbation_points
        has_base = True

    def one_shift(x_cur, i):
        pm = p_seq[..., i].reshape(b, -1, gh, gw)[:, frame]
        shift_px = shifts_px[i]
        shift_patch = jnp.round(shift_px / jnp.asarray([ph, pw])).astype(
            shift_px.dtype)

        def per_example(xe, me):
            x_f = xe[frame]
            x_shifted = translate2d(x_f, shift_px, fill=0.0)
            m_shifted = translate2d(me, shift_patch, fill=True)
            m_pix = upsample_masks(m_shifted, (h, w)).astype(x_f.dtype)[None]
            merged = x_shifted * (1.0 - m_pix) + x_f * m_pix
            return xe.at[frame].set(merged), m_shifted

        x_new, m_shift = jax.vmap(per_example)(x_cur, pm)
        full = p_seq[..., i].reshape(b, -1, gh, gw).at[:, frame].set(m_shift)
        full = full.reshape(b, -1)
        if has_base:
            full = full & m_seq[..., i]
        return x_new, full

    x_cur = x
    out_masks = []
    for i in range(s):
        x_cur, m_i = one_shift(x_cur, i)
        out_masks.append(m_i)
    mask = jnp.stack(out_masks, -1).min(-1)
    return x_cur, mask


def random_shift(key, max_shift_fraction: float, image_size, patch_size,
                 fractional: bool = False) -> jnp.ndarray:
    """Draw a nonzero random [dy, dx] shift in patch units (pixels if
    ``fractional``), uniform over +-max_shift_fraction * image_size
    (reference perturbation.py:209-225). Rejection-free: zero draws get
    bumped to +1 patch in dx.
    """
    _, ph, pw = canonical_patch_size(patch_size)
    h, w = image_size
    max_h = int(max_shift_fraction * h)
    max_w = int(max_shift_fraction * w)
    d = jax.random.randint(key, (2,), jnp.asarray([-max_h, -max_w]),
                           jnp.asarray([max_h + 1, max_w + 1]))
    if not fractional:
        d = jnp.asarray([d[0] // ph, d[1] // pw])
    bump = jnp.asarray([0, 1], dtype=d.dtype)
    return jnp.where((d == 0).all(), d + bump, d)


def shift_patches(x: jnp.ndarray, mask: jnp.ndarray, shift_patches_vec,
                  patch_size, frame: int = 1):
    """Shift only the visible patches' content, keep the mask unchanged
    (reference ShiftPatches, perturbation.py:291-327).

    x: [B, T, C, H, W]; mask bool [B, N]. Returns (x_out, mask).
    """
    _, ph, pw = canonical_patch_size(patch_size)
    b, t, c, h, w = x.shape
    gh, gw = h // ph, w // pw
    m_f = mask.reshape(b, -1, gh, gw)[:, frame % t]
    shift = jnp.asarray(shift_patches_vec)

    def per_example(xe, me):
        x_f = xe[frame]
        x_shifted = translate2d(x_f, (shift[0] * ph, shift[1] * pw), fill=0.0)
        m_pix = upsample_masks(me, (h, w)).astype(x_f.dtype)[None]
        merged = x_shifted * (1.0 - m_pix) + x_f * m_pix
        return xe.at[frame].set(merged)

    return jax.vmap(per_example)(x, m_f), mask


def shuffle_visible(key, x: jnp.ndarray, mask: jnp.ndarray, patch_size,
                    frame: int = -1):
    """Shuffle the visible patches among themselves in the target frame
    (reference ShuffleVisible, perturbation.py:478-509). Keyed permutation of
    visible positions; masked patches stay in place.
    """
    from ..ops.patches import patchify, unpatchify
    _, ph, pw = canonical_patch_size(patch_size)
    b, t, c, h, w = x.shape
    gh, gw = h // ph, w // pw
    n = gh * gw
    f = frame % t
    m_f = mask.reshape(b, -1, n)[:, f]  # [B, n]

    patches = patchify(x, patch_size, temporal_dim=1)  # [B, T*n, D]
    frame_patches = patches[:, f * n:(f + 1) * n]

    def per_row(k, pr, mr):
        # random ranks; visible entries permute among visible slots
        noise = jax.random.uniform(k, (n,))
        score = jnp.where(mr, 2.0 + noise, noise)
        order = jnp.argsort(score)          # visible positions first, shuffled
        out = pr
        nv = (~mr).sum()
        # scatter shuffled visible patches into stable visible positions
        stable_vis = jnp.argsort(mr.astype(jnp.uint8), stable=True)
        shuffled_vis = order
        out = out.at[stable_vis].set(
            jnp.where((jnp.arange(n) < nv)[:, None],
                      pr[shuffled_vis], pr[stable_vis]))
        return out

    keys = jax.random.split(key, b)
    shuffled = jax.vmap(per_row)(keys, frame_patches, m_f)
    patches = patches.at[:, f * n:(f + 1) * n].set(shuffled)
    return unpatchify(patches, patch_size, x.shape, temporal_dim=1), mask


def shuffle_all(key, x: jnp.ndarray, mask: jnp.ndarray, patch_size,
                frame: int = -1):
    """Replace visible patches with patches drawn from a full-frame shuffle
    (reference ShuffleAll, perturbation.py:511-549): masked patches keep
    their content, visible ones get shuffled content."""
    from ..ops.patches import patchify, unpatchify
    b, t = x.shape[:2]
    _, ph, pw = canonical_patch_size(patch_size)
    n = (x.shape[-2] // ph) * (x.shape[-1] // pw)
    f = frame % t
    m_f = mask.reshape(b, -1, n)[:, f]
    patches = patchify(x, patch_size, temporal_dim=1)
    frame_patches = patches[:, f * n:(f + 1) * n]
    keys = jax.random.split(key, b)
    perm = jax.vmap(lambda k: jax.random.permutation(k, n))(keys)
    shuffled = jnp.take_along_axis(frame_patches, perm[..., None], axis=1)
    out = jnp.where(m_f[..., None], frame_patches, shuffled)
    patches = patches.at[:, f * n:(f + 1) * n].set(out)
    return unpatchify(patches, patch_size, x.shape, temporal_dim=1), mask


def shuffle_invisible(key, x: jnp.ndarray, mask: jnp.ndarray, patch_size,
                      frame: int = -1):
    """Swap visible patches with randomly chosen invisible ones
    (reference ShuffleInvisible, perturbation.py:551-591)."""
    from ..ops.patches import patchify, unpatchify
    b, t = x.shape[:2]
    _, ph, pw = canonical_patch_size(patch_size)
    n = (x.shape[-2] // ph) * (x.shape[-1] // pw)
    f = frame % t
    m_f = mask.reshape(b, -1, n)[:, f]
    patches = patchify(x, patch_size, temporal_dim=1)
    frame_patches = patches[:, f * n:(f + 1) * n]

    def per_row(k, pr, mr):
        noise = jax.random.uniform(k, (n,))
        # rank invisible patches randomly; visible slots draw from them
        inv_score = jnp.where(mr, noise, 2.0 + noise)
        inv_order = jnp.argsort(inv_score)      # invisible first, shuffled
        draw = pr[inv_order]                     # candidate replacements
        n_inv = mr.sum()
        # visible slot i takes the (i mod n_inv)-th shuffled invisible patch
        # (the reference tiles the invisible set, perturbation.py:577-583)
        idx = jnp.cumsum(~mr) - 1
        idx = jnp.where(n_inv > 0, idx % jnp.maximum(n_inv, 1), 0)
        repl = draw[idx]
        return jnp.where(mr[:, None] | (n_inv == 0), pr, repl)

    keys = jax.random.split(key, b)
    out = jax.vmap(per_row)(keys, frame_patches, m_f)
    patches = patches.at[:, f * n:(f + 1) * n].set(out)
    return unpatchify(patches, patch_size, x.shape, temporal_dim=1), mask


def add_markers(x: jnp.ndarray, patch_idx_list, patch_size,
                marker_color=(1.0, 0.0, 0.0), shape: str = 'full',
                frame: int = 0):
    """Paint markers onto the given patches and reveal them
    (reference AddMarkers, perturbation.py:356-476, host-side utility).

    patch_idx_list: list of (b, t, i, j) patch indices. Returns
    (x_marked, mask) where mask is visible exactly at the marked patches.
    """
    _, ph, pw = canonical_patch_size(patch_size)
    b, t, c, h, w = x.shape
    gh, gw = h // ph, w // pw
    x_np = np.array(x)
    mask = np.ones((b, t * gh * gw), dtype=bool)
    col = np.asarray(marker_color, np.float32)

    if shape == 'full':
        stamp = np.ones((ph, pw), np.float32)
    elif shape == 'cross':
        stamp = np.zeros((ph, pw), np.float32)
        stamp[ph // 2 - (1 - ph % 2):ph // 2 + 1] = 1
        stamp[:, pw // 2 - (1 - pw % 2):pw // 2 + 1] = 1
    else:
        raise ValueError(shape)

    for p in patch_idx_list:
        bi, ti, i, j = (p if len(p) == 4 else (0, frame, *p))
        ys, xs = slice(i * ph, (i + 1) * ph), slice(j * pw, (j + 1) * pw)
        region = x_np[bi, ti, :, ys, xs]
        x_np[bi, ti, :, ys, xs] = (stamp[None] * col[:, None, None] +
                                   (1 - stamp[None]) * region)
        mask[bi, (ti % t) * gh * gw + i * gw + j] = False
    return jnp.asarray(x_np), jnp.asarray(mask)
