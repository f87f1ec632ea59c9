"""Flow-sample rejection filter, pure jnp.

Equivalent of the reference FlowSampleFilter (cwm/models/sampling.py:128-287):
rejects degenerate counterfactual flow samples by (a) the selected patch not
moving, (b) the whole scene moving, (c) >= 2 image corners moving. Rejected
samples are zeroed.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

ALL_FILTERS = ('patch_magnitude', 'flow_area', 'num_corners')


def flow_sample_filter(flow_samples: jnp.ndarray,
                       active_patches: jnp.ndarray,
                       filter_methods: Sequence[str] = ALL_FILTERS,
                       flow_magnitude_threshold: float = 5.0,
                       flow_area_threshold: float = 0.75,
                       num_corners_threshold: int = 2
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """flow_samples [B,2,H,W,S]; active_patches bool [B,N,S] (N over 2
    frames, True = masked). Returns (filtered flows, filter_mask [B,S])."""
    b, _, h, w, s = flow_samples.shape
    flow_mag = jnp.linalg.norm(flow_samples, axis=1)  # [B,H,W,S]

    n = active_patches.shape[1]
    # infer the frame-1 patch grid from the image aspect (square patches);
    # the reference simply asserts H == W (sampling.py:189) — support
    # non-square frames but fail loudly on inconsistent shapes instead of
    # silently scrambling patch indexing
    n2 = n // 2
    gh = max(1, int(round((n2 * h / w) ** 0.5)))
    gw = n2 // gh
    if gh * gw != n2:
        raise ValueError(
            f'cannot infer a patch grid with square patches from '
            f'N/2={n2} active entries and a {h}x{w} frame')
    active_second = 1.0 - active_patches[:, gh * gw:, :].astype(jnp.float32)
    active_second = jnp.swapaxes(active_second, 1, 2)  # [B,S,hw]

    # bilinear downsample of the magnitude map to the patch grid.
    # antialias=False for bit-parity with the reference's F.interpolate
    # (utils.py:837, torch default: no antialiasing) — jax's default
    # antialiased downsample dilutes single-patch magnitudes and flips
    # accept/reject decisions near the threshold
    mag = jnp.moveaxis(flow_mag, -1, 1)  # [B,S,H,W]
    mag_down = jax.image.resize(mag, (b, s, gh, gw), 'bilinear',
                                antialias=False)
    mag_down = mag_down.reshape(b, s, gh * gw)
    patch_mag = (mag_down * active_second).sum(-1) / \
        (active_second.sum(-1) + 1e-12)  # [B,S]

    reject = jnp.zeros((b, s), dtype=bool)
    for method in filter_methods:
        if method == 'patch_magnitude':
            r = patch_mag < flow_magnitude_threshold
        elif method == 'flow_area':
            area = (flow_mag > flow_magnitude_threshold).reshape(
                b, h * w, s).sum(1) / (h * w)
            r = area > flow_area_threshold
        elif method == 'num_corners':
            moving = (flow_mag > flow_magnitude_threshold)
            corners = (moving[:, 0, 0].astype(jnp.float32) +
                       moving[:, 0, -1] + moving[:, -1, 0] +
                       moving[:, -1, -1])
            r = corners >= num_corners_threshold
        else:
            raise ValueError(method)
        reject = reject | r

    keep = ~reject
    flows = flow_samples * keep[:, None, None, None, :].astype(
        flow_samples.dtype)
    return flows, reject


class FlowSampleFilter:
    """Class wrapper mirroring the reference module API."""

    def __init__(self, filter_methods=ALL_FILTERS,
                 flow_magnitude_threshold=5.0, flow_area_threshold=0.75,
                 num_corners_threshold=2):
        self.filter_methods = tuple(filter_methods)
        self.flow_magnitude_threshold = flow_magnitude_threshold
        self.flow_area_threshold = flow_area_threshold
        self.num_corners_threshold = num_corners_threshold

    def __call__(self, flow_samples, active_patches):
        return flow_sample_filter(
            flow_samples, active_patches, self.filter_methods,
            self.flow_magnitude_threshold, self.flow_area_threshold,
            self.num_corners_threshold)

    def __repr__(self):
        return ('FlowSampleFilter(%s, mag>%.1f, area>%.2f, corners>=%d)' %
                (list(self.filter_methods), self.flow_magnitude_threshold,
                 self.flow_area_threshold, self.num_corners_threshold))
