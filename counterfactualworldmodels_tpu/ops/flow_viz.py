"""Optical-flow colorization (HSV wheel), pure jnp.

Equivalent of the reference ``FlowToRgb`` (cwm/data/utils.py:19-46), with the
kornia HSV->RGB conversion re-implemented in jnp.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """HSV -> RGB with hue in radians [0, 2pi) on a [..., 3, H, W] tensor.

    Matches kornia.color.hsv_to_rgb semantics (hue in radians).
    """
    h = (hsv[..., 0, :, :] % (2 * math.pi)) / (2 * math.pi)
    s = hsv[..., 1, :, :]
    v = hsv[..., 2, :, :]

    hi = jnp.floor(h * 6.0) % 6
    f = h * 6.0 - jnp.floor(h * 6.0)
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)

    hi = hi.astype(jnp.int32)
    r = jnp.select([hi == 0, hi == 1, hi == 2, hi == 3, hi == 4, hi == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([hi == 0, hi == 1, hi == 2, hi == 3, hi == 4, hi == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([hi == 0, hi == 1, hi == 2, hi == 3, hi == 4, hi == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-3)


def flow_to_rgb(flow: jnp.ndarray, max_speed: float = 1.0,
                from_image_coordinates: bool = False,
                from_sampling_grid: bool = True) -> jnp.ndarray:
    """[..., 2, H, W] flow -> [..., 3, H, W] RGB image."""
    assert flow.shape[-3] == 2, flow.shape
    if from_sampling_grid:
        flow_x, flow_y = flow[..., 0, :, :], -flow[..., 1, :, :]
    elif not from_image_coordinates:
        flow_x, flow_y = flow[..., 0, :, :], flow[..., 1, :, :]
    else:
        flow_h, flow_w = flow[..., 0, :, :], flow[..., 1, :, :]
        flow_x, flow_y = flow_w, -flow_h

    angle = jnp.arctan2(flow_y, flow_x)
    speed = jnp.sqrt(flow_x ** 2 + flow_y ** 2) / max_speed

    hue = jnp.mod(angle, 2 * math.pi)
    sat = jnp.ones_like(hue)
    val = speed
    hsv = jnp.stack([hue, sat, val], axis=-3)
    return hsv_to_rgb(hsv)


class FlowToRgb:
    """Stateful convenience wrapper mirroring the reference class API."""

    def __init__(self, max_speed: float = 1.0, from_image_coordinates: bool = False,
                 from_sampling_grid: bool = True):
        self.max_speed = max_speed
        self.from_image_coordinates = from_image_coordinates
        self.from_sampling_grid = from_sampling_grid

    def __call__(self, flow):
        return flow_to_rgb(flow, self.max_speed, self.from_image_coordinates,
                           self.from_sampling_grid)
