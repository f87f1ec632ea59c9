"""Flow <-> RGB conversions (reference cwm/data/utils.py:12-89)."""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from ..ops.flow_viz import FlowToRgb, flow_to_rgb, hsv_to_rgb  # noqa: F401


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, H, W] RGB in [0,1] -> HSV with hue in radians."""
    r, g, b = rgb[..., 0, :, :], rgb[..., 1, :, :], rgb[..., 2, :, :]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.clip(maxc, min=1e-12), 0.0)
    safe = jnp.clip(delta, min=1e-12)
    h = jnp.where(maxc == r, (g - b) / safe,
                  jnp.where(maxc == g, 2.0 + (b - r) / safe,
                            4.0 + (r - g) / safe))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0) * 2 * math.pi
    return jnp.stack([h, s, v], axis=-3)


def rgb_to_xy_flows(flows_rgb: jnp.ndarray, to_image_coordinates: bool = True,
                    to_sampling_grid: bool = False,
                    max_speed: float = 1.0) -> jnp.ndarray:
    """Invert the HSV flow wheel: [..., 3, H, W] RGB -> [..., 2, H, W] flow
    (reference RgbFlowToXY / OpticalFlowRgbTo2d, data/utils.py:12-17,48-89).
    """
    hsv = rgb_to_hsv(flows_rgb)
    ang = hsv[..., 0, :, :]
    speed = hsv[..., 2, :, :] * max_speed
    flow_x = jnp.cos(ang) * speed
    flow_y = jnp.sin(ang) * speed
    if to_sampling_grid:
        return jnp.stack([flow_x, -flow_y], axis=-3)
    if to_image_coordinates:
        return jnp.stack([-flow_y, flow_x], axis=-3)
    return jnp.stack([flow_x, flow_y], axis=-3)


class RgbFlowToXY:
    """Class wrapper mirroring the reference API (data/utils.py:12-17)."""

    def __init__(self, to_image_coordinates=True, to_sampling_grid=False,
                 max_speed=1.0):
        self.to_image_coordinates = to_image_coordinates
        self.to_sampling_grid = to_sampling_grid
        self.max_speed = max_speed

    def __call__(self, flows_rgb):
        return rgb_to_xy_flows(flows_rgb, self.to_image_coordinates,
                               self.to_sampling_grid, self.max_speed)
