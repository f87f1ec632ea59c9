"""Sinusoidal position encodings.

Numerically identical to the reference table builder
(cwm/models/VideoMAE/utils.py:251-268 and cwm/models/transformer.py:37-52) so
converted checkpoints reproduce reference activations bit-for-bit at f32.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sinusoid_encoding_table(positions, d_hid: int,
                            apply_sinusoid: bool = True) -> jnp.ndarray:
    """[1, N, d_hid] sin/cos table.

    ``positions`` may be an int (range) or a sequence of position values.
    Even dims get sin, odd dims get cos; frequency 10000^(2*(j//2)/d).
    """
    if isinstance(positions, int):
        pos = np.arange(positions, dtype=np.float64)
    else:
        pos = np.asarray(positions, dtype=np.float64)
    dims = np.arange(d_hid)
    angle_rates = 1.0 / np.power(10000.0, 2 * (dims // 2) / d_hid)
    table = pos[:, None] * angle_rates[None, :]
    if apply_sinusoid:
        table[:, 0::2] = np.sin(table[:, 0::2])
        table[:, 1::2] = np.cos(table[:, 1::2])
    return jnp.asarray(table[None], dtype=jnp.float32)
