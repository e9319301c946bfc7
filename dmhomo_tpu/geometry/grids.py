"""Pixel coordinate grids.

Reference parity: `mesh_grid` / `get_grid`
(denoising_diffusion_pytorch.py:1283-1299,1558-1574; HEM/model/utils.py:294-311).
Coordinates are (x, y) pixel indices, x fastest along width.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _pixel_grid_np(h: int, w: int) -> np.ndarray:
    x = np.arange(w, dtype=np.float32)
    y = np.arange(h, dtype=np.float32)
    xx, yy = np.meshgrid(x, y)  # (h, w) each
    return np.stack([xx, yy], axis=-1)  # (h, w, 2)


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(h, w, 2) grid of (x, y) pixel coordinates."""
    return jnp.asarray(_pixel_grid_np(h, w), dtype=dtype)


def homogeneous_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(h, w, 3) grid of (x, y, 1) homogeneous pixel coordinates."""
    g = _pixel_grid_np(h, w)
    ones = np.ones((h, w, 1), dtype=np.float32)
    return jnp.asarray(np.concatenate([g, ones], axis=-1), dtype=dtype)
