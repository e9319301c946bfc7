"""Flow <-> mapping converters, validity masks, random homography sampler.

Parity targets (HEM/utils_operations/):
* convert_flow_to_mapping / convert_mapping_to_flow (+normalized variants)
  (flow_and_mapping_operations.py:64-380): mapping = flow + pixel grid.
* get_gt_correspondence_mask / create_border_mask (:45-62): valid where the
  mapped position lands strictly inside the image.
* define_mask_zero_borders (:6-38): mask of non-black pixels.
* RandomHomography (homography_parameters_sampling.py:6-78): random
  flip/rotation/shear/scale/perspective/translation composition - available
  for augmentation (unused by the shipped configs, like the reference).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from dmhomo_tpu.geometry.grids import pixel_grid


def convert_flow_to_mapping(flow: jnp.ndarray) -> jnp.ndarray:
    """(..., h, w, 2) flow -> absolute mapping (flow + grid)."""
    h, w = flow.shape[-3], flow.shape[-2]
    return flow + pixel_grid(h, w, dtype=flow.dtype)


def convert_mapping_to_flow(mapping: jnp.ndarray) -> jnp.ndarray:
    """(..., h, w, 2) absolute mapping -> flow (mapping - grid)."""
    h, w = mapping.shape[-3], mapping.shape[-2]
    return mapping - pixel_grid(h, w, dtype=mapping.dtype)


def normalize_mapping(mapping: jnp.ndarray) -> jnp.ndarray:
    """pixel mapping -> [-1, 1] coords (2x/(W-1) - 1 convention)."""
    h, w = mapping.shape[-3], mapping.shape[-2]
    scale = jnp.asarray([2.0 / (w - 1), 2.0 / (h - 1)], mapping.dtype)
    return mapping * scale - 1.0


def unnormalize_mapping(mapping_n: jnp.ndarray) -> jnp.ndarray:
    h, w = mapping_n.shape[-3], mapping_n.shape[-2]
    scale = jnp.asarray([(w - 1) / 2.0, (h - 1) / 2.0], mapping_n.dtype)
    return (mapping_n + 1.0) * scale


def correspondence_mask(flow: jnp.ndarray) -> jnp.ndarray:
    """Valid-flow mask: mapped position strictly inside (0, w) x (0, h).

    Matches get_gt_correspondence_mask's strict inequalities (:45-62).
    Returns (..., h, w) bool.
    """
    m = convert_flow_to_mapping(flow)
    h, w = flow.shape[-3], flow.shape[-2]
    return (m[..., 0] > 0) & (m[..., 0] < w) & (m[..., 1] > 0) & (m[..., 1] < h)


def border_mask(flow: jnp.ndarray) -> jnp.ndarray:
    """correspondence_mask as float (create_border_mask parity)."""
    return correspondence_mask(flow).astype(jnp.float32)


def zero_border_mask(image: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """(..., h, w, 3) image -> bool mask, False where all channels ~ 0."""
    occ = jnp.all(image < epsilon, axis=-1)
    return ~occ


@dataclasses.dataclass
class RandomHomography:
    """Random homography sampler for augmentation.

    Composes flip / rotation / shear / scale / perspective / translation
    like the reference sampler; returns 3x3 matrices acting on pixel coords
    of an (h, w) image centred at the image centre.
    """

    p_flip: float = 0.0
    max_rotation: float = 10.0  # degrees
    max_shear: float = 0.1
    max_scale: float = 0.1
    max_perspective: float = 1e-4
    max_translation: float = 8.0  # pixels

    def sample(self, rng: np.random.Generator, h: int, w: int) -> np.ndarray:
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        T_c = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1.0]])
        T_c_inv = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1.0]])

        H = np.eye(3)
        if rng.uniform() < self.p_flip:
            H = H @ np.diag([-1.0, 1.0, 1.0])
        theta = np.deg2rad(rng.uniform(-self.max_rotation, self.max_rotation))
        c, s = np.cos(theta), np.sin(theta)
        H = H @ np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        shx, shy = rng.uniform(-self.max_shear, self.max_shear, 2)
        H = H @ np.array([[1, shx, 0], [shy, 1, 0], [0, 0, 1.0]])
        sx, sy = 1 + rng.uniform(-self.max_scale, self.max_scale, 2)
        H = H @ np.diag([sx, sy, 1.0])
        px, py = rng.uniform(-self.max_perspective, self.max_perspective, 2)
        H = H @ np.array([[1, 0, 0], [0, 1, 0], [px, py, 1.0]])
        tx, ty = rng.uniform(-self.max_translation, self.max_translation, 2)
        H = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1.0]]) @ H

        H = T_c_inv @ H @ T_c
        return H / H[2, 2]
