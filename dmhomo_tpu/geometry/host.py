"""Host-side (numpy, float64) geometry for the data pipelines.

The reference computes condition flows in numpy float64 and casts to fp32 at
the end (`get_flow_np`, denoising_diffusion_pytorch.py:927-975;
`from_homography_to_pixel_wise_mapping`,
HEM/utils_operations/flow_and_mapping_operations.py:454-484).  The jnp ops in
``dmhomo_tpu.geometry.homography`` run in fp32 on device; these float64
variants are used where bit-parity with the reference's CPU pipeline matters.
"""

from __future__ import annotations

import numpy as np


def homography_to_mapping_np(H: np.ndarray, h: int, w: int, eps: float = 1e-6) -> np.ndarray:
    """Dense float64 mapping of each pixel under H -> (h, w, 2) float32."""
    X, Y = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    xyh = np.stack([X.ravel(), Y.ravel(), np.ones(h * w)], axis=0)  # (3, N)
    out = np.asarray(H, np.float64) @ xyh
    z = out[2] + eps
    return np.stack([(out[0] / z).reshape(h, w), (out[1] / z).reshape(h, w)], axis=-1).astype(
        np.float32
    )


def homography_to_flow_np(H: np.ndarray, h: int, w: int, eps: float = 1e-6) -> np.ndarray:
    """flow(x) = H(x) - x in float64, cast fp32.  (h, w, 2)."""
    m = homography_to_mapping_np(H, h, w, eps=eps).astype(np.float64)
    X, Y = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    return (m - np.stack([X, Y], axis=-1)).astype(np.float32)


def rescale_homography_np(H: np.ndarray, src_hw, dst_hw) -> np.ndarray:
    """float64 `adapt_homography_to_preprocessing_v3` conjugation."""
    h0, w0 = src_hw
    h1, w1 = dst_hw

    def _m(hh, ww):
        return np.array(
            [[ww / 2.0, 0.0, ww / 2.0], [0.0, hh / 2.0, hh / 2.0], [0.0, 0.0, 1.0]]
        )

    m0, m1 = _m(h0, w0), _m(h1, w1)
    return m1 @ np.linalg.inv(m0) @ np.asarray(H, np.float64) @ m0 @ np.linalg.inv(m1)
