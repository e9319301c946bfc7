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
    """flow(x) = H(x) - x in float64 throughout, single fp32 cast at the end
    (matching the reference's get_flow_np).  (h, w, 2).

    Dispatches to the C++ kernel (dmhomo_tpu.native) when built - same
    float64 expression per pixel, ~10x faster than the numpy temporaries.
    """
    from dmhomo_tpu import native

    out = native.homography_to_flow_native(H, h, w, eps)
    if out is not None:
        return out
    X, Y = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    xyh = np.stack([X.ravel(), Y.ravel(), np.ones(h * w)], axis=0)
    o = np.asarray(H, np.float64) @ xyh
    z = o[2] + eps
    fx = (o[0] / z).reshape(h, w) - X
    fy = (o[1] / z).reshape(h, w) - Y
    return np.stack([fx, fy], axis=-1).astype(np.float32)


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
