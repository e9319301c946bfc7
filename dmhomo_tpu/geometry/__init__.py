"""Unified homography / optical-flow geometry library.

The reference implementation carries several private copies of these ops
(`DGM/denoising_diffusion_models/denoising_diffusion_pytorch.py:913-1678`,
`HEM/model/utils.py`, `HEM/common/flow2homo.py`, `HEM/dataset/data_loader.py`);
this package is the single source of truth for the rebuild.

Everything is pure jnp, vmap-able, and static-shaped so it fuses under jit.
"""

from dmhomo_tpu.geometry.grids import (
    pixel_grid,
    homogeneous_grid,
)
from dmhomo_tpu.geometry.homography import (
    apply_homography,
    homography_to_mapping,
    homography_to_flow,
    rescale_homography,
    dlt_solve_4pt,
    homography_from_points,
    homography_from_points_ax0,
    fit_homography_to_flow,
)
from dmhomo_tpu.geometry.warp import (
    bilinear_sample,
    warp_by_flow,
    warp_by_homography,
    resize_bilinear,
    resize_bilinear_align_corners,
    resize_nearest,
    upsample_flow_to,
)
from dmhomo_tpu.geometry.flow_viz import (
    flow_to_rgb,
    hsv_to_rgb,
)
from dmhomo_tpu.geometry.basis import gen_homography_basis

__all__ = [
    "pixel_grid",
    "homogeneous_grid",
    "apply_homography",
    "homography_to_mapping",
    "homography_to_flow",
    "rescale_homography",
    "dlt_solve_4pt",
    "homography_from_points",
    "homography_from_points_ax0",
    "fit_homography_to_flow",
    "bilinear_sample",
    "warp_by_flow",
    "warp_by_homography",
    "resize_bilinear",
    "resize_bilinear_align_corners",
    "resize_nearest",
    "upsample_flow_to",
    "flow_to_rgb",
    "hsv_to_rgb",
    "gen_homography_basis",
]
