"""Homography math: application, H->flow, DLT solves, dense flow fits.

Reference parity targets (file:line are in /root/reference):
* projective divide guards: `get_flow_np` (denoising_diffusion_pytorch.py:957-963,
  unconditional +1e-6), `from_homography_to_pixel_wise_mapping`
  (HEM/utils_operations/flow_and_mapping_operations.py:454-484, +1e-8),
  `get_flow` (HEM/model/utils.py:429-435, conditional +1e-6 when |z| < 1e-7).
* `adapt_homography_to_preprocessing_v3` / `homo_scale`
  (denoising_diffusion_pytorch.py:978-988, HEM/dataset/data_loader.py:29-39).
* 4-point DLT (HEM/model/net.py:24-92, exact solve of the 8x8 system).
* dense flow->H fit `homo_gen` (denoising_diffusion_pytorch.py:1647-1661).
  The reference materialises a (2*H*W, 8) system and computes `pinv`; here we
  solve the same least-squares problem through the 8x8 normal equations, which
  turns the whole fit into two MXU matmuls + a tiny solve - the TPU-native
  formulation (identical solution for full-rank systems).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dmhomo_tpu.geometry.grids import homogeneous_grid, pixel_grid

# ---------------------------------------------------------------------------
# application / H -> flow
# ---------------------------------------------------------------------------


def _projective_divide(xyz: jnp.ndarray, guard: str, eps: float) -> jnp.ndarray:
    """(..., 3) homogeneous -> (..., 2) with the reference's divide guards."""
    z = xyz[..., 2:3]
    if guard == "add":
        z = z + eps
    elif guard == "cond":
        # +eps only where |z| < 1e-7 (HEM/model/utils.py:429-431)
        z = z + eps * (1.0 - (jnp.abs(z) >= 1e-7).astype(z.dtype))
    else:
        raise ValueError(f"unknown guard {guard!r}")
    return xyz[..., :2] / z


def apply_homography(
    H: jnp.ndarray,
    pts: jnp.ndarray,
    guard: str = "cond",
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Apply homographies to 2D points.

    H: (..., 3, 3); pts: (..., N, 2) broadcastable against H's batch dims.
    Returns (..., N, 2).
    """
    ones = jnp.ones_like(pts[..., :1])
    xy1 = jnp.concatenate([pts, ones], axis=-1)  # (..., N, 3)
    # HIGHEST precision: pixel-coordinate math must not round through bf16
    out = jnp.einsum("...ij,...nj->...ni", H, xy1, precision=jax.lax.Precision.HIGHEST)
    return _projective_divide(out, guard, eps)


def homography_to_mapping(
    H: jnp.ndarray,
    h: int,
    w: int,
    guard: str = "add",
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Dense mapping of every pixel (x,y) under H.

    H: (..., 3, 3) -> (..., h, w, 2). Default guard matches the DGM condition
    pipeline (`get_flow_np`); pass eps=1e-8 for the HEM data-pipeline variant.
    """
    grid = homogeneous_grid(h, w, dtype=H.dtype)  # (h, w, 3)
    out = jnp.einsum(
        "...ij,hwj->...hwi", H, grid, precision=jax.lax.Precision.HIGHEST
    )  # (..., h, w, 3)
    return _projective_divide(out, guard, eps)


def homography_to_flow(
    H: jnp.ndarray,
    h: int,
    w: int,
    guard: str = "add",
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Dense flow field of H: flow(x) = H(x) - x.  (..., h, w, 2)."""
    mapping = homography_to_mapping(H, h, w, guard=guard, eps=eps)
    return mapping - pixel_grid(h, w, dtype=H.dtype)


def rescale_homography(H, src_hw, dst_hw):
    """Conjugate H from src (h0,w0) pixel coords into dst (h1,w1) coords.

    Matches `adapt_homography_to_preprocessing_v3`: H1 = M1 (M0^-1 H M0) M1^-1
    where Mi scale normalized coords by half-size (wi/2, hi/2) with half-size
    translation.  Works on (..., 3, 3).
    """
    h0, w0 = src_hw
    h1, w1 = dst_hw

    def _m(hh, ww):
        return np.array(
            [[ww / 2.0, 0.0, ww / 2.0], [0.0, hh / 2.0, hh / 2.0], [0.0, 0.0, 1.0]],
            dtype=np.float64,
        )

    m0 = _m(h0, w0)
    m1 = _m(h1, w1)
    pre = jnp.asarray(m1 @ np.linalg.inv(m0), dtype=H.dtype)
    post = jnp.asarray(m0 @ np.linalg.inv(m1), dtype=H.dtype)
    hi = jax.lax.Precision.HIGHEST  # 3x3 conjugation must not round via bf16
    return jnp.matmul(jnp.matmul(pre, H, precision=hi), post, precision=hi)


# ---------------------------------------------------------------------------
# DLT solves
# ---------------------------------------------------------------------------


def _dlt_system(src: jnp.ndarray, dst: jnp.ndarray):
    """Rows of the DLT system A h8 = b for correspondences src->dst.

    src, dst: (..., N, 2). Returns A: (..., 2N, 8), b: (..., 2N,).
    Row layout matches the reference's interleaving (x-eq then y-eq per point):
    [x, y, 1, 0, 0, 0, -u*x, -u*y] . h8 = u
    [0, 0, 0, x, y, 1, -v*x, -v*y] . h8 = v
    """
    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    rows_x = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], axis=-1)
    rows_y = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], axis=-1)
    A = jnp.concatenate([rows_x[..., None, :], rows_y[..., None, :]], axis=-2)
    A = A.reshape(*A.shape[:-3], -1, 8)  # (..., 2N, 8)
    b = jnp.stack([u, v], axis=-1).reshape(*u.shape[:-1], -1)  # (..., 2N)
    return A, b


def dlt_solve_4pt(src: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """Exact 4-point DLT: src (..., 4, 2), offset (..., 4, 2) -> H (..., 3, 3).

    dst = src + offset; solves the square 8x8 system exactly
    (reference: HEM/model/net.py:24-92 via `torch.linalg.inv`).
    """
    dst = src + offset
    A, b = _dlt_system(src, dst)
    h8 = jnp.linalg.solve(A, b[..., None])[..., 0]  # (..., 8)
    ones = jnp.ones_like(h8[..., :1])
    return jnp.concatenate([h8, ones], axis=-1).reshape(*h8.shape[:-1], 3, 3)


def _normalize_points(p: jnp.ndarray):
    """Hartley normalization: translate to centroid, scale mean dist to sqrt(2)."""
    c = jnp.mean(p, axis=-2, keepdims=True)
    d = jnp.mean(jnp.linalg.norm(p - c, axis=-1), axis=-1)  # (...,)
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-12)
    pn = (p - c) * s[..., None, None]
    # T such that pn_hom = T @ p_hom
    zeros = jnp.zeros_like(s)
    ones = jnp.ones_like(s)
    T = jnp.stack(
        [
            jnp.stack([s, zeros, -s * c[..., 0, 0]], axis=-1),
            jnp.stack([zeros, s, -s * c[..., 0, 1]], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return pn, T


def homography_from_points(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Least-squares homography from N>=4 correspondences (..., N, 2).

    Normalized-DLT least squares - the drop-in for
    `cv2.findHomography(src, dst)` (method=0) used by the CATestSet reader
    (denoising_diffusion_pytorch.py:1200-1211).  Output scaled to H[2,2]=1.
    """
    src_n, T_src = _normalize_points(src)
    dst_n, T_dst = _normalize_points(dst)
    A, b = _dlt_system(src_n, dst_n)
    At = jnp.swapaxes(A, -1, -2)
    hi = jax.lax.Precision.HIGHEST
    G = jnp.matmul(At, A, precision=hi)
    rhs = jnp.matmul(At, b[..., None], precision=hi)[..., 0]
    h8 = jnp.linalg.solve(G, rhs[..., None])[..., 0]
    ones = jnp.ones_like(h8[..., :1])
    Hn = jnp.concatenate([h8, ones], axis=-1).reshape(*h8.shape[:-1], 3, 3)
    H = jnp.matmul(
        jnp.matmul(jnp.linalg.inv(T_dst), Hn, precision=hi), T_src, precision=hi
    )
    return H / H[..., 2:3, 2:3]


def homography_from_points_ax0(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Null-space (Ax0) DLT via SVD - the reference `DLT(method='Ax0')`
    (HEM/model/utils.py:86-92): H is the smallest right singular vector of
    the homogeneous (..., 2N, 9) system.  Same solution space as the
    Axb/least-squares variants on consistent data; Hartley-normalized here
    for fp32 conditioning.  Output scaled to H[2,2]=1."""
    src_n, T_src = _normalize_points(src)
    dst_n, T_dst = _normalize_points(dst)
    A8, b = _dlt_system(src_n, dst_n)
    # reference column layout [M1 | -M2 | -M3] == [A8 | -b]
    A9 = jnp.concatenate([A8, -b[..., None]], axis=-1)  # (..., 2N, 9)
    _, _, vt = jnp.linalg.svd(A9, full_matrices=True)
    h9 = vt[..., -1, :]
    Hn = h9.reshape(*h9.shape[:-1], 3, 3)
    hi = jax.lax.Precision.HIGHEST
    H = jnp.matmul(
        jnp.matmul(jnp.linalg.inv(T_dst), Hn, precision=hi), T_src, precision=hi
    )
    return H / H[..., 2:3, 2:3]


def fit_homography_to_flow(flow: jnp.ndarray) -> jnp.ndarray:
    """Fit one H per batch item to a dense flow field.

    flow: (B, h, w, 2) -> H: (B, 3, 3) with H(x) ~= x + flow(x) for all pixels.
    Least-squares over every pixel via 8x8 normal equations (the TPU-native
    replacement for the reference's pinv of a (2hw, 8) matrix,
    denoising_diffusion_pytorch.py:1639,1647-1661).
    """
    B, h, w, _ = flow.shape
    grid = pixel_grid(h, w, dtype=flow.dtype).reshape(1, -1, 2)
    src = jnp.broadcast_to(grid, (B, h * w, 2))
    dst = src + flow.reshape(B, -1, 2)

    # Normalize coordinates to ~[-1, 1] for fp32 conditioning (the reference
    # gets away without it by solving in float64; the normalized system has
    # the same exact solution for homography-consistent flows).
    scale = jnp.asarray([2.0 / max(w - 1, 1), 2.0 / max(h - 1, 1)], flow.dtype)
    shift = jnp.asarray([1.0, 1.0], flow.dtype)
    src_n = src * scale - shift
    dst_n = dst * scale - shift

    def solve_one(s, d):
        A, b = _dlt_system(s, d)  # (2hw, 8), (2hw,)
        # fp32 accumulation on the MXU; 8x8 solve is negligible.
        hi = jax.lax.Precision.HIGHEST
        G = jnp.matmul(A.T, A, precision=hi)
        rhs = jnp.matmul(A.T, b, precision=hi)
        h8 = jnp.linalg.solve(G, rhs)
        return jnp.concatenate([h8, jnp.ones((1,), flow.dtype)]).reshape(3, 3)

    Hn = jax.vmap(solve_one)(src_n, dst_n)
    # un-normalize: H = T^-1 Hn T with T = diag(sx, sy) with -1 shift
    T_np = np.array(
        [
            [2.0 / max(w - 1, 1), 0.0, -1.0],
            [0.0, 2.0 / max(h - 1, 1), -1.0],
            [0.0, 0.0, 1.0],
        ],
        dtype=np.float64,
    )
    T = jnp.asarray(T_np, flow.dtype)
    Tinv = jnp.asarray(np.linalg.inv(T_np), flow.dtype)
    hi = jax.lax.Precision.HIGHEST
    H = jnp.matmul(jnp.matmul(Tinv, Hn, precision=hi), T, precision=hi)
    return H / H[..., 2:3, 2:3]
