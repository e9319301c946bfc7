"""Golden-value tests for the geometry library.

Each test re-derives the reference's numerics independently (numpy/torch
formulas written from the spec in SURVEY.md) and checks our jnp versions
against them.  The warp-consistency invariant the reference only eyeballs in
GIFs (SURVEY.md section 4) is asserted numerically here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dmhomo_tpu.geometry import (
    apply_homography,
    bilinear_sample,
    dlt_solve_4pt,
    fit_homography_to_flow,
    flow_to_rgb,
    gen_homography_basis,
    homography_from_points,
    homography_to_flow,
    homography_to_mapping,
    hsv_to_rgb,
    pixel_grid,
    rescale_homography,
    resize_bilinear_align_corners,
    resize_nearest,
    upsample_flow_to,
    warp_by_flow,
    warp_by_homography,
)


def _random_homography(rng, scale=0.05):
    """A mild random homography around identity (tame projective row)."""
    d = rng.normal(0, scale, (3, 3))
    d[2, :2] *= 1e-3  # keep the projective divide well away from zero
    d[2, 2] = 0.0
    H = np.eye(3) + d
    return H / H[2, 2]


# ---------------------------------------------------------------------------
# grids / H -> flow
# ---------------------------------------------------------------------------


def test_pixel_grid_layout():
    g = np.asarray(pixel_grid(3, 5))
    assert g.shape == (3, 5, 2)
    assert g[1, 4, 0] == 4 and g[1, 4, 1] == 1  # (x, y)


def test_homography_to_mapping_matches_numpy_golden(rng):
    H = _random_homography(rng)
    h, w = 36, 64
    # independent numpy derivation (from_homography_to_pixel_wise_mapping spec)
    X, Y = np.meshgrid(np.arange(w), np.arange(h))
    XYhom = np.stack([X.ravel(), Y.ravel(), np.ones(h * w)], axis=0)
    warped = H @ XYhom
    gx = (warped[0] / (warped[2] + 1e-8)).reshape(h, w)
    gy = (warped[1] / (warped[2] + 1e-8)).reshape(h, w)

    # fp64 host variant: bit-parity with the reference's CPU condition path
    from dmhomo_tpu.geometry.host import homography_to_mapping_np

    m64 = homography_to_mapping_np(H, h, w, eps=1e-8)
    np.testing.assert_allclose(m64[..., 0], gx, atol=1e-5)
    np.testing.assert_allclose(m64[..., 1], gy, atol=1e-5)

    # fp32 device variant: within fp32 round-off of the fp64 golden
    m = np.asarray(homography_to_mapping(jnp.asarray(H, jnp.float32), h, w, eps=1e-8))
    np.testing.assert_allclose(m[..., 0], gx, atol=5e-2)
    np.testing.assert_allclose(m[..., 1], gy, atol=5e-2)


def test_homography_to_flow_identity_is_zero():
    flow = np.asarray(homography_to_flow(jnp.eye(3), 24, 32))
    # the reference's unconditional +1e-6 divide guard leaves a tiny residual
    assert np.abs(flow).max() < 1e-3


def test_apply_homography_roundtrip(rng):
    H = _random_homography(rng)
    pts = rng.uniform(0, 100, (1, 10, 2)).astype(np.float32)
    out = np.asarray(apply_homography(jnp.asarray(H, jnp.float32)[None], jnp.asarray(pts)))
    back = np.asarray(
        apply_homography(jnp.asarray(np.linalg.inv(H), jnp.float32)[None], jnp.asarray(out))
    )
    np.testing.assert_allclose(back, pts, atol=5e-2)


def test_rescale_homography_conjugation(rng):
    """Must equal adapt_homography_to_preprocessing_v3: M1 (M0^-1 H M0) M1^-1."""
    H = _random_homography(rng)
    h0, w0, h1, w1 = 360, 640, 256, 256

    def _m(hh, ww):
        return np.array([[ww / 2, 0, ww / 2], [0, hh / 2, hh / 2], [0, 0, 1.0]])

    golden = _m(h1, w1) @ np.linalg.inv(_m(h0, w0)) @ H @ _m(h0, w0) @ np.linalg.inv(_m(h1, w1))
    ours = np.asarray(rescale_homography(jnp.asarray(H, jnp.float32), (h0, w0), (h1, w1)))
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_rescale_homography_maps_scaled_points(rng):
    """Semantics check: the rescaled H acts on rescaled coordinates."""
    H = _random_homography(rng)
    Hs = np.asarray(rescale_homography(jnp.asarray(H, jnp.float32), (360, 640), (256, 256)))
    pts = rng.uniform(50, 300, (1, 6, 2)).astype(np.float32)
    mapped = np.asarray(apply_homography(jnp.asarray(H, jnp.float32)[None], jnp.asarray(pts)))
    sx, sy = 256 / 640, 256 / 360
    pts_s = pts * np.array([sx, sy], np.float32)
    mapped_s = np.asarray(apply_homography(jnp.asarray(Hs, jnp.float32)[None], jnp.asarray(pts_s)))
    # half-pixel conjugation is not a pure scaling; allow ~1px slack on 256 grid
    np.testing.assert_allclose(mapped_s, mapped * np.array([sx, sy]), atol=1.0)


# ---------------------------------------------------------------------------
# DLT solves
# ---------------------------------------------------------------------------


def test_dlt_solve_4pt_exact(rng):
    H = _random_homography(rng)
    src = np.array([[0, 0], [319, 0], [0, 239], [319, 239]], np.float32)[None]
    dst = np.asarray(apply_homography(jnp.asarray(H, jnp.float32)[None], jnp.asarray(src)))
    Hhat = np.array(dlt_solve_4pt(jnp.asarray(src), jnp.asarray(dst - src)))[0]
    Hhat /= Hhat[2, 2]
    np.testing.assert_allclose(Hhat, H, atol=1e-2)


def test_dlt_solve_4pt_batched(rng):
    src = np.tile(np.array([[0, 0], [100, 0], [0, 80], [100, 80]], np.float32), (4, 1, 1))
    off = rng.normal(0, 3, (4, 4, 2)).astype(np.float32)
    Hs = np.asarray(dlt_solve_4pt(jnp.asarray(src), jnp.asarray(off)))
    assert Hs.shape == (4, 3, 3)
    dst = np.asarray(apply_homography(jnp.asarray(Hs), jnp.asarray(src)))
    np.testing.assert_allclose(dst, src + off, atol=1e-2)


def test_homography_from_points_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    H = _random_homography(rng)
    src = rng.uniform(0, 600, (6, 2)).astype(np.float32)
    dst = np.asarray(apply_homography(jnp.asarray(H, jnp.float32)[None], jnp.asarray(src[None])))[0]
    H_cv, _ = cv2.findHomography(src.reshape(1, -1, 2), dst.reshape(1, -1, 2))
    H_ours = np.asarray(homography_from_points(jnp.asarray(src[None]), jnp.asarray(dst[None])))[0]
    np.testing.assert_allclose(H_ours, H_cv, atol=5e-3)


def test_fit_homography_to_flow_roundtrip(rng):
    H = np.stack([_random_homography(rng, 0.02) for _ in range(3)]).astype(np.float32)
    flow = homography_to_flow(jnp.asarray(H), 64, 96, guard="cond")
    Hhat = np.array(fit_homography_to_flow(flow))
    Hhat /= Hhat[:, 2:, 2:]
    np.testing.assert_allclose(Hhat, H, atol=1e-2)


# ---------------------------------------------------------------------------
# warps
# ---------------------------------------------------------------------------


def test_warp_border_matches_grid_sample(rng):
    """mode='border' must match grid_sample(border, align_corners=True)."""
    img = rng.uniform(0, 1, (2, 20, 28, 3)).astype(np.float32)
    flow = rng.normal(0, 3, (2, 20, 28, 2)).astype(np.float32)

    ours = np.asarray(warp_by_flow(jnp.asarray(img), jnp.asarray(flow), mode="border"))

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_flow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    B, _, Hh, Ww = t_img.shape
    xx = torch.arange(Ww).view(1, 1, 1, Ww).expand(B, 1, Hh, Ww)
    yy = torch.arange(Hh).view(1, 1, Hh, 1).expand(B, 1, Hh, Ww)
    grid = torch.cat([xx, yy], 1).float() + t_flow
    gx = 2.0 * grid[:, 0] / (Ww - 1) - 1.0
    gy = 2.0 * grid[:, 1] / (Hh - 1) - 1.0
    vgrid = torch.stack([gx, gy], dim=-1)
    golden = F.grid_sample(t_img, vgrid, mode="bilinear", padding_mode="border", align_corners=True)
    golden = golden.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, golden, atol=1e-4)


def _interpolate_collapse_golden(img, coords):
    """Independent numpy re-derivation of HEM's `_interpolate` semantics."""
    B, H, W, C = img.shape
    out = np.zeros((B,) + coords.shape[1:3] + (C,), np.float32)
    for b in range(B):
        x = coords[b, ..., 0].ravel()
        y = coords[b, ..., 1].ravel()
        x0 = np.floor(x).astype(int)
        y0 = np.floor(y).astype(int)
        x0c, x1c = np.clip(x0, 0, W - 1), np.clip(x0 + 1, 0, W - 1)
        y0c, y1c = np.clip(y0, 0, H - 1), np.clip(y0 + 1, 0, H - 1)
        wa = (x1c - x) * (y1c - y)
        wb = (x1c - x) * (y - y0c)
        wc = (x - x0c) * (y1c - y)
        wd = (x - x0c) * (y - y0c)
        flat = img[b].reshape(-1, C)
        vals = (
            wa[:, None] * flat[y0c * W + x0c]
            + wb[:, None] * flat[y1c * W + x0c]
            + wc[:, None] * flat[y0c * W + x1c]
            + wd[:, None] * flat[y1c * W + x1c]
        )
        out[b] = vals.reshape(coords.shape[1:3] + (C,))
    return out


def test_warp_collapse_matches_reference_semantics(rng):
    img = rng.uniform(0, 1, (2, 16, 24, 2)).astype(np.float32)
    coords = rng.uniform(-4, 28, (2, 16, 24, 2)).astype(np.float32)
    ours = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords), mode="collapse"))
    golden = _interpolate_collapse_golden(img, coords)
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_warp_consistency_invariant(rng):
    """Warping by H's flow == resampling by H directly (the GIF check, numeric)."""
    H = _random_homography(rng, 0.01).astype(np.float32)
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    flow = homography_to_flow(jnp.asarray(H)[None], 64, 64, guard="cond")
    via_flow = np.asarray(warp_by_flow(jnp.asarray(img), flow, mode="border"))
    via_h = np.asarray(warp_by_homography(jnp.asarray(img), jnp.asarray(H)[None], mode="border"))
    np.testing.assert_allclose(via_flow, via_h, atol=1e-3)


def test_identity_warp_preserves_interior(rng):
    img = rng.uniform(0, 1, (1, 10, 12, 1)).astype(np.float32)
    out = np.asarray(warp_by_flow(jnp.asarray(img), jnp.zeros((1, 10, 12, 2))))
    # collapse mode zeroes exact-boundary pixels (reference quirk) - interior only
    np.testing.assert_allclose(out[:, :-1, :-1], img[:, :-1, :-1], atol=1e-5)


# ---------------------------------------------------------------------------
# resizes
# ---------------------------------------------------------------------------


def test_resize_bilinear_matches_torch(rng):
    x = rng.normal(0, 1, (2, 20, 36, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (45, 80)))
    golden = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), [45, 80], mode="bilinear", align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_resize_nearest_matches_torch(rng):
    x = rng.normal(0, 1, (2, 20, 36, 3)).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), (45, 80)))
    golden = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), [45, 80], mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_upsample_flow_scales_magnitude(rng):
    flow = rng.normal(0, 2, (1, 40, 72, 2)).astype(np.float32)
    up = np.asarray(upsample_flow_to(jnp.asarray(flow), (320, 576)))
    assert up.shape == (1, 320, 576, 2)
    # corners map exactly under align_corners=True
    np.testing.assert_allclose(up[0, 0, 0], flow[0, 0, 0] * 8.0, atol=1e-4)
    np.testing.assert_allclose(up[0, -1, -1], flow[0, -1, -1] * 8.0, atol=1e-4)


# ---------------------------------------------------------------------------
# flow viz / basis
# ---------------------------------------------------------------------------


def test_hsv_to_rgb_matches_matplotlib(rng):
    from matplotlib.colors import hsv_to_rgb as mpl_hsv

    hsv = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(hsv_to_rgb(jnp.asarray(hsv))), mpl_hsv(hsv), atol=1e-5)


def test_flow_to_rgb_matches_reference_formula(rng):
    from matplotlib.colors import hsv_to_rgb as mpl_hsv

    flow = rng.normal(0, 20, (24, 24, 2)).astype(np.float32)
    u, v = flow[..., 0], flow[..., 1]
    mag = np.sqrt(u**2 + v**2)
    angle = np.arctan2(v, u)
    im_h = np.mod(angle / (2 * np.pi) + 1, 1)
    im_s = np.clip(mag * 8 / 256.0, 0, 1)
    im_v = np.clip(8 - im_s, 0, 1)
    golden = mpl_hsv(np.stack([im_h, im_s, im_v], 2))
    np.testing.assert_allclose(np.asarray(flow_to_rgb(jnp.asarray(flow))), golden, atol=1e-4)


def test_gen_basis_matches_torch_qr():
    """QR sign/values must match torch.qr so imported HEM weights line up."""
    h, w = 20, 36
    ours = gen_homography_basis(h, w)

    xx, yy = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    zeros, ones = np.zeros_like(xx), np.ones_like(xx)
    fields = [
        (xx, zeros), (yy, zeros), (ones, zeros), (zeros, xx),
        (zeros, yy), (zeros, ones), (xx * xx, xx * yy), (xx * yy, yy * yy),
    ]
    flows = torch.from_numpy(
        np.stack([np.stack([a, b], axis=-1) for a, b in fields], 0)
    )  # (8, h, w, 2)
    q, _ = torch.linalg.qr(flows.reshape(8, -1).T)
    q = q.T.reshape(8, h, w, 2)
    mx = q.abs().reshape(8, -1).max(1)[0].reshape(8, 1, 1, 1)
    golden = (q / mx).numpy()
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_basis_spans_homography_flows(rng):
    """Any small homography flow should be (nearly) in the basis span."""
    h, w = 32, 48
    basis = gen_homography_basis(h, w).reshape(8, -1)  # (8, N)
    H = _random_homography(rng, 0.005).astype(np.float32)
    flow = np.asarray(homography_to_flow(jnp.asarray(H)[None], h, w, guard="cond")).reshape(-1)
    coef, *_ = np.linalg.lstsq(basis.T, flow, rcond=None)
    recon = basis.T @ coef
    resid = np.abs(recon - flow).max()
    assert resid < 0.5, f"basis span residual too large: {resid}"


def test_jit_compatibility():
    """Core ops must trace under jit with no concretization errors."""
    H = jnp.eye(3)[None]
    img = jnp.ones((1, 32, 32, 3))

    @jax.jit
    def fn(H, img):
        flow = homography_to_flow(H, 32, 32)
        warped = warp_by_flow(img, flow)
        Hf = fit_homography_to_flow(flow)
        return warped.sum() + Hf.sum()

    out = fn(H, img)
    assert np.isfinite(float(out))


def test_homography_from_points_ax0_matches_reference_svd(rng):
    """Ax0 (SVD null-space) DLT == the reference DLT(method='Ax0')
    (HEM/model/utils.py:86-92) and recovers an exact H from >=4 points."""
    import torch

    from dmhomo_tpu.geometry import homography_from_points_ax0

    H_true = np.eye(3) + rng.normal(0, 0.05, (3, 3))
    H_true[2, :2] *= 1e-3
    H_true /= H_true[2, 2]
    src = rng.uniform(0, 100, (1, 6, 2)).astype(np.float64)
    ones = np.ones((1, 6, 1))
    dh = np.concatenate([src, ones], axis=-1) @ H_true.T
    dst = dh[..., :2] / dh[..., 2:]

    ours = np.asarray(
        homography_from_points_ax0(
            jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32)
        )
    )[0]
    np.testing.assert_allclose(ours, H_true, atol=2e-3)

    # golden: the reference's torch implementation (unnormalized, fp64)
    xy1 = torch.cat([torch.tensor(src), torch.ones(1, 6, 1, dtype=torch.float64)], -1)
    zeros = torch.zeros(1, 6, 3, dtype=torch.float64)
    M1 = torch.cat([torch.cat([xy1, zeros], -1), torch.cat([zeros, xy1], -1)], -1).view(1, -1, 6)
    t_dst = torch.tensor(dst)
    M2 = torch.matmul(t_dst.reshape(-1, 2, 1), torch.tensor(src).reshape(-1, 1, 2)).view(1, -1, 2)
    M3 = t_dst.reshape(1, -1, 1)
    A = torch.cat([M1, -M2, -M3], -1)
    _, _, V = torch.svd(A)
    Href = V.transpose(-2, -1).conj()[:, -1].view(3, 3)
    Href = (Href / Href[2, 2]).numpy()
    np.testing.assert_allclose(ours, Href, atol=2e-3)


def test_bilinear_sample_matmul_matches_gather(rng):
    """The MXU interpolation-matrix warp == the 4-tap gather oracle,
    both boundary modes, C=1 and C=3, including out-of-range coords."""
    from dmhomo_tpu.geometry.warp import bilinear_sample

    B, H, W = 2, 20, 28
    for C in (1, 3):
        img = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32))
        coords = jnp.asarray(
            rng.uniform(-4, max(H, W) + 3, (B, 15, 17, 2)).astype(np.float32)
        )
        for mode in ("border", "collapse"):
            a = bilinear_sample(img, coords, mode=mode, method="matmul")
            b = bilinear_sample(img, coords, mode=mode, method="gather")
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bilinear_sample_matmul_grad_matches_gather(rng):
    """Gradients (w.r.t. image and flow) of the matmul warp equal the
    gather oracle's - the backward is matmuls instead of scatter-adds."""
    from dmhomo_tpu.geometry.warp import warp_by_flow

    B, H, W, C = 2, 12, 14, 2
    img = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 2, (B, H, W, 2)).astype(np.float32))
    # keep coords away from integer lattice points (floor() kinks make the
    # two formulations' subgradients differ exactly at integers)
    flow = jnp.where(jnp.abs(flow - jnp.round(flow)) < 1e-3, flow + 0.01, flow)

    def loss(img, flow, method):
        out = warp_by_flow(img, flow, mode="collapse") if method == "matmul" else None
        if method == "gather":
            from dmhomo_tpu.geometry.warp import bilinear_sample
            from dmhomo_tpu.geometry.grids import pixel_grid

            coords = pixel_grid(H, W, dtype=flow.dtype)[None] + flow
            out = bilinear_sample(img, coords, mode="collapse", method="gather")
        return (out * out).sum()

    gi_m, gf_m = jax.grad(loss, (0, 1))(img, flow, "matmul")
    gi_g, gf_g = jax.grad(loss, (0, 1))(img, flow, "gather")
    np.testing.assert_allclose(np.asarray(gi_m), np.asarray(gi_g), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf_m), np.asarray(gf_g), atol=1e-4)
