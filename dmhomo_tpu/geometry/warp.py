"""Dense warping / resampling ops (NHWC, clamp-gather based).

The reference mixes three bilinear-warp implementations with *different*
boundary semantics; HEM inference numbers depend on which one runs:

* ``mode='border'``  - clamp sample coords to the image, then bilinear.
  Equals `flow_warp`'s grid_sample(padding='border', align_corners=True)
  (denoising_diffusion_pytorch.py:1262-1280) and `WarpImages`'s pre-clamped
  gather (HEM/model/utils.py:104-197).
* ``mode='collapse'`` - the `transformer`/`_interpolate` gather
  (HEM/model/utils.py:443-545): coords are *not* pre-clamped; the four tap
  indices are clamped and the interpolation weights are computed from the
  clamped tap positions against the raw coordinate.  Outside the image the
  two taps collapse to the same pixel and the weights sum to ~0, so
  out-of-range samples fade to zero.  This is the variant OSNet/Swin use
  (`get_warp_flow`, HEM/model/utils.py:548-553) - match it exactly.

Resizes reproduce torch.nn.functional.interpolate semantics
(align_corners=True bilinear; floor-scaled nearest) as two small matmuls /
gathers so they map onto the MXU instead of a scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dmhomo_tpu.geometry.grids import pixel_grid


def _gather_hw(img_flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """img_flat: (B, H*W, C); idx: (B, N) int32 -> (B, N, C)."""
    return jax.vmap(lambda im, ix: jnp.take(im, ix, axis=0))(img_flat, idx)


def _taps_and_weights(img_hw, coords, mode: str, wdt):
    """Per-axis taps and separable bilinear weights for both warp modes.

    The 4-tap weights factorize per axis (wa = wx0*wy0, wb = wx0*wy1,
    wc = wx1*wy0, wd = wx1*wy1) for both boundary semantics, which is what
    lets the warp run as two dense interpolation matmuls.
    Returns int32 taps (x0i, x1i, y0i, y1i) and weights (wx0, wx1, wy0, wy1),
    all shaped like coords[..., 0].
    """
    H, W = img_hw
    x = coords[..., 0]
    y = coords[..., 1]
    if mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
    elif mode != "collapse":
        raise ValueError(f"unknown mode {mode!r}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H - 1)

    if mode == "border":
        # grid_sample semantics: weights from the *unclamped* tap positions
        # of the (already clamped) coordinate; only gather indices clamp.
        x0f, x1f = x0, x0 + 1.0
        y0f, y1f = y0, y0 + 1.0
    else:
        # HEM `_interpolate` semantics: weights from the *clamped* tap
        # positions against the raw coordinate (zero-collapse outside).
        x0f = x0i.astype(wdt)
        x1f = x1i.astype(wdt)
        y0f = y0i.astype(wdt)
        y1f = y1i.astype(wdt)
    return x0i, x1i, y0i, y1i, x1f - x, x - x0f, y1f - y, y - y0f


def _bilinear_sample_gather(img, coords, mode):
    """4-tap gather formulation (the reference semantics, kept as the
    parity oracle).  On the TPU XLA lowers these gathers to ~0.3 GB/s
    row-fetch loops (BENCH.md gather shootout) - use the matmul path there."""
    B, H, W, C = img.shape
    _, h, w, _ = coords.shape
    x0i, x1i, y0i, y1i, wx0, wx1, wy0, wy1 = jax.tree.map(
        lambda a: a.reshape(B, -1),
        _taps_and_weights((H, W), coords, mode, img.dtype),
    )
    wa, wb = wx0 * wy0, wx0 * wy1
    wc, wd = wx1 * wy0, wx1 * wy1

    flat = img.reshape(B, H * W, C)
    Ia = _gather_hw(flat, y0i * W + x0i)
    Ib = _gather_hw(flat, y1i * W + x0i)
    Ic = _gather_hw(flat, y0i * W + x1i)
    Id = _gather_hw(flat, y1i * W + x1i)

    out = (
        wa[..., None] * Ia + wb[..., None] * Ib + wc[..., None] * Ic + wd[..., None] * Id
    )
    return out.reshape(B, h, w, C)


def _bilinear_sample_matmul(img, coords, mode):
    """Bilinear warp as two dense one-hot-weighted interpolation matmuls.

    TPU-native formulation: per output-row chunk, build the vertical
    interpolation matrix U (B, ch, w, H) and horizontal V (B, ch, w, W)
    from iota comparisons (2 nonzeros per row), contract U with the image
    on the MXU, then reduce against V.  ~8x faster than the 4-tap gather
    on v5e (47 vs 370 ms at (32, 320, 576); BENCH.md) and the backward is
    matmuls instead of scatter-adds.  fp32 inputs run at HIGHEST precision
    (exact); bf16 inputs at the activation width.
    """
    B, H, W, C = img.shape
    _, h, w, _ = coords.shape
    f32 = img.dtype == jnp.float32
    wdt = jnp.float32 if f32 else img.dtype
    prec = jax.lax.Precision.HIGHEST if f32 else None
    x0i, x1i, y0i, y1i, wx0, wx1, wy0, wy1 = _taps_and_weights(
        (H, W), coords, mode, jnp.float32
    )

    # chunk output rows so the (B, ch, w, W, C) middle stays bounded
    budget = 256 * 2**20
    bytes_per_row = B * w * W * C * (4 if f32 else 2)
    ch = max(1, min(h, budget // max(bytes_per_row, 1)))
    while h % ch:
        ch -= 1
    ih = jnp.arange(H, dtype=jnp.int32)
    iw = jnp.arange(W, dtype=jnp.int32)
    imgw = img.astype(wdt)

    def one_chunk(c):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c * ch, ch, axis=1)
        # cast the tap weights BEFORE the broadcast-multiply: the (B, ch,
        # w, H/W) products then build directly in the matmul dtype.  On
        # the bf16 path this halves the largest tensors in the HEM step
        # (the r5 HLO breakdown shows 425 MB f32 selects + converts per
        # chunk when the chain runs f32-then-cast); numerically it only
        # adds one bf16 rounding to the two-tap sum — the einsum consumes
        # U/V at bf16 either way.  fp32 inputs: wdt == f32, identical.
        wv = lambda a: sl(a).astype(wdt)[..., None]
        U = (
            wv(wy0) * (sl(y0i)[..., None] == ih).astype(wdt)
            + wv(wy1) * (sl(y1i)[..., None] == ih).astype(wdt)
        )  # (B, ch, w, H)
        V = (
            wv(wx0) * (sl(x0i)[..., None] == iw).astype(wdt)
            + wv(wx1) * (sl(x1i)[..., None] == iw).astype(wdt)
        )  # (B, ch, w, W)
        T = jnp.einsum("bpwh,bhvc->bpwvc", U, imgw, precision=prec)
        return jnp.einsum("bpwvc,bpwv->bpwc", T, V, precision=prec)

    if ch == h:
        out = one_chunk(0)
    else:
        # checkpoint the chunk body: the scan backward would otherwise
        # stack every chunk's U/V/T residuals (n x 100 MB-class buffers);
        # recomputing them from iota comparisons is nearly free
        out = jax.lax.map(jax.checkpoint(one_chunk), jnp.arange(h // ch))
        out = jnp.moveaxis(out, 0, 1).reshape(B, h, w, C)  # (n,B,ch,w,C) -> rows
    return out.astype(img.dtype)


def bilinear_sample(
    img: jnp.ndarray, coords: jnp.ndarray, mode: str = "collapse",
    method: str | None = None,
) -> jnp.ndarray:
    """Sample ``img`` at pixel ``coords``.

    img: (B, H, W, C); coords: (B, h, w, 2) of (x, y) pixel positions.
    Returns (B, h, w, C).  ``method='matmul'`` (default) runs the
    MXU-friendly interpolation-matrix formulation; ``method='gather'``
    the 4-tap gather oracle (identical math).  The choice is plumbed
    through config (EstimatorConfig.warp_method / SwinConfig.warp_method)
    — an env var here would be read at TRACE time, which jit caches are
    not keyed on (the round-2/3 footgun this replaced).
    """
    method = method or "matmul"
    if method == "gather":
        return _bilinear_sample_gather(img, coords, mode)
    return _bilinear_sample_matmul(img, coords, mode)


def warp_by_flow(
    img: jnp.ndarray, flow: jnp.ndarray, mode: str = "collapse",
    method: str | None = None,
) -> jnp.ndarray:
    """Backward-warp: out(x) = img(x + flow(x)).

    img (B,H,W,C), flow (B,h,w,2) -> (B,h,w,C). ``mode='border'`` gives the
    DGM `flow_warp` semantics; ``mode='collapse'`` the HEM `get_warp_flow`.
    ``method`` as in :func:`bilinear_sample` (None = 'matmul').
    """
    _, h, w, _ = flow.shape
    coords = pixel_grid(h, w, dtype=flow.dtype)[None] + flow
    return bilinear_sample(img, coords, mode=mode, method=method)


def warp_by_homography(
    img: jnp.ndarray, H: jnp.ndarray, mode: str = "collapse", guard: str = "cond"
) -> jnp.ndarray:
    """out(x) = img(H(x)).  img (B,H,W,C), H (B,3,3)."""
    from dmhomo_tpu.geometry.homography import homography_to_mapping

    b, hh, ww, _ = img.shape
    coords = homography_to_mapping(H, hh, ww, guard=guard)
    return bilinear_sample(img, coords, mode=mode)


# ---------------------------------------------------------------------------
# resizes (torch-compatible semantics, expressed as matmuls / gathers)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=128)
def _align_corners_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) interpolation matrix for align_corners=True bilinear."""
    M = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1:
        M[0, 0] = 1.0
        return M
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, n_in - 1)
    hi = np.clip(lo + 1, 0, n_in - 1)
    frac = (src - lo).astype(np.float32)
    M[np.arange(n_out), lo] += 1.0 - frac
    M[np.arange(n_out), hi] += frac
    return M


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=True) on NHWC.

    Implemented as two dense matmuls (separable kernel) - MXU-friendly and
    exactly reproducible, unlike jax.image.resize's half-pixel convention.
    """
    _, H, W, _ = x.shape
    oh, ow = out_hw
    Mh = jnp.asarray(_align_corners_matrix(H, oh), dtype=x.dtype)
    Mw = jnp.asarray(_align_corners_matrix(W, ow), dtype=x.dtype)
    hi = jax.lax.Precision.HIGHEST  # flows feed the eval metric - keep fp32
    y = jnp.einsum("oh,bhwc->bowc", Mh, x, precision=hi)
    return jnp.einsum("pw,bowc->bopc", Mw, y, precision=hi)


@functools.lru_cache(maxsize=128)
def _half_pixel_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) matrix for align_corners=False (half-pixel) bilinear -
    the cv2.resize(INTER_LINEAR) / F.interpolate(align_corners=False)
    convention, taps edge-clamped."""
    M = np.zeros((n_out, n_in), dtype=np.float32)
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = (src - lo).astype(np.float32)
    lo_c = np.clip(lo, 0, n_in - 1)
    hi_c = np.clip(lo + 1, 0, n_in - 1)
    M[np.arange(n_out), lo_c] += 1.0 - frac
    M[np.arange(n_out), hi_c] += frac
    return M


def resize_bilinear(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Half-pixel bilinear resize on NHWC (cv2 INTER_LINEAR semantics for
    float inputs), as two separable matmuls."""
    _, H, W, _ = x.shape
    oh, ow = out_hw
    Mh = jnp.asarray(_half_pixel_matrix(H, oh), dtype=x.dtype)
    Mw = jnp.asarray(_half_pixel_matrix(W, ow), dtype=x.dtype)
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,bhwc->bowc", Mh, x, precision=hi)
    return jnp.einsum("pw,bowc->bopc", Mw, y, precision=hi)


def resize_nearest(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') on NHWC: src = floor(i * in/out)."""
    _, H, W, _ = x.shape
    oh, ow = out_hw
    iy = np.clip(np.floor(np.arange(oh) * (H / oh)).astype(np.int32), 0, H - 1)
    ix = np.clip(np.floor(np.arange(ow) * (W / ow)).astype(np.int32), 0, W - 1)
    return x[:, jnp.asarray(iy)][:, :, jnp.asarray(ix)]


def upsample_flow_to(flow: jnp.ndarray, out_hw, scale: bool = True) -> jnp.ndarray:
    """Resize a flow field with magnitude rescale.

    Matches `upsample2d_flow_as(..., if_rate=True)` (HEM/model/utils.py:556-572):
    multiply (u, v) by (w_out/w_in, h_out/h_in) *before* the align-corners
    bilinear resize. flow: (B, h, w, 2).
    """
    _, h, w, _ = flow.shape
    oh, ow = out_hw
    if scale:
        factors = jnp.asarray([ow / w, oh / h], dtype=flow.dtype)
        flow = flow * factors
    return resize_bilinear_align_corners(flow, out_hw)
