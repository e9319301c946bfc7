"""Flow -> RGB rendering used as the DGM conditioning image.

Parity target: `flow_to_image` (denoising_diffusion_pytorch.py:1471-1486) -
an HSV encoding with max_flow=256, n=8 where hue encodes direction,
saturation encodes magnitude and value = clip(n - s, 0, 1) (== 1.0 for the
magnitudes seen in practice).  The HSV->RGB conversion reproduces
matplotlib.colors.hsv_to_rgb.  Pure jnp so the whole condition pipeline can
run jitted on device.
"""

from __future__ import annotations

import jax.numpy as jnp


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) HSV in [0,1] -> (..., 3) RGB in [0,1] (matplotlib convention)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = jnp.mod(i, 6.0).astype(jnp.int32)

    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _middlebury_color_wheel():
    """55-color Middlebury wheel (flow_to_image_luo parity, :1328-1381)."""
    import numpy as np

    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col : col + MR, 0] = 255
    return wheel


def flow_to_rgb_middlebury(flow) -> "jnp.ndarray":
    """Middlebury color-code rendering (`flow_to_image_luo`,
    denoising_diffusion_pytorch.py:1318-1468).  Host-side numpy; used only
    for qualitative previews.  flow: (h, w, 2) -> (h, w, 3) in [0, 1]."""
    import numpy as np

    flow = np.asarray(flow, np.float64)
    u, v = flow[..., 0].copy(), flow[..., 1].copy()
    bad = (np.abs(u) > 1e7) | (np.abs(v) > 1e7) | np.isnan(u) | np.isnan(v)
    u[bad] = 0
    v[bad] = 0
    rad = np.sqrt(u * u + v * v)
    maxrad = max(-1.0, rad.max())
    u = u / (maxrad + np.finfo(float).eps)
    v = v / (maxrad + np.finfo(float).eps)

    wheel = _middlebury_color_wheel()
    ncols = wheel.shape[0]
    rad = np.sqrt(u * u + v * v)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1) + 1
    k0 = np.floor(fk).astype(int)
    k1 = k0 + 1
    k1[k1 == ncols + 1] = 1
    f = fk - k0
    img = np.zeros(u.shape + (3,))
    for i in range(3):
        col0 = wheel[k0 - 1, i] / 255.0
        col1 = wheel[k1 - 1, i] / 255.0
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] *= 0.75
        img[..., i] = np.floor(255 * col * (1 - bad)).astype(np.uint8)
    return img / 255.0


def flow_to_rgb(flow: jnp.ndarray, max_flow: float = 256.0, n: float = 8.0) -> jnp.ndarray:
    """(..., h, w, 2) flow -> (..., h, w, 3) RGB in [0,1]."""
    if max_flow is not None:
        max_flow = max(max_flow, 1.0)
    else:
        max_flow = jnp.max(flow)
    u, v = flow[..., 0], flow[..., 1]
    mag = jnp.sqrt(u * u + v * v)
    angle = jnp.arctan2(v, u)
    im_h = jnp.mod(angle / (2 * jnp.pi) + 1.0, 1.0)
    im_s = jnp.clip(mag * n / max_flow, 0.0, 1.0)
    im_v = jnp.clip(n - im_s, 0.0, 1.0)
    return hsv_to_rgb(jnp.stack([im_h, im_s, im_v], axis=-1))
