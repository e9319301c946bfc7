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
