"""TPU shootout: formulations of the 4-tap bilinear gather at the HEM shape.

Per-call host readback.  python scripts/gather_shootout.py [variant ...]
Variants: take (current), flat, along, pair, onehot
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    B, H, W = 32, 320, 576
    N = H * W
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(0, 1, (B, H, W)).astype(np.float32))
    # realistic smooth coords: identity + moderate flow
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    fy = rng.normal(0, 8, (B, 1, 1)) + gy[None]
    fx = rng.normal(0, 8, (B, 1, 1)) + gx[None]
    y0 = jnp.asarray(np.clip(np.floor(fy), 0, H - 1).astype(np.int32)).reshape(B, N)
    x0 = jnp.asarray(np.clip(np.floor(fx), 0, W - 1).astype(np.int32)).reshape(B, N)

    def time_fn(name, fn, *args):
        v = jax.device_get(fn(*args))
        t0 = time.time()
        iters = 4
        for i in range(iters):
            v = jax.device_get(fn(*args))
        dt = (time.time() - t0) / iters
        print(f"{name}: {dt*1e3:.1f} ms")

    variants = sys.argv[1:] or ["take", "flat", "along", "pair", "onehot"]

    if "take" in variants:
        @jax.jit
        def g_take(img, y0, x0):
            flat = img.reshape(B, N, 1)
            idx = y0 * W + x0
            return jax.vmap(lambda im, ix: jnp.take(im, ix, axis=0))(flat, idx).sum()

        time_fn("take (current)", g_take, img, y0, x0)

    if "flat" in variants:
        @jax.jit
        def g_flat(img, y0, x0):
            flat = img.reshape(B * N)
            idx = (jnp.arange(B, dtype=jnp.int32)[:, None] * N + y0 * W + x0).reshape(-1)
            return jnp.take(flat, idx, axis=0).sum()

        time_fn("flat 1-D take", g_flat, img, y0, x0)

    if "along" in variants:
        @jax.jit
        def g_along(img, y0, x0):
            flat = img.reshape(B, N)
            idx = y0 * W + x0
            return jnp.take_along_axis(flat, idx, axis=1).sum()

        time_fn("take_along_axis minor", g_along, img, y0, x0)

    if "pair" in variants:
        @jax.jit
        def g_pair(img, y0, x0):
            # one lax.gather fetching (1, 2) spans: both x-taps per index
            x0c = jnp.minimum(x0, W - 2)
            starts = jnp.stack([y0, x0c], axis=-1)  # (B, N, 2)

            def one(im, st):
                dnums = jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0,),
                    start_index_map=(0, 1),
                )
                return jax.lax.gather(im, st, dnums, slice_sizes=(1, 2))

            return jax.vmap(one)(img, starts).sum()

        time_fn("row-pair gather (1,2)", g_pair, img, y0, x0)

    if "onehot" in variants:
        CH = 16  # output-row chunk

        @jax.jit
        def g_onehot(img, y0, x0):
            # U[b,p,y] one-hot over H (bf16 matmul), then in-row pick via
            # one-hot over W; chunked over output rows
            y2 = y0.reshape(B, H, W)
            x2 = x0.reshape(B, H, W)
            out = jnp.zeros((B,), jnp.float32)
            ih = jnp.arange(H, dtype=jnp.int32)
            iw = jnp.arange(W, dtype=jnp.int32)

            def body(c, acc):
                ys = jax.lax.dynamic_slice(y2, (0, c * CH, 0), (B, CH, W))
                xs = jax.lax.dynamic_slice(x2, (0, c * CH, 0), (B, CH, W))
                U = (ys[..., None] == ih).astype(jnp.bfloat16)  # (B,CH,W,H)
                T = jnp.einsum("bpwh,bhv->bpwv", U, img.astype(jnp.bfloat16))
                V = (xs[..., None] == iw).astype(jnp.bfloat16)  # (B,CH,W,W)
                return acc + jnp.sum(T * V, axis=(1, 2, 3), dtype=jnp.float32).sum()

            return jax.lax.fori_loop(0, H // CH, body, out).sum()

        time_fn("one-hot matmul (chunked)", g_onehot, img, y0, x0)


if __name__ == "__main__":
    main()
