"""TPU probe: cost of one gather-bilinear warp fwd / fwd+grad, per-call
host readback.  python scripts/warp_probe.py [C] [mode]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dmhomo_tpu.geometry.warp import warp_by_flow

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    B, H, W = 32, 320, 576
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32))
    if len(sys.argv) > 2 and sys.argv[2] == "bf16":
        img = img.astype(jnp.bfloat16)
    flow = jnp.asarray(rng.normal(0, 8, (B, H, W, 2)).astype(np.float32))

    @jax.jit
    def fwd(img, flow):
        return warp_by_flow(img, flow, mode="collapse").sum()

    @jax.jit
    def bwd(img, flow):
        return jax.grad(lambda i, f: warp_by_flow(i, f, mode="collapse").sum(),
                        (0, 1))(img, flow)[0].sum()

    for name, fn in (("fwd", fwd), ("fwd+grad", bwd)):
        v = float(jax.device_get(fn(img, flow)))
        t0 = time.time()
        iters = 4
        for i in range(iters):
            v = float(jax.device_get(fn(img + i * 1e-6, flow)))
        dt = (time.time() - t0) / iters
        print(f"warp {name} (B={B},{H}x{W},C={C}): {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
