"""On-chip A/B of one SwinBlock: xla vs pallas-attn vs fused_block.

Level shapes as in win_attn_probe.py (shipped HEM config, B=32, ws=8).
fused-K loop, single readback.

  python scripts/swin_block_probe.py [--k 10] [--levels 0 1 2] [--shift 0]
         [--impls xla pallas fused_block] [--fwd-only]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

LEVELS = {
    0: dict(H=160, W=288, C=24, h=3),
    1: dict(H=80, W=144, C=48, h=12),
    2: dict(H=40, W=72, C=96, h=24),
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--b", type=int, default=32)
    p.add_argument("--levels", type=int, nargs="+", default=[0])
    p.add_argument("--impls", nargs="+",
                   default=["xla", "pallas", "fused_block"])
    p.add_argument("--shift", type=int, default=0)
    p.add_argument("--fwd-only", action="store_true")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    from dmhomo_tpu.utils.platform import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp

    from dmhomo_tpu.models.swin import SwinBlock

    dt = jnp.dtype(args.dtype)
    for lvl in args.levels:
        cfg = LEVELS[lvl]
        H, W, C, h = cfg["H"], cfg["W"], cfg["C"], cfg["h"]
        rng = np.random.default_rng(lvl)
        x0 = jnp.asarray(rng.normal(0, 1, (args.b, H * W, C)), dt)

        def mk(impl):
            return SwinBlock(dim=C, input_resolution=(H, W), num_heads=h,
                             window_size=8, shift_size=args.shift,
                             mlp_ratio=3.0, dtype=dt,
                             sim_dtype=dt if impl == "xla" else None,
                             attn_impl=impl)

        params = mk("xla").init(jax.random.PRNGKey(0), x0)

        for impl in args.impls:
            blk = mk(impl)

            if args.fwd_only:
                def step(xx):
                    return blk.apply(params, xx)
            else:
                def val(xx):
                    return jnp.sum(blk.apply(params, xx).astype(jnp.float32) ** 2)
                step = jax.grad(val)

            @jax.jit
            def loop(xx, key):
                def body(i, carry):
                    q, key = carry
                    key, sub = jax.random.split(key)
                    q = q + jax.random.normal(sub, (1, 1, 1), dt) * 1e-6
                    o = step(q)
                    return q + o[..., :1].mean().astype(dt) * 1e-12, key

                out, _ = jax.lax.fori_loop(0, args.k, body, (x0, key))
                return out

            r = loop(x0, jax.random.PRNGKey(0))
            r.block_until_ready()
            t0 = time.perf_counter()
            r = loop(x0, jax.random.PRNGKey(1))
            r.block_until_ready()
            dt_s = (time.perf_counter() - t0) / args.k
            mode = "fwd" if args.fwd_only else "fwd+bwd"
            print(f"L{lvl} {impl:12s} {mode:7s} shift={args.shift}: "
                  f"{dt_s * 1e3:8.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
