"""On-chip A/B: XLA window attention vs the Pallas fused kernel.

Shapes are the shipped HEM Swin levels (crop 320x576, ws=8):
  L0: B*nW = 32*720, C=24,  h=3
  L1: B*nW = 32*180, C=48,  h=12
  L2: B*nW = 32*45,  C=96,  h=24

Method: fused-K (K reps inside one jitted lax.fori_loop with key-varied
inputs, single readback), per BENCH.md measurement-validity rules.

  python scripts/win_attn_probe.py [--k 20] [--grad] [--levels 0 1 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

LEVELS = {
    0: dict(nW=720, C=24, h=3),
    1: dict(nW=180, C=48, h=12),
    2: dict(nW=45, C=96, h=24),
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--b", type=int, default=32)
    p.add_argument("--grad", action="store_true", help="time fwd+bwd")
    p.add_argument("--mask", action="store_true", help="SW-MSA additive mask")
    p.add_argument("--levels", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    from dmhomo_tpu.utils.platform import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp

    from dmhomo_tpu.ops.window_attention import fused_window_attention

    N = 64
    dt = jnp.dtype(args.dtype)

    def xla_attn(qkv, bias, mask, h):
        Bn, N_, C3 = qkv.shape
        C = C3 // 3
        hd = C // h
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(Bn, N_, h, hd)
        k = k.reshape(Bn, N_, h, hd)
        v = v.reshape(Bn, N_, h, hd)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k,
                         preferred_element_type=jnp.float32)
        sim = sim + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            sim = sim.reshape(Bn // nW, nW, h, N_, N_) + mask[None, :, None]
            sim = sim.reshape(Bn, h, N_, N_)
        e = jnp.exp(jnp.clip(sim, -60.0, 60.0)).astype(qkv.dtype)
        s = jnp.sum(e.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", e, v,
                         preferred_element_type=jnp.float32)
        return (out / s.transpose(0, 2, 1)[..., None]).astype(qkv.dtype).reshape(
            Bn, N_, C)

    for lvl in args.levels:
        cfg = LEVELS[lvl]
        nW, C, h = cfg["nW"], cfg["C"], cfg["h"]
        Bn = args.b * nW
        rng = np.random.default_rng(lvl)
        qkv0 = jnp.asarray(rng.normal(0, 1, (Bn, N, 3 * C)), dt)
        bias = jnp.asarray(rng.normal(0, 0.5, (h, N, N)), jnp.float32)
        mask = None
        if args.mask:
            m = np.zeros((nW, N, N), np.float32)
            m[rng.uniform(size=(nW, N, N)) < 0.3] = -100.0
            mask = jnp.asarray(m)

        def bench(fn, name):
            if args.grad:
                def val(qkv):
                    return jnp.sum(fn(qkv).astype(jnp.float32) ** 2)

                step = jax.grad(val)
            else:
                step = fn

            @jax.jit
            def loop(qkv, key):
                def body(i, carry):
                    q, key = carry
                    key, sub = jax.random.split(key)
                    q = q + jax.random.normal(sub, (1, 1, 1), dt) * 1e-6
                    o = step(q)
                    return q + o[..., :1].mean() * 1e-12, key

                out, _ = jax.lax.fori_loop(0, args.k, body, (qkv, key))
                return out

            key = jax.random.PRNGKey(0)
            r = loop(qkv0, key)
            r.block_until_ready()  # compile + warm
            t0 = time.perf_counter()
            r = loop(qkv0, jax.random.PRNGKey(1))
            r.block_until_ready()
            dt_s = (time.perf_counter() - t0) / args.k
            print(f"L{lvl} {name:7s} {'fwd+bwd' if args.grad else 'fwd':7s} "
                  f"mask={bool(mask is not None)}: {dt_s * 1e3:8.2f} ms/call",
                  flush=True)
            return dt_s

        bench(lambda q: xla_attn(q, bias, mask, h), "xla")
        bench(lambda q: fused_window_attention(q, bias, mask, num_heads=h),
              "pallas")


if __name__ == "__main__":
    main()
