"""Empirical VMEM-fit probe for the fused window-attention kernel tiles.

The round-4 on-chip parity run exposed a Mosaic scoped-VMEM OOM compiling
the L2 (nW=45, C=96, h=24) forward kernel in fp32 at the default 64-window
tile cap (24.72M vs the 16M scoped limit) — bf16 fits, fp32 doesn't.  This
probe compile-tests candidate tiles for BOTH kernels at the worst (L2)
shape in fp32 and bf16 so the dtype-aware caps in ops/window_attention.py
are calibrated by ground truth, not a VMEM model.

Run on TPU: python scripts/vmem_tile_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dmhomo_tpu.ops import window_attention as wa

    N, C, h = 64, 96, 24
    B = 4
    nW_mask = 45
    results = {}
    for dt_name in ("float32", "bfloat16"):
        dt = jnp.dtype(dt_name)
        for with_mask in (False, True):
            nW = nW_mask if with_mask else B * nW_mask
            Bn = B * nW_mask
            rng = np.random.default_rng(0)
            qkv = jnp.asarray(rng.normal(0, 1, (Bn, N, 3 * C)), dt)
            bias = jnp.asarray(rng.normal(0, 0.5, (h, N, N)), jnp.float32)
            mask = (jnp.asarray(np.zeros((nW, N, N), np.float32))
                    if with_mask else None)
            gout = jnp.asarray(rng.normal(0, 1, (Bn, N, C)), dt)

            for kind in ("fwd", "bwd"):
                caps = ([60, 45, 36, 30, 20, 15, 12] if kind == "fwd"
                        else [24, 20, 15, 12, 10, 6, 5])
                for cap in caps:
                    tb = wa._tile_windows(nW, cap)
                    key = (dt_name, with_mask, kind, tb)
                    if key[:3] + (tb,) in results:
                        continue
                    wa._make_fused.cache_clear()
                    # monkey-patch the tile choice for this trial
                    orig = wa._tile_windows

                    def patched(n, cap=64, _tb=tb, _orig=orig):
                        return _tb if n % _tb == 0 and _tb <= n else _orig(n, cap)

                    wa._tile_windows = patched
                    try:
                        attend = wa._make_fused(
                            Bn, N, 3 * C, h, nW, with_mask, dt_name, 60.0,
                            (C // h) ** -0.5, False)
                        if kind == "fwd":
                            out = attend(qkv, bias,
                                         mask if with_mask else jnp.zeros((0,), dt))

                            jax.block_until_ready(out)
                        else:
                            def loss(q, b):
                                o = attend(q, b,
                                           mask if with_mask else jnp.zeros((0,), dt))
                                return jnp.sum(o.astype(jnp.float32) *
                                               gout.astype(jnp.float32))

                            g = jax.jit(jax.grad(loss, argnums=(0, 1)))(qkv, bias)
                            jax.block_until_ready(g)
                        ok = True
                    except Exception as e:
                        ok = False
                        err = str(e)[:120].replace("\n", " ")
                    finally:
                        wa._tile_windows = orig
                        wa._make_fused.cache_clear()
                    results[key] = ok
                    print(f"{dt_name:9s} mask={int(with_mask)} {kind} tb={tb:3d}: "
                          f"{'OK' if ok else 'OOM/' + err[:80]}", flush=True)


if __name__ == "__main__":
    main()
