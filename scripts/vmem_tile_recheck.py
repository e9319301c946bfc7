"""Re-test the ambiguous VMEM-boundary tiles with FULL error text + retry.

The first vmem_tile_probe pass reported failures as truncated relay HTTP
500s — indistinguishable from relay flakes.  This recheck runs only the
boundary cases, prints the full exception, and retries each failure once
(a genuine Mosaic scoped-VMEM OOM reproduces; a relay flake doesn't).

Run on TPU: python scripts/vmem_tile_recheck.py [tb_spec ...]
  tb_spec: dtype,mask,kind,tb  e.g. bfloat16,0,fwd,60
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

DEFAULT = [
    ("bfloat16", 0, "fwd", 60),   # r3-proven production tile — flake suspect
    ("float32", 0, "fwd", 45),    # first fp32 fwd failure
    ("float32", 0, "fwd", 36),    # first fp32 fwd pass (control)
    ("float32", 0, "bwd", 20),    # first fp32 bwd failure
    ("float32", 1, "fwd", 45),    # fp32 mask fwd failure
]


def trial(dt_name, with_mask, kind, tb):
    import jax
    import jax.numpy as jnp

    from dmhomo_tpu.ops import window_attention as wa

    N, C, h = 64, 96, 24
    B = 4
    nW = 45 if with_mask else B * 45
    Bn = B * 45
    rng = np.random.default_rng(0)
    dt = jnp.dtype(dt_name)
    qkv = jnp.asarray(rng.normal(0, 1, (Bn, N, 3 * C)), dt)
    bias = jnp.asarray(rng.normal(0, 0.5, (h, N, N)), jnp.float32)
    mask = (jnp.asarray(np.zeros((nW, N, N), np.float32)) if with_mask else None)
    gout = jnp.asarray(rng.normal(0, 1, (Bn, N, C)), dt)

    wa._make_fused.cache_clear()
    orig = wa._vmem_tile

    def patched(nW_, N_, C_, h_, b_, m_, *, bwd, cap, _tb=tb):
        return _tb if nW_ % _tb == 0 else orig(nW_, N_, C_, h_, b_, m_,
                                               bwd=bwd, cap=cap)

    wa._vmem_tile = patched
    try:
        attend = wa._make_fused(Bn, N, 3 * C, h, nW, bool(with_mask), dt_name,
                                60.0, (C // h) ** -0.5, False)
        marg = mask if with_mask else jnp.zeros((0,), dt)
        if kind == "fwd":
            jax.block_until_ready(attend(qkv, bias, marg))
        else:
            def loss(q, b):
                o = attend(q, b, marg)
                return jnp.sum(o.astype(jnp.float32) * gout.astype(jnp.float32))

            jax.block_until_ready(jax.jit(jax.grad(loss, argnums=(0, 1)))(qkv, bias))
        return True, ""
    except Exception as e:
        return False, str(e)
    finally:
        wa._vmem_tile = orig
        wa._make_fused.cache_clear()


def main():
    specs = DEFAULT
    if len(sys.argv) > 1:
        specs = []
        for a in sys.argv[1:]:
            d, m, k, t = a.split(",")
            specs.append((d, int(m), k, int(t)))
    for dt_name, with_mask, kind, tb in specs:
        for attempt in (1, 2):
            ok, err = trial(dt_name, with_mask, kind, tb)
            tag = f"{dt_name} mask={with_mask} {kind} tb={tb} attempt={attempt}"
            if ok:
                print(f"{tag}: OK", flush=True)
                break
            vmem = "Ran out of memory" in err or "vmem limit" in err
            print(f"{tag}: FAIL (vmem_oom={vmem})\n--- error head ---\n"
                  f"{err[:600]}\n--- error tail ---\n{err[-2500:]}\n"
                  "------------------", flush=True)


if __name__ == "__main__":
    main()
