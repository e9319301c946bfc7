"""TPU micro-probe for the DGM UNet forward and the linear-attention core.

Key-varied chained-readback loops (the only trustworthy timing on the axon
relay - BENCH.md caveats).  Usage:
  python scripts/perf_probe.py fwd   [B]      # UNet forward, default B=128
  python scripts/perf_probe.py attn  [B N C]  # blockdiag core, default 64 65536 64
  python scripts/perf_probe.py sample [bs]    # 4-step DDIM scan, per-step ms
"""

from __future__ import annotations

import sys
import time

import numpy as np


def chain_time(fn, x0, iters=8):
    """fn must map its output shape to itself; chains calls so nothing is
    memoized or pipelined away, returns seconds/call."""
    import jax
    from dmhomo_tpu.utils.platform import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    x = fn(x0)
    x = jax.block_until_ready(x)
    t0 = time.time()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    print("devices:", jax.devices())

    if mode == "attn":
        from dmhomo_tpu.ops.linear_attention import blockdiag_linear_attention

        B, N, C = (int(a) for a in (sys.argv[2:5] or [64, 65536, 64]))
        H, D = 4, 32
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(0, 0.1, (C, 3 * H * D)).astype(np.float32))
        wo = jnp.asarray(rng.normal(0, 0.1, (H * D, C)).astype(np.float32))

        @jax.jit
        def step(x):
            out = blockdiag_linear_attention(x, w, H, D)
            # project back to C so the call chains
            return jnp.einsum("bnk,kc->bnc", out, wo.astype(x.dtype))

        x0 = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32)).astype(jnp.bfloat16)
        dt = chain_time(step, x0)
        print(f"attn core+proj ({B},{N},{C}) bf16: {dt*1e3:.2f} ms/call")

    elif mode == "fwd":
        from dmhomo_tpu.models import ConditionalUNet, UNetConfig
        from dmhomo_tpu.models.unet import make_unet_apply

        B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
        S = 256
        cfg = UNetConfig(dim=64, num_classes=1, dtype=jnp.bfloat16)
        model = ConditionalUNet(cfg)
        apply_fn = make_unet_apply(model)
        rng = np.random.default_rng(0)
        dummy = dict(
            x=jnp.zeros((1, S, S, 6)), time=jnp.zeros((1,), jnp.int32),
            classes=jnp.zeros((1,), jnp.int32), rgb_flow=jnp.zeros((1, S, S, 3)),
            mask=jnp.ones((1, S, S, 1)), keep_mask=jnp.ones((1,), bool),
        )
        params = model.init(jax.random.PRNGKey(0), **dummy)["params"]
        classes = jnp.zeros((B,), jnp.int32)
        rgb = jnp.asarray(rng.normal(0, 0.3, (B, S, S, 3)).astype(np.float32))
        mask = jnp.ones((B, S, S, 1))
        keep = jnp.ones((B,), bool)

        @jax.jit
        def step(x):
            t = jnp.full((B,), 500, jnp.int32)
            out = apply_fn(params, x, t, classes, rgb, mask, keep)
            return out  # (B,S,S,6) fp32 -> feed back as x

        x0 = jnp.asarray(rng.normal(0, 1, (B, S, S, 6)).astype(np.float32))
        dt = chain_time(step, x0, iters=6)
        print(f"UNet fwd B={B} bf16: {dt*1e3:.1f} ms ({B/dt:.0f} img/s)")

    elif mode == "sample":
        from dmhomo_tpu.diffusion import DiffusionConfig, GaussianDiffusion
        from dmhomo_tpu.models import ConditionalUNet, UNetConfig
        from dmhomo_tpu.models.unet import make_unet_apply

        bs = int(sys.argv[2]) if len(sys.argv) > 2 else 64
        S, S_STEP = 256, 4
        cfg = UNetConfig(dim=64, num_classes=1, dtype=jnp.bfloat16)
        model = ConditionalUNet(cfg)
        gd = GaussianDiffusion(
            make_unet_apply(model),
            DiffusionConfig(image_size=S, timesteps=1000, sampling_timesteps=S_STEP,
                            objective="pred_x0", cond_scale=3.0),
        )
        rng = np.random.default_rng(0)
        dummy = dict(
            x=jnp.zeros((1, S, S, 6)), time=jnp.zeros((1,), jnp.int32),
            classes=jnp.zeros((1,), jnp.int32), rgb_flow=jnp.zeros((1, S, S, 3)),
            mask=jnp.ones((1, S, S, 1)), keep_mask=jnp.ones((1,), bool),
        )
        params = model.init(jax.random.PRNGKey(0), **dummy)["params"]
        classes = jnp.zeros((bs,), jnp.int32)
        rgb = jnp.asarray(rng.normal(0, 0.3, (bs, S, S, 3)).astype(np.float32))
        mask = jnp.ones((bs, S, S, 1))

        @jax.jit
        def run(key):
            return gd.sample(params, key, classes, rgb, mask)

        key = jax.random.PRNGKey(0)
        out = jax.block_until_ready(run(key))
        times = []
        for i in range(3):
            key = jax.random.PRNGKey(i + 1)
            t0 = time.time()
            out = jax.block_until_ready(run(key))
            times.append(time.time() - t0)
        dt = min(times)
        per_step = dt / S_STEP
        print(f"sampling bs={bs} s_step={S_STEP}: {dt:.3f} s "
              f"({per_step*1e3:.0f} ms/step -> {bs/(per_step*32):.2f} samples/s at s_step=32)")

    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
