"""Ablation probe: UNet fwd at B=128 with pieces disabled, to locate time.

  python scripts/fwd_ablate.py noattn   # PreNormResidual wraps -> identity
  python scripts/fwd_ablate.py nogn     # GroupNorm -> identity
  python scripts/fwd_ablate.py base     # unmodified
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "base"

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    import dmhomo_tpu.models.unet as unet_mod

    if mode == "noattn":
        class _Skip(nn.Module):
            dim: int
            inner: nn.Module
            dtype: jnp.dtype = jnp.float32

            @nn.compact
            def __call__(self, x):
                return x

        unet_mod.PreNormResidual = _Skip
    elif mode == "nogn":
        class _NoGN(nn.Module):
            dim_out: int
            groups: int = 8
            dtype: jnp.dtype = jnp.float32

            @nn.compact
            def __call__(self, x, scale_shift=None):
                x = unet_mod.WeightStandardizedConv(
                    self.dim_out, (3, 3), dtype=self.dtype, name="proj")(x)
                if scale_shift is not None:
                    scale, shift = scale_shift
                    x = x * (scale + 1.0) + shift
                return nn.silu(x).astype(self.dtype)

        unet_mod.Block = _NoGN

    from dmhomo_tpu.models.unet import ConditionalUNet, UNetConfig, make_unet_apply

    B, S = 128, 256
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
        return apply_fn(params, x, t, classes, rgb, mask, keep)

    x0 = jnp.asarray(rng.normal(0, 1, (B, S, S, 6)).astype(np.float32))
    x = jax.block_until_ready(step(x0))
    t0 = time.time()
    for _ in range(6):
        x = step(x)
    jax.block_until_ready(x)
    dt = (time.time() - t0) / 6
    print(f"[{mode}] UNet fwd B={B}: {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
