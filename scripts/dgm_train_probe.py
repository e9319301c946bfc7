"""TPU probe for the DGM diffusion TRAIN step at the full config.

Refreshes the r2b per-call record (28.9 samples/s at bs=32+remat) with the
current code (fused K-step scan driver, host-CPU init, bf16) and the only
measurement method that survives the relay (BENCH.md): K optimizer steps
scanned in ONE program via DGMTrainer.train_steps, batches generated
IN-GRAPH from a key (zero upload), single readback.

Reference counterpart: the Trainer train loop's device section,
denoising_diffusion_pytorch.py:1828-1865 (autocast fwd -> backward ->
clip -> Adam -> EMA), at the shipped UNet dim=64 @ 256^2 config.

  python scripts/dgm_train_probe.py [--bs 32] [--k 6] [--remat/--no-remat]
         [--accum N] [--runs 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--k", type=int, default=6)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--no-remat", action="store_true")
    args = p.parse_args()

    import jax
    from dmhomo_tpu.utils.platform import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp

    from dmhomo_tpu.train.config import DGMTrainConfig
    from dmhomo_tpu.train.dgm_trainer import DGMTrainer

    cfg = DGMTrainConfig()
    cfg = dataclasses.replace(
        cfg,
        unet=dataclasses.replace(cfg.unet, remat=not args.no_remat),
        gradient_accumulate_every=args.accum,
    )
    tr = DGMTrainer(cfg)
    tr.init_state()
    S = cfg.diffusion.image_size
    BS, K = args.bs, args.k
    print(f"devices: {jax.devices()} bs={BS} k={K} bf16={cfg.bf16} "
          f"remat={tr.model.config.remat} accum={args.accum}", flush=True)

    if tr._train_steps is None:
        tr._train_steps = tr._build_train_steps()
    steps_fn = tr._train_steps

    @jax.jit
    def fused(state, key):
        ks = jax.random.split(key, 3)
        # 12-ch condition batches in-graph: data(6) in [-1,1]-ish, mask(1)
        # in [0,1], rgb_flow(3), motion(2) - content-varied via the key
        imgs = jnp.concatenate(
            [jax.random.normal(ks[0], (K, BS, S, S, 6)) * 0.5,
             jax.random.uniform(ks[1], (K, BS, S, S, 1)),
             jax.random.normal(ks[2], (K, BS, S, S, 5)) * 0.3],
            axis=-1)
        classes = jnp.zeros((K, BS), jnp.int32)
        return steps_fn(state, imgs, classes, key)

    state = tr.state
    st, losses = fused(state, jax.random.PRNGKey(0))  # compile
    jax.block_until_ready(losses)
    del st, losses  # holding a second full train state OOMs the next run
    print("compiled; timing", flush=True)
    out = None
    for r in range(args.runs):
        del out  # free the previous run's state before dispatching
        t0 = time.time()
        out = fused(state, jax.random.PRNGKey(2 + r))
        lv = float(jax.device_get(out[1][-1]))
        dt = (time.time() - t0) / K
        print(f"DGM fused(dev-data) {K}-step run {r}: {dt*1e3:.0f} ms/step "
              f"({BS/dt:.1f} samples/s, loss {lv:.4f})", flush=True)


if __name__ == "__main__":
    main()
