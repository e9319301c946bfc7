"""TPU probe for the HEM train step: fwd-only vs fwd+bwd at the shipped
config (bs=32, bf16+remat), key-varied with host readback.

  python scripts/hem_step_probe.py [fwd|step|both]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dmhomo_tpu.losses import compute_losses
    from dmhomo_tpu.train.config import HEMTrainConfig
    from dmhomo_tpu.train.hem_trainer import HEMTrainer

    import os

    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    BS = 32
    cfg = HEMTrainConfig()
    if os.environ.get("DMHOMO_HEM_ACCUM"):
        import dataclasses

        cfg = dataclasses.replace(cfg, grad_accum=int(os.environ["DMHOMO_HEM_ACCUM"]))
        print("grad_accum:", cfg.grad_accum)
    if len(sys.argv) > 2:  # optional jax.checkpoint_policies name
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            estimator=dataclasses.replace(
                cfg.estimator,
                swin=dataclasses.replace(cfg.estimator.swin, remat_policy=sys.argv[2]),
            ),
        )
        print("remat_policy:", sys.argv[2])
    trainer = HEMTrainer(cfg, steps_per_epoch=1000)
    trainer.init_state()
    ph, pw = cfg.estimator.crop_size
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(0, 1, (BS, ph, pw, 2)).astype(np.float32))
    flow_gt = jnp.asarray(rng.normal(0, 4, (BS, ph, pw, 4)).astype(np.float32))
    print("devices:", jax.devices(), "bf16:", cfg.bf16, "remat:", cfg.remat)

    if mode in ("fwd", "both"):
        @jax.jit
        def fwd(params, batch_stats, imgs):
            out, _ = trainer.model.apply(
                {"params": params, "batch_stats": batch_stats},
                imgs, train=True, mutable=["batch_stats"],
            )
            losses = compute_losses(
                {"imgs_gray_patch": imgs, "flow_gt_patch": flow_gt}, out, cfg.loss
            )
            return losses["total"]

        p, bs_ = trainer.state["params"], trainer.state["batch_stats"]
        v = float(jax.device_get(fwd(p, bs_, imgs)))
        iters = 6
        t0 = time.time()
        for i in range(iters):
            # per-call host readback (see step mode)
            v = float(jax.device_get(fwd(p, bs_, imgs + i * 1e-6)))
        dt = (time.time() - t0) / iters
        print(f"HEM fwd+loss bs={BS}: {dt*1e3:.0f} ms ({BS/dt:.1f} pairs/s)")

    if mode in ("step", "both"):
        batch = {"imgs_gray_patch": imgs, "flow_gt_patch": flow_gt}
        losses = trainer.train_step(batch)
        jax.block_until_ready(losses["total"])
        iters = 6
        t0 = time.time()
        for i in range(iters):
            b = dict(batch)
            b["imgs_gray_patch"] = imgs + float(i) * 1e-6
            losses = trainer.train_step(b)
            # per-call host readback: the relay can otherwise report
            # chained dispatches as done long before the chip is (BENCH.md)
            lv = float(jax.device_get(losses["total"]))
        dt = (time.time() - t0) / iters
        print(f"HEM train step bs={BS}: {dt*1e3:.0f} ms "
              f"({BS/dt:.1f} pairs/s, loss {lv:.4f})")


if __name__ == "__main__":
    main()
