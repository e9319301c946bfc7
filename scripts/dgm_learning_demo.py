"""DGM learning demo: the diffusion trainer learns a warp-consistent generator.

Trains a small-but-real conditional UNet (dim 32 @ 128^2, CFG, cosine
schedule, EMA - the shipped architecture at reduced width) on synthetic
warp-consistent conditions (img2 = warpPerspective(img1, H), flow = H-flow,
HSV render - the exact 12-ch layout of UnHomoTrainData,
denoising_diffusion_pytorch.py:1045-1163) and demonstrates, on committed
evidence (reports/dgm_learning_demo.json):

* train loss decreasing over ~1-2k real TPU steps,
* a sample-quality proxy improving vs random init: the masked photometric
  error of EMA-sampled pairs under their condition flows
  mean(mask*|warp(img2_s, flow) - img1_s|) - the numeric form of the
  reference Trainer's milestone preview eyeball check (:1871-1935),
* a mid-run checkpoint resume (new trainer object, orbax restore, training
  continues from the saved step).

Training dispatches through the fused multi-step driver
(DGMTrainer.train_steps - K optimizer steps per relay call), which is both
the production loop and the only honest way to drive the axon relay.

Run:  python scripts/dgm_learning_demo.py             (real TPU, ~15 min)
      python scripts/dgm_learning_demo.py --steps 20 --cpu   (smoke)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_conditions(n: int, S: int, num_classes: int, seed: int):
    """Warp-consistent 12-ch condition set: img2 is img1 homography-warped,
    so a learned generator can (and must) produce pairs consistent with the
    condition flow - the property the photometric proxy measures."""
    import cv2

    from dmhomo_tpu.data.conditions import flow_to_rgb_np
    from dmhomo_tpu.geometry.host import homography_to_flow_np

    rng = np.random.default_rng(seed)
    conds = np.zeros((n, S, S, 12), np.float32)
    classes = rng.integers(0, num_classes, (n,)).astype(np.int32)
    for i in range(n):
        # smooth random image (low-frequency, like natural-image statistics)
        small = rng.uniform(0, 1, (S // 8, S // 8, 3)).astype(np.float32)
        img1 = cv2.resize(small, (S, S), interpolation=cv2.INTER_CUBIC)
        d = rng.normal(0, 0.01, (3, 3))
        d[2, :2] *= 1e-4
        d[2, 2] = 0
        H = np.eye(3) + d
        img2 = cv2.warpPerspective(img1, H, (S, S), borderMode=cv2.BORDER_REPLICATE)
        flow = homography_to_flow_np(H, S, S)
        conds[i, ..., 0:3] = np.clip(img1, 0, 1)
        conds[i, ..., 3:6] = np.clip(img2, 0, 1)
        conds[i, ..., 6:7] = 1.0
        conds[i, ..., 7:10] = flow_to_rgb_np(flow)
        conds[i, ..., 10:12] = flow
    return conds, classes


def photometric_proxy(trainer, cond, classes, key, use_ema=True):
    """Masked photometric error of sampled pairs under the condition flow."""
    import jax
    from dmhomo_tpu.utils.platform import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp

    from dmhomo_tpu.geometry import warp_by_flow

    imgs = trainer.sample(key, classes, cond[..., 7:10], cond[..., 6:7], use_ema=use_ema)
    imgs = np.asarray(jax.device_get(imgs))
    mask = np.asarray(cond[..., 6:7])
    flow = np.asarray(cond[..., 10:12])
    warped = np.asarray(jax.device_get(
        warp_by_flow(jnp.asarray(imgs[..., 3:]), jnp.asarray(flow), mode="border")
    ))
    return float((mask * np.abs(warped - imgs[..., :3])).sum() / (mask.sum() * 3 + 1e-8))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--fuse-steps", type=int, default=25,
                   help="optimizer steps per dispatch (train_steps scan)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--n-train", type=int, default=256)
    p.add_argument("--n-eval", type=int, default=16)
    p.add_argument("--s-step", type=int, default=16)
    p.add_argument("--out", type=str, default="reports/dgm_learning_demo.json")
    p.add_argument("--ckpt", type=str, default="/tmp/dgm_demo_ckpt")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon sitecustomize "
                   "overrides JAX_PLATFORMS, so an env var is not enough)")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dmhomo_tpu.diffusion import DiffusionConfig
    from dmhomo_tpu.models import UNetConfig
    from dmhomo_tpu.train.config import DGMTrainConfig
    from dmhomo_tpu.train.dgm_trainer import DGMTrainer

    S, B = args.image_size, args.batch_size
    cfg = DGMTrainConfig(
        unet=UNetConfig(dim=args.dim, num_classes=2),
        diffusion=DiffusionConfig(
            image_size=S, timesteps=1000, sampling_timesteps=args.s_step,
            objective="pred_x0", loss_type="l1",
        ),
        train_batch_size=B, lr=2e-4, results_dir=args.ckpt, bf16=True,
    )

    conds, classes = make_conditions(args.n_train, S, 2, seed=0)
    ev_conds, ev_classes = make_conditions(args.n_eval, S, 2, seed=999)
    # the data's own photometric floor (sampled pairs cannot beat the
    # warp-consistency of the data they imitate)
    import jax.numpy as jnp

    from dmhomo_tpu.geometry import warp_by_flow

    data_floor = float(np.mean(np.abs(
        np.asarray(warp_by_flow(jnp.asarray(ev_conds[..., 3:6]),
                                jnp.asarray(ev_conds[..., 10:12]), mode="border"))
        - ev_conds[..., 0:3]
    )))

    rng = np.random.default_rng(1)
    trainer = DGMTrainer(cfg)
    trainer.init_state()

    proxy_init = photometric_proxy(
        trainer, ev_conds, ev_classes, jax.random.PRNGKey(7), use_ema=False
    )
    print(f"photometric proxy at random init: {proxy_init:.4f} "
          f"(data floor {data_floor:.4f})", flush=True)

    def draw(k):
        idx = rng.integers(0, args.n_train, (k, B))
        return conds[idx], classes[idx]

    key = jax.random.PRNGKey(2)
    losses_curve = []
    half = args.steps // 2

    def run_until(trainer, target):
        nonlocal key
        step = int(jax.device_get(trainer.state["step"]))
        while step < target:
            k = min(args.fuse_steps, target - step)
            bi, cl = draw(k)
            key, sub = jax.random.split(key)
            ls = np.asarray(jax.device_get(trainer.train_steps(bi, cl, sub)))
            step += k
            losses_curve.append({"step": step, "loss": float(ls[-1]),
                                 "loss_mean": float(ls.mean())})
            print(f"step {step}/{args.steps} loss {ls[-1]:.4f}", flush=True)

    run_until(trainer, half)
    trainer.save()

    # mid-run resume: a NEW trainer restores step/params/opt/EMA and continues
    trainer2 = DGMTrainer(cfg)
    trainer2.init_state()
    trainer2.load()
    resumed_step = int(jax.device_get(trainer2.state["step"]))
    assert resumed_step == half, (resumed_step, half)
    run_until(trainer2, args.steps)

    proxy_final = photometric_proxy(
        trainer2, ev_conds, ev_classes, jax.random.PRNGKey(7), use_ema=True
    )
    first_losses = [c["loss_mean"] for c in losses_curve[:3]]
    last_losses = [c["loss_mean"] for c in losses_curve[-3:]]
    loss_improved = bool(np.mean(last_losses) < np.mean(first_losses))
    proxy_improved = bool(proxy_final < proxy_init)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    result = {
        "proxy_init": proxy_init,
        "proxy_final": proxy_final,
        "data_floor": data_floor,
        "loss_first3": first_losses,
        "loss_last3": last_losses,
        "loss_improved": loss_improved,
        "proxy_improved": proxy_improved,
        "improved": bool(loss_improved and proxy_improved),
        "resumed_at_step": resumed_step,
        "curve": losses_curve,
        "config": {
            "dim": args.dim, "image_size": S, "batch_size": B,
            "steps": args.steps, "fuse_steps": args.fuse_steps,
            "s_step": args.s_step, "n_train": args.n_train,
            "backend": jax.default_backend(),
        },
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: result[k] for k in (
        "proxy_init", "proxy_final", "data_floor", "loss_improved",
        "proxy_improved", "improved", "resumed_at_step")}))
    if args.steps >= 500:  # smoke runs only check plumbing
        assert result["improved"], result
    return result


if __name__ == "__main__":
    main()
