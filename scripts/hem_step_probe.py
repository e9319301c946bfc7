"""TPU probe for the HEM train step at the shipped config (bs=32, bf16+remat).

Modes:
  fused (default) - K optimizer steps scanned in ONE program via
      HEMTrainer.train_steps, single readback: the only measurement that
      survives the relay's per-call program-reupload pathology (BENCH.md),
      and also the production training path.
  step  - per-call dispatch with host readback (relay-health indicator).
  fwd   - forward+loss only, per-call readback.

  python scripts/hem_step_probe.py [--mode fused] [--k 6] [--accum N]
         [--policy dots_with_no_batch_dims_saveable] [--fold] [--runs 2]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="fused", choices=("fused", "step", "fwd"))
    p.add_argument("--k", type=int, default=6, help="steps per fused dispatch")
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--accum", type=int, default=None)
    p.add_argument("--policy", type=str, default=None)
    p.add_argument("--fold", action="store_true", help="fold_ln=True")
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--attn", type=str, default=None,
                   help="window-attention impl: xla | pallas | fused_block, "
                        "or a per-level comma spec 'pallas,pallas,"
                        "fused_block' (enc_idx order C=24,48,96; pass "
                        "--no-remat explicitly with comma specs - "
                        "remat='auto' only resolves plain 'pallas')")
    p.add_argument("--warp-method", type=str, default=None,
                   choices=("matmul", "gather"),
                   help="bilinear warp formulation (default matmul)")
    p.add_argument("--device-data", action="store_true",
                   help="generate batches in-graph (isolates chip time "
                        "from relay input transport)")
    p.add_argument("--no-remat", action="store_true",
                   help="disable per-block remat (with attn=pallas the "
                        "logits never materialize, so remat's saving "
                        "shrinks while its recompute cost stays)")
    p.add_argument("--ablate-warps", action="store_true",
                   help="skip the feature/mask warps (time-decomposition "
                        "diagnostic; NOT the reference algorithm)")
    p.add_argument("--ablate-mask", action="store_true",
                   help="skip the full-res FlowMaskEstimator heads "
                        "(time-decomposition diagnostic)")
    p.add_argument("--mask-impl", type=str, default=None,
                   choices=("concat", "split"),
                   help="mask-head formulation (split = concat-free)")
    args = p.parse_args()

    import jax
    from dmhomo_tpu.utils.platform import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp

    from dmhomo_tpu.losses import compute_losses
    from dmhomo_tpu.train.config import HEMTrainConfig
    from dmhomo_tpu.train.hem_trainer import HEMTrainer

    BS = args.bs
    cfg = HEMTrainConfig()
    if args.accum is not None:
        cfg = dataclasses.replace(cfg, grad_accum=args.accum)
    if args.no_remat:
        cfg = dataclasses.replace(cfg, remat=False)
    swin = cfg.estimator.swin
    if args.policy:
        swin = dataclasses.replace(swin, remat_policy=args.policy)
    if args.fold:
        swin = dataclasses.replace(swin, fold_ln=True)
    if args.warp_method:
        swin = dataclasses.replace(swin, warp_method=args.warp_method)
    if args.ablate_warps:  # estimator-level AND trunk-internal level warps
        swin = dataclasses.replace(swin, ablate_warps=True)
    cfg = dataclasses.replace(
        cfg, estimator=dataclasses.replace(
            cfg.estimator, swin=swin, warp_method=args.warp_method,
            ablate_warps=args.ablate_warps, ablate_mask=args.ablate_mask,
            **({"mask_impl": args.mask_impl} if args.mask_impl else {})),
        # None would leave the trainer's 'auto' default in play; pin the
        # probe to exactly what was asked (default: the XLA einsum path)
        attn_impl=args.attn or "xla",
    )
    trainer = HEMTrainer(cfg, steps_per_epoch=1000)
    trainer.init_state()
    ph, pw = cfg.estimator.crop_size
    rng = np.random.default_rng(0)
    imgs = rng.normal(0, 1, (BS, ph, pw, 2)).astype(np.float32)
    flow_gt = rng.normal(0, 4, (BS, ph, pw, 4)).astype(np.float32)
    print(f"devices: {jax.devices()} bf16: {cfg.bf16} "
          f"remat: {trainer.model.config.swin.remat} (from {cfg.remat!r}) "
          f"accum: {cfg.grad_accum} policy: {args.policy} fold: {args.fold}",
          flush=True)

    if args.mode == "fwd":
        @jax.jit
        def fwd(params, batch_stats, imgs):
            out, _ = trainer.model.apply(
                {"params": params, "batch_stats": batch_stats},
                imgs, train=True, mutable=["batch_stats"],
            )
            losses = compute_losses(
                {"imgs_gray_patch": imgs, "flow_gt_patch": jnp.asarray(flow_gt)},
                out, cfg.loss,
            )
            return losses["total"]

        par, bst = trainer.state["params"], trainer.state["batch_stats"]
        im = jnp.asarray(imgs)
        float(jax.device_get(fwd(par, bst, im)))
        iters = 6
        t0 = time.time()
        for i in range(iters):
            v = float(jax.device_get(fwd(par, bst, im + i * 1e-6)))
        dt = (time.time() - t0) / iters
        print(f"HEM fwd+loss bs={BS}: {dt*1e3:.0f} ms ({BS/dt:.1f} pairs/s)")
        return

    if args.mode == "step":
        batch = {"imgs_gray_patch": jnp.asarray(imgs),
                 "flow_gt_patch": jnp.asarray(flow_gt)}
        losses = trainer.train_step(batch)
        jax.block_until_ready(losses["total"])
        iters = 6
        t0 = time.time()
        for i in range(iters):
            b = dict(batch)
            b["imgs_gray_patch"] = batch["imgs_gray_patch"] + float(i) * 1e-6
            losses = trainer.train_step(b)
            lv = float(jax.device_get(losses["total"]))
        dt = (time.time() - t0) / iters
        print(f"HEM train step (per-call) bs={BS}: {dt*1e3:.0f} ms "
              f"({BS/dt:.1f} pairs/s, loss {lv:.4f})")
        return

    if args.device_data:
        # batches generated IN-GRAPH from a key: each dispatch uploads ~0
        # bytes and reads back one scalar - isolates chip time from the
        # relay's input-transport pathology (today's relay moves batch
        # uploads at ~50 MB/s: 6 bs=32 batches = 848 MB = tens of seconds
        # of pure transport that the host-data mode can't see past)
        step_fn = trainer._build_train_steps()

        @jax.jit
        def fused(state, key):
            ks = jax.random.split(key, args.k)
            batches = {
                "imgs_gray_patch": jax.random.normal(
                    ks[0], (args.k, BS, ph, pw, 2), jnp.float32),
                "flow_gt_patch": 4.0 * jax.random.normal(
                    ks[1], (args.k, BS, ph, pw, 4), jnp.float32),
            }
            return step_fn(state, batches)

        state = trainer.state
        st, losses = fused(state, jax.random.PRNGKey(0))  # compile
        jax.block_until_ready(losses["total"])
        for r in range(args.runs):
            t0 = time.time()
            _, losses = fused(state, jax.random.PRNGKey(2 + r))
            lv = float(jax.device_get(losses["total"][-1]))
            dt = (time.time() - t0) / args.k
            print(f"HEM fused(dev-data) {args.k}-step run {r}: "
                  f"{dt*1e3:.0f} ms/step ({BS/dt:.1f} pairs/s, "
                  f"loss {lv:.4f})", flush=True)
        return

    # fused: K content-varied batches per dispatch, single readback
    def batches(seed):
        r = np.random.default_rng(seed)
        return [
            {"imgs_gray_patch": imgs + r.normal(0, 1e-5, imgs.shape).astype(np.float32),
             "flow_gt_patch": flow_gt}
            for _ in range(args.k)
        ]

    losses = trainer.train_steps(batches(1))  # compile
    jax.block_until_ready(losses["total"])
    for r in range(args.runs):
        bs_list = batches(2 + r)
        t0 = time.time()
        losses = trainer.train_steps(bs_list)
        lv = float(jax.device_get(losses["total"][-1]))
        dt = (time.time() - t0) / args.k
        print(f"HEM fused {args.k}-step run {r}: {dt*1e3:.0f} ms/step "
              f"({BS/dt:.1f} pairs/s, loss {lv:.4f})", flush=True)


if __name__ == "__main__":
    main()
