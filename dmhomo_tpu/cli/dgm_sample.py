"""DGM trainset generation CLI (reference: python DGM/dgm_sample.py).

Fixes the reference's unimplemented shard plumbing (dgm_sample.py:54-57):
--shard-index/--num-shards slice the condition set cleanly, one process per
host/chip.  Each batch of conditions drives one jitted DDIM scan; the
sampled image pairs get homographies fitted to their condition flows
(`saveTrainPair` equivalent) and land in reference-format shard npys.

Example:
  python -m dmhomo_tpu.cli.dgm_sample --ckpt results/dgm --conditions cache \
      --s-step 32 --bs 25 --exp generate_trainset --shard-index 0 --num-shards 1
  python -m dmhomo_tpu.cli.dgm_sample --synthetic 64 --dim 16 --image-size 64 \
      --s-step 4 --bs 8 --exp smoke --batches 2     # smoke
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", type=str, default=None, help="native ckpt root")
    parser.add_argument("--torch-ckpt", type=str, default=None, help="reference DGM.pt")
    parser.add_argument("--conditions", type=str, default=None)
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--s-step", type=int, default=32)
    parser.add_argument("--bs", type=int, default=25)
    parser.add_argument("--exp", type=str, required=True)
    parser.add_argument("--shard-index", type=int, default=0)
    parser.add_argument("--num-shards", type=int, default=1)
    parser.add_argument("--batches", type=int, default=0, help="0 = run until conditions exhausted")
    parser.add_argument("--batches-per-shard", type=int, default=2)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--dim-mults", type=str, default="1,2,4,8",
                        help="comma-separated UNet stage multipliers")
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--num-classes", type=int, default=1)
    parser.add_argument("--cond-scale", type=float, default=3.0)
    parser.add_argument("--out", type=str, default="traindata")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--preview-every", type=int, default=0, metavar="N",
        help="every N batches, dump a warp-consistency sample-panel PNG "
        "(the reference's per-100-step previews, "
        "denoising_diffusion_pytorch.py:1972-2019); 0 = off",
    )
    args = parser.parse_args(argv)

    from dmhomo_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    import jax
    import jax.numpy as jnp

    from dmhomo_tpu.diffusion import DiffusionConfig, GaussianDiffusion
    from dmhomo_tpu.geometry import fit_homography_to_flow
    from dmhomo_tpu.models import ConditionalUNet, UNetConfig
    from dmhomo_tpu.models.unet import make_unet_apply
    from dmhomo_tpu.utils import get_logger, load_checkpoint

    logger = get_logger("dgm_sample")

    unet_cfg = UNetConfig(
        dim=args.dim,
        num_classes=args.num_classes,
        dim_mults=tuple(int(m) for m in args.dim_mults.split(",")),
        dtype=jnp.bfloat16,
    )
    model = ConditionalUNet(unet_cfg)
    gd = GaussianDiffusion(
        make_unet_apply(model),
        DiffusionConfig(
            image_size=args.image_size,
            timesteps=1000,
            sampling_timesteps=args.s_step,
            objective="pred_x0",
            cond_scale=args.cond_scale,
        ),
    )

    # weights: native checkpoint (EMA), torch DGM.pt, or fresh init (smoke)
    if args.torch_ckpt:
        from dmhomo_tpu.models.import_torch import load_dgm_checkpoint

        params, info = load_dgm_checkpoint(args.torch_ckpt, unet_cfg, use_ema=True)
        params = jax.tree.map(jnp.asarray, params)
        logger.info(f"loaded torch checkpoint step {info['step']}")
    elif args.ckpt:
        from dmhomo_tpu.train.dgm_trainer import dgm_abstract_state

        target = dgm_abstract_state(model, args.image_size)
        state = load_checkpoint(args.ckpt, target=target)
        params = jax.tree.map(jnp.asarray, state["ema"].params)
        logger.info(f"loaded native checkpoint step {int(state['step'])}")
    else:
        S = args.image_size
        dummy = dict(
            x=jnp.zeros((1, S, S, 6)), time=jnp.zeros((1,), jnp.int32),
            classes=jnp.zeros((1,), jnp.int32), rgb_flow=jnp.zeros((1, S, S, 3)),
            mask=jnp.ones((1, S, S, 1)), keep_mask=jnp.ones((1,), bool),
        )
        params = model.init(jax.random.PRNGKey(args.seed), **dummy)["params"]
        logger.warning("no checkpoint given - sampling from RANDOM weights (smoke mode)")

    # conditions
    if args.conditions:
        from dmhomo_tpu.data.conditions import ConditionCache

        cache = ConditionCache(args.conditions)
        n = len(cache)
        idxs = np.arange(n)[args.shard_index :: args.num_shards]
        get_batch = lambda b: cache.batch(idxs[b * args.bs : (b + 1) * args.bs])
        max_batches = len(idxs) // args.bs
    elif args.synthetic:
        from dmhomo_tpu.cli.dgm_train import synthetic_condition_batches

        gen = synthetic_condition_batches(
            args.synthetic, args.image_size, args.bs, args.num_classes, args.seed
        )
        get_batch = lambda b: next(gen)
        max_batches = args.batches or 4
    else:
        parser.error("need --conditions or --synthetic")
    if args.batches:
        max_batches = min(max_batches, args.batches)

    @jax.jit
    def generate(params, key, cond, classes):
        mask = cond[..., 6:7]
        rgb_flow = cond[..., 7:10]
        flow = cond[..., 10:12]
        imgs = gd.sample(params, key, classes, rgb_flow, mask)  # (B,S,S,6) [0,1]
        homos = fit_homography_to_flow(flow)
        return imgs, homos

    out_dir = os.path.join(args.out, args.exp, "dataset")
    os.makedirs(out_dir, exist_ok=True)
    from dmhomo_tpu.data.shards import save_generation_shard, shard_filename

    key = jax.random.PRNGKey(args.seed + args.shard_index)
    pending, part, done = [], 0, 0
    t_start = time.time()
    for b in range(max_batches):
        cond, classes = get_batch(b)
        if cond.shape[0] < args.bs:
            break
        key, sub = jax.random.split(key)
        imgs, homos = generate(
            params, sub, jnp.asarray(cond), jnp.asarray(classes, jnp.int32)
        )
        imgs = np.asarray(jax.device_get(imgs))
        homos = np.asarray(jax.device_get(homos))
        if args.preview_every and b % args.preview_every == 0:
            from dmhomo_tpu.utils.viz import image_grid, sample_panel, save_png

            panel = sample_panel(
                imgs, np.asarray(cond[..., 6:7]), np.asarray(cond[..., 10:12])
            )
            # shard index in the name: parallel shard processes share the
            # experiment dir and must not overwrite each other's previews
            ppath = os.path.join(
                args.out, args.exp, "previews",
                f"shard_{args.shard_index:02d}_batch_{b:05d}.png",
            )
            save_png(ppath, image_grid(panel))
            logger.info(f"preview: {ppath}")
        # reference format: CHW uint8
        imgs_u8 = (np.clip(imgs, 0, 1) * 255).astype(np.uint8).transpose(0, 3, 1, 2)
        pending.append({"imgs": imgs_u8, "homos": homos})
        done += imgs_u8.shape[0]
        if len(pending) >= args.batches_per_shard:
            path = os.path.join(
                out_dir, shard_filename(args.shard_index, 0, part, done)
            )
            save_generation_shard(path, pending)
            logger.info(f"wrote {path} ({done} samples total)")
            pending, part = [], part + 1
        if b == 0:
            t_start = time.time()  # exclude compile from throughput
            done = 0
    if pending:
        path = os.path.join(out_dir, shard_filename(args.shard_index, 0, part, done))
        save_generation_shard(path, pending)
        logger.info(f"wrote {path}")
    dt = time.time() - t_start
    if done and dt > 0:
        logger.info(f"throughput: {done / dt:.2f} samples/sec/chip at s_step={args.s_step}")


if __name__ == "__main__":
    main()
