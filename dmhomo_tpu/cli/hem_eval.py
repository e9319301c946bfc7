"""HEM CAHomo evaluation CLI (reference: accelerate launch hem_evaluate.py).

Loads a native checkpoint root or a reference HEM .pth and reports per-
category point-matching errors on the CAHomo test layout.

Example:
  python -m dmhomo_tpu.cli.hem_eval --test-data CAHomo --torch-ckpt HEM.pth
  python -m dmhomo_tpu.cli.hem_eval --test-data CAHomo --ckpt experiments/hem/best
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--test-data", type=str, required=True)
    parser.add_argument("--model-dir", type=str, default=None, help="dir with params.json")
    parser.add_argument("--ckpt", type=str, default=None, help="native ckpt root (…/best)")
    parser.add_argument("--torch-ckpt", type=str, default=None, help="reference HEM .pth")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--out-json", type=str, default=None)
    parser.add_argument("--seed-zero", action="store_true",
                        help="reproduce the reference's biased category lists")
    parser.add_argument("--category-set", choices=("eval", "test"), default="eval",
                        help="'eval' = hem_evaluate.py lists (default); 'test' = "
                        "the test() twin's lists ('0000030' under SF, "
                        "HEM/evaluate.py:341-346)")
    parser.add_argument("--mask-vis", type=str, default=None, metavar="DIR",
                        help="dump per-category qualitative panels/GIFs "
                        "(HEM/evaluate.py::mask_vis)")
    args = parser.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from dmhomo_tpu.data import CAHomoTestDataset, DataLoader
    from dmhomo_tpu.evaluation import bucket_by_category, category_report, point_matching_error
    from dmhomo_tpu.models import HomographyEstimator
    from dmhomo_tpu.models.estimator import upsample_outputs
    from dmhomo_tpu.train.config import HEMTrainConfig, Params
    from dmhomo_tpu.utils import get_logger, load_checkpoint

    logger = get_logger("hem_eval")

    if args.model_dir:
        cfg = HEMTrainConfig.from_params(Params(os.path.join(args.model_dir, "params.json")))
    else:
        cfg = HEMTrainConfig()
    model = HomographyEstimator(cfg.estimator)

    if args.torch_ckpt:
        from dmhomo_tpu.models.import_torch import load_hem_checkpoint

        params, batch_stats, _ = load_hem_checkpoint(args.torch_ckpt, cfg.estimator)
    elif args.ckpt:
        state = load_checkpoint(args.ckpt)
        params, batch_stats = state["params"], state.get("batch_stats", {})
    else:
        parser.error("need --ckpt or --torch-ckpt")

    params = jax.tree.map(jnp.asarray, params)
    batch_stats = jax.tree.map(jnp.asarray, batch_stats)

    ds = CAHomoTestDataset(args.test_data, crop_size=cfg.estimator.crop_size)
    dl = DataLoader(ds, batch_size=args.batch_size, shuffle=False, drop_last=False)

    full_hw = cfg.estimator.ori_size

    @jax.jit
    def forward(params, batch_stats, patch, pt_set):
        out = model.apply({"params": params, "batch_stats": batch_stats}, patch, train=False)
        full = upsample_outputs(out, full_hw)
        return point_matching_error(pt_set, full["flow_f"], full["flow_b"])

    vis_forward = None
    if args.mask_vis:
        from dmhomo_tpu.evaluation.mask_vis import mask_vis_categories

        @jax.jit
        def vis_forward(params, batch_stats, patch):
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              patch, train=False)
            full = upsample_outputs(out, full_hw)
            return {k: full[k] for k in ("flow_b", "mask_f", "mask_b")}

        vis_counts = {}

    from dmhomo_tpu.data.loader import pad_batch

    errs, names = [], []
    for batch in dl:
        # pad-and-mask the tail so the jitted forward compiles exactly once
        batch, n_valid = pad_batch(batch, args.batch_size)
        e = forward(
            params, batch_stats,
            jnp.asarray(batch["imgs_gray_patch"]), jnp.asarray(batch["pt_set"]),
        )
        errs.extend(np.asarray(jax.device_get(e))[:n_valid].tolist())
        names.extend(batch["video_names"][:n_valid])
        if vis_forward is not None:
            outs = jax.device_get(
                vis_forward(params, batch_stats, jnp.asarray(batch["imgs_gray_patch"]))
            )
            mask_vis_categories(
                {k: v[:n_valid] for k, v in batch.items()},
                {k: np.asarray(v)[:n_valid] for k, v in outs.items()},
                args.mask_vis, counts=vis_counts,
            )

    from dmhomo_tpu.evaluation.metrics import TEST_CATEGORIES, TEST_CATEGORIES_TESTFN

    cats = TEST_CATEGORIES_TESTFN if args.category_set == "test" else TEST_CATEGORIES
    report = category_report(
        bucket_by_category(errs, names, categories=cats, seed_zero=args.seed_zero)
    )
    logger.info(" ".join(f"{k}:{v:.4f}" for k, v in report.items()))
    print(json.dumps(report))
    if args.out_json:
        from dmhomo_tpu.parallel.distributed import is_main_process

        if is_main_process():  # single writer on pods
            with open(args.out_json, "w") as f:
                json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main()
