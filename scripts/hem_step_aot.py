"""Chipless AOT comparison of HEM train-step variants: XLA's optimized-HLO
bytes-accessed / flops / peak-memory, no chip time needed.

  python scripts/hem_step_aot.py [variant ...]
Variants: base, bf16sim, bf16sim_policy, gatherwarp, nowarp
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(sim_bf16=False, policy=None, accum=1, remat=True, fold_ln=False,
          attn=None, warp_method=None, ablate_warps=False, mask_impl=None):
    import jax
    from dmhomo_tpu.utils.platform import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp

    from dmhomo_tpu.train.config import HEMTrainConfig
    from dmhomo_tpu.train.hem_trainer import HEMTrainer

    cfg = HEMTrainConfig(grad_accum=accum, remat=remat)
    swin = cfg.estimator.swin
    if sim_bf16:
        swin = dataclasses.replace(swin, sim_dtype=jnp.bfloat16)
    if policy:
        swin = dataclasses.replace(swin, remat_policy=policy)
    if fold_ln:
        swin = dataclasses.replace(swin, fold_ln=True)
    if attn:
        swin = dataclasses.replace(swin, attn_impl=attn)
    if warp_method:
        swin = dataclasses.replace(swin, warp_method=warp_method)
    if ablate_warps:
        swin = dataclasses.replace(swin, ablate_warps=True)
    est = dataclasses.replace(
        cfg.estimator, swin=swin,
        warp_method=warp_method, ablate_warps=ablate_warps,
        **({"mask_impl": mask_impl} if mask_impl else {}),
    )
    cfg = dataclasses.replace(cfg, estimator=est)
    return HEMTrainer(cfg, steps_per_epoch=1000)


def measure(name, **kw):
    import jax
    import jax.numpy as jnp

    tr = build(**kw)
    BS = 32
    ph, pw = tr.config.estimator.crop_size
    batch = {
        "imgs_gray_patch": jax.ShapeDtypeStruct((BS, ph, pw, 2), jnp.float32),
        "flow_gt_patch": jax.ShapeDtypeStruct((BS, ph, pw, 4), jnp.float32),
    }
    dummy = jnp.zeros((1, ph, pw, 2))
    variables = jax.eval_shape(
        lambda k: tr.model.init(k, dummy, train=False), jax.random.PRNGKey(0)
    )
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": jax.eval_shape(tr.tx.init, variables["params"]),
        "step": jax.ShapeDtypeStruct((), jnp.int32),
        "epoch": jax.ShapeDtypeStruct((), jnp.int32),
    }
    comp = tr._train_step.lower(state, batch).compile()
    ca = comp.cost_analysis()
    try:
        mem = comp.memory_analysis()
        peak = f" temp={mem.temp_size_in_bytes / 2**30:.2f}GiB"
    except Exception:
        peak = ""
    print(
        f"{name}: bytes={ca.get('bytes accessed', 0) / 1e12:.3f}TB "
        f"flops={ca.get('flops', 0) / 1e12:.2f}T{peak}", flush=True,
    )


def main():
    names = sys.argv[1:] or ["base", "bf16sim", "bf16sim_policy"]
    for name in names:
        if name == "base":
            measure(name)
        elif name == "bf16sim":
            measure(name, sim_bf16=True)
        elif name == "bf16sim_policy":
            measure(name, sim_bf16=True, policy="dots_with_no_batch_dims_saveable")
        elif name == "gatherwarp":
            measure(name, warp_method="gather")
        elif name == "nowarp":
            measure(name, ablate_warps=True)
        elif name == "fold":
            measure(name, fold_ln=True)
        elif name == "fold_policy":
            measure(name, fold_ln=True, policy="dots_with_no_batch_dims_saveable")
        elif name.startswith("fold_accum"):
            measure(name, fold_ln=True, accum=int(name[10:]))
        elif name == "policy":
            measure(name, policy="dots_with_no_batch_dims_saveable")
        elif name.startswith("policy_accum"):
            measure(name, policy="dots_with_no_batch_dims_saveable",
                    accum=int(name[12:]))
        elif name.startswith("pallas_accum"):
            rest = name[12:]
            if rest.endswith("_noremat"):
                measure(name, attn="pallas", accum=int(rest.split("_")[0]),
                        remat=False)
            else:
                measure(name, attn="pallas", accum=int(rest))
        elif name == "pallas":
            measure(name, attn="pallas")
        elif name == "splitmask":
            # the shipped r4 regime (pallas, no remat, accum=4) ± the
            # concat-free mask head
            measure(name, attn="pallas", accum=4, remat=False,
                    mask_impl="split")
        elif name == "concatmask":
            measure(name, attn="pallas", accum=4, remat=False,
                    mask_impl="concat")
        elif name == "fusedblock":
            measure(name, attn="fused_block")
        elif name.startswith("accum"):
            if name.endswith("_noremat"):
                measure(name, accum=int(name[5:].split("_")[0]), remat=False)
            else:
                measure(name, accum=int(name[5:]))
        else:
            raise SystemExit(f"unknown variant {name}")


if __name__ == "__main__":
    main()
