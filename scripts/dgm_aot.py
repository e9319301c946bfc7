"""Chipless AOT cost analysis of DGM programs (see hem_step_aot.py).

  python scripts/dgm_aot.py sample64 sample80 train32 train32a2
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sample(bs, bf16_params=False):
    import jax
    from dmhomo_tpu.utils.platform import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp

    from dmhomo_tpu.diffusion import DiffusionConfig, GaussianDiffusion
    from dmhomo_tpu.models import ConditionalUNet, UNetConfig
    from dmhomo_tpu.models.unet import make_unet_apply

    import os

    S = 256
    split = os.environ.get("DMHOMO_SPLIT_SKIP", "0") == "1"  # read at build
    cfg = UNetConfig(dim=64, num_classes=1, dtype=jnp.bfloat16,
                     split_skip_convs=split)
    model = ConditionalUNet(cfg)
    gd = GaussianDiffusion(
        make_unet_apply(model),
        DiffusionConfig(image_size=S, timesteps=1000, sampling_timesteps=32,
                        objective="pred_x0", cond_scale=3.0),
    )
    dummy = dict(
        x=jnp.zeros((1, S, S, 6)), time=jnp.zeros((1,), jnp.int32),
        classes=jnp.zeros((1,), jnp.int32), rgb_flow=jnp.zeros((1, S, S, 3)),
        mask=jnp.ones((1, S, S, 1)), keep_mask=jnp.ones((1,), bool),
    )
    pshape = jax.eval_shape(lambda k: model.init(k, **dummy), jax.random.PRNGKey(0))["params"]
    if bf16_params:
        # VERDICT r4 #4 A/B: stream the EMA sampling weights as bf16.
        # Arithmetic first: 38.4M params x 4B = 154 MB; the 12-ch input
        # means ONE weight read per CFG-doubled forward, 32 DDIM steps ->
        # 32 x 154 MB ~ 4.9 GB of the 6.39 TB batch - 0.08% of traffic.
        # The sampler's bytes are ACTIVATIONS (bf16 already); this run
        # quantifies the (tiny) delta under the same AOT accounting.
        pshape = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(
                s.shape,
                jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
            pshape)
    args = (
        pshape,
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        jax.ShapeDtypeStruct((bs,), jnp.int32),
        jax.ShapeDtypeStruct((bs, S, S, 3), jnp.float32),
        jax.ShapeDtypeStruct((bs, S, S, 1), jnp.float32),
    )
    comp = jax.jit(lambda p, k, c, r, m: gd.sample(p, k, c, r, m)).lower(*args).compile()
    report(f"sample bs={bs}", comp)


def train(bs, accum):
    import dataclasses

    import jax
    from dmhomo_tpu.utils.platform import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp

    from dmhomo_tpu.train.config import DGMTrainConfig
    from dmhomo_tpu.train.dgm_trainer import DGMTrainer, dgm_abstract_state

    cfg = DGMTrainConfig()
    cfg = dataclasses.replace(
        cfg,
        unet=dataclasses.replace(cfg.unet, dtype=jnp.bfloat16, remat=True),
        gradient_accumulate_every=accum,
    )
    tr = DGMTrainer(cfg)
    S = cfg.diffusion.image_size
    state = dgm_abstract_state(tr.model, S, lr=cfg.lr)
    step = tr._build_train_step()
    batch = jax.ShapeDtypeStruct((bs, S, S, 12), jnp.float32)
    classes = jax.ShapeDtypeStruct((bs,), jnp.int32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    comp = step.lower(state, batch, classes, key).compile()
    report(f"train bs={bs} accum={accum}", comp)


def report(name, comp):
    ca = comp.cost_analysis()
    try:
        mem = comp.memory_analysis()
        peak = f" temp={mem.temp_size_in_bytes / 2**30:.2f}GiB"
    except Exception:
        peak = ""
    print(f"{name}: bytes={ca.get('bytes accessed', 0)/1e12:.3f}TB "
          f"({ca.get('bytes accessed', 0):.0f}) "
          f"flops={ca.get('flops', 0)/1e12:.2f}T{peak}", flush=True)


def main():
    for name in sys.argv[1:] or ["sample64"]:
        if name.startswith("sampleb"):  # bf16 sampling params (EMA cast)
            sample(int(name[7:]), bf16_params=True)
        elif name.startswith("sample"):
            sample(int(name[6:]))
        elif name.startswith("train"):
            bs, _, a = name[5:].partition("a")
            train(int(bs), int(a or 1))
        else:
            raise SystemExit(name)


if __name__ == "__main__":
    main()
