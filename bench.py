"""Headline benchmark: DGM trainset-generation throughput on one TPU chip.

Measures the reference's primary performance target (SURVEY.md 3.2 /
BASELINE.md): conditional DDIM sampling at the shipped config - UNet dim=64
@ 256^2, s_step=32, CFG scale 3 (so 64 UNet evaluations per image pair) -
plus the dense flow->homography fit, i.e. everything `trainer.sample` +
`saveTrainPair` do per batch.  bs=64 (vs the reference's 25): the chip-
optimal batch found by the r2 sweep (throughput saturates at the CFG-
doubled B=128 forward; B=256 exceeds 16 GB HBM) - shards carry the same
per-sample format regardless of batch.

Baseline: the reference runs this on one RTX 2080 Ti (README.md:13-14) but
publishes no throughput number, so we derive one.  XLA cost analysis of
this exact UNet gives 237.5 GFLOP per forward at 256^2, i.e. 64 x 237.5 =
15.2 TFLOP per generated sample.  The reference samples in fp32 (amp=False,
dgm_sample.py:48); a 2080 Ti peaks at 13.45 TFLOPS fp32, and granting
PyTorch eager a generous 30% MFU on this conv/attention mix gives ~4.0
effective TFLOPS -> 0.27 samples/s; we round UP to 0.30 samples/s
(generous-to-baseline = conservative speedup claims).
vs_baseline = ours / 0.30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_2080TI_SAMPLES_PER_SEC = 0.30
# HEM: the reference publishes no throughput; derive one the same way as the
# DGM baseline - fp32 train-step FLOPs (measured by XLA cost analysis at
# runtime) on one 13.45-TFLOPS 2080 Ti at a generous 30% MFU.
HEM_BASELINE_EFFECTIVE_TFLOPS = 13.45 * 0.30


def main():
    import jax
    import jax.numpy as jnp

    from dmhomo_tpu.diffusion import DiffusionConfig, GaussianDiffusion
    from dmhomo_tpu.geometry import fit_homography_to_flow
    from dmhomo_tpu.geometry.host import homography_to_flow_np
    from dmhomo_tpu.data.conditions import flow_to_rgb_np
    from dmhomo_tpu.models import ConditionalUNet, UNetConfig
    from dmhomo_tpu.models.unet import make_unet_apply

    B, S, S_STEP = 64, 256, 32
    unet_cfg = UNetConfig(dim=64, num_classes=1, dtype=jnp.bfloat16)
    model = ConditionalUNet(unet_cfg)
    gd = GaussianDiffusion(
        make_unet_apply(model),
        DiffusionConfig(image_size=S, timesteps=1000, sampling_timesteps=S_STEP,
                        objective="pred_x0", cond_scale=3.0),
    )

    dummy = dict(
        x=jnp.zeros((1, S, S, 6)), time=jnp.zeros((1,), jnp.int32),
        classes=jnp.zeros((1,), jnp.int32), rgb_flow=jnp.zeros((1, S, S, 3)),
        mask=jnp.ones((1, S, S, 1)), keep_mask=jnp.ones((1,), bool),
    )
    params = model.init(jax.random.PRNGKey(0), **dummy)["params"]

    # real condition content (homography flow + HSV render)
    rng = np.random.default_rng(0)
    d = rng.normal(0, 0.01, (3, 3)); d[2, :2] *= 1e-4; d[2, 2] = 0
    flow_np = homography_to_flow_np(np.eye(3) + d, S, S)
    rgb = jnp.asarray(np.broadcast_to(flow_to_rgb_np(flow_np), (B, S, S, 3)))
    flow = jnp.asarray(np.broadcast_to(flow_np, (B, S, S, 2)))
    mask = jnp.ones((B, S, S, 1))
    classes = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def generate(params, key):
        imgs = gd.sample(params, key, classes, rgb, mask)
        homos = fit_homography_to_flow(flow)
        return imgs, homos

    # warmup/compile
    out = generate(params, jax.random.PRNGKey(1))
    jax.block_until_ready(out)

    iters = 3
    t0 = time.time()
    for i in range(iters):
        imgs_out, homos_out = generate(params, jax.random.PRNGKey(2 + i))
        # host readback of a sampled pixel: homos alone depends only on the
        # condition flow, so blocking on it would not force the DDIM chain
        float(jax.device_get(imgs_out[0, 0, 0, 0]))
        float(jax.device_get(homos_out[0, 0, 0]))
    dt = (time.time() - t0) / iters

    samples_per_sec = B / dt
    print(json.dumps({
        "metric": "DGM generation samples/sec/chip (bs=64, s_step=32, CFG, 256^2, + H-fit)",
        "value": round(samples_per_sec, 3),
        "unit": "samples/sec",
        "vs_baseline": round(samples_per_sec / BASELINE_2080TI_SAMPLES_PER_SEC, 2),
    }))


def main_hem():
    """HEM end-to-end training throughput: host loader feeding the jitted
    train step (BASELINE.md "HEM pairs/sec").  Uses the device-pipeline
    loader (raw uint8 + H to the chip; resize/gray/flow render in-graph)."""
    import os
    import tempfile

    import jax

    from dmhomo_tpu.data import DataLoader, HEMTrainDataset
    from dmhomo_tpu.data.loader import cycle
    from dmhomo_tpu.train.config import HEMTrainConfig
    from dmhomo_tpu.train.hem_trainer import HEMTrainer

    BS = 32
    tmp = tempfile.mkdtemp(prefix="hembench")
    rng = np.random.default_rng(0)
    for i in range(8 * BS):
        d = rng.normal(0, 0.005, (3, 3))
        d[2, :2] *= 1e-4
        d[2, 2] = 0
        np.save(
            os.path.join(tmp, f"{i}.npy"),
            {"img12": rng.integers(0, 255, (6, 256, 256)).astype(np.uint8),
             "homo12": np.eye(3) + d},
            allow_pickle=True,
        )

    ds = HEMTrainDataset(tmp, rng=np.random.default_rng(1), device_pipeline=True)
    dl = DataLoader(ds, batch_size=BS, prefetch=4)

    # loader-only rate
    it = iter(dl)
    first = next(it)
    t0 = time.time()
    n = 0
    for b in it:
        n += b["img12"].shape[0]
    loader_rate = n / (time.time() - t0)

    trainer = HEMTrainer(HEMTrainConfig(), steps_per_epoch=1000)
    trainer.init_state()
    losses = trainer.train_step(first)
    jax.block_until_ready(losses["total"])

    # step-only rate (varied inputs, HONEST per-call host readback - the
    # relay can otherwise report chained dispatches early, BENCH.md)
    iters = 10
    t0 = time.time()
    for i in range(iters):
        b = {k: v for k, v in first.items()}
        b["start"] = (first["start"] + i) % 8 + 16
        losses = trainer.train_step(b)
        loss_val = float(jax.device_get(losses["total"]))
    step_rate = BS * iters / (time.time() - t0)

    # sustained end-to-end: loader feeding the step (per-call readback)
    stream = cycle(dl)
    steps = 12
    t0 = time.time()
    for _ in range(steps):
        losses = trainer.train_step(next(stream))
        float(jax.device_get(losses["total"]))
    e2e_rate = BS * steps / (time.time() - t0)

    # derived reference baseline from the step's actual FLOPs
    try:
        cost = trainer._train_step_raw.lower(
            jax.device_get(trainer.state),
            {k: np.asarray(v) for k, v in first.items()},
        ).compile().cost_analysis()
        flops_per_pair = float(cost["flops"]) / BS
    except Exception:
        flops_per_pair = 25e9  # conservative fallback
    baseline_rate = HEM_BASELINE_EFFECTIVE_TFLOPS * 1e12 / flops_per_pair

    print(json.dumps({
        "metric": "HEM train pairs/sec/chip (bs=32, device-pipeline loader + one-jit step)",
        "value": round(e2e_rate, 1),
        "unit": "pairs/sec",
        "vs_baseline": round(e2e_rate / baseline_rate, 2),
        "loader_pairs_per_sec": round(loader_rate, 1),
        "step_pairs_per_sec": round(step_rate, 1),
        "final_loss": round(loss_val, 4),
    }))


if __name__ == "__main__":
    import sys

    if "--hem" in sys.argv:
        main_hem()
    else:
        main()
