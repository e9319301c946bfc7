"""HEM train-step roofline: the step headline as a % of the chip's ceilings.

Mirrors scripts/dgm_roofline.py (r4) for the one baseline the repo only
matches (VERDICT r4 #1): XLA's AOT cost analysis gives the production
train step's true bytes/FLOPs, wall-clock comes from the measured fused
step record (scripts/hem_step_probe.py --device-data), ceilings are the
ones MEASURED on this chip (BENCH.md: 119.7 TFLOPS bf16 matmul, ~500 GB/s
plain XLA read, ~355 GB/s elementwise stream).

Scan-body-once accounting: the step at grad_accum=4 runs ONE lax.scan of 4
microbatch value_and_grad bodies; AOT counts the body once.  So we compile
  (a) a standalone microbatch loss+grad twin of the accum body, and
  (b) the full single-step program (body counted once),
and reconstruct  true = (accum - 1) x micro + full.

Pallas custom-call accounting: XLA's cost model reports 0 bytes/flops for
Mosaic custom-calls, so the fused window-attention kernel's HBM I/O would
vanish from the totals.  We re-add operand+result bytes of every
custom-call parsed from the optimized HLO — the same operand+output
convention the cost model uses for native ops.  (Kernel-internal VMEM
traffic is free in this accounting, exactly like in-fusion temporaries.)

Chipless (AOT only).  Writes reports/hem_roofline.json.

Run: python scripts/hem_roofline.py --measured <pairs/s from the probe>
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# measured on THIS chip via the relay (BENCH.md "chip ceilings", r2)
CEIL_TFLOPS = 119.7       # 8192^3 bf16 matmul, per-call key-varied loop
CEIL_GBPS_READ = 500.0    # plain XLA read (jnp.sum over 512 MB)
CEIL_GBPS_STREAM = 355.0  # elementwise r+w+r stream

_DT_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8,
}
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(s: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(s):
        if dt not in _DT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DT_BYTES[dt]
    return total


def custom_call_bytes(hlo_text: str) -> tuple[int, int]:
    """(total operand+result bytes, call count) over every custom-call.

    The result type is the lhs of '= ... custom-call(...)'; operand types
    appear inline in the argument list of the optimized-HLO text."""
    total, count = 0, 0
    for line in hlo_text.splitlines():
        if " custom-call(" not in line and " custom-call." not in line:
            continue
        m = re.match(r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(.+?)\s*custom-call",
                     line)
        if not m:
            continue
        count += 1
        total += _shape_bytes(m.group(1))  # result
        args = line.split("custom-call", 1)[1]
        # operand types are spelled inline: custom-call(bf16[...] %x, ...)
        total += _shape_bytes(args.split("custom_call_target", 1)[0])
    return total, count


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--measured", type=float, required=True,
                   help="measured step-only pairs/s (hem_step_probe fused "
                        "--device-data record)")
    p.add_argument("--attn", type=str, default="pallas")
    p.add_argument("--mask-impl", type=str, default=None)
    p.add_argument("--accum", type=int, default=4)
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--flops-per-pair", type=float, default=None,
                   help="known remat-off FLOPs/pair anchor (e.g. 279.5e9, "
                        "BENCH.md) - skips the two XLA-twin compiles that "
                        "only serve the flops count")
    p.add_argument("--out", type=str, default="reports/hem_roofline.json")
    args = p.parse_args(argv)

    import dataclasses

    import jax
    from dmhomo_tpu.utils.platform import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp

    from dmhomo_tpu.losses import compute_losses
    from dmhomo_tpu.train.config import HEMTrainConfig
    from dmhomo_tpu.train.hem_trainer import HEMTrainer

    cfg = HEMTrainConfig(attn_impl=args.attn, grad_accum=args.accum)
    if args.mask_impl:
        cfg = dataclasses.replace(
            cfg, estimator=dataclasses.replace(
                cfg.estimator, mask_impl=args.mask_impl))
    tr = HEMTrainer(cfg, steps_per_epoch=1000)
    # FLOPs reference twin: XLA attention with remat OFF - identical math
    # (kernel parity: reports/kernel_parity_tpu.json), no recompute, and
    # the cost model counts its einsums (it reports 0 for Mosaic calls).
    cfg_fl = dataclasses.replace(cfg, attn_impl="xla", remat=False)
    tr_fl = HEMTrainer(cfg_fl, steps_per_epoch=1000)
    BS = args.bs
    ph, pw = cfg.estimator.crop_size

    batch_s = {
        "imgs_gray_patch": jax.ShapeDtypeStruct((BS, ph, pw, 2), jnp.float32),
        "flow_gt_patch": jax.ShapeDtypeStruct((BS, ph, pw, 4), jnp.float32),
    }
    dummy = jnp.zeros((1, ph, pw, 2))
    variables = jax.eval_shape(
        lambda k: tr.model.init(k, dummy, train=False), jax.random.PRNGKey(0))
    state_s = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": jax.eval_shape(tr.tx.init, variables["params"]),
        "step": jax.ShapeDtypeStruct((), jnp.int32),
        "epoch": jax.ShapeDtypeStruct((), jnp.int32),
    }

    def cost(lowered):
        comp = lowered.compile()
        ca = comp.cost_analysis()
        cc_bytes, cc_n = custom_call_bytes(comp.as_text())
        return (float(ca["bytes accessed"]), float(ca["flops"]),
                cc_bytes, cc_n)

    # (b) full single-step program (accum scan body counted once)
    full_b, full_f, full_cc, full_ccn = cost(
        tr._train_step.lower(state_s, batch_s))
    full_f_ref = None
    if args.flops_per_pair is None:
        _, full_f_ref, _, _ = cost(tr_fl._train_step.lower(state_s, batch_s))

    # (a) standalone microbatch loss+grad twin of the accum scan body
    accum = min(args.accum, BS)
    while accum > 1 and BS % accum:
        accum -= 1
    mb = BS // accum
    micro_s = {
        "imgs_gray_patch": jax.ShapeDtypeStruct((mb, ph, pw, 2), jnp.float32),
        "flow_gt_patch": jax.ShapeDtypeStruct((mb, ph, pw, 4), jnp.float32),
    }

    def make_micro(model):
        def micro(params, batch_stats, batch):
            def loss_fn(params, batch_stats, batch):
                outputs, mutated = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch["imgs_gray_patch"], train=True,
                    mutable=["batch_stats"])
                losses = compute_losses(batch, outputs, cfg.loss)
                return losses["total"], (losses, mutated["batch_stats"])

            return jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, batch)

        return micro

    mic_b, mic_f, mic_cc, mic_ccn = cost(
        jax.jit(make_micro(tr.model)).lower(
            state_s["params"], state_s["batch_stats"], micro_s))
    mic_f_ref = None
    if args.flops_per_pair is None:
        _, mic_f_ref, _, _ = cost(
            jax.jit(make_micro(tr_fl.model)).lower(
                state_s["params"], state_s["batch_stats"], micro_s))

    true_bytes = (accum - 1) * (mic_b + mic_cc) + full_b + full_cc
    # flops from the XLA remat-off twin (same math, einsums counted), or
    # the known anchor passed in
    if args.flops_per_pair is not None:
        true_flops = args.flops_per_pair * BS
    else:
        true_flops = (accum - 1) * mic_f_ref + full_f_ref
    report = {
        "config": {"bs": BS, "accum": accum, "attn": args.attn,
                   "mask_impl": args.mask_impl or cfg.estimator.mask_impl,
                   "remat": tr.model.config.swin.remat,
                   "measured_pairs_per_sec": args.measured},
        "aot": {
            "full_step_once_bytes": full_b,
            "full_step_custom_call_bytes": full_cc,
            "full_step_custom_calls": full_ccn,
            "full_step_flops": full_f,
            "micro_bytes": mic_b, "micro_custom_call_bytes": mic_cc,
            "micro_custom_calls": mic_ccn, "micro_flops": mic_f,
            "micro_flops_xla_ref": mic_f_ref,
            "full_step_flops_xla_ref": full_f_ref,
            "true_bytes_per_step": true_bytes,
            "true_flops_per_step": true_flops,
        },
    }
    t_step = BS / args.measured
    gbps = true_bytes / t_step / 1e9
    tflops = true_flops / t_step / 1e12
    report["achieved"] = {
        "GBps": round(gbps, 1),
        "TFLOPS": round(tflops, 2),
        "pct_of_read_ceiling_500GBps": round(100 * gbps / CEIL_GBPS_READ, 1),
        "pct_of_stream_ceiling_355GBps": round(
            100 * gbps / CEIL_GBPS_STREAM, 1),
        "pct_of_matmul_ceiling_119.7TFLOPS": round(
            100 * tflops / CEIL_TFLOPS, 1),
    }
    report["verdict"] = ("HBM-bandwidth-bound" if gbps / CEIL_GBPS_STREAM
                         > tflops / CEIL_TFLOPS else "compute-bound")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"metric": "hem train-step roofline",
                      **report["achieved"], "verdict": report["verdict"]}))


if __name__ == "__main__":
    main()
