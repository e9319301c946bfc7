"""Chipless HBM-traffic breakdown of the HEM train step from optimized HLO.

The AOT totals (scripts/hem_step_aot.py) say WHAT the step costs
(bytes/flops/peak); this says WHERE: it compiles the default fused step
for the TPU backend, walks the optimized-HLO text, and buckets every
instruction's output bytes (a proxy for HBM writes; reads roughly mirror
them on this elementwise-heavy program) by op kind and by shape.  Use it
to rank the next fusion/layout target (BENCH.md "HEM train step").

Caveats: fusion outputs only — in-fusion temporaries stay in registers /
VMEM and are free; scan bodies count ONCE (the grad-accum loop multiplies
real traffic by `grad_accum`); copies/bitcasts with identical logical
shape can still be real relayouts on TPU.

  python scripts/hem_hlo_breakdown.py [--accum N] [--attn pallas] [--top 30]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_DT_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO result type, incl. tuple elements."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DT_BYTES[dt]
    return total


# `%name = <result type incl. layout annos> opcode(...)`; the opcode is the
# first lowercase token directly followed by '(' (layout parens like
# T(8,128) are preceded by non-identifier chars, so non-greedy is safe)
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.+?)\s([a-z][a-z\-]*)\(")


def analyze(text: str, top: int):
    by_kind = defaultdict(int)
    by_comp = defaultdict(int)
    rows = []  # (bytes, kind, name, shape, comp)
    for line in text.splitlines():
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, shape_str, kind = m.groups()
        if kind in ("parameter", "constant", "tuple", "get-tuple-element",
                    "bitcast"):
            continue
        b = shape_bytes(shape_str)
        if not b:
            continue
        fk = re.search(r"kind=k(\w+)", line)
        if kind == "fusion" and fk:
            kind = f"fusion:{fk.group(1)}"
        by_kind[kind] += b
        op = re.search(r'op_name="([^"]+)"', line)
        comp = "?"
        if op:
            # trim 'jit(train_step)/...' to the informative tail: the last
            # module scopes before the primitive (e.g. swin/layers_0/...)
            parts = [s for s in op.group(1).split("/")
                     if s and not s.startswith("jit(")]
            comp = "/".join(parts[:-1][-3:]) or parts[-1]
        by_comp[comp] += b
        rows.append((b, kind, name, shape_str.strip(), comp))
    rows.sort(reverse=True)
    total = sum(by_kind.values())
    print(f"total instruction-output bytes: {total / 1e9:.1f} GB "
          "(scan bodies once)")
    print("\n-- by op kind --")
    for kind, b in sorted(by_kind.items(), key=lambda kv: -kv[1]):
        print(f"{kind:24s} {b / 1e9:9.2f} GB  {100 * b / total:5.1f}%")
    print("\n-- by component (op_name metadata) --")
    for comp, b in sorted(by_comp.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{b / 1e9:9.2f} GB  {100 * b / total:5.1f}%  {comp[:80]}")
    print(f"\n-- top {top} instructions --")
    for b, kind, name, shape, comp in rows[:top]:
        print(f"{b / 1e6:9.1f} MB  {kind:14s} {comp[:40]:40s} {shape[:60]}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--accum", type=int, default=None)
    p.add_argument("--attn", type=str, default=None)
    p.add_argument("--remat", action="store_true",
                   help="remat ON (default mirrors the shipped remat='auto' "
                   "resolution: off under pallas)")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--dump", type=str, default=None,
                   help="also write the optimized HLO text here")
    args = p.parse_args()

    from hem_step_aot import build  # noqa: E402 (sibling script)
    import jax
    from dmhomo_tpu.utils.platform import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp

    tr = build(attn=args.attn, accum=args.accum or 4, remat=args.remat)
    BS = 32
    ph, pw = tr.config.estimator.crop_size
    batch = {
        "imgs_gray_patch": jax.ShapeDtypeStruct((BS, ph, pw, 2), jnp.float32),
        "flow_gt_patch": jax.ShapeDtypeStruct((BS, ph, pw, 4), jnp.float32),
    }
    dummy = jnp.zeros((1, ph, pw, 2))
    variables = jax.eval_shape(
        lambda k: tr.model.init(k, dummy, train=False), jax.random.PRNGKey(0))
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": jax.eval_shape(tr.tx.init, variables["params"]),
        "step": jax.ShapeDtypeStruct((), jnp.int32),
        "epoch": jax.ShapeDtypeStruct((), jnp.int32),
    }
    comp = tr._train_step.lower(state, batch).compile()
    text = comp.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(text)
        print(f"optimized HLO -> {args.dump} ({len(text) / 1e6:.1f} MB)")
    analyze(text, args.top)


if __name__ == "__main__":
    main()
