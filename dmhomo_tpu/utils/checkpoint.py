"""Orbax checkpointing with the reference's logical contents.

DGM checkpoints carry {step, params, opt_state, ema} (the reference's
{'step','model','opt','ema','scaler','version'} minus AMP scaler,
denoising_diffusion_pytorch.py:1782-1826); HEM checkpoints carry
{step, epoch, params, batch_stats, opt_state, best scores}
(HEM/common/manager.py:128-200).  Steps are directories under a root, so
`latest_step` + `save_checkpoint(keep=N)` replace the reference's rolling
milestone-9999 scheme.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional

import orbax.checkpoint as ocp


def _step_dir(root: str, step: int) -> str:
    return os.path.join(os.path.abspath(root), f"step_{step:09d}")


def save_checkpoint(root: str, step: int, tree: Any, keep: Optional[int] = 3) -> str:
    """Save pytree `tree` at `root/step_XXXXXXXXX`. Returns the path.

    Single-writer on pods: callers pass host-gathered (device_get) trees,
    so only process 0 writes - every other process returns the path
    without touching the filesystem (the accelerate is_main_process gate,
    denoising_diffusion_pytorch.py:1783)."""
    from dmhomo_tpu.parallel.distributed import is_main_process

    path = _step_dir(root, step)
    if not is_main_process():
        return path
    os.makedirs(root, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr.save(path, tree)
    if keep is not None:
        steps = sorted(all_steps(root))
        for s in steps[:-keep]:
            shutil.rmtree(_step_dir(root, s), ignore_errors=True)
    return path


def all_steps(root: str):
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_step(root: str) -> Optional[int]:
    steps = all_steps(root)
    return steps[-1] if steps else None


def load_checkpoint(root: str, step: Optional[int] = None, target: Any = None) -> Any:
    """Load the pytree at `step` (default: latest). `target` gives structure
    and shardings (abstract arrays ok); without it, raw arrays come back."""
    if step is None:
        step = latest_step(root)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {root}")
    path = _step_dir(root, step)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(path, target)
        return ckptr.restore(path)
