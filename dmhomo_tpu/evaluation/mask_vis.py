"""Qualitative mask / alignment dumps for HEM evaluation.

Parity target: `HEM/evaluate.py::mask_vis` (:165-329): per test pair, dump
warped-image alignment panels and mask heatmaps (it uses pytorch_grad_cam's
show_cam_on_image; here a jet colormap overlay), plus flip GIFs.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _jet_overlay(gray01: np.ndarray, heat01: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Overlay a heatmap on a grayscale image (show_cam_on_image-style)."""
    from matplotlib import cm

    heat_rgb = cm.jet(np.clip(heat01.squeeze(-1), 0, 1))[..., :3]
    base = np.repeat(np.clip(gray01, 0, 1), 3, axis=-1)
    return np.clip((1 - alpha) * base + alpha * heat_rgb, 0, 1)


def mask_vis(
    batch: Dict[str, np.ndarray],
    outputs: Dict[str, np.ndarray],
    out_dir: str,
    prefix: str = "val",
    max_items: int = 4,
) -> list:
    """Dump alignment + mask panels for a CAHomo eval batch.

    batch: imgs_gray_full (B,H,W,2); outputs: full-res flow_f/mask_fusion.
    Returns written paths.
    """
    import jax.numpy as jnp

    from dmhomo_tpu.geometry import warp_by_flow
    from dmhomo_tpu.utils.viz import save_flip_gif, save_png

    os.makedirs(out_dir, exist_ok=True)
    g = np.asarray(batch["imgs_gray_full"])
    g1, g2 = g[..., :1], g[..., 1:2]
    flow_f = np.asarray(outputs["flow_f"])
    mask = np.asarray(outputs.get("mask_fusion", np.ones_like(g1)))

    # normalize gray to [0,1] for display
    lo, hi = g.min(), g.max()
    g1d = (g1 - lo) / max(hi - lo, 1e-6)
    g2d = (g2 - lo) / max(hi - lo, 1e-6)
    warp = np.asarray(
        warp_by_flow(jnp.asarray(g2d), jnp.asarray(flow_f), mode="border")
    )

    paths = []
    for i in range(min(len(g1), max_items)):
        heat = _jet_overlay(g1d[i], mask[i])
        panel1 = np.concatenate([np.repeat(g1d[i], 3, -1), heat], axis=1)
        panel2 = np.concatenate([np.repeat(warp[i], 3, -1), heat], axis=1)
        png = os.path.join(out_dir, f"{prefix}_{i}_mask.png")
        gif = os.path.join(out_dir, f"{prefix}_{i}_align.gif")
        save_png(png, panel1)
        save_flip_gif(gif, [panel1, panel2])
        paths += [png, gif]
    return paths
