"""Qualitative mask / alignment dumps for HEM evaluation.

Parity target: `HEM/evaluate.py::mask_vis` (:165-329): per CAHomo test pair,
capped per scene category, dump the RGB pair, the im1-warped-by-flow_b
remap, mask_f/mask_b heatmaps (show_cam_on_image -> jet overlay here) and a
4-panel flip GIF [im1 | im1_remap | heat1 | heat2] vs [im2 | im2 | ...].
`mask_vis` keeps the light gray-only variant for in-training spot checks.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _jet_overlay(base01: np.ndarray, heat01: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Overlay a heatmap on a gray or RGB image (show_cam_on_image-style)."""
    from matplotlib import cm

    heat_rgb = cm.jet(np.clip(heat01.squeeze(-1), 0, 1))[..., :3]
    base = np.clip(base01, 0, 1)
    if base.shape[-1] == 1:
        base = np.repeat(base, 3, axis=-1)
    return np.clip((1 - alpha) * base + alpha * heat_rgb, 0, 1)


def mask_vis(
    batch: Dict[str, np.ndarray],
    outputs: Dict[str, np.ndarray],
    out_dir: str,
    prefix: str = "val",
    max_items: int = 4,
) -> list:
    """Light alignment + fusion-mask panels for a CAHomo eval batch.

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


def mask_vis_categories(
    batch: Dict[str, np.ndarray],
    outputs: Dict[str, np.ndarray],
    out_dir: str,
    counts: Optional[Dict[str, int]] = None,
    per_category_cap: int = 50,
) -> list:
    """Reference-format per-category qualitative dumps (HEM/evaluate.py:165-329).

    batch: imgs_rgb_full (B,H,W,6) in [0,1], video_names (list), optionally
    save_names.  outputs (full-res): flow_b, mask_f, mask_b.  `counts` keeps
    the per-category cap across batches (mutated in place).  Returns paths.
    """
    import jax.numpy as jnp

    from dmhomo_tpu.evaluation.metrics import TEST_CATEGORIES
    from dmhomo_tpu.geometry import warp_by_flow
    from dmhomo_tpu.utils.viz import save_flip_gif, save_png

    counts = counts if counts is not None else {}
    rgb = np.asarray(batch["imgs_rgb_full"])
    names = batch["video_names"]
    save_names = batch.get("save_names", [f"{n}_{i}" for i, n in enumerate(names)])
    im1, im2 = rgb[..., :3], rgb[..., 3:]
    flow_b = np.asarray(outputs["flow_b"])
    # im1 remapped by flow_b == the reference's get_warp_flow (collapse)
    im1_remap = np.asarray(
        warp_by_flow(jnp.asarray(im1), jnp.asarray(flow_b), mode="collapse")
    )

    def norm_mask(m):  # (m / (max(m) * 0.5)).clamp(0, 1)  (ref :269-270)
        return np.clip(m / max(float(m.max()) * 0.5, 1e-6), 0, 1)

    paths = []
    for i, vid in enumerate(names):
        cat = next((c for c, ids in TEST_CATEGORIES.items() if vid in ids), None)
        if cat is None:
            continue
        counts[cat] = counts.get(cat, 0) + 1
        if counts[cat] >= per_category_cap:
            continue
        d = os.path.join(out_dir, cat)
        mask_f = norm_mask(np.asarray(outputs["mask_f"][i]))
        mask_b = norm_mask(np.asarray(outputs["mask_b"][i]))
        heat1 = _jet_overlay(im1_remap[i], mask_f)
        heat2 = _jet_overlay(im2[i], mask_b)
        stem = os.path.join(d, str(save_names[i]))
        save_png(f"{stem}_img1.jpg", im1[i])
        save_png(f"{stem}_img2.jpg", im2[i])
        save_png(f"{stem}_mask_1.jpg", heat1)
        save_png(f"{stem}_mask_2.jpg", heat2)
        frame1 = np.concatenate([im1[i], im1_remap[i], heat1, heat2], axis=1)
        frame2 = np.concatenate([im2[i], im2[i], heat1, heat2], axis=1)
        save_flip_gif(f"{stem}.gif", [np.clip(frame1, 0, 1), np.clip(frame2, 0, 1)])
        paths += [f"{stem}_img1.jpg", f"{stem}_img2.jpg",
                  f"{stem}_mask_1.jpg", f"{stem}_mask_2.jpg", f"{stem}.gif"]
    return paths
