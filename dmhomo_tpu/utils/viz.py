"""Qualitative visualization: preview panels, image grids, warp-check GIFs.

The numeric equivalents of the reference's eyeball checks:
* `postProcess` sample panels (denoising_diffusion_pytorch.py:1505-1517):
  [img1 | warp(img2, flow) | mask | flow-rgb] rows
* `make_gif` two-frame flip GIFs (:1543-1555, HEM/model/utils.py:575-583)
* square image grids like torchvision save_image (net.py:879-886)
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def sample_panel(imgs6: np.ndarray, mask: np.ndarray, flow: np.ndarray) -> np.ndarray:
    """Per-sample check panel.

    imgs6: (B, H, W, 6) in [0,1]; mask: (B, H, W, 1); flow: (B, H, W, 2).
    Returns (B, 2H, 4W, 3): row 1 = [img1, img1, mask, flow_rgb],
    row 2 = [img2, warp(img2, flow), mask, flow_rgb] - aligned columns
    should match between rows when the generation is consistent.
    """
    import jax.numpy as jnp

    from dmhomo_tpu.geometry import flow_to_rgb, warp_by_flow

    img1, img2 = imgs6[..., :3], imgs6[..., 3:]
    warp = np.asarray(warp_by_flow(jnp.asarray(img2), jnp.asarray(flow), mode="border"))
    flow_rgb = np.asarray(flow_to_rgb(jnp.asarray(flow)))
    mask3 = np.repeat(mask, 3, axis=-1)
    row1 = np.concatenate([img1, img1, mask3, flow_rgb], axis=2)
    row2 = np.concatenate([img2, warp, mask3, flow_rgb], axis=2)
    return np.clip(np.concatenate([row1, row2], axis=1), 0, 1)


def image_grid(images: np.ndarray, nrow: Optional[int] = None, pad: int = 2) -> np.ndarray:
    """(N, H, W, C) -> one (gh*H', gw*W', C) grid image in [0,1]."""
    n, h, w, c = images.shape
    nrow = nrow or int(np.ceil(np.sqrt(n)))
    ncol = int(np.ceil(n / nrow))
    grid = np.ones((ncol * (h + pad) - pad, nrow * (w + pad) - pad, c), images.dtype)
    for i in range(n):
        r, cl = divmod(i, nrow)
        grid[r * (h + pad) : r * (h + pad) + h, cl * (w + pad) : cl * (w + pad) + w] = images[i]
    return grid


def save_png(path: str, image01: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray((np.clip(image01, 0, 1) * 255).astype(np.uint8)).save(path)


def save_flip_gif(path: str, frames01: Sequence[np.ndarray], duration: float = 0.5) -> None:
    """Two-frame (or more) flip GIF - the reference's warp-consistency check."""
    import imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames = [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f in frames01]
    imageio.mimsave(path, frames, duration=duration, loop=0)


def vis_bad_case(path_dir: str, imgs6: np.ndarray, flow: np.ndarray,
                 motion: float, duration: float = 0.5) -> str:
    """Debugging dump for a rejected/extreme generation
    (GaussianDiffusion.vis_bad_case, classifier_free_guidance.py:753-768):
    a two-frame flip GIF, frame 1 = [img1 | img1], frame 2 =
    [img2 | warp(img2, flow)] — the right half should hold still when the
    flow explains the pair.  Writes ``badcase_{motion}.gif`` under
    ``path_dir`` (first sample of the batch, like the reference) and
    returns the path.

    imgs6: (B, H, W, 6) in [0,1]; flow: (B, H, W, 2); motion: the
    diagnostic tag (the reference uses the sampled motion magnitude).
    """
    import jax.numpy as jnp

    from dmhomo_tpu.geometry import warp_by_flow

    img1, img2 = imgs6[..., :3], imgs6[..., 3:]
    warp = np.asarray(
        warp_by_flow(jnp.asarray(img2[:1]), jnp.asarray(flow[:1]), mode="border")
    )[0]
    f1 = np.concatenate([img1[0], img1[0]], axis=1)
    f2 = np.concatenate([img2[0], warp], axis=1)
    path = os.path.join(path_dir, f"badcase_{motion}.gif")
    save_flip_gif(path, [f1, f2], duration)
    return path


def warp_check_gif(path: str, img12_u8_chw: np.ndarray, homo: np.ndarray,
                   duration: float = 0.5) -> str:
    """Per-shard warp-consistency flip GIF on a generated pair
    (generate_nyps_to_single_case.py:8-19): frame 1 = [img1 | warp(img1, H)],
    frame 2 = [img2 | img2]; when the generation is consistent the right
    half holds still while flipping."""
    import cv2

    img12 = np.asarray(img12_u8_chw).transpose(1, 2, 0).astype(np.float32)
    img1, img2 = img12[..., :3], img12[..., 3:]
    h, w = img1.shape[:2]
    warp = cv2.warpPerspective(img1, np.asarray(homo, np.float64), (w, h))
    f1 = np.concatenate([img1, warp], axis=1) / 255.0
    f2 = np.concatenate([img2, img2], axis=1) / 255.0
    save_flip_gif(path, [f1, f2], duration)
    return path
