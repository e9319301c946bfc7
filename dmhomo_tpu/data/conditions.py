"""DGM condition-tensor construction (host side, numpy float64 parity path).

Parity target: `UnHomoTrainData.__getitem__`
(denoising_diffusion_pytorch.py:1097-1163): per CAHomo training pair,
* images resized to 256x256, scaled to [0, 1]
* HomoGAN dominant-plane mask nearest-resized, 3x3 erode then dilate
* BasesHomo pseudo-homography rescaled 360x640 -> 256x256
* dense flow rendered from the homography (float64, +1e-6 divide guard)
* RGB flow image via the HSV encoding (max_flow=256, n=8)
* 12-channel concat: img1(3) img2(3) mask(1) rgb_flow(3) flow(2)

The reference recomputes all of this per *epoch* per sample on the CPU
loader - the classic TPU-starvation pattern (SURVEY.md hot loop 6).  Here
conditions are built once and cached to a flat memmap-able .npy so the
sampler/trainer streams them at memory bandwidth.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from dmhomo_tpu.geometry.host import homography_to_flow_np, rescale_homography_np


def flow_to_rgb_np(flow: np.ndarray, max_flow: float = 256.0, n: float = 8.0) -> np.ndarray:
    """Numpy twin of geometry.flow_viz.flow_to_rgb (H, W, 2) -> (H, W, 3)."""
    from matplotlib.colors import hsv_to_rgb

    max_flow = max(max_flow, 1.0) if max_flow is not None else np.max(flow)
    u, v = flow[..., 0], flow[..., 1]
    mag = np.sqrt(u * u + v * v)
    angle = np.arctan2(v, u)
    im_h = np.mod(angle / (2 * np.pi) + 1.0, 1.0)
    im_s = np.clip(mag * n / max_flow, 0, 1)
    im_v = np.clip(n - im_s, 0, 1)
    return hsv_to_rgb(np.stack([im_h, im_s, im_v], axis=2)).astype(np.float32)


def morph_close_mask(mask: np.ndarray, ksize: int = 3) -> np.ndarray:
    """3x3 erode then dilate (the reference's mask cleanup, :1126-1134)."""
    import cv2

    kernel = np.ones((ksize, ksize), np.uint8)
    m = cv2.erode(mask.astype(np.float32), kernel, iterations=1)
    return cv2.dilate(m, kernel, iterations=1)


def build_condition(
    img1: np.ndarray,
    img2: np.ndarray,
    mask: np.ndarray,
    homo_f: np.ndarray,
    image_size: int = 256,
    src_hw=(360, 640),
) -> np.ndarray:
    """One 12-channel condition tensor (image_size, image_size, 12) float32.

    img1/img2: (H, W, 3) in [0, 1] or uint8; mask: (H', W') float;
    homo_f: (3, 3) homography in `src_hw` pixel coordinates (img1 -> img2).
    """
    import cv2

    def to_f01(im):
        im = np.asarray(im)
        if im.dtype == np.uint8:
            im = im.astype(np.float32) / 255.0
        return im.astype(np.float32)

    img1 = cv2.resize(to_f01(img1), (image_size, image_size))
    img2 = cv2.resize(to_f01(img2), (image_size, image_size))

    m = cv2.resize(
        np.squeeze(mask).astype(np.float32),
        (image_size, image_size),
        interpolation=cv2.INTER_NEAREST,
    )
    m = morph_close_mask(m)[..., None]

    homo = rescale_homography_np(homo_f, src_hw, (image_size, image_size))
    flow = homography_to_flow_np(homo, image_size, image_size)  # fp64 -> fp32
    rgb_flow = flow_to_rgb_np(flow)

    return np.concatenate([img1, img2, m, rgb_flow, flow], axis=2).astype(np.float32)


def build_test_condition(
    img1: np.ndarray,
    img2: np.ndarray,
    matched_pts: np.ndarray,
    image_size: int = 256,
    src_hw=(360, 640),
) -> np.ndarray:
    """CATestSet-style 11-channel condition (no mask): img1(3) img2(3)
    rgb_flow(3) flow(2).  The homography comes from the 6 GT matched points
    (denoising_diffusion_pytorch.py:1166-1246).

    matched_pts: (>=4, 2, 2) of [pair, (src, dst), (x, y)].
    """
    import cv2

    import jax.numpy as jnp

    from dmhomo_tpu.geometry.homography import homography_from_points

    def to_f01(im):
        im = np.asarray(im)
        if im.dtype == np.uint8:
            im = im.astype(np.float32) / 255.0
        return im.astype(np.float32)

    img1 = cv2.resize(to_f01(img1), (image_size, image_size))
    img2 = cv2.resize(to_f01(img2), (image_size, image_size))

    src = np.asarray(matched_pts, np.float32)[:, 0, :]
    dst = np.asarray(matched_pts, np.float32)[:, 1, :]
    H = np.asarray(homography_from_points(jnp.asarray(src[None]), jnp.asarray(dst[None])))[0]
    H = rescale_homography_np(H, src_hw, (image_size, image_size))
    flow = homography_to_flow_np(H, image_size, image_size)
    rgb_flow = flow_to_rgb_np(flow)
    return np.concatenate([img1, img2, rgb_flow, flow], axis=2).astype(np.float32)


class ConditionCache:
    """Flat condition cache: one (N, S, S, 12) float32 .npy + (N,) class ids.

    Built once (build_cache), then memmap-read per batch - replaces the
    reference's per-epoch cv2+flow recompute in the DataLoader workers.
    """

    def __init__(self, path: str):
        self.path = path
        self.conditions = np.load(os.path.join(path, "conditions.npy"), mmap_mode="r")
        self.classes = np.load(os.path.join(path, "classes.npy"))

    def __len__(self):
        return self.conditions.shape[0]

    def __getitem__(self, idx):
        return np.asarray(self.conditions[idx]), self.classes[idx]

    def batch(self, indices: Sequence[int]):
        return np.asarray(self.conditions[list(indices)]), self.classes[list(indices)]

    @staticmethod
    def build(
        out_dir: str,
        samples,  # iterable of (img1, img2, mask, homo_f, class_id)
        image_size: int = 256,
        src_hw=(360, 640),
    ) -> "ConditionCache":
        os.makedirs(out_dir, exist_ok=True)
        conds, classes = [], []
        for img1, img2, mask, homo_f, cls in samples:
            conds.append(build_condition(img1, img2, mask, homo_f, image_size, src_hw))
            classes.append(cls)
        np.save(os.path.join(out_dir, "conditions.npy"), np.stack(conds))
        np.save(os.path.join(out_dir, "classes.npy"), np.asarray(classes, np.int32))
        return ConditionCache(out_dir)
