"""HEM datasets: generated-pair training set, CAHomo test set, synthetic pairs.

Parity targets (HEM/dataset/data_loader.py):
* DGMTrainData (:97-255): per-sample npy -> H rescaled 256 -> 360x640, images
  resized, mean/std normalized ([118.93,113.97,102.60]/[69.85,68.81,72.45]),
  grayscale by channel mean, random crop 320x576 inside a rho=16 margin,
  full-res fwd/bwd GT flows from H and H^-1, patch flows cropped from them.
  Fix applied (SURVEY.md quirk): train batches DO carry `ganhomo_mask` ones.
* HomoTestData (:258-352): test.txt pair list + pt/*.npy matched points +
  img/; gray+normalized full imgs and 320x576 resized "patch".
* SyntheticHomoPairs: no-disk stand-in generating pairs by warping random
  textures with random homographies - used by tests and demo runs.

All outputs are NHWC numpy float32 dicts (channel-last, unlike the torch
reference) ready for device upload.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np

from dmhomo_tpu.data.shards import load_sample
from dmhomo_tpu.geometry.host import homography_to_flow_np, rescale_homography_np

MEAN_I = np.array([118.93, 113.97, 102.60], np.float64).reshape(1, 1, 3)
STD_I = np.array([69.85, 68.81, 72.45], np.float64).reshape(1, 1, 3)


def normalize_gray(img_u8: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8/float -> (H, W, 1) normalized grayscale (ref :240-248).

    Routes through the native kernel when built (same fp64 math).
    """
    from dmhomo_tpu import native

    img_u8 = np.asarray(img_u8)
    if img_u8.dtype in (np.uint8, np.float32):
        out = native.normalize_gray_native(img_u8, MEAN_I.ravel(), STD_I.ravel())
        if out is not None:
            return out
    img = (np.asarray(img_u8, np.float64) - MEAN_I) / STD_I
    return np.mean(img, axis=2, keepdims=True).astype(np.float32)


def device_build_patches(img12_u8, homo, homo_inv, start, crop_size, ori_size):
    """In-graph (jit-able) twin of HEMTrainDataset.__getitem__'s heavy path.

    Takes the raw uint8 pairs + ori-coordinate homographies + crop starts
    that `HEMTrainDataset(device_pipeline=True)` ships (0.4 KB of host work
    per sample instead of ~9 ms of cv2/numpy) and produces the training
    batch on the TPU: half-pixel bilinear resize to ori_size, gray
    normalization, dense GT flows from H / H^-1, and the random crops.

    img12_u8: (B, 6, S, S) uint8; homo/homo_inv: (B, 3, 3) in ori coords;
    start: (B, 2) int32 (x, y).  Returns the minimal train batch dict.
    """
    import jax
    import jax.numpy as jnp

    from dmhomo_tpu.geometry.homography import homography_to_flow
    from dmhomo_tpu.geometry.warp import resize_bilinear

    ph, pw = crop_size
    oh, ow = ori_size
    B = img12_u8.shape[0]

    imgs = jnp.transpose(img12_u8, (0, 2, 3, 1)).astype(jnp.float32)  # (B,S,S,6)
    if imgs.shape[1:3] != (oh, ow):
        imgs = resize_bilinear(imgs, (oh, ow))
    mean = jnp.asarray(MEAN_I.ravel(), jnp.float32)
    std = jnp.asarray(STD_I.ravel(), jnp.float32)
    g1 = jnp.mean((imgs[..., :3] - mean) / std, axis=-1, keepdims=True)
    g2 = jnp.mean((imgs[..., 3:] - mean) / std, axis=-1, keepdims=True)
    gray = jnp.concatenate([g1, g2], axis=-1)  # (B, oh, ow, 2)

    flow_f = homography_to_flow(homo.astype(jnp.float32), oh, ow, eps=1e-8)
    flow_b = homography_to_flow(homo_inv.astype(jnp.float32), oh, ow, eps=1e-8)
    flows = jnp.concatenate([flow_b, flow_f], axis=-1)  # (B, oh, ow, 4)

    def crop(arr, s):
        return jax.lax.dynamic_slice(arr, (s[1], s[0], 0), (ph, pw, arr.shape[-1]))

    start = start.astype(jnp.int32)
    return {
        "imgs_gray_patch": jax.vmap(crop)(gray, start),
        "flow_gt_patch": jax.vmap(crop)(flows, start),
    }


class HEMTrainDataset:
    """Generated-pair training set over per-sample npys."""

    def __init__(
        self,
        samples_dir: str,
        crop_size=(320, 576),
        ori_size=(360, 640),
        rho: int = 16,
        rng: Optional[np.random.Generator] = None,
        limit: Optional[int] = None,
        minimal: bool = False,
        device_pipeline: bool = False,
    ):
        self.paths = sorted(glob.glob(os.path.join(samples_dir, "*.npy")))
        if limit:
            self.paths = self.paths[:limit]
        self.crop_size = tuple(crop_size)
        self.ori_size = tuple(ori_size)
        # clamp the crop margin so small (smoke) geometries stay valid
        max_rho = min(
            (ori_size[0] - crop_size[0]) // 2, (ori_size[1] - crop_size[1]) // 2
        )
        self.rho = max(0, min(rho, max_rho))
        self.rng = rng or np.random.default_rng()
        # minimal=True returns only what the jitted train step consumes
        # (imgs_gray_patch + flow_gt_patch) - the full-res extras roughly
        # triple the per-sample host time (BENCH.md loader breakdown)
        self.minimal = minimal
        # device_pipeline=True ships raw uint8 + H + crop start and leaves
        # resize/gray/flow-render to `device_build_patches` inside the
        # jitted train step - the host does ~0.2 ms/sample instead of ~9
        self.device_pipeline = device_pipeline

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        import cv2

        buf = load_sample(self.paths[idx])
        img12 = buf["img12"]  # (6, S, S) uint8 CHW
        homo = np.asarray(buf["homo12"], np.float64)
        oh, ow = self.ori_size
        ph_, pw_ = self.crop_size

        if self.device_pipeline:
            h, w = img12.shape[1:]
            H = homo if (h, w) == (oh, ow) else rescale_homography_np(homo, (h, w), (oh, ow))
            x = int(self.rng.integers(self.rho, ow - self.rho - pw_ + 1))
            y = int(self.rng.integers(self.rho, oh - self.rho - ph_ + 1))
            return {
                "img12": img12,
                "homo": H.astype(np.float32),
                "homo_inv": np.linalg.inv(H).astype(np.float32),
                "start": np.asarray([x, y], np.int32),
            }

        img1 = img12[:3].transpose(1, 2, 0)
        img2 = img12[3:].transpose(1, 2, 0)
        h, w = img1.shape[:2]

        if (h, w) != (oh, ow):
            homo = rescale_homography_np(homo, (h, w), (oh, ow))
            img1 = cv2.resize(img1, (ow, oh))
            img2 = cv2.resize(img2, (ow, oh))
        homo_inv = np.linalg.inv(homo)

        g1 = normalize_gray(img1)
        g2 = normalize_gray(img2)

        ph, pw = self.crop_size
        x = int(self.rng.integers(self.rho, ow - self.rho - pw + 1))
        y = int(self.rng.integers(self.rho, oh - self.rho - ph + 1))

        flow_f = homography_to_flow_np(homo, oh, ow, eps=1e-8)
        flow_b = homography_to_flow_np(homo_inv, oh, ow, eps=1e-8)
        flow_f_patch = flow_f[y : y + ph, x : x + pw]
        flow_b_patch = flow_b[y : y + ph, x : x + pw]

        out = {
            "imgs_gray_patch": np.concatenate(
                [g1[y : y + ph, x : x + pw], g2[y : y + ph, x : x + pw]], axis=2
            ),
            "flow_gt_patch": np.concatenate([flow_b_patch, flow_f_patch], axis=2),
            "start": np.asarray([x, y], np.float32),
        }
        if self.minimal:
            return out
        out.update({
            "imgs_gray_full": np.concatenate([g1, g2], axis=2),
            "flow_gt_full": np.concatenate([flow_b, flow_f], axis=2),
            "imgs_rgb_full": np.concatenate([img1, img2], axis=2).astype(np.float32) / 255.0,
            "ganhomo_mask": np.ones((ph, pw, 1), np.float32),
        })
        return out


class CAHomoTestDataset:
    """CAHomo test split: img pairs + 6 GT matched points per pair."""

    def __init__(self, data_dir: str, crop_size=(320, 576)):
        self.data_dir = data_dir
        self.crop_size = tuple(crop_size)
        with open(os.path.join(data_dir, "test.txt")) as f:
            self.pairs = [ln.strip() for ln in f if ln.strip()]

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, idx):
        import cv2

        line = self.pairs[idx]
        video_name = line.split("/")[0]
        names = line.split(" ")
        pt_name = names[0].split("/")[-1] + "_" + names[1].split("/")[-1] + ".npy"

        img1 = cv2.imread(os.path.join(self.data_dir, "img", names[0]))
        img2 = cv2.imread(os.path.join(self.data_dir, "img", names[1]))

        pt = np.load(os.path.join(self.data_dir, "pt", pt_name), allow_pickle=True).item()
        pt_set = np.asarray(pt["matche_pts"][:6], np.float32)  # (6, 2, 2)

        g1 = normalize_gray(img1)
        g2 = normalize_gray(img2)
        ph, pw = self.crop_size
        g1_rs = cv2.resize(g1, (pw, ph))[..., None]
        g2_rs = cv2.resize(g2, (pw, ph))[..., None]

        return {
            "imgs_gray_full": np.concatenate([g1, g2], axis=2),
            "imgs_gray_patch": np.concatenate([g1_rs, g2_rs], axis=2),
            "imgs_rgb_full": np.concatenate([img1, img2], axis=2).astype(np.float32) / 255.0,
            "pt_set": pt_set,
            "video_names": video_name,
            "ganhomo_mask": np.ones((g1.shape[0], g1.shape[1], 1), np.float32),
        }


class SyntheticHomoPairs:
    """Random-texture pairs under known homographies (no disk required).

    Serves tests, demos and smoke training; emits the same dict schema as
    HEMTrainDataset.  Image2 = warp(image1, H) + noise, so the GT flows are
    exact and small training runs can actually converge.
    """

    def __init__(
        self,
        n: int = 64,
        crop_size=(320, 576),
        ori_size=(360, 640),
        rho: int = 16,
        max_offset: float = 8.0,
        seed: int = 0,
        noise: float = 0.01,
        outlier_frac: float = 0.0,
        label_outliers: bool = False,
    ):
        self.n = n
        self.crop_size = tuple(crop_size)
        self.ori_size = tuple(ori_size)
        self.rho = rho
        self.max_offset = max_offset
        self.noise = noise
        self.seed = seed
        # fraction of the image area covered by an "independently moving
        # object": a rectangle in img2 whose content violates the global H
        # (shifted copy of the local texture).  GT flows stay the H-flows,
        # so the region is a true outlier - the material the
        # uncertainty/mask head (NLL-Laplace, losses.py parity) must learn
        # to downweight.  0 = rigid scene (old behavior).
        self.outlier_frac = outlier_frac
        # label_outliers=True: the GT flow labels in the outlier rectangle
        # follow the ACTUAL (outlier) motion instead of the global H - the
        # labels a dense-flow fit would produce.  This models the
        # reference's training reality: DGM pair homographies are FITTED
        # from sampled dense flows (denoising_diffusion_pytorch.py:
        # 1647-1661), so wherever the generated pair carries
        # non-homography content the per-pixel supervision disagrees with
        # the dominant plane.  The mask-weighted stage-2 sup loss
        # (HEM/loss/losses.py:154-156) exists to EXCLUDE those labels;
        # with clean labels everywhere (label_outliers=False) a spatial
        # reweighting of a smooth residual field cannot change the
        # global-homography argmin and stage-2 is indistinguishable from
        # equal-compute stage-1.  Also emits `inlier_mask_full` (0 in a
        # dilated outlier rect) so eval points can be sampled on the
        # dominant plane, like CAHomo's annotated static-background pts.
        self.label_outliers = label_outliers

    def __len__(self):
        return self.n

    def _random_homography(self, rng, h, w):
        from dmhomo_tpu.geometry.homography import dlt_solve_4pt
        import jax.numpy as jnp

        corners = np.array([[0, 0], [w - 1, 0], [0, h - 1], [w - 1, h - 1]], np.float32)
        off = rng.uniform(-self.max_offset, self.max_offset, (4, 2)).astype(np.float32)
        H = dlt_solve_4pt(jnp.asarray(corners[None]), jnp.asarray(off[None]))[0]
        return np.asarray(H, np.float64)

    def __getitem__(self, idx):
        import cv2

        rng = np.random.default_rng(self.seed * 100003 + idx)
        oh, ow = self.ori_size
        # smooth random texture
        small = rng.uniform(0, 255, (oh // 8, ow // 8, 3)).astype(np.float32)
        img1 = cv2.resize(small, (ow, oh), interpolation=cv2.INTER_CUBIC)
        img1 = np.clip(img1, 0, 255)

        homo = self._random_homography(rng, oh, ow)
        homo_inv = np.linalg.inv(homo)
        # convention: a feature at x in img1 sits at H(x) in img2
        # (flow_f = H - id, and warp(img2, flow_f) == img1), so
        # img2(y) = img1(H^-1(y)) - remap img1 by the mapping of H^-1.
        from dmhomo_tpu.geometry.host import homography_to_mapping_np

        mapping = homography_to_mapping_np(homo_inv, oh, ow, eps=1e-8)
        img2 = cv2.remap(
            img1, mapping[..., 0], mapping[..., 1], cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_REPLICATE,
        )
        img2 = np.clip(img2 + rng.normal(0, self.noise * 255, img2.shape), 0, 255)
        flow_f = homography_to_flow_np(homo, oh, ow, eps=1e-8)
        flow_b = homography_to_flow_np(homo_inv, oh, ow, eps=1e-8)
        inlier = np.ones((oh, ow, 1), np.float32)
        if self.outlier_frac > 0:
            # moving object: displace a rectangle of img2's content by an
            # independent shift, breaking warp consistency there
            area = self.outlier_frac * oh * ow
            rh = int(np.sqrt(area * rng.uniform(0.5, 2.0)))
            rw = max(int(area / max(rh, 1)), 8)
            rh = min(max(rh, 8), oh // 2)
            rw = min(rw, ow // 2)
            ry = int(rng.integers(0, oh - rh))
            rx = int(rng.integers(0, ow - rw))
            dy = int(rng.integers(-rh // 2, rh // 2 + 1))
            dx = int(rng.integers(-rw // 2, rw // 2 + 1))
            sy = np.clip(ry + dy, 0, oh - rh)
            sx = np.clip(rx + dx, 0, ow - rw)
            img2[ry:ry + rh, rx:rx + rw] = img2[sy:sy + rh, sx:sx + rw]
            if self.label_outliers:
                # content at rect position q in img2 came from q+(s-r), so
                # a feature visible there moved by H-flow + (r-s); the
                # labels become the TRUE image motion (what a dense-flow
                # fit would supervise with), diverging from the dominant
                # plane inside the rect.  (Indexing the rect in img1
                # coords for flow_f is exact up to the few-px H
                # displacement - a boundary band, excluded from eval by
                # the dilation below.)
                ddx, ddy = float(rx - sx), float(ry - sy)
                flow_f[ry:ry + rh, rx:rx + rw] += (ddx, ddy)
                flow_b[ry:ry + rh, rx:rx + rw] -= (ddx, ddy)
                pad = 12  # dilated exclusion band for eval-point sampling
                y0, y1 = max(ry - pad, 0), min(ry + rh + pad, oh)
                x0, x1 = max(rx - pad, 0), min(rx + rw + pad, ow)
                inlier[y0:y1, x0:x1] = 0.0
        g1 = normalize_gray(img1)
        g2 = normalize_gray(img2)
        ph, pw = self.crop_size
        x = int(rng.integers(self.rho, ow - self.rho - pw + 1))
        y = int(rng.integers(self.rho, oh - self.rho - ph + 1))

        return {
            "inlier_mask_full": inlier,
            "imgs_gray_full": np.concatenate([g1, g2], axis=2),
            "imgs_gray_patch": np.concatenate(
                [g1[y : y + ph, x : x + pw], g2[y : y + ph, x : x + pw]], axis=2
            ),
            "flow_gt_full": np.concatenate([flow_b, flow_f], axis=2),
            "flow_gt_patch": np.concatenate(
                [flow_b[y : y + ph, x : x + pw], flow_f[y : y + ph, x : x + pw]], axis=2
            ),
            "start": np.asarray([x, y], np.float32),
            "imgs_rgb_full": np.concatenate([img1, img2], axis=2).astype(np.float32) / 255.0,
            "ganhomo_mask": np.ones((ph, pw, 1), np.float32),
        }
