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

# CAHomo *train* split video ids per scene category
# (denoising_diffusion_pytorch.py:991-1042; data tables, re-keyed by name).
# Label order matches prefix2label (:1080-1091): RE=0 LT=1 LL=2 SF=3 LF=4.
TRAIN_CATEGORIES = {
    "RE": (
        "000004", "000008", "000009", "0000010", "0000012", "0000013", "0000014",
        "0000015", "0000017", "0000018", "0000052", "0000053", "0000054",
        "0000055", "0000065", "0000066", "0000068", "0000070", "00000105",
        "00000108", "00000111", "00000112", "00000113", "00000114", "00000116",
        "00000120", "00000122", "00000121", "00000125", "00000126", "00000127",
        "00000128", "00000130", "00000131", "00000132", "00000133", "00000134",
        "00000136", "00000138", "00000142", "00000143", "00000144", "00000145",
        "00000151", "00000153", "00000154", "00000156", "00000157", "00000159",
        "00000160", "00000162", "00000167", "00000168", "00000203", "00000204",
        "00000205", "00000206", "00000207", "00000208", "00000209", "00000212",
        "00000231", "00000233", "00000234",
    ),
    "LT": (
        "0000032", "0000033", "0000036", "0000037", "0000039", "0000040",
        "0000041", "0000042", "0000043", "0000045", "0000048", "0000049",
        "0000050", "0000051", "00000123", "00000150", "00000175", "00000176",
        "00000178", "00000179", "00000180", "00000182", "00000183", "00000184",
        "00000186", "00000187", "00000189", "00000237", "00000240", "00000245",
        "00000246",
    ),
    "LL": (
        "0000071", "0000072", "0000073", "0000074", "0000075", "0000076",
        "0000077", "0000078", "0000079", "0000080", "0000081", "0000082",
        "0000083", "0000084", "0000086", "0000087", "0000088", "0000089",
        "0000090", "0000093", "0000094", "0000095", "0000096", "0000097",
        "0000098", "0000099", "00000214", "00000215", "00000217", "00000218",
        "00000219", "00000220", "00000221", "00000222", "00000223", "00000224",
        "00000225", "00000227", "00000228",
    ),
    "SF": (
        "000001", "000002", "000003", "000007", "0000057", "0000058", "0000059",
        "0000060", "0000061", "0000062", "0000063", "0000067", "0000069",
        "00000101", "00000102", "00000103", "00000106", "00000170", "00000171",
        "00000172", "00000173", "00000174", "00000185", "00000190", "00000191",
        "00000192", "00000193", "00000202", "00000210", "00000211", "00000213",
        "00000229", "00000230", "00000235", "00000236", "00000241", "00000242",
        "00000243", "00000247", "00000248", "00000249", "00000250",
    ),
    "LF": (
        "000005", "000006", "0000019", "0000020", "0000021", "0000022", "0000023",
        "0000024", "0000025", "0000027", "0000028", "0000029", "0000056",
        "0000064", "00000109", "00000110", "00000117", "00000118", "00000119",
        "00000124", "00000135", "00000137", "00000139", "00000140", "00000146",
        "00000148", "00000149", "00000152", "00000161", "00000163", "00000164",
        "00000165", "00000166", "00000169", "00000194", "00000195", "00000196",
        "00000197", "00000198", "00000199", "00000201", "00000232",
    ),
}

_PREFIX_TO_LABEL = {
    vid: label
    for label, ids in enumerate(TRAIN_CATEGORIES.values())
    for vid in ids
}


def prefix2label(prefix: str) -> int:
    """CAHomo train video id -> scene class 0..4 (RE LT LL SF LF).

    Parity: UnHomoTrainData.prefix2label (:1080-1091), which hits an
    UnboundLocalError on unknown ids; here that is a ValueError."""
    try:
        return _PREFIX_TO_LABEL[prefix]
    except KeyError:
        raise ValueError(f"unknown CAHomo train video id: {prefix!r}") from None


def pair_name_to_class(im1_im2_name: str) -> int:
    """Scene class from a BasesHomo pseudo-label pair key like
    '0000012_000001_0000012_000005' (dir prefix = split('_')[0], :1105)."""
    return prefix2label(im1_im2_name.split("_")[0])


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
        samples,  # iterable of (img1, img2, mask, homo_f, class_id_or_pair_name)
        image_size: int = 256,
        src_hw=(360, 640),
    ) -> "ConditionCache":
        """Build the cache.  The last tuple element may be an int class id or
        a CAHomo pair-name string, in which case the scene class is derived
        via `pair_name_to_class` (the reference defines prefix2label but then
        hardcodes scene_class=0 in __getitem__, :1135 - we wire it through)."""
        os.makedirs(out_dir, exist_ok=True)
        conds, classes = [], []
        for img1, img2, mask, homo_f, cls in samples:
            conds.append(build_condition(img1, img2, mask, homo_f, image_size, src_hw))
            classes.append(pair_name_to_class(cls) if isinstance(cls, str) else int(cls))
        np.save(os.path.join(out_dir, "conditions.npy"), np.stack(conds))
        np.save(os.path.join(out_dir, "classes.npy"), np.asarray(classes, np.int32))
        return ConditionCache(out_dir)


def iter_cahomo_train_samples(trainset_path: str, pseudo_labels_npy: str,
                              masks_dir: str = "HomoGAN_Bug_Masks"):
    """Yield (img1, img2, mask, homo_f, pair_name) over the real CAHomo
    train layout: a BasesHomo pseudo-label dict {pair_name: [homo_b, homo_f]}
    plus per-pair dominant-plane masks (UnHomoTrainData.__init__/__getitem__,
    denoising_diffusion_pytorch.py:1048-1135).  Feed to ConditionCache.build
    to rebuild DGM_Conditions end to end with correct 5-way class ids."""
    import cv2

    labels = np.load(pseudo_labels_npy, allow_pickle=True).item()
    for name in sorted(labels.keys()):
        parts = name.split("_")
        dir_name = parts[0]
        im1 = "_".join(parts[:2]) + ".png"
        im2 = "_".join(parts[2:]) + ".png"
        homo_f = np.asarray(labels[name][1], np.float64)
        mask = np.load(os.path.join(trainset_path, masks_dir, name + ".npy"))
        img1 = cv2.imread(os.path.join(trainset_path, dir_name, im1))
        img2 = cv2.imread(os.path.join(trainset_path, dir_name, im2))
        yield img1, img2, mask, homo_f, name
