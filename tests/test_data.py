"""Tests for the host data pipeline: conditions, shards, datasets, loader."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dmhomo_tpu.data import (
    CAHomoTestDataset,
    DataLoader,
    HEMTrainDataset,
    SyntheticHomoPairs,
    build_condition,
    explode_shards_to_samples,
    load_generation_shard,
    load_sample,
    save_generation_shard,
)
from dmhomo_tpu.data.conditions import ConditionCache, flow_to_rgb_np
from dmhomo_tpu.data.loader import cycle
from dmhomo_tpu.geometry import warp_by_flow


def _mild_h(rng, scale=0.002):
    d = rng.normal(0, scale, (3, 3))
    d[2, :2] *= 1e-3
    d[2, 2] = 0
    H = np.eye(3) + d
    return H / H[2, 2]


def test_build_condition_layout(rng):
    img1 = rng.uniform(0, 1, (360, 640, 3)).astype(np.float32)
    img2 = rng.uniform(0, 1, (360, 640, 3)).astype(np.float32)
    mask = (rng.uniform(0, 1, (360, 640)) > 0.5).astype(np.float32)
    H = _mild_h(rng, 0.01)
    cond = build_condition(img1, img2, mask, H, image_size=64)
    assert cond.shape == (64, 64, 12)
    assert cond.dtype == np.float32
    # channel slices: imgs in [0,1], mask binary-ish, rgb in [0,1]
    assert 0 <= cond[..., :6].min() and cond[..., :6].max() <= 1
    assert set(np.unique(cond[..., 6]).round(3)).issubset({0.0, 1.0})
    assert 0 <= cond[..., 7:10].min() and cond[..., 7:10].max() <= 1


def test_condition_flow_consistency(rng):
    """The flow channels must photometrically align img2 to img1."""
    # img1 = warp of img2 by H's flow (constructed that way)
    base = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    H = _mild_h(rng, 0.005)
    from dmhomo_tpu.geometry.host import homography_to_flow_np

    flow = homography_to_flow_np(H, 64, 64)
    img2 = base
    img1 = np.asarray(
        warp_by_flow(jnp.asarray(img2[None]), jnp.asarray(flow[None]), mode="border")
    )[0]
    cond = build_condition(img1, img2, np.ones((64, 64)), H, image_size=64, src_hw=(64, 64))
    # re-warp with the cond's own flow channels
    rewarp = np.asarray(
        warp_by_flow(jnp.asarray(cond[None, ..., 3:6]), jnp.asarray(cond[None, ..., 10:12]), mode="border")
    )[0]
    err = np.abs(rewarp - cond[..., :3]).mean()
    assert err < 0.02, f"photometric misalignment {err}"


def test_flow_to_rgb_np_matches_jnp(rng):
    from dmhomo_tpu.geometry import flow_to_rgb

    flow = rng.normal(0, 10, (32, 32, 2)).astype(np.float32)
    np.testing.assert_allclose(
        flow_to_rgb_np(flow), np.asarray(flow_to_rgb(jnp.asarray(flow))), atol=1e-4
    )


def test_shard_roundtrip(tmp_path, rng):
    imgs = (rng.uniform(0, 255, (4, 6, 32, 32))).astype(np.uint8)
    homos = np.stack([_mild_h(rng) for _ in range(4)])
    p = str(tmp_path / "shard.npy")
    save_generation_shard(p, [{"imgs": imgs, "homos": homos}])
    back = load_generation_shard(p)
    assert len(back) == 1
    np.testing.assert_array_equal(back[0]["imgs"], imgs)

    n = explode_shards_to_samples([p], str(tmp_path / "samples"))
    assert n == 4
    s = load_sample(str(tmp_path / "samples" / "0.npy"))
    np.testing.assert_array_equal(s["img12"], imgs[0])
    np.testing.assert_allclose(s["homo12"], homos[0])


def test_synthetic_pairs_schema_and_flow_consistency():
    ds = SyntheticHomoPairs(n=2, crop_size=(64, 128), ori_size=(72, 144), rho=4, max_offset=3)
    item = ds[0]
    assert item["imgs_gray_full"].shape == (72, 144, 2)
    assert item["imgs_gray_patch"].shape == (64, 128, 2)
    assert item["flow_gt_patch"].shape == (64, 128, 4)
    assert item["ganhomo_mask"].shape == (64, 128, 1)

    # warp img2 by flow_f reproduces img1 (away from borders)
    g1 = item["imgs_gray_full"][..., :1][None]
    g2 = item["imgs_gray_full"][..., 1:][None]
    flow_f = item["flow_gt_full"][..., 2:][None]
    rewarp = np.asarray(warp_by_flow(jnp.asarray(g2), jnp.asarray(flow_f), mode="border"))
    inner = np.s_[:, 8:-8, 8:-8]
    err = np.abs(rewarp[inner] - g1[inner]).mean()
    assert err < 0.08, f"synthetic pair flow inconsistent: {err}"


def test_hem_train_dataset_from_shards(tmp_path, rng):
    # build a fake generated trainset at 32x32 -> dataset rescales to ori
    imgs = (rng.uniform(0, 255, (3, 6, 32, 32))).astype(np.uint8)
    homos = np.stack([_mild_h(rng) for _ in range(3)])
    p = str(tmp_path / "s.npy")
    save_generation_shard(p, [{"imgs": imgs, "homos": homos}])
    explode_shards_to_samples([p], str(tmp_path / "samples"))

    ds = HEMTrainDataset(
        str(tmp_path / "samples"), crop_size=(32, 64), ori_size=(48, 80), rho=4,
        rng=np.random.default_rng(0),
    )
    assert len(ds) == 3
    item = ds[0]
    assert item["imgs_gray_full"].shape == (48, 80, 2)
    assert item["imgs_gray_patch"].shape == (32, 64, 2)
    assert item["flow_gt_patch"].shape == (32, 64, 4)
    assert np.isfinite(item["imgs_gray_full"]).all()
    # patch flows must equal full flows cropped at start
    x, y = item["start"].astype(int)
    np.testing.assert_allclose(
        item["flow_gt_patch"], item["flow_gt_full"][y : y + 32, x : x + 64], atol=1e-6
    )


def test_cahomo_test_dataset(tmp_path, rng):
    import cv2

    # synthesize the CAHomo disk layout
    (tmp_path / "img" / "vidA").mkdir(parents=True)
    (tmp_path / "pt").mkdir()
    for name in ["a.jpg", "b.jpg"]:
        cv2.imwrite(str(tmp_path / "img" / "vidA" / name),
                    rng.integers(0, 255, (360, 640, 3)).astype(np.uint8))
    pts = rng.uniform(10, 300, (6, 2, 2)).astype(np.float32)
    np.save(str(tmp_path / "pt" / "a.jpg_b.jpg.npy"), {"matche_pts": pts}, allow_pickle=True)
    with open(tmp_path / "test.txt", "w") as f:
        f.write("vidA/a.jpg vidA/b.jpg\n")

    ds = CAHomoTestDataset(str(tmp_path))
    assert len(ds) == 1
    item = ds[0]
    assert item["imgs_gray_full"].shape == (360, 640, 2)
    assert item["imgs_gray_patch"].shape == (320, 576, 2)
    assert item["pt_set"].shape == (6, 2, 2)
    assert item["video_names"] == "vidA"


def test_loader_sharding_and_collate():
    ds = SyntheticHomoPairs(n=16, crop_size=(32, 64), ori_size=(48, 80), rho=4)
    l0 = DataLoader(ds, batch_size=2, shuffle=True, seed=7, shard_index=0, num_shards=2)
    l1 = DataLoader(ds, batch_size=2, shuffle=True, seed=7, shard_index=1, num_shards=2)
    b0 = list(l0)
    b1 = list(l1)
    assert len(b0) == len(b1) == 4
    assert b0[0]["imgs_gray_patch"].shape == (2, 32, 64, 2)
    # shards see disjoint data: compare hashes of batches
    h0 = {b["imgs_gray_patch"].tobytes() for b in b0}
    h1 = {b["imgs_gray_patch"].tobytes() for b in b1}
    assert not (h0 & h1)


def test_loader_prefetch_and_cycle():
    ds = SyntheticHomoPairs(n=8, crop_size=(32, 64), ori_size=(48, 80), rho=4)
    dl = DataLoader(ds, batch_size=4, prefetch=2, num_workers=2)
    it = cycle(dl)
    seen = [next(it) for _ in range(5)]  # crosses epoch boundary
    assert all(s["imgs_gray_patch"].shape == (4, 32, 64, 2) for s in seen)


def test_condition_cache_roundtrip(tmp_path, rng):
    def gen():
        for i in range(3):
            yield (
                rng.uniform(0, 1, (64, 64, 3)).astype(np.float32),
                rng.uniform(0, 1, (64, 64, 3)).astype(np.float32),
                np.ones((64, 64), np.float32),
                _mild_h(rng),
                i % 5,
            )

    cache = ConditionCache.build(str(tmp_path / "cache"), gen(), image_size=32, src_hw=(64, 64))
    assert len(cache) == 3
    cond, cls = cache[1]
    assert cond.shape == (32, 32, 12) and cls == 1
    batch, classes = cache.batch([0, 2])
    assert batch.shape == (2, 32, 32, 12)


def test_prefix2label_tables():
    """Scene-class mapping over representative train video ids
    (denoising_diffusion_pytorch.py:991-1042,1080-1091)."""
    from dmhomo_tpu.data import TRAIN_CATEGORIES, pair_name_to_class, prefix2label

    assert prefix2label("000004") == 0      # RE
    assert prefix2label("0000032") == 1     # LT
    assert prefix2label("0000071") == 2     # LL
    assert prefix2label("000001") == 3      # SF
    assert prefix2label("000005") == 4      # LF
    # every id maps to its own category's label; no id in two categories
    for label, (cat, ids) in enumerate(TRAIN_CATEGORIES.items()):
        for vid in ids:
            assert prefix2label(vid) == label, (cat, vid)
    assert sum(len(v) for v in TRAIN_CATEGORIES.values()) == 218
    # pair-name parsing: dir prefix before the first underscore (:1105)
    assert pair_name_to_class("00000105_000012_00000105_000016") == 0
    import pytest

    with pytest.raises(ValueError):
        prefix2label("9999999")


def test_condition_cache_derives_classes_from_pair_names(tmp_path, rng):
    def gen():
        for name in ("000004_000001_000004_000005", "0000071_000001_0000071_000003"):
            yield (
                rng.uniform(0, 1, (64, 64, 3)).astype(np.float32),
                rng.uniform(0, 1, (64, 64, 3)).astype(np.float32),
                np.ones((64, 64), np.float32),
                _mild_h(rng),
                name,
            )

    cache = ConditionCache.build(str(tmp_path / "c2"), gen(), image_size=32, src_hw=(64, 64))
    assert list(cache.classes) == [0, 2]


def test_device_pipeline_matches_host_pipeline(tmp_path, rng):
    """`device_build_patches` (in-graph resize/gray/flow/crop) must agree
    with HEMTrainDataset's host cv2/numpy path on the same crop starts.
    cv2 resizes uint8 in fixed point, so grays match to ~1/255-scale noise;
    flows are analytic and match tightly."""
    from dmhomo_tpu.data import device_build_patches

    imgs = (rng.uniform(0, 255, (4, 6, 32, 32))).astype(np.uint8)
    homos = np.stack([_mild_h(rng) for _ in range(4)])
    p = str(tmp_path / "s.npy")
    save_generation_shard(p, [{"imgs": imgs, "homos": homos}])
    explode_shards_to_samples([p], str(tmp_path / "samples"))

    kw = dict(crop_size=(32, 64), ori_size=(48, 80), rho=4)
    host = HEMTrainDataset(str(tmp_path / "samples"), rng=np.random.default_rng(7), **kw)
    raw = HEMTrainDataset(str(tmp_path / "samples"), rng=np.random.default_rng(7),
                          device_pipeline=True, **kw)

    h_items = [host[i] for i in range(4)]
    r_items = [raw[i] for i in range(4)]
    for h, r in zip(h_items, r_items):
        np.testing.assert_array_equal(h["start"].astype(np.int32), r["start"])

    batch = device_build_patches(
        jnp.asarray(np.stack([r["img12"] for r in r_items])),
        jnp.asarray(np.stack([r["homo"] for r in r_items])),
        jnp.asarray(np.stack([r["homo_inv"] for r in r_items])),
        jnp.asarray(np.stack([r["start"] for r in r_items])),
        kw["crop_size"], kw["ori_size"],
    )
    gray_dev = np.asarray(batch["imgs_gray_patch"])
    flow_dev = np.asarray(batch["flow_gt_patch"])
    gray_host = np.stack([h["imgs_gray_patch"] for h in h_items])
    flow_host = np.stack([h["flow_gt_patch"] for h in h_items])
    assert np.abs(gray_dev - gray_host).max() < 0.03
    np.testing.assert_allclose(flow_dev, flow_host, atol=2e-3)


def test_hem_trainer_accepts_device_pipeline_batches(tmp_path, rng):
    """The raw-schema train step (in-graph preprocessing) runs and its loss
    is close to the host-schema step on the equivalent batch."""
    import dataclasses as dc

    from dmhomo_tpu.models import EstimatorConfig, SwinConfig
    from dmhomo_tpu.train.config import HEMTrainConfig
    from dmhomo_tpu.train.hem_trainer import HEMTrainer

    imgs = (rng.uniform(0, 255, (8, 6, 32, 32))).astype(np.uint8)
    homos = np.stack([_mild_h(rng) for _ in range(8)])
    p = str(tmp_path / "s.npy")
    save_generation_shard(p, [{"imgs": imgs, "homos": homos}])
    explode_shards_to_samples([p], str(tmp_path / "samples"))

    swin = SwinConfig(crop_size=(32, 64), embed_dim=8, depths=(1, 1, 1),
                      layer_depth=(3, 2, 1), num_heads=(2, 2, 4), window_size=4,
                      mlp_ratio=2.0)
    cfg = HEMTrainConfig(
        estimator=EstimatorConfig(crop_size=(32, 64), ori_size=(40, 72), swin=swin),
        train_batch_size=8, bf16=False, remat=False,
    )
    kw = dict(crop_size=(32, 64), ori_size=(40, 72), rho=4)
    host = HEMTrainDataset(str(tmp_path / "samples"), rng=np.random.default_rng(3), **kw)
    raw = HEMTrainDataset(str(tmp_path / "samples"), rng=np.random.default_rng(3),
                          device_pipeline=True, **kw)
    from dmhomo_tpu.data.loader import _collate

    host_b = _collate([host[i] for i in range(8)])
    raw_b = _collate([raw[i] for i in range(8)])

    tr1 = HEMTrainer(cfg)
    tr1.init_state(seed=0)
    l_host = {k: float(v) for k, v in tr1.train_step(host_b).items()}
    tr2 = HEMTrainer(cfg)
    tr2.init_state(seed=0)
    l_raw = {k: float(v) for k, v in tr2.train_step(raw_b).items()}
    assert np.isfinite(l_raw["total"])
    np.testing.assert_allclose(l_raw["total"], l_host["total"], rtol=0.05)


def test_cifar_dataset(tmp_path, rng):
    """CIFAR pickle-batch reader (denoising_diffusion_pytorch.py:820-871)."""
    import pickle

    from dmhomo_tpu.data import CifarDataset

    for i in range(1, 6):
        data = rng.integers(0, 255, (4, 3 * 32 * 32)).astype(np.uint8)
        with open(tmp_path / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": [0] * 4}, f)
    ds = CifarDataset(str(tmp_path), image_size=16, rng=np.random.default_rng(0))
    assert len(ds) == 20
    img = ds[3]
    assert img.shape == (16, 16, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_ghof_test_dataset(tmp_path, rng):
    """GHOF npy reader (denoising_diffusion_pytorch.py:874-911)."""
    from dmhomo_tpu.data import GHOFTestDataset

    samples = np.asarray(
        [{"img1": rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)} for _ in range(3)],
        dtype=object,
    )
    p = str(tmp_path / "ghof.npy")
    np.save(p, samples, allow_pickle=True)
    ds = GHOFTestDataset(p, image_size=32, rng=np.random.default_rng(0))
    assert len(ds) == 3
    img = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
