"""Parity + speed tests for the native host-data kernels."""

import numpy as np
import pytest

from dmhomo_tpu import native


needs_native = pytest.mark.skipif(not native.available(), reason="no compiler / lib")


def _numpy_flow(H, h, w, eps=1e-6):
    X, Y = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    xyh = np.stack([X.ravel(), Y.ravel(), np.ones(h * w)], axis=0)
    o = np.asarray(H, np.float64) @ xyh
    z = o[2] + eps
    return np.stack(
        [(o[0] / z).reshape(h, w) - X, (o[1] / z).reshape(h, w) - Y], axis=-1
    ).astype(np.float32)


@needs_native
def test_native_flow_bitwise_parity(rng):
    d = rng.normal(0, 0.02, (3, 3))
    d[2, :2] *= 1e-4
    d[2, 2] = 0
    H = np.eye(3) + d
    ours = native.homography_to_flow_native(H, 90, 160)
    golden = _numpy_flow(H, 90, 160)
    np.testing.assert_array_equal(ours, golden)  # identical fp64 expression


@needs_native
def test_native_mapping_parity(rng):
    from dmhomo_tpu.geometry.host import homography_to_mapping_np

    d = rng.normal(0, 0.02, (3, 3)); d[2, :2] *= 1e-4; d[2, 2] = 0
    H = np.eye(3) + d
    ours = native.homography_to_mapping_native(H, 45, 80, eps=1e-8)
    golden = homography_to_mapping_np(H, 45, 80, eps=1e-8)
    np.testing.assert_allclose(ours, golden, atol=1e-5)


@needs_native
def test_native_gray_parity(rng):
    from dmhomo_tpu.data.hem_data import MEAN_I, STD_I

    img = rng.integers(0, 255, (36, 64, 3)).astype(np.uint8)
    ours = native.normalize_gray_native(img, MEAN_I.ravel(), STD_I.ravel())
    golden = (np.mean((img.astype(np.float64) - MEAN_I) / STD_I, axis=2, keepdims=True)).astype(np.float32)
    np.testing.assert_allclose(ours, golden, atol=2e-7)

    imgf = rng.uniform(0, 255, (36, 64, 3)).astype(np.float32)
    ours = native.normalize_gray_native(imgf, MEAN_I.ravel(), STD_I.ravel())
    golden = (np.mean((imgf.astype(np.float64) - MEAN_I) / STD_I, axis=2, keepdims=True)).astype(np.float32)
    np.testing.assert_allclose(ours, golden, atol=2e-7)


@needs_native
def test_native_speedup():
    import time

    H = np.eye(3); H[0, 2] = 3.0
    # warm
    native.homography_to_flow_native(H, 360, 640)
    t0 = time.time()
    for _ in range(10):
        native.homography_to_flow_native(H, 360, 640)
    t_native = (time.time() - t0) / 10
    t0 = time.time()
    for _ in range(5):
        _numpy_flow(H, 360, 640)
    t_numpy = (time.time() - t0) / 5
    assert t_native < t_numpy, (t_native, t_numpy)


def test_dataset_uses_native_transparently(tmp_path, rng):
    """HEMTrainDataset output is identical regardless of backend (parity by
    construction: both call the same fp64 expressions)."""
    from dmhomo_tpu.data import HEMTrainDataset, save_generation_shard, explode_shards_to_samples

    imgs = rng.integers(0, 255, (2, 6, 32, 32)).astype(np.uint8)
    d = rng.normal(0, 0.002, (3, 3)); d[2, :2] *= 1e-3; d[2, 2] = 0
    homos = np.stack([np.eye(3) + d] * 2)
    p = str(tmp_path / "s.npy")
    save_generation_shard(p, [{"imgs": imgs, "homos": homos}])
    explode_shards_to_samples([p], str(tmp_path / "samples"))
    ds = HEMTrainDataset(str(tmp_path / "samples"), crop_size=(32, 64), ori_size=(48, 80),
                         rho=4, rng=np.random.default_rng(0))
    item = ds[0]
    assert np.isfinite(item["imgs_gray_full"]).all()
    assert item["flow_gt_patch"].shape == (32, 64, 4)
