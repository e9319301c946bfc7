"""Golden tests for HEM losses and the CAHomo eval metric (vs torch formulas)."""

import math

import jax.numpy as jnp
import numpy as np
import torch

from dmhomo_tpu.evaluation import (
    TEST_CATEGORIES,
    bucket_by_category,
    bucket_sums,
    category_report,
    merge_bucket_sums,
    point_matching_error,
)
from dmhomo_tpu.losses import LossWeights, compute_losses, mask_bce_loss, nll_laplace


def test_nll_laplace_matches_torch_formula(rng):
    gt = rng.normal(0, 2, (2, 8, 12, 2)).astype(np.float32)
    est = rng.normal(0, 2, (2, 8, 12, 2)).astype(np.float32)
    mask = rng.uniform(0, 1, (2, 8, 12, 1)).astype(np.float32)
    log_var = 1.0 - mask

    ours = float(nll_laplace(jnp.asarray(gt), jnp.asarray(est), jnp.asarray(log_var)))

    t_gt = torch.from_numpy(gt).permute(0, 3, 1, 2)
    t_est = torch.from_numpy(est).permute(0, 3, 1, 2)
    t_lv = torch.from_numpy(log_var).permute(0, 3, 1, 2)
    loss = math.sqrt(2) * torch.exp(-0.5 * t_lv) * torch.abs(t_gt - t_est) + 0.5 * t_lv
    valid = ~torch.isnan(loss) & ~torch.isinf(loss)
    golden = float(torch.masked_select(loss, valid).mean())
    np.testing.assert_allclose(ours, golden, rtol=1e-5)


def test_nll_laplace_ignores_nonfinite(rng):
    gt = np.zeros((1, 4, 4, 2), np.float32)
    est = np.zeros((1, 4, 4, 2), np.float32)
    est[0, 0, 0, 0] = np.inf  # poisons one element
    lv = np.zeros((1, 4, 4, 1), np.float32)
    out = float(nll_laplace(jnp.asarray(gt), jnp.asarray(est), jnp.asarray(lv)))
    assert np.isfinite(out)


def test_mask_bce_default_target_zero(rng):
    """weight=(1,1) -> target 0 -> BCE = -mean log(1-m)."""
    m = rng.uniform(0.05, 0.95, (2, 6, 6, 1)).astype(np.float32)
    ours = float(mask_bce_loss(jnp.asarray(m)))
    golden = float(-np.log(1 - m).mean())
    np.testing.assert_allclose(ours, golden, rtol=1e-4)


def test_compute_losses_stage_configs(rng):
    B, H, W = 2, 8, 12
    batch = {"flow_gt_patch": jnp.asarray(rng.normal(0, 1, (B, H, W, 4)).astype(np.float32))}
    f = lambda *s: jnp.asarray(rng.normal(0, 1, s).astype(np.float32))
    m = lambda *s: jnp.asarray(rng.uniform(0.1, 0.9, s).astype(np.float32))
    outputs = {
        "flow_f": f(B, H, W, 2),
        "flow_b": f(B, H, W, 2),
        "mask_f": m(B, H, W, 1),
        "mask_b": m(B, H, W, 1),
        "mask_fusion": m(B, H, W, 1),
        "fil_features": {
            "img1_patch_fea": f(B, H, W, 1),
            "img2_patch_fea": f(B, H, W, 1),
            "img1_patch_fea_warp": f(B, H, W, 1),
            "img2_patch_fea_warp": f(B, H, W, 1),
        },
    }
    # stage 1: nll only
    l1 = compute_losses(batch, outputs, LossWeights(sup=0, unsup=0, mask_reg=0, nll=1))
    assert float(l1["supervise"]) == 0.0 and float(l1["unsup"]) == 0.0
    assert float(l1["total"]) == float(l1["nll"])
    # stage 2: + supervised
    l2 = compute_losses(batch, outputs, LossWeights(sup=1, nll=1))
    assert float(l2["total"]) == float(l2["nll"]) + float(l2["supervise"])
    assert float(l2["supervise"]) > 0


def test_point_matching_error_golden(rng):
    """Vectorized metric == the reference's python loop (int truncation incl.)."""
    B, H, W = 3, 36, 64
    flow_f = rng.normal(0, 3, (B, H, W, 2)).astype(np.float32)
    flow_b = rng.normal(0, 3, (B, H, W, 2)).astype(np.float32)
    pt = rng.uniform(1, 30, (B, 6, 2, 2)).astype(np.float32)

    ours = np.asarray(
        point_matching_error(jnp.asarray(pt), jnp.asarray(flow_f), jnp.asarray(flow_b))
    )

    golden = []
    for i in range(B):
        err = 0.0
        for j in range(6):
            src, dst = pt[i, j, 0], pt[i, j, 1]
            src_t = src + flow_f[i, int(src[1]), int(src[0])]
            e_f = np.linalg.norm(dst - src_t)
            dst_t = dst + flow_b[i, int(dst[1]), int(dst[0])]
            e_b = np.linalg.norm(src - dst_t)
            err += min(e_f, e_b)
        golden.append(err / 6)
    np.testing.assert_allclose(ours, np.asarray(golden), atol=1e-5)


def test_zero_flow_identity_points():
    """With zero flow and src == dst the error is 0 (ref sanity check)."""
    pt = np.tile(np.array([[10.0, 20.0]], np.float32), (1, 6, 2, 1)).reshape(1, 6, 2, 2)
    z = jnp.zeros((1, 36, 64, 2))
    err = np.asarray(point_matching_error(jnp.asarray(pt), z, z))
    np.testing.assert_allclose(err, 0.0, atol=1e-6)


def test_bucket_and_report():
    errs = [1.0, 2.0, 3.0, 4.0]
    names = ["0000011", "0000038", "0000085", "zzz_unknown"]
    buckets = bucket_by_category(errs, names)
    assert buckets["RE"] == [1.0] and buckets["LT"] == [2.0] and buckets["LL"] == [3.0]
    # unknown video dropped, SF/LF empty
    rep = category_report({**buckets, "SF": [4.0], "LF": [5.0]})
    np.testing.assert_allclose(rep["AVG"], np.mean([1, 2, 3, 4, 5]))


def test_bucket_seed_zero_reproduces_reference_bias():
    buckets = bucket_by_category([2.0], ["0000011"], seed_zero=True)
    assert buckets["RE"] == [0.0, 2.0]  # the hem_evaluate.py:79-83 quirk


def test_category_ids_unique_membership():
    """'0000030' appears in both RE and SF in the reference (elif order wins)."""
    b = bucket_by_category([7.0], ["0000030"])
    assert b["RE"] == [7.0] and b["SF"] == []


def test_multihost_bucket_reduction_matches_unsharded(rng):
    """The per-host (sum, count) allgather arithmetic (hem_trainer.evaluate)
    must reproduce the whole-split category report for ANY data sharding -
    the accelerator.gather replacement (hem_evaluate.py:132-151)."""
    ids = [v for ids in TEST_CATEGORIES.values() for v in ids]
    names = [ids[i % len(ids)] for i in range(101)]  # ragged, all categories
    errs = list(rng.uniform(0, 10, len(names)))
    whole = category_report(bucket_by_category(errs, names))
    for n_hosts in (1, 2, 3, 8):
        shards = [
            bucket_sums(bucket_by_category(errs[h::n_hosts], names[h::n_hosts]))
            for h in range(n_hosts)
        ]
        merged = category_report(merge_bucket_sums(np.stack(shards)))
        for k, v in whole.items():
            np.testing.assert_allclose(merged[k], v, rtol=1e-6)


def test_bucket_sums_empty_category():
    sums = bucket_sums({"RE": [1.0, 3.0]})
    assert sums.shape == (5, 2)
    np.testing.assert_allclose(sums[0], [4.0, 2.0])
    merged = merge_bucket_sums(sums[None])
    assert merged["RE"] == [2.0] * 2 and merged["LT"] == []


def test_testfn_category_lists_move_0000030_to_sf():
    """The test() twin's lists (HEM/evaluate.py:341-346): '0000030' scores
    under SF instead of RE (no duplicate membership)."""
    from dmhomo_tpu.evaluation.metrics import TEST_CATEGORIES_TESTFN

    b = bucket_by_category([7.0], ["0000030"], categories=TEST_CATEGORIES_TESTFN)
    assert b["SF"] == [7.0] and b["RE"] == []


def test_point_error_under_h_matches_torch_expression(rng):
    """ComputeErrH_kornia parity (losses.py:187-194, dead code there):
    both the intended distance-to-dst and the reference's literal
    x-axis quirk."""
    from dmhomo_tpu.evaluation import point_error_under_h

    B, N = 3, 6
    src = rng.uniform(0, 100, (B, N, 2)).astype(np.float32)
    dst = rng.uniform(0, 100, (B, N, 2)).astype(np.float32)
    H = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    H[:, 0, 2] = rng.normal(0, 5, B)
    H[:, 1, 2] = rng.normal(0, 5, B)
    H[:, 2, :2] = rng.normal(0, 1e-4, (B, 2))

    # torch reimplementation of the reference expression
    ts, td, tH = map(torch.from_numpy, (src, dst, H))
    ones = torch.ones_like(ts[..., :1])
    warp = torch.einsum("bij,bnj->bni", tH, torch.cat([ts, ones], -1))
    warp = warp[..., :2] / warp[..., 2:]
    want_quirk = torch.sqrt((warp[:, :, 0] - ts[:, :, 0]) ** 2
                            + (warp[:, :, 1] - td[:, :, 1]) ** 2).numpy()
    want_fixed = torch.sqrt((warp[:, :, 0] - td[:, :, 0]) ** 2
                            + (warp[:, :, 1] - td[:, :, 1]) ** 2).numpy()

    got_quirk = np.asarray(point_error_under_h(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(H),
        reproduce_axis_quirk=True))
    got_fixed = np.asarray(point_error_under_h(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(H)))
    np.testing.assert_allclose(got_quirk, want_quirk, atol=1e-4)
    np.testing.assert_allclose(got_fixed, want_fixed, atol=1e-4)


def test_point_error_under_h_v2_global_norm(rng):
    """ComputeErrH_v2 (losses.py:196-205): one Frobenius norm over all
    points; identity H on identical points gives 0."""
    from dmhomo_tpu.evaluation import point_error_under_h_v2

    N = 6
    src = rng.uniform(0, 100, (N, 2)).astype(np.float32)
    dst = src + rng.normal(0, 2, (N, 2)).astype(np.float32)
    H = np.eye(3, dtype=np.float32)
    got = float(point_error_under_h_v2(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(H)))
    want = float(np.sqrt(np.sum((dst - src) ** 2)))
    assert abs(got - want) < 1e-4
    assert float(point_error_under_h_v2(jnp.asarray(src), jnp.asarray(src), jnp.asarray(H))) < 1e-6
