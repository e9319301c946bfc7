"""CAHomo point-matching-error metric and scene-category reporting.

Parity targets:
* `compute_eval_results` / `ComputeErrFlow` (HEM/loss/losses.py:208-211,
  263-296): per sample, mean over 6 GT point pairs of
  min(||dst - (src + flow_f[int(src_y), int(src_x)])||,
      ||src - (dst + flow_b[int(dst_y), int(dst_x)])||)
  - note the *integer-truncated* pixel lookup into the full-res flow.
* category bucketing RE/LT/LL/SF/LF over test video ids + AVG = mean of the
  5 category means (hem_evaluate.py:68-83,126-155).  The reference's eval
  seeds each category list with a spurious 0 element (hem_evaluate.py:79-83),
  biasing means low; its twin HEM/evaluate.py:74-78 does not.  We default to
  the clean lists and expose `seed_zero=True` to reproduce the biased
  variant (SURVEY.md "quirks NOT to replicate").
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

CATEGORY_NAMES = ("RE", "LT", "LL", "SF", "LF")

# CAHomo *test* split video ids per scene category (hem_evaluate.py:68-78)
TEST_CATEGORIES: Dict[str, tuple] = {
    "RE": ("0000011", "0000016", "00000147", "00000155", "00000158", "00000107",
           "00000239", "0000030"),
    "LT": ("0000038", "0000044", "0000046", "0000047", "00000238", "00000177",
           "00000188", "00000181"),
    "LL": ("0000085", "00000100", "0000091", "0000092", "00000216", "00000226"),
    "SF": ("00000244", "00000251", "0000026", "0000030", "0000034", "00000115"),
    "LF": ("00000104", "0000031", "0000035", "00000129", "00000141", "00000200"),
}

# the `test()` twin uses slightly different lists: '0000030' only in SF
# (HEM/evaluate.py:341-346) - so it scores under SF instead of RE
TEST_CATEGORIES_TESTFN: Dict[str, tuple] = {
    **TEST_CATEGORIES,
    "RE": ("0000011", "0000016", "00000147", "00000155", "00000158", "00000107",
           "00000239"),
}


def point_matching_error(
    pt_set: jnp.ndarray, flow_f: jnp.ndarray, flow_b: jnp.ndarray
) -> jnp.ndarray:
    """Vectorized CAHomo point error.

    pt_set: (B, 6, 2, 2) - [pair, (src, dst), (x, y)] GT matched points.
    flow_f/flow_b: (B, H, W, 2) full-resolution flows.
    Returns (B,) mean-over-6-pairs min(fwd, bwd) errors.
    """
    src = pt_set[:, :, 0, :]  # (B, 6, 2)
    dst = pt_set[:, :, 1, :]

    def lookup(flow, pts):
        # integer truncation like flow[int(y), int(x)] (losses.py:209)
        x = pts[..., 0].astype(jnp.int32)
        y = pts[..., 1].astype(jnp.int32)
        H, W = flow.shape[1], flow.shape[2]
        x = jnp.clip(x, 0, W - 1)
        y = jnp.clip(y, 0, H - 1)

        def one(f, xi, yi):
            return f[yi, xi]  # (6, 2)

        return jax.vmap(one)(flow, x, y)

    err_f = jnp.linalg.norm(dst - (src + lookup(flow_f, src)), axis=-1)  # (B, 6)
    err_b = jnp.linalg.norm(src - (dst + lookup(flow_b, dst)), axis=-1)
    return jnp.minimum(err_f, err_b).mean(axis=1)


def bucket_by_category(
    errors: Sequence[float],
    video_names: Sequence[str],
    categories: Dict[str, tuple] = TEST_CATEGORIES,
    seed_zero: bool = False,
) -> Dict[str, list]:
    """Host-side bucketing of per-sample errors by video id."""
    buckets = {k: ([0.0] if seed_zero else []) for k in categories}
    for err, name in zip(errors, video_names):
        for cat, ids in categories.items():
            if name in ids:
                buckets[cat].append(float(err))
                break
    return buckets


def bucket_sums(buckets: Dict[str, list]) -> np.ndarray:
    """(5, 2) per-category [sum, count] - the per-host numeric summary used
    by the multi-host eval reduction (replaces accelerator.gather of raw
    error lists, hem_evaluate.py:132-151)."""
    return np.asarray(
        [
            [float(np.sum(buckets.get(c, []))), float(len(buckets.get(c, [])))]
            for c in CATEGORY_NAMES
        ],
        np.float32,
    )


def merge_bucket_sums(gathered) -> Dict[str, list]:
    """Inverse of `bucket_sums` across hosts: (n_hosts, 5, 2) [sum, count]
    rows -> buckets whose per-category means and counts equal the global
    (unsharded) evaluation.  Pure numpy so the allgather arithmetic is
    unit-testable without multiple processes."""
    totals = (
        np.asarray(gathered, np.float64).reshape(-1, len(CATEGORY_NAMES), 2).sum(axis=0)
    )
    return {
        c: ([totals[i, 0] / totals[i, 1]] * int(totals[i, 1]) if totals[i, 1] else [])
        for i, c in enumerate(CATEGORY_NAMES)
    }


def category_report(buckets: Dict[str, list]) -> Dict[str, float]:
    """Per-category means + AVG (mean of the 5 category means).

    Categories with no samples report NaN and are excluded from AVG
    (nanmean) so partial test sets still yield a usable AVG; on the full
    CAHomo test split this equals the reference's plain mean of 5.
    """
    report = {}
    for cat in CATEGORY_NAMES:
        vals = buckets.get(cat, [])
        report[cat] = float(np.mean(vals)) if vals else float("nan")
    cats = [report[c] for c in CATEGORY_NAMES]
    report["AVG"] = float(np.nanmean(cats)) if not all(np.isnan(cats)) else float("nan")
    return report


def point_error_under_h(src: jnp.ndarray, dst: jnp.ndarray, H: jnp.ndarray,
                        reproduce_axis_quirk: bool = False) -> jnp.ndarray:
    """Per-point matching error under a homography (ComputeErrH_kornia,
    HEM/loss/losses.py:187-194).

    src, dst: (B, N, 2) matched (x, y) points; H: (B, 3, 3).
    Returns (B, N) errors ||dst - H(src)||.

    The reference variant is dead code (its only call site is commented out,
    losses.py:246-254) and carries an apparent typo: its x-term compares the
    warped x against *src* x instead of dst x.  Default computes the
    intended distance-to-dst; `reproduce_axis_quirk=True` reproduces the
    reference expression bit-for-bit for archaeology.
    """
    from ..geometry.homography import apply_homography

    src_warp = apply_homography(H, src)
    ref_x = src if reproduce_axis_quirk else dst
    return jnp.sqrt((src_warp[:, :, 0] - ref_x[:, :, 0]) ** 2
                    + (src_warp[:, :, 1] - dst[:, :, 1]) ** 2)


def point_error_under_h_v2(src: jnp.ndarray, dst: jnp.ndarray,
                           H: jnp.ndarray) -> jnp.ndarray:
    """Scalar Frobenius error over ALL points (ComputeErrH_v2,
    HEM/loss/losses.py:196-205; dead code in the reference).

    src, dst: (N, 2) single-sample matched points; H: (3, 3).
    Returns a scalar ||dst - H(src)||_F (the reference unsqueezes to a
    batch of one and takes one global torch.linalg.norm).
    """
    from ..geometry.homography import apply_homography

    src_warp = apply_homography(H[None], src[None])[0]
    return jnp.sqrt(jnp.sum((dst - src_warp) ** 2))
