"""The 8 orthonormalized homography flow-basis fields.

Parity target: `gen_basis` (HEM/model/net.py:118-154, duplicated at
HEM/model/utils.py:605-641).  The 8 raw fields on the (x, y) pixel grid are
  (x,0) (y,0) (1,0) (0,x) (0,y) (0,1) (x^2,xy) (xy,y^2)
stacked as (8, h*w*2) rows, QR-orthonormalized column-wise (LAPACK Householder
- numpy and torch agree bit-for-bit), then each basis is divided by its own
max |value|.

Computed once on host in float64-backed numpy (the reference computes in
fp32; we match fp32 end-to-end), returned as a constant - never traced.
Output layout: (8, h, w, 2) NHWC-style (reference returns (8, 2, h, w)).
"""

from __future__ import annotations

import functools

import numpy as np

# checkpoint-exact basis overrides, keyed by (h, w) — see set_basis_override
_BASIS_OVERRIDES: dict = {}


def set_basis_override(h: int, w: int, basis: "np.ndarray | None") -> None:
    """Install the exact (8, h, w, 2) basis to use at (h, w).

    Reference checkpoints carry the basis as a buffer (`h_net.basis`,
    HEM/model/net.py:712) computed by torch's fp32 QR, which differs from
    the true orthonormal Q by up to ~2e-2 at 320x576 (our numpy/f64 QR
    matches the true Q to ~1e-6; torch's blocked fp32 Householder does
    not).  A checkpoint's h_net weights are trained against ITS basis, so
    bit-faithful eval of an imported checkpoint requires using the buffer
    — the importer installs it here (import_torch.import_estimator_state_dict).

    Must be called BEFORE the model is traced/jitted: the basis is baked
    into traced programs as a constant, and jit caches do not key on it.
    Pass basis=None to clear."""
    if basis is None:
        _BASIS_OVERRIDES.pop((h, w), None)
        return
    basis = np.asarray(basis, dtype=np.float32)
    if basis.shape != (8, h, w, 2):
        raise ValueError(f"basis override must be (8, {h}, {w}, 2); "
                         f"got {basis.shape}")
    _BASIS_OVERRIDES[(h, w)] = basis


def gen_homography_basis(h: int, w: int, qr: bool = True, scale: bool = True) -> np.ndarray:
    if qr and scale and (h, w) in _BASIS_OVERRIDES:
        return _BASIS_OVERRIDES[(h, w)]
    return _gen_homography_basis(h, w, qr, scale)


@functools.lru_cache(maxsize=8)
def _gen_homography_basis(h: int, w: int, qr: bool = True, scale: bool = True) -> np.ndarray:
    x = np.arange(w, dtype=np.float32)
    y = np.arange(h, dtype=np.float32)
    xx, yy = np.meshgrid(x, y)  # (h, w)
    zeros = np.zeros_like(xx)
    ones = np.ones_like(xx)

    fields = [
        (xx, zeros),
        (yy, zeros),
        (ones, zeros),
        (zeros, xx),
        (zeros, yy),
        (zeros, ones),
        (xx * xx, xx * yy),
        (xx * yy, yy * yy),
    ]
    flows = np.stack([np.stack([fu, fv], axis=-1) for fu, fv in fields], axis=0)
    # (8, h, w, 2)

    if qr:
        mat = flows.reshape(8, -1).T.astype(np.float32)  # (h*w*2, 8)
        q, _ = np.linalg.qr(mat)  # reduced QR, Householder (matches torch.qr)
        flows = q.T.reshape(8, h, w, 2).astype(np.float32)

    if scale:
        mx = np.abs(flows.reshape(8, -1)).max(axis=1).reshape(8, 1, 1, 1)
        flows = flows / mx
    return flows.astype(np.float32)
