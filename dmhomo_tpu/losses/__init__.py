"""HEM training losses."""

from dmhomo_tpu.losses.hem_losses import (
    LossWeights,
    nll_laplace,
    mask_bce_loss,
    compute_losses,
)

__all__ = ["LossWeights", "nll_laplace", "mask_bce_loss", "compute_losses"]
