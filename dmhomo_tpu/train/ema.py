"""Exponential moving average of parameters as a pytree lerp.

Parity target: the `ema_pytorch.EMA` wrapper used by the DGM Trainer
(denoising_diffusion_pytorch.py:1766-1769) with beta=0.995, update_every=10
and the library defaults update_after_step=100, inv_gamma=1, power=2/3:

* update() is called every train step and increments `step`;
* an actual EMA update only happens when step % update_every == 0;
* before update_after_step the EMA is a plain copy of the online weights;
* the decay warms up as  1 - (1 + k/inv_gamma)^-power  clamped to [0, beta],
  where k = max(step - update_after_step - 1, 0).

Implemented branch-free (jnp.where) so it lives inside the jitted train
step - no host round-trip per step, unlike the torch wrapper.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EMAState:
    params: Any
    step: jnp.ndarray  # scalar int32, counts update() calls

    def tree_flatten(self):
        return (self.params, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def ema_init(params) -> EMAState:
    # distinct buffers: the trainer donates its whole state, and donating a
    # buffer aliased by both params and ema.params is an XLA error
    return EMAState(
        params=jax.tree.map(jnp.copy, params), step=jnp.zeros((), jnp.int32)
    )


def _decay(step, beta, update_after_step, inv_gamma, power, min_value):
    k = jnp.maximum(step - (update_after_step + 1), 0).astype(jnp.float32)
    value = 1.0 - (1.0 + k / inv_gamma) ** (-power)
    value = jnp.where(k <= 0, 0.0, value)
    return jnp.clip(value, min_value, beta)


def ema_update(
    state: EMAState,
    params,
    beta: float = 0.995,
    update_every: int = 10,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
) -> EMAState:
    step = state.step + 1
    do_update = (step % update_every) == 0
    d = _decay(step, beta, update_after_step, inv_gamma, power, min_value)

    def lerp(ema, new):
        upd = ema * d + new.astype(ema.dtype) * (1.0 - d)
        return jnp.where(do_update, upd, ema)

    new_params = jax.tree.map(lerp, state.params, params)
    return EMAState(params=new_params, step=step)
