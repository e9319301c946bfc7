"""Unconditional Gaussian diffusion (the reference's lucidrains twin).

Parity target: `GaussianDiffusion` in denoising_diffusion_pytorch.py:453-817:
same schedule machinery as the conditional class, plus
* self-conditioning: with prob 0.5 a stop-gradient x0 estimate feeds the
  model's second input (:756-764)
* p2 loss reweighting applied to the per-sample loss (:773-775)
* plain DDPM / DDIM sampling without CFG

The reference's flow-channel un-normalizations inside its samplers
(:677-680, :726-729 - [0,1]->[-1,1] and x512 on channels 2:) belong to an
abandoned flow-generation experiment and are intentionally not replicated
(SURVEY.md 2.2).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from dmhomo_tpu.diffusion.gaussian import (
    normalize_to_neg_one_to_one,
    unnormalize_to_zero_to_one,
)
from dmhomo_tpu.diffusion.schedules import DiffusionSchedule, ddim_time_pairs, extract


@dataclasses.dataclass(frozen=True)
class UncondDiffusionConfig:
    image_size: int = 128
    channels: int = 3
    timesteps: int = 1000
    sampling_timesteps: int = 250
    objective: str = "pred_noise"
    beta_schedule: str = "cosine"
    loss_type: str = "l1"
    ddim_sampling_eta: float = 1.0
    self_condition: bool = False
    self_condition_prob: float = 0.5
    p2_loss_weight_gamma: float = 0.0
    p2_loss_weight_k: float = 1.0

    @property
    def is_ddim_sampling(self):
        return self.sampling_timesteps < self.timesteps


class UnconditionalGaussianDiffusion:
    """model_fn(params, x, t, x_self_cond, train) -> prediction."""

    def __init__(self, model_fn: Callable[..., jnp.ndarray], config: UncondDiffusionConfig):
        assert config.objective in ("pred_noise", "pred_x0", "pred_v")
        self.model_fn = model_fn
        self.config = config
        self.schedule = DiffusionSchedule.create(
            timesteps=config.timesteps,
            beta_schedule=config.beta_schedule,
            p2_loss_weight_gamma=config.p2_loss_weight_gamma,
            p2_loss_weight_k=config.p2_loss_weight_k,
        )

    # converters shared with the conditional class via the schedule
    def q_sample(self, x_start, t, noise):
        s = self.schedule
        nd = x_start.ndim
        return (
            extract(s.sqrt_alphas_cumprod, t, nd) * x_start
            + extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def _pred_x0_and_noise(self, params, x, t, x_self_cond, clip=True):
        s = self.schedule
        nd = x.ndim
        out = self.model_fn(params, x, t, x_self_cond, train=False)
        if self.config.objective == "pred_noise":
            noise = out
            x0 = (
                extract(s.sqrt_recip_alphas_cumprod, t, nd) * x
                - extract(s.sqrt_recipm1_alphas_cumprod, t, nd) * noise
            )
            if clip:
                x0 = jnp.clip(x0, -1.0, 1.0)
        elif self.config.objective == "pred_x0":
            x0 = jnp.clip(out, -1.0, 1.0) if clip else out
            noise = (extract(s.sqrt_recip_alphas_cumprod, t, nd) * x - x0) / extract(
                s.sqrt_recipm1_alphas_cumprod, t, nd
            )
        else:  # pred_v
            x0 = (
                extract(s.sqrt_alphas_cumprod, t, nd) * x
                - extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * out
            )
            if clip:
                x0 = jnp.clip(x0, -1.0, 1.0)
            noise = (extract(s.sqrt_recip_alphas_cumprod, t, nd) * x - x0) / extract(
                s.sqrt_recipm1_alphas_cumprod, t, nd
            )
        return x0, noise

    def sample(self, params, key, batch_size: int):
        cfg = self.config
        s = self.schedule
        shape = (batch_size, cfg.image_size, cfg.image_size, cfg.channels)
        key, ik = jax.random.split(key)
        img0 = jax.random.normal(ik, shape)
        sc0 = jnp.zeros(shape)

        if cfg.is_ddim_sampling:
            pairs = jnp.asarray(ddim_time_pairs(cfg.timesteps, cfg.sampling_timesteps))
            eta = cfg.ddim_sampling_eta

            def step(carry, pair):
                img, x_sc, k = carry
                time, time_next = pair[0], pair[1]
                t_b = jnp.full((batch_size,), time, jnp.int32)
                x0, noise_pred = self._pred_x0_and_noise(
                    params, img, t_b, x_sc if cfg.self_condition else None
                )
                tn = jnp.maximum(time_next, 0)
                alpha = s.alphas_cumprod[time]
                alpha_next = s.alphas_cumprod[tn]
                sigma = eta * jnp.sqrt(
                    jnp.clip((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha), 0.0)
                )
                c = jnp.sqrt(jnp.clip(1 - alpha_next - sigma**2, 0.0))
                k, nk = jax.random.split(k)
                z = jax.random.normal(nk, img.shape)
                nxt = x0 * jnp.sqrt(alpha_next) + c * noise_pred + sigma * z
                img_out = jnp.where(time_next < 0, x0, nxt)
                return (img_out, x0, k), None

            (img, _, _), _ = jax.lax.scan(step, (img0, sc0, key), pairs)
        else:
            ts = jnp.arange(cfg.timesteps - 1, -1, -1)

            def step(carry, t):
                img, x_sc, k = carry
                t_b = jnp.full((batch_size,), t, jnp.int32)
                x0, _ = self._pred_x0_and_noise(
                    params, img, t_b, x_sc if cfg.self_condition else None
                )
                nd = img.ndim
                mean = (
                    extract(s.posterior_mean_coef1, t_b, nd) * x0
                    + extract(s.posterior_mean_coef2, t_b, nd) * img
                )
                log_var = extract(s.posterior_log_variance_clipped, t_b, nd)
                k, nk = jax.random.split(k)
                z = jax.random.normal(nk, img.shape)
                img_out = mean + jnp.where(t > 0, jnp.exp(0.5 * log_var) * z, 0.0)
                return (img_out, x0, k), None

            (img, _, _), _ = jax.lax.scan(step, (img0, sc0, key), ts)
        return unnormalize_to_zero_to_one(img)

    def loss(self, params, key, img01, train: bool = True):
        """img01 in [0,1], NHWC.  Returns scalar loss."""
        cfg = self.config
        B = img01.shape[0]
        x_start = normalize_to_neg_one_to_one(img01)
        k_t, k_n, k_sc, k_flip = jax.random.split(key, 4)
        t = jax.random.randint(k_t, (B,), 0, cfg.timesteps)
        noise = jax.random.normal(k_n, x_start.shape)
        x = self.q_sample(x_start, t, noise)

        x_self_cond = None
        if cfg.self_condition:
            # 50%: estimate x0 with a stop-gradient forward (ref :756-764)
            x0_est, _ = self._pred_x0_and_noise(params, x, t, jnp.zeros_like(x), clip=False)
            x0_est = jax.lax.stop_gradient(x0_est)
            use = jax.random.uniform(k_sc, ()) < cfg.self_condition_prob
            x_self_cond = jnp.where(use, x0_est, jnp.zeros_like(x))

        out = self.model_fn(params, x, t, x_self_cond, train=train)
        if cfg.objective == "pred_noise":
            target = noise
        elif cfg.objective == "pred_x0":
            target = x_start
        else:
            s = self.schedule
            nd = x_start.ndim
            target = (
                extract(s.sqrt_alphas_cumprod, t, nd) * noise
                - extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
            )
        if cfg.loss_type == "l1":
            per = jnp.abs(out - target)
        else:
            per = (out - target) ** 2
        per = per.reshape(B, -1).mean(axis=1)
        per = per * self.schedule.p2_loss_weight[t]
        return per.mean()
