"""Conditional Gaussian diffusion: losses, CFG model predictions, samplers.

Parity target: `GaussianDiffusion` (classifier_free_guidance.py:498-842):
* q_sample / converters / posterior (:586-608, :738-742)
* model_predictions with classifier-free guidance scale 3 (:610-630)
* DDIM sampler with eta=1 and x0-clipping (:669-711)
* p_losses: L1(model_out, x0) + alpha_bar_t-weighted mask*photometric (:770-806)
* forward: slices the 12-ch condition tensor, normalizes to [-1,1] (:808-842)

TPU-native deviations (behaviour-preserving):
* the DDIM loop is one `lax.scan` under jit instead of a Python loop;
* the CFG pair (conditional + null) is a single doubled-batch forward
  (the reference calls the UNet twice per step, :403-410);
* the conditional DDPM path is implemented *working* (the reference's is
  stale/broken - SURVEY.md "reference quirks", classifier_free_guidance.py:632-667).

Layouts are NHWC. ``model_fn(params, x, t, classes, rgb_flow, mask,
keep_mask, train, rngs)`` must return the 6-channel prediction; ``keep_mask``
(B,) bool selects real vs null class embedding per sample.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from dmhomo_tpu.diffusion.schedules import DiffusionSchedule, ddim_time_pairs, extract
from dmhomo_tpu.geometry.warp import warp_by_flow


def normalize_to_neg_one_to_one(x):
    return x * 2.0 - 1.0


def unnormalize_to_zero_to_one(x):
    return (x + 1.0) * 0.5


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    image_size: int = 256
    channels: int = 6
    timesteps: int = 1000
    sampling_timesteps: int = 32
    objective: str = "pred_x0"  # pred_noise | pred_x0 | pred_v
    beta_schedule: str = "cosine"
    loss_type: str = "l1"  # l1 | l2
    ddim_sampling_eta: float = 1.0
    cond_scale: float = 3.0
    cond_drop_prob: float = 0.5
    p2_loss_weight_gamma: float = 0.0
    p2_loss_weight_k: float = 1.0
    photo_loss_weight: float = 1.0

    @property
    def is_ddim_sampling(self) -> bool:
        return self.sampling_timesteps < self.timesteps


class GaussianDiffusion:
    """Functional diffusion wrapper around a conditional denoiser."""

    def __init__(self, model_fn: Callable[..., jnp.ndarray], config: DiffusionConfig):
        assert config.objective in ("pred_noise", "pred_x0", "pred_v")
        assert config.loss_type in ("l1", "l2")
        assert config.sampling_timesteps <= config.timesteps
        self.model_fn = model_fn
        self.config = config
        self.schedule = DiffusionSchedule.create(
            timesteps=config.timesteps,
            beta_schedule=config.beta_schedule,
            p2_loss_weight_gamma=config.p2_loss_weight_gamma,
            p2_loss_weight_k=config.p2_loss_weight_k,
        )

    # -- converters ---------------------------------------------------------

    def predict_start_from_noise(self, x_t, t, noise):
        s = self.schedule
        nd = x_t.ndim
        return (
            extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - extract(s.sqrt_recipm1_alphas_cumprod, t, nd) * noise
        )

    def predict_noise_from_start(self, x_t, t, x0):
        s = self.schedule
        nd = x_t.ndim
        return (extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0) / extract(
            s.sqrt_recipm1_alphas_cumprod, t, nd
        )

    def predict_v(self, x_start, t, noise):
        s = self.schedule
        nd = x_start.ndim
        return (
            extract(s.sqrt_alphas_cumprod, t, nd) * noise
            - extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
        )

    def predict_start_from_v(self, x_t, t, v):
        s = self.schedule
        nd = x_t.ndim
        return (
            extract(s.sqrt_alphas_cumprod, t, nd) * x_t
            - extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * v
        )

    def q_posterior(self, x_start, x_t, t):
        s = self.schedule
        nd = x_t.ndim
        mean = (
            extract(s.posterior_mean_coef1, t, nd) * x_start
            + extract(s.posterior_mean_coef2, t, nd) * x_t
        )
        var = extract(s.posterior_variance, t, nd)
        log_var = extract(s.posterior_log_variance_clipped, t, nd)
        return mean, var, log_var

    def q_sample(self, x_start, t, noise):
        s = self.schedule
        nd = x_start.ndim
        return (
            extract(s.sqrt_alphas_cumprod, t, nd) * x_start
            + extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    # -- model wrappers -----------------------------------------------------

    def _forward_with_cond_scale(self, params, x, t, classes, rgb_flow, mask, cond_scale):
        """CFG extrapolation `null + (cond - null) * scale` as ONE forward.

        Doubles the batch (cond half keep_mask=True, null half False) so the
        two UNet evaluations of the reference (:403-410) fuse into one
        MXU-saturating call.
        """
        if cond_scale == 1.0:
            keep = jnp.ones((x.shape[0],), bool)
            return self.model_fn(
                params, x, t, classes, rgb_flow, mask, keep_mask=keep, train=False
            )
        B = x.shape[0]
        x2 = jnp.concatenate([x, x], 0)
        t2 = jnp.concatenate([t, t], 0)
        cls2 = jnp.concatenate([classes, classes], 0)
        rf2 = jnp.concatenate([rgb_flow, rgb_flow], 0)
        m2 = jnp.concatenate([mask, mask], 0)
        keep2 = jnp.concatenate([jnp.ones((B,), bool), jnp.zeros((B,), bool)], 0)
        out2 = self.model_fn(params, x2, t2, cls2, rf2, m2, keep_mask=keep2, train=False)
        cond, null = out2[:B], out2[B:]
        return null + (cond - null) * cond_scale

    def model_predictions(
        self, params, x, t, classes, rgb_flow, mask, cond_scale=None, clip_x_start=False
    ):
        cfg = self.config
        cond_scale = cfg.cond_scale if cond_scale is None else cond_scale
        model_out = self._forward_with_cond_scale(
            params, x, t, classes, rgb_flow, mask, cond_scale
        )
        clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (lambda v: v)

        if cfg.objective == "pred_noise":
            pred_noise = model_out
            x_start = clip(self.predict_start_from_noise(x, t, pred_noise))
        elif cfg.objective == "pred_x0":
            x_start = clip(model_out)
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        else:  # pred_v
            x_start = clip(self.predict_start_from_v(x, t, model_out))
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        return pred_noise, x_start

    # -- samplers -----------------------------------------------------------

    def ddim_sample(
        self,
        params,
        key: jax.Array,
        classes: jnp.ndarray,
        rgb_flow: jnp.ndarray,
        mask: jnp.ndarray,
        cond_scale: float | None = None,
        clip_denoised: bool = True,
        fixed_noise: tuple | None = None,
    ) -> jnp.ndarray:
        """DDIM sampling as one lax.scan.  rgb_flow must already be in [-1,1].

        ``fixed_noise`` optionally injects (init_noise (B,H,W,C), step_noise
        (S,B,H,W,C)) instead of drawing from ``key`` - used by the
        bit-parity harness against the reference sampler.
        Returns the sampled 6-ch image pair in [0, 1], NHWC.
        """
        cfg = self.config
        s = self.schedule
        B = classes.shape[0]
        shape = (B, cfg.image_size, cfg.image_size, cfg.channels)

        pairs = jnp.asarray(ddim_time_pairs(cfg.timesteps, cfg.sampling_timesteps))
        eta = cfg.ddim_sampling_eta

        if fixed_noise is not None:
            img0 = jnp.asarray(fixed_noise[0], jnp.float32)
            step_noise = jnp.asarray(fixed_noise[1], jnp.float32)
        else:
            key, init_key = jax.random.split(key)
            img0 = jax.random.normal(init_key, shape, jnp.float32)
            step_noise = None

        def step(carry, inp):
            img, k = carry
            if step_noise is None:
                pair = inp
            else:
                pair, noise = inp
            time, time_next = pair[0], pair[1]
            t_b = jnp.full((B,), time, jnp.int32)
            pred_noise, x_start = self.model_predictions(
                params, img, t_b, classes, rgb_flow, mask,
                cond_scale=cond_scale, clip_x_start=clip_denoised,
            )
            # coefficient math masked for the final (time_next = -1) step
            tn = jnp.maximum(time_next, 0)
            alpha = s.alphas_cumprod[time]
            alpha_next = s.alphas_cumprod[tn]
            sigma = eta * jnp.sqrt(
                jnp.clip((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha), 0.0)
            )
            c = jnp.sqrt(jnp.clip(1 - alpha_next - sigma**2, 0.0))

            if step_noise is None:
                k, nk = jax.random.split(k)
                noise = jax.random.normal(nk, img.shape, img.dtype)
            img_next = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
            img_out = jnp.where(time_next < 0, x_start, img_next)
            return (img_out, k), None

        xs = pairs if step_noise is None else (pairs, step_noise)
        (img, _), _ = jax.lax.scan(step, (img0, key), xs)
        return unnormalize_to_zero_to_one(img)

    def p_sample_loop(
        self,
        params,
        key: jax.Array,
        classes: jnp.ndarray,
        rgb_flow: jnp.ndarray,
        mask: jnp.ndarray,
        cond_scale: float | None = None,
        clip_denoised: bool = True,
    ) -> jnp.ndarray:
        """Full ancestral DDPM loop (T steps) as lax.scan.

        The reference's conditional DDPM path is broken (stale signatures,
        classifier_free_guidance.py:632-667); this is the working intent.
        """
        cfg = self.config
        B = classes.shape[0]
        shape = (B, cfg.image_size, cfg.image_size, cfg.channels)
        key, init_key = jax.random.split(key)
        img0 = jax.random.normal(init_key, shape, jnp.float32)
        ts = jnp.arange(cfg.timesteps - 1, -1, -1)

        def step(carry, t):
            img, k = carry
            t_b = jnp.full((B,), t, jnp.int32)
            _, x_start = self.model_predictions(
                params, img, t_b, classes, rgb_flow, mask,
                cond_scale=cond_scale, clip_x_start=clip_denoised,
            )
            mean, _, log_var = self.q_posterior(x_start, img, t_b)
            k, nk = jax.random.split(k)
            noise = jax.random.normal(nk, img.shape, img.dtype)
            img_out = mean + jnp.where(t > 0, jnp.exp(0.5 * log_var) * noise, 0.0)
            return (img_out, k), None

        (img, _), _ = jax.lax.scan(step, (img0, key), ts)
        return unnormalize_to_zero_to_one(img)

    def sample(self, params, key, classes, rgb_flow, mask, cond_scale=None):
        """Dispatch like the reference `sample()` (:713-720).

        rgb_flow arrives in [0, 1] and is normalized here (:716).
        """
        rgb_flow = normalize_to_neg_one_to_one(rgb_flow)
        fn = self.ddim_sample if self.config.is_ddim_sampling else self.p_sample_loop
        return fn(params, key, classes, rgb_flow, mask, cond_scale=cond_scale)

    # -- training loss ------------------------------------------------------

    def _elem_loss(self, a, b):
        if self.config.loss_type == "l1":
            return jnp.abs(a - b)
        return (a - b) ** 2

    def p_losses(
        self,
        params,
        key: jax.Array,
        x_start: jnp.ndarray,
        t: jnp.ndarray,
        classes: jnp.ndarray,
        rgb_flow: jnp.ndarray,
        flow: jnp.ndarray,
        mask: jnp.ndarray,
        train: bool = True,
        rngs: Any = None,
    ) -> jnp.ndarray:
        cfg = self.config
        B = x_start.shape[0]
        key_noise, key_drop = jax.random.split(key)
        noise = jax.random.normal(key_noise, x_start.shape, x_start.dtype)
        x = self.q_sample(x_start, t, noise)

        # classifier-free-guidance condition dropout (prob_mask_like, :421-425)
        keep_mask = jax.random.uniform(key_drop, (B,)) < (1.0 - cfg.cond_drop_prob)
        model_out = self.model_fn(
            params, x, t, classes, rgb_flow, mask, keep_mask=keep_mask, train=train, rngs=rngs
        )

        im1, im2 = model_out[..., :3], model_out[..., 3:]
        im2_warp = warp_by_flow(im2, flow, mode="border")

        if cfg.objective == "pred_noise":
            target = noise
        elif cfg.objective == "pred_x0":
            target = x_start
        else:
            target = self.predict_v(x_start, t, noise)

        loss = self._elem_loss(model_out, target).reshape(B, -1).mean(axis=1)
        photo = (mask * self._elem_loss(im2_warp, im1)).reshape(B, -1).mean(axis=1)
        photo_w = self.schedule.alphas_cumprod[t]
        return loss.mean() + (cfg.photo_loss_weight * photo_w * photo).mean()

    def loss(self, params, key, batch_img, classes, train=True, rngs=None):
        """Training entry: 12-ch condition tensor in [0,1], NHWC (ref :808-842).

        channels: img1(3) img2(3) mask(1) rgb_flow(3) flow(2).
        """
        cfg = self.config
        B = batch_img.shape[0]
        key_t, key_loss = jax.random.split(key)
        t = jax.random.randint(key_t, (B,), 0, cfg.timesteps)

        data = batch_img[..., :6]
        mask = batch_img[..., 6:7]
        rgb_flow = batch_img[..., 7:10]
        flow = batch_img[..., 10:12]

        data = normalize_to_neg_one_to_one(data)
        rgb_flow = normalize_to_neg_one_to_one(rgb_flow)
        return self.p_losses(
            params, key_loss, data, t, classes, rgb_flow, flow, mask, train=train, rngs=rngs
        )
