"""DGM diffusion trainer: jit train step over a device mesh, EMA, checkpoints.

Parity target: the accelerate `Trainer` (denoising_diffusion_pytorch.py:
1681-2021): Adam(lr, betas=(0.9, 0.99)), grad-clip 1.0, EMA(0.995, every 10),
grad accumulation, periodic save + sample.  TPU-native shape:

* ONE jitted step - loss, grad, clip, Adam update and the EMA lerp all fuse
  into a single XLA program; no per-step host sync, no barriers, no
  find_unused_parameters (static graph).
* data-parallel over a `Mesh(('data','model'))`: the batch is sharded on
  'data', parameters replicated; the gradient all-reduce is inserted by XLA
  because the loss is a global-batch mean (replaces DDP/NCCL).
* gradient accumulation as a `lax.scan` over microbatches.
* bf16 activations (params fp32) instead of the reference's (disabled) AMP.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dmhomo_tpu.diffusion import GaussianDiffusion
from dmhomo_tpu.models import ConditionalUNet
from dmhomo_tpu.models.unet import make_unet_apply
from dmhomo_tpu.parallel import (
    batch_sharding,
    channel_shardings,
    make_mesh,
    replicated,
    shard_batch,
    shard_stacked_batch,
    stacked_batch_sharding,
)
from dmhomo_tpu.train.config import DGMTrainConfig
from dmhomo_tpu.train.ema import EMAState, ema_init, ema_update
from dmhomo_tpu.utils import get_logger, load_checkpoint, save_checkpoint


def dgm_abstract_state(
    model: ConditionalUNet,
    image_size: int,
    grad_clip_norm: float = 1.0,
    lr: float = 5e-4,
    adam_b1: float = 0.9,
    adam_b2: float = 0.99,
):
    """Abstract {params, opt_state, ema, step} pytree matching DGMTrainer
    checkpoints, built under `jax.eval_shape` (no allocation).  Restoring
    orbax checkpoints against this target keeps custom pytrees (EMAState)
    intact instead of positional flattened children, so structure changes
    fail loudly rather than silently misindex."""

    def build():
        S = image_size
        dummy = dict(
            x=jnp.zeros((1, S, S, 6)),
            time=jnp.zeros((1,), jnp.int32),
            classes=jnp.zeros((1,), jnp.int32),
            rgb_flow=jnp.zeros((1, S, S, 3)),
            mask=jnp.ones((1, S, S, 1)),
            keep_mask=jnp.ones((1,), bool),
        )
        params = model.init(jax.random.PRNGKey(0), **dummy)["params"]
        tx = optax.chain(
            optax.clip_by_global_norm(grad_clip_norm), optax.adam(lr, b1=adam_b1, b2=adam_b2)
        )
        return {
            "params": params,
            "opt_state": tx.init(params),
            "ema": ema_init(params),
            "step": jnp.zeros((), jnp.int32),
        }

    return jax.eval_shape(build)


class DGMTrainer:
    def __init__(self, config: DGMTrainConfig, mesh=None):
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh()
        import dataclasses

        unet_cfg = config.unet
        if config.bf16 and unet_cfg.dtype != jnp.bfloat16:
            unet_cfg = dataclasses.replace(unet_cfg, dtype=jnp.bfloat16)
        self.model = ConditionalUNet(unet_cfg)
        self.gd = GaussianDiffusion(make_unet_apply(self.model), config.diffusion)
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.grad_clip_norm),
            optax.adam(config.lr, b1=config.adam_b1, b2=config.adam_b2),
        )
        self.logger = get_logger("dgm")
        self._train_step = None  # built after init_state (needs shardings)
        self._train_steps = None  # fused multi-step variant
        self._sample = None
        self.state = None
        self.state_shardings = None

    # -- state --------------------------------------------------------------

    def init_state(self, seed: Optional[int] = None):
        cfg = self.config
        seed = cfg.seed if seed is None else seed
        S = cfg.diffusion.image_size
        dummy = dict(  # numpy: stays placement-neutral for either backend
            x=np.zeros((1, S, S, 6), np.float32),
            time=np.zeros((1,), np.int32),
            classes=np.zeros((1,), np.int32),
            rgb_flow=np.zeros((1, S, S, 3), np.float32),
            mask=np.ones((1, S, S, 1), np.float32),
            keep_mask=np.ones((1,), bool),
        )
        if jax.default_backend() != "cpu":
            # eager flax init on the axon relay = one remote dispatch per
            # op (minutes); run it on the host CPU backend instead — the
            # threefry init values are backend-invariant — and transfer
            # via the sharded device_put below (same trick as
            # HEMTrainer.init_state)
            with jax.default_device(jax.devices("cpu")[0]):
                params = self.model.init(
                    jax.random.PRNGKey(seed), **dummy)["params"]
        else:
            params = self.model.init(jax.random.PRNGKey(seed), **dummy)["params"]
        state = {
            "params": params,
            "opt_state": self.tx.init(params),
            "ema": ema_init(params),
            "step": jnp.zeros((), jnp.int32),
        }
        self.state_shardings = self._state_shardings(state)
        self.state = jax.tree.map(jax.device_put, state, self.state_shardings)
        return self.state

    def _state_shardings(self, state):
        """Replicated, or channel-sharded over 'model' when configured."""
        if self.config.shard_params and self.mesh.shape.get("model", 1) > 1:
            return channel_shardings(state, self.mesh)
        rep = replicated(self.mesh)
        return jax.tree.map(lambda _: rep, state)

    # -- step ---------------------------------------------------------------

    def _step_body(self, state, batch_img, classes, key):
        """One optimizer step (pure; shared by the per-step jit and the
        fused multi-step scan driver)."""
        cfg = self.config
        accum = cfg.gradient_accumulate_every

        def loss_fn(params, key, batch_img, classes):
            return self.gd.loss(params, key, batch_img, classes, train=True)

        params = state["params"]
        if accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(params, key, batch_img, classes)
        else:
            B = batch_img.shape[0]
            mb = B // accum
            bi = batch_img[: mb * accum].reshape(accum, mb, *batch_img.shape[1:])
            cl = classes[: mb * accum].reshape(accum, mb)
            keys = jax.random.split(key, accum)

            def micro(carry, inp):
                b, c, k = inp
                l, g = jax.value_and_grad(loss_fn)(params, k, b, c)
                loss_acc, grad_acc = carry
                return (loss_acc + l, jax.tree.map(jnp.add, grad_acc, g)), None

            zero = jax.tree.map(jnp.zeros_like, params)
            (loss, grads), _ = jax.lax.scan(micro, (0.0, zero), (bi, cl, keys))
            loss = loss / accum
            grads = jax.tree.map(lambda g: g / accum, grads)

        updates, opt_state = self.tx.update(grads, state["opt_state"], params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(
            state["ema"], params, beta=cfg.ema_beta, update_every=cfg.ema_update_every
        )
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "ema": ema,
            "step": state["step"] + 1,
        }
        return new_state, loss

    def _build_train_step(self):
        data_sh = batch_sharding(self.mesh)
        rep = replicated(self.mesh)
        st_sh = self.state_shardings
        return jax.jit(
            self._step_body,
            in_shardings=(st_sh, data_sh, data_sh, rep),
            out_shardings=(st_sh, rep),
            donate_argnums=(0,),
        )

    def _build_train_steps(self):
        """Fused multi-step driver: K optimizer steps scanned inside ONE
        jitted program - one dispatch and one host sync per K steps.  On the
        axon relay this amortizes the per-call program-reupload pathology
        (BENCH.md); on any platform it removes the per-step host round-trip
        of the reference's Python loop (denoising_diffusion_pytorch.py:
        1836-1865)."""

        def steps_fn(state, batch_imgs, classes, key):
            K = batch_imgs.shape[0]
            keys = jax.random.split(key, K)

            def one(st, inp):
                b, c, k = inp
                return self._step_body(st, b, c, k)

            return jax.lax.scan(one, state, (batch_imgs, classes, keys))

        stacked_sh = stacked_batch_sharding(self.mesh)
        rep = replicated(self.mesh)
        st_sh = self.state_shardings
        return jax.jit(
            steps_fn,
            in_shardings=(st_sh, stacked_sh, stacked_sh, rep),
            out_shardings=(st_sh, rep),
            donate_argnums=(0,),
        )

    def train_step(self, batch_img: np.ndarray, classes: np.ndarray, key):
        """One optimizer step on a (B, S, S, 12) condition batch."""
        if self._train_step is None:
            assert self.state is not None, "call init_state()/load() first"
            self._train_step = self._build_train_step()
        batch = shard_batch(
            {"img": jnp.asarray(batch_img), "cls": jnp.asarray(classes, jnp.int32)},
            self.mesh,
        )
        self.state, loss = self._train_step(self.state, batch["img"], batch["cls"], key)
        return loss

    def train_steps(self, batch_imgs: np.ndarray, classes: np.ndarray, key):
        """K fused optimizer steps on a (K, B, S, S, 12) condition stack;
        returns the (K,) per-step losses (one dispatch, one host sync)."""
        if self._train_steps is None:
            assert self.state is not None, "call init_state()/load() first"
            self._train_steps = self._build_train_steps()
        batch = shard_stacked_batch(
            {"img": jnp.asarray(batch_imgs), "cls": jnp.asarray(classes, jnp.int32)},
            self.mesh,
        )
        self.state, losses = self._train_steps(self.state, batch["img"], batch["cls"], key)
        return losses

    # -- train loop ---------------------------------------------------------

    def train(
        self,
        batches: Iterator,
        num_steps: Optional[int] = None,
        save_every: Optional[int] = None,
        log_every: int = 50,
        on_milestone=None,
        fuse_steps: int = 1,
    ):
        """Training loop.  ``fuse_steps>1`` runs K optimizer steps per
        dispatch via the scanned driver (chunks shrink at save/num_steps
        boundaries so milestones land on the exact step)."""
        cfg = self.config
        num_steps = num_steps or cfg.train_num_steps
        save_every = save_every or cfg.save_every
        if self.state is None:
            self.init_state()
        key = jax.random.PRNGKey(cfg.seed + 1)
        step = int(jax.device_get(self.state["step"]))
        last_loss = None
        while step < num_steps:
            to_boundary = min(
                num_steps - step, save_every - step % save_every
            )
            k = min(fuse_steps, to_boundary)
            key, sub = jax.random.split(key)
            if k == 1:
                batch_img, classes = next(batches)
                last_loss = self.train_step(batch_img, classes, sub)
            else:
                stack = [next(batches) for _ in range(k)]
                batch_imgs = np.stack([b for b, _ in stack])
                classes = np.stack([c for _, c in stack])
                last_loss = self.train_steps(batch_imgs, classes, sub)[-1]
            prev, step = step, step + k
            if step // log_every > prev // log_every:
                loss_val = float(jax.device_get(last_loss))
                self.logger.info(f"step {step}/{num_steps} loss {loss_val:.4f}")
            if step % save_every == 0:
                self.save()
                if on_milestone is not None:
                    on_milestone(self, step)
        return self.state

    # -- sampling -----------------------------------------------------------

    def sample(self, key, classes, rgb_flow, mask, use_ema: bool = True, cond_scale=None):
        """jit-cached DDIM sampling with the EMA (or online) weights."""
        if self._sample is None:
            self._sample = jax.jit(
                lambda p, k, c, rf, m: self.gd.sample(p, k, c, rf, m, cond_scale=cond_scale)
            )
        params = self.state["ema"].params if use_ema else self.state["params"]
        return self._sample(
            params,
            key,
            jnp.asarray(classes, jnp.int32),
            jnp.asarray(rgb_flow),
            jnp.asarray(mask),
        )

    def save_preview(self, cond_batch: np.ndarray, classes: np.ndarray, path: str, key=None):
        """Sample from the EMA model on a condition batch and dump the
        warp-consistency panel grid (the reference Trainer's milestone
        preview, denoising_diffusion_pytorch.py:1871-1935).  Logs the
        preview's masked photometric error - mean(mask*|warp(img2, flow) -
        img1|), the numeric form of the reference's eyeball check - and
        returns (path, photo_err)."""
        import jax.numpy as jnp

        from dmhomo_tpu.geometry import warp_by_flow
        from dmhomo_tpu.utils.viz import image_grid, sample_panel, save_png

        key = jax.random.PRNGKey(0) if key is None else key
        cond = jnp.asarray(cond_batch)
        imgs = self.sample(key, classes, cond[..., 7:10], cond[..., 6:7])
        imgs_np = np.asarray(jax.device_get(imgs))
        mask = np.asarray(cond_batch[..., 6:7])
        flow = np.asarray(cond_batch[..., 10:12])
        warped = np.asarray(
            jax.device_get(warp_by_flow(jnp.asarray(imgs_np[..., 3:]), jnp.asarray(flow),
                                        mode="border"))
        )
        photo_err = float(
            (mask * np.abs(warped - imgs_np[..., :3])).sum() / (mask.sum() * 3 + 1e-8)
        )
        from dmhomo_tpu.parallel.distributed import is_main_process

        if is_main_process():  # sampling ran on every process; one writer
            panel = sample_panel(imgs_np, mask, flow)
            save_png(path, image_grid(panel))
            self.logger.info(f"preview {path}: photometric error {photo_err:.4f}")
        return path, photo_err

    # -- checkpoints --------------------------------------------------------

    def save(self, root: Optional[str] = None):
        root = root or self.config.results_dir
        step = int(jax.device_get(self.state["step"]))
        host_state = jax.device_get(self.state)
        path = save_checkpoint(root, step, host_state)
        self.logger.info(f"saved checkpoint at step {step}: {path}")
        return path

    def load(self, root: Optional[str] = None, step: Optional[int] = None):
        root = root or self.config.results_dir
        if self.state is None:
            self.init_state()
        target = jax.device_get(self.state)
        restored = load_checkpoint(root, step=step, target=target)
        self.state = jax.tree.map(jax.device_put, restored, self.state_shardings)
        self.logger.info(f"restored step {int(jax.device_get(self.state['step']))}")
        return self.state
