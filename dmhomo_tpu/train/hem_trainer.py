"""HEM estimator trainer: two-stage schedule, mesh data-parallel, eval loop.

Parity target: HEM/train.py + common/manager.py: Adam + ExponentialLR(0.8)
stepped once per epoch-equivalent, loss from `compute_losses` under the
stage's weights, eval every `train_num_steps` with best-checkpoint tracking
on the AVG point error.  TPU-native shape mirrors DGMTrainer: one jitted
step (loss+grad+Adam+BN-stats) over the ('data','model') mesh; separate
static-shape jitted program for the full-resolution eval forward.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dmhomo_tpu.evaluation import bucket_by_category, category_report, point_matching_error
from dmhomo_tpu.losses import compute_losses
from dmhomo_tpu.models import HomographyEstimator
from dmhomo_tpu.models.estimator import upsample_outputs
from dmhomo_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_stacked_batch,
    stacked_batch_sharding,
)
from dmhomo_tpu.train.config import HEMTrainConfig
from dmhomo_tpu.utils import MetricTracker, get_logger, load_checkpoint, save_checkpoint


def resolve_attn_impl(requested: Optional[str], backend: Optional[str] = None) -> Optional[str]:
    """Resolve HEMTrainConfig.attn_impl: 'auto' -> the fused Pallas window
    attention on TPU ONLY (the `pltpu` kernel is Mosaic; it cannot run on
    GPU, and on CPU it would only interpret), 'xla' everywhere else.
    Explicit values pass through; None = defer to the SwinConfig."""
    if requested != "auto":
        return requested
    backend = backend or jax.default_backend()
    return "pallas" if backend == "tpu" else "xla"


def resolve_remat(requested, attn_impl: Optional[str], grad_accum: int) -> bool:
    """Resolve HEMTrainConfig.remat: 'auto' -> False when the fused Pallas
    window attention is active AND grad_accum >= 4 (logits live in VMEM and
    the microbatch working set fits; skipping the per-block forward
    recompute measured +19% step throughput, BENCH.md r4), True otherwise
    (the XLA path's materialized logits need the recompute to fit 16 GB).
    Explicit booleans pass through."""
    if requested != "auto":
        return bool(requested)
    return not (attn_impl == "pallas" and grad_accum >= 4)


class HEMTrainer:
    def __init__(self, config: HEMTrainConfig, mesh=None, steps_per_epoch: Optional[int] = None):
        import dataclasses

        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh()
        est = config.estimator
        if config.bf16 and est.dtype != jnp.bfloat16:
            # bf16 activations AND bf16 attention logits (sim_dtype): the
            # (Bn,h,N,N) window sims dominate step HBM traffic (AOT cost
            # analysis: 1.445 -> 1.228 TB/step, BENCH.md); softmax
            # normalizers stay fp32-accumulated
            est = dataclasses.replace(
                est, dtype=jnp.bfloat16,
                swin=dataclasses.replace(
                    est.swin, dtype=jnp.bfloat16, sim_dtype=jnp.bfloat16
                ),
            )
        impl = resolve_attn_impl(config.attn_impl)
        if impl is not None and est.swin.attn_impl != impl:
            est = dataclasses.replace(
                est, swin=dataclasses.replace(est.swin, attn_impl=impl)
            )
        if resolve_remat(config.remat, est.swin.attn_impl, config.grad_accum) \
                and not est.swin.remat:
            est = dataclasses.replace(est, swin=dataclasses.replace(est.swin, remat=True))
        self.model = HomographyEstimator(est)
        # ExponentialLR(gamma) stepped per epoch == staircase exp decay
        self.steps_per_epoch = steps_per_epoch or config.train_num_steps
        schedule = optax.exponential_decay(
            init_value=config.lr,
            transition_steps=self.steps_per_epoch,
            decay_rate=config.gamma,
            staircase=True,
        )
        self.tx = optax.adam(schedule)
        self.logger = get_logger("hem")
        self.metrics = MetricTracker(config.major_metric)
        self._train_step = self._build_train_step()
        self._train_step_raw = None  # device-pipeline variant, built lazily
        self._train_steps = None  # fused multi-step variants
        self._train_steps_raw = None
        self._eval_forward = None
        self._logit_health_fn = None
        self.state = None

    # -- state --------------------------------------------------------------

    def init_state(self, seed: Optional[int] = None):
        cfg = self.config
        seed = cfg.seed if seed is None else seed
        ph, pw = cfg.estimator.crop_size
        if jax.default_backend() != "cpu":
            # Initialize on the host CPU backend and transfer: flax init
            # runs EAGERLY, and on the axon TPU relay each of the
            # thousands of init ops is its own remote dispatch/compile —
            # 13-16 min per process measured, vs seconds on host.  The
            # init twin uses the XLA attention with remat off: the param
            # tree and the threefry init values are impl-invariant
            # (logit_health's twin relies on the same fact), and it keeps
            # the Pallas kernel from running interpret-mode on CPU.
            import dataclasses as _dc
            est = self.model.config
            if est.swin.remat or est.swin.attn_impl != "xla":
                est = _dc.replace(
                    est, swin=_dc.replace(est.swin, remat=False, attn_impl="xla"))
            twin = HomographyEstimator(est)
            with jax.default_device(jax.devices("cpu")[0]):
                variables = twin.init(
                    jax.random.PRNGKey(seed), jnp.zeros((1, ph, pw, 2)),
                    train=False)
        else:
            dummy = jnp.zeros((1, ph, pw, 2))
            variables = self.model.init(
                jax.random.PRNGKey(seed), dummy, train=False)
        state = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "opt_state": self.tx.init(variables["params"]),
            "step": jnp.zeros((), jnp.int32),
            "epoch": jnp.zeros((), jnp.int32),
        }
        rep = replicated(self.mesh)
        self.state = jax.tree.map(lambda x: jax.device_put(x, rep), state)
        return self.state

    # -- train step ---------------------------------------------------------

    def _step_body(self, state, batch, raw: bool = False):
        """One optimizer step (pure; shared by the per-step jit and the
        fused multi-step scan driver)."""
        cfg = self.config

        def loss_fn(params, batch_stats, batch):
            outputs, mutated = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["imgs_gray_patch"],
                train=True,
                mutable=["batch_stats"],
            )
            losses = compute_losses(batch, outputs, cfg.loss)
            return losses["total"], (losses, mutated["batch_stats"])

        if raw:
            # device-pipeline batches: resize/gray/flow-render in-graph
            # (HEMTrainDataset(device_pipeline=True), hem_data.py)
            from dmhomo_tpu.data.hem_data import device_build_patches

            batch = device_build_patches(
                batch["img12"], batch["homo"], batch["homo_inv"],
                batch["start"], cfg.estimator.crop_size, cfg.estimator.ori_size,
            )
        params = state["params"]
        B_ = batch["imgs_gray_patch"].shape[0]
        # microbatches must divide the per-device batch (the scan's
        # minor batch axis stays sharded over 'data')
        per_dev = max(B_ // max(self.mesh.shape.get("data", 1), 1), 1)
        accum = min(cfg.grad_accum, per_dev)
        while accum > 1 and (per_dev % accum or B_ % accum):
            accum -= 1
        if accum == 1:
            (total, (losses, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, state["batch_stats"], batch)
        else:
            # microbatch gradient accumulation (lax.scan): divides the
            # activation working set by `accum` (peak temp 14.4 ->
            # 5.2 GiB at bs=32), which removes XLA's memory-pressure
            # spill copies and auto-remat near the 16 GB ceiling.  BN
            # stats thread through the scan carry - `accum` sequential
            # momentum updates per optimizer step, vs ONE per-rank update
            # per step in the reference's DDP: the normalization batch
            # matches, but the running averages move ~accum x faster
            # toward the batch statistics (cadence difference; harmless
            # for eval parity because the stats converge to the same
            # fixed point, noted per ADVICE r2).
            B = batch["imgs_gray_patch"].shape[0]
            mb = B // accum
            mbatch = jax.tree.map(
                lambda x: x[: mb * accum].reshape(accum, mb, *x.shape[1:]), batch
            )

            def micro(carry, b):
                loss_acc, grad_acc, stats = carry
                (l, (ls, stats)), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, stats, b
                )
                grad_acc = jax.tree.map(jnp.add, grad_acc, g)
                return (loss_acc + l, grad_acc, stats), ls

            zero = jax.tree.map(jnp.zeros_like, params)
            (total, grads, new_stats), losses_seq = jax.lax.scan(
                micro, (0.0, zero, state["batch_stats"]), mbatch
            )
            total = total / accum
            grads = jax.tree.map(lambda g: g / accum, grads)
            losses = jax.tree.map(lambda x: x.mean(), losses_seq)
        updates, opt_state = self.tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_step = state["step"] + 1
        new_state = {
            "params": params,
            "batch_stats": new_stats,
            "opt_state": opt_state,
            "step": new_step,
            # epoch-equivalent counter: the reference's per-epoch
            # ExponentialLR staircase (HEM/train.py:91-99) ticks here
            "epoch": new_step // self.steps_per_epoch,
        }
        scalars = {k: v for k, v in losses.items()}
        return new_state, scalars

    def _build_train_step(self, raw: bool = False):
        import functools

        data_sh = batch_sharding(self.mesh)
        rep = replicated(self.mesh)
        return jax.jit(
            functools.partial(self._step_body, raw=raw),
            in_shardings=(rep, data_sh),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )

    def _build_train_steps(self, raw: bool = False):
        """Fused multi-step driver: K optimizer steps scanned inside ONE
        jitted program - one dispatch and one host sync per K steps (the
        production answer to the relay's per-call overhead; reference
        counterpart is the Python step loop HEM/train.py:72-99)."""

        def steps_fn(state, batches):
            def one(st, b):
                return self._step_body(st, b, raw=raw)

            return jax.lax.scan(one, state, batches)

        stacked_sh = stacked_batch_sharding(self.mesh)
        rep = replicated(self.mesh)
        return jax.jit(
            steps_fn,
            in_shardings=(rep, stacked_sh),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )

    def train_step(self, batch: dict):
        if "img12" in batch:  # raw device-pipeline schema
            if self._train_step_raw is None:
                self._train_step_raw = self._build_train_step(raw=True)
            keys = ("img12", "homo", "homo_inv", "start")
            device_batch = shard_batch({k: jnp.asarray(batch[k]) for k in keys}, self.mesh)
            self.state, losses = self._train_step_raw(self.state, device_batch)
            return losses
        device_batch = shard_batch(
            {
                "imgs_gray_patch": jnp.asarray(batch["imgs_gray_patch"]),
                "flow_gt_patch": jnp.asarray(batch["flow_gt_patch"]),
            },
            self.mesh,
        )
        self.state, losses = self._train_step(self.state, device_batch)
        return losses

    def train_steps(self, batches: list):
        """K fused optimizer steps from a list of K batches (either schema);
        returns the loss dict of (K,) arrays (one dispatch, one host sync)."""
        raw = "img12" in batches[0]
        keys = (
            ("img12", "homo", "homo_inv", "start")
            if raw
            else ("imgs_gray_patch", "flow_gt_patch")
        )
        stacked = {
            k: jnp.asarray(np.stack([np.asarray(b[k]) for b in batches])) for k in keys
        }
        if raw:
            if self._train_steps_raw is None:
                self._train_steps_raw = self._build_train_steps(raw=True)
            fn = self._train_steps_raw
        else:
            if self._train_steps is None:
                self._train_steps = self._build_train_steps()
            fn = self._train_steps
        device_batches = shard_stacked_batch(stacked, self.mesh)
        self.state, losses = fn(self.state, device_batches)
        return losses

    # -- eval ---------------------------------------------------------------

    def _build_eval_forward(self, full_hw):
        def fwd(params, batch_stats, imgs_gray_patch, pt_set):
            outputs = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                imgs_gray_patch,
                train=False,
            )
            full = upsample_outputs(outputs, full_hw)
            return point_matching_error(pt_set, full["flow_f"], full["flow_b"])

        data_sh = batch_sharding(self.mesh)
        rep = replicated(self.mesh)
        return jax.jit(fwd, in_shardings=(rep, rep, data_sh, data_sh), out_shardings=data_sh)

    def evaluate(self, eval_batches: Iterator, split: str = "val") -> dict:
        """Point-matching error per category over the CAHomo-format loader."""
        cfg = self.config
        if self._eval_forward is None:
            self._eval_forward = self._build_eval_forward(cfg.estimator.ori_size)
        self.metrics.reset(split)
        from dmhomo_tpu.data.loader import pad_batch

        errs, names = [], []
        for batch in eval_batches:
            # pad-and-mask ragged tails: one jit program per split, and the
            # batch stays divisible by the mesh's 'data' axis
            batch, n_valid = pad_batch(batch, cfg.eval_batch_size)
            e = self._eval_forward(
                self.state["params"],
                self.state["batch_stats"],
                jnp.asarray(batch["imgs_gray_patch"]),
                jnp.asarray(batch["pt_set"]),
            )
            errs.extend(np.asarray(jax.device_get(e))[:n_valid].tolist())
            names.extend(batch["video_names"][:n_valid])
        buckets = bucket_by_category(errs, names)
        # pod runs: reduce numeric per-category (sum, count) across hosts -
        # the accelerate.gather replacement (hem_evaluate.py:132-151); each
        # host evaluates its own data shard.
        if jax.process_count() > 1:
            from dmhomo_tpu.evaluation.metrics import bucket_sums, merge_bucket_sums
            from jax.experimental import multihost_utils

            gathered = np.asarray(multihost_utils.process_allgather(bucket_sums(buckets)))
            buckets = merge_bucket_sums(gathered)
        report = category_report(buckets)
        self.metrics.update(split, report)
        self.logger.info(
            f"[{split}] " + " ".join(f"{k}:{v:.4f}" for k, v in report.items())
        )
        return report

    def logit_health(self, imgs_gray_patch) -> float:
        """Max |attention logit| over every WindowAttention in one forward.

        Clip-validity diagnostic for the max-free softmax (swin.py: the
        static +-60 clip — and under bf16 training the bf16 sim dtype — is
        exact only while real logits stay in range).  Collects the
        `max_abs_logit` values sown by WindowAttention; runs a non-remat
        XLA-attention twin of the model (identical param tree): flax remat
        does not re-emit intermediates, and the fused Pallas kernel keeps
        its logits in VMEM — only the XLA einsum path sows.  The logits are
        the same math either way (kernel parity: reports/kernel_parity_tpu
        .json), so the twin measures the production run's magnitudes.

        The whole twin forward + reduction runs as ONE jitted program
        (cached on the trainer): eager flax apply would dispatch each op
        as its own relay call on the axon TPU backend (~3 ms/call floor,
        BENCH.md) — minutes per health reading instead of one dispatch."""
        import dataclasses as _dc

        import flax

        if self._logit_health_fn is None:
            est = self.config.estimator
            if est.swin.remat or est.swin.attn_impl != "xla":
                est = _dc.replace(
                    est, swin=_dc.replace(est.swin, remat=False, attn_impl="xla"))
            model = HomographyEstimator(est)

            def health(params, batch_stats, imgs):
                _, mut = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    imgs, train=False, mutable=["intermediates"],
                )
                leaves = [
                    jnp.max(jnp.stack(v))
                    for path, v in flax.traverse_util.flatten_dict(
                        mut["intermediates"]).items()
                    if path[-1] == "max_abs_logit"
                ]
                return jnp.max(jnp.stack(leaves))

            self._logit_health_fn = jax.jit(health)
        return float(jax.device_get(self._logit_health_fn(
            self.state["params"], self.state["batch_stats"],
            jnp.asarray(imgs_gray_patch))))

    # -- loop ---------------------------------------------------------------

    def train_and_evaluate(
        self,
        train_batches: Iterator,
        eval_loader=None,
        total_steps: Optional[int] = None,
        log_every: int = 100,
        fuse_steps: int = 1,
    ):
        """Training loop.  ``fuse_steps>1`` scans K optimizer steps per
        dispatch (chunks shrink at eval boundaries so the eval-every-N
        cadence of the reference is preserved exactly)."""
        cfg = self.config
        if self.state is None:
            self.init_state()
        total_steps = total_steps or cfg.num_epochs * self.steps_per_epoch
        step = int(jax.device_get(self.state["step"]))
        best_report = None
        while step < total_steps:
            to_boundary = min(
                total_steps - step,
                cfg.train_num_steps - step % cfg.train_num_steps,
            )
            k = min(fuse_steps, to_boundary)
            if k == 1:
                losses = self.train_step(next(train_batches))
            else:
                losses = self.train_steps([next(train_batches) for _ in range(k)])
                losses = {key: v[-1] for key, v in losses.items()}
            prev, step = step, step + k
            if step // log_every > prev // log_every:
                ls = {key: float(jax.device_get(v)) for key, v in losses.items()}
                self.logger.info(
                    f"step {step}/{total_steps} " +
                    " ".join(f"{key}:{v:.4f}" for key, v in ls.items())
                )
            if eval_loader is not None and step % cfg.train_num_steps == 0:
                report = self.evaluate(iter(eval_loader))
                is_best = self.metrics.is_best("val")
                self.save(tag="latest")
                if is_best:
                    best_report = report
                    self.save(tag="best")
        return best_report

    # -- checkpoints --------------------------------------------------------

    def save(self, root: Optional[str] = None, tag: str = "latest"):
        root = root or self.config.model_dir
        step = int(jax.device_get(self.state["step"]))
        host_state = jax.device_get(self.state)
        # best/latest live in separate subdirs, like model_latest.pth vs
        # val_model_best_*.pth (manager.py:128-200)
        return save_checkpoint(f"{root}/{tag}", step, host_state, keep=2)

    def load(self, root: Optional[str] = None, tag: str = "latest", step=None,
             weights_only: bool = False):
        """Restore a checkpoint.

        weights_only=True is the reference's `-ow` flow (manager.py:218-259
        / train.py --only_weights): take params + batch_stats from the
        checkpoint but keep THIS trainer's fresh optimizer state, step and
        epoch counters — the stage-2 schedule restarts the staircase LR
        from config.lr instead of inheriting stage-1's decayed tail."""
        root = root or self.config.model_dir
        if self.state is None:
            self.init_state()
        target = jax.device_get(self.state)
        restored = load_checkpoint(f"{root}/{tag}", step=step, target=target)
        if weights_only:
            restored = {
                **jax.device_get(self.state),
                "params": restored["params"],
                "batch_stats": restored.get("batch_stats", {}),
            }
        rep = replicated(self.mesh)
        self.state = jax.tree.map(lambda x: jax.device_put(x, rep), restored)
        return self.state

    def load_params(self, params, batch_stats=None):
        """Inject externally-imported weights (e.g. from HEM.pth)."""
        if self.state is None:
            self.init_state()
        rep = replicated(self.mesh)
        self.state["params"] = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), rep), params)
        if batch_stats is not None:
            self.state["batch_stats"] = jax.tree.map(
                lambda x: jax.device_put(jnp.asarray(x), rep), batch_stats
            )
