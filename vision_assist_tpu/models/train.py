"""Training: state, schedules, the jitted train step, and the epoch driver.

TPU-native counterpart of the reference's ultralytics training entry point
(model/train.py:12-13, hyperparameters from model/runs/segment/train11/
args.yaml): SGD (nesterov, momentum 0.937) with weight decay 5e-4 on conv
kernels only, linear warmup (3 epochs) then linear decay lr0=0.01 -> lrf*lr0,
EMA 0.9999 with ramp, bf16 forward / f32 params. The step jits once over
fixed-shape batches and runs data-parallel over the mesh's 'dp' axis
(parallel/mesh.py) — gradients are reduced by XLA-inserted psums over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from vision_assist_tpu.models.losses import LossConfig, yolo_seg_loss
from vision_assist_tpu.models.yolo import YoloSeg


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 100
    batch_size: int = 16
    imgsz: int = 640
    lr0: float = 0.01
    lrf: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 5e-4
    warmup_epochs: float = 3.0
    ema_decay: float = 0.9999
    ema_ramp: float = 2000.0
    # Host->device batch image format: "bgr" ships (B, S, S, 3) uint8;
    # "i420" ships the packed (B, S*3/2, S) YUV 4:2:0 plane (2.13x fewer
    # wire bytes AND 2.13x less relay-client leak per step — the wire is
    # the epoch bottleneck on this box, PERFORMANCE.md "Round 3b") and
    # converts on-device exactly like the serving path (ops/yuv.py).
    wire_format: str = "bgr"


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats, ema_decay):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = jax.tree.map(
            lambda e, p: e + (1.0 - ema_decay) * (p - e),
            self.ema_params, new_params)
        return self.replace(step=self.step + 1, params=new_params,
                            batch_stats=new_batch_stats, opt_state=new_opt,
                            ema_params=new_ema)


def lr_schedule(cfg: TrainConfig, steps_per_epoch: int) -> Callable:
    total = cfg.epochs * steps_per_epoch
    warmup = int(cfg.warmup_epochs * steps_per_epoch)

    def sched(step):
        warm = cfg.lr0 * jnp.minimum(step / jnp.maximum(warmup, 1), 1.0)
        frac = jnp.clip((step - warmup) / jnp.maximum(total - warmup, 1), 0, 1)
        decay = cfg.lr0 * ((1 - frac) + frac * cfg.lrf)
        return jnp.where(step < warmup, warm, decay)

    return sched


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int
                   ) -> optax.GradientTransformation:
    def decay_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: path[-1].key == "kernel", params)

    def zero_nonfinite() -> optax.GradientTransformation:
        # Safety net: a single pathological batch must not poison the run.
        # optax.zero_nans only catches NaN; an INF grad would survive it,
        # make the global norm inf, and turn clip's scale (10/inf -> 0)
        # into inf*0 = NaN updates — permanent param poisoning.
        def update(updates, s, params=None):
            del params
            return jax.tree.map(
                lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)),
                updates), s
        return optax.GradientTransformation(lambda p: optax.EmptyState(),
                                            update)

    return optax.chain(
        zero_nonfinite(),
        # ultralytics clips the global grad norm at 10 before stepping;
        # without it bf16 from-scratch training explodes to NaN in epoch 1.
        optax.clip_by_global_norm(10.0),
        optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask),
        optax.sgd(lr_schedule(cfg, steps_per_epoch),
                  momentum=cfg.momentum, nesterov=True),
    )


def create_train_state(model: YoloSeg, rng: jax.Array, cfg: TrainConfig,
                       steps_per_epoch: int) -> TrainState:
    variables = model.init(
        rng, jnp.zeros((1, cfg.imgsz, cfg.imgsz, 3), jnp.float32), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, steps_per_epoch)
    # EMA starts equal to params but must NOT alias the same buffers —
    # donated aliased arguments break multi-device execution.
    ema = jax.tree.map(jnp.copy, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats=batch_stats,
        opt_state=tx.init(params), ema_params=ema, tx=tx)


def make_train_step(model: YoloSeg, loss_cfg: LossConfig, cfg: TrainConfig):
    """Returns the jitted train step (state, batch) -> (state, metrics)."""

    def step_fn(state: TrainState, batch):
        images = batch["images"]
        if cfg.wire_format == "i420":
            from vision_assist_tpu.ops.yuv import i420_to_bgr

            images = jax.vmap(
                lambda p: i420_to_bgr(p, cfg.imgsz, cfg.imgsz))(images)
        images = images.astype(jnp.float32) / 255.0
        if "hsv_gains" in batch:
            # Device-side photometric augmentation (data/augment_device.py):
            # the loader ships BGR uint8 + per-image HSV gains; channel
            # reorder + jitter fuse into the input normalisation here,
            # keeping the single-core host loader geometry-only.
            from vision_assist_tpu.data.augment_device import hsv_jitter_rgb

            images = hsv_jitter_rgb(images[..., ::-1], batch["hsv_gains"])

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            loss, metrics = yolo_seg_loss(out, batch, loss_cfg, cfg.imgsz)
            return loss, (mut["batch_stats"], metrics)

        (loss, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # ultralytics EMA ramp: d = decay * (1 - exp(-step / tau)).
        ramp = 1.0 - jnp.exp(-state.step.astype(jnp.float32) / cfg.ema_ramp)
        decay = cfg.ema_decay * ramp
        new_state = state.apply_gradients(grads, new_bs, decay)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))
