"""Fine-tuning harness (the reference ships none; InkLayer's detector was
fine-tuned offline).  Supports SAM-style box-prompted mask fine-tuning with
focal+dice loss, sharded dp/fsdp/tp over a mesh — the multi-chip training
path exercised by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from inklayer_tpu.parallel.sharding import batch_sharding, param_sharding_rules


def focal_loss(logits: jax.Array, targets: jax.Array, alpha: float = 0.25,
               gamma: float = 2.0) -> jax.Array:
    """Sigmoid focal loss (SAM's mask loss component), mean over pixels."""
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return jnp.mean(a_t * ((1 - p_t) ** gamma) * ce)


def dice_loss(logits: jax.Array, targets: jax.Array, eps: float = 1.0) -> jax.Array:
    p = jax.nn.sigmoid(logits)
    num = 2 * jnp.sum(p * targets, axis=(-2, -1)) + eps
    den = jnp.sum(p, axis=(-2, -1)) + jnp.sum(targets, axis=(-2, -1)) + eps
    return jnp.mean(1 - num / den)


def sam_mask_loss(logits, iou_pred, target_masks):
    """20:1 focal:dice + IoU-prediction MSE (SAM recipe)."""
    t = target_masks.astype(jnp.float32)
    fl = focal_loss(logits, t)
    dl = dice_loss(logits, t)
    pred_bin = logits > 0
    inter = jnp.sum(pred_bin * t, axis=(-2, -1))
    union = jnp.sum(pred_bin + t - pred_bin * t, axis=(-2, -1))
    true_iou = inter / jnp.maximum(union, 1.0)
    iou_l = jnp.mean((iou_pred.reshape(true_iou.shape) - true_iou) ** 2)
    return 20.0 * fl + dl + iou_l


class Trainer:
    """pjit'd train step over a (dp, fsdp, tp) mesh.

    loss_fn(params, batch) -> scalar; params sharded by the path rules,
    batch leaves sharded over dp on axis 0, grads/opt state co-sharded.
    """

    def __init__(self, loss_fn: Callable, params, mesh: Mesh,
                 optimizer: Optional[optax.GradientTransformation] = None):
        self.mesh = mesh
        self.optimizer = optimizer or optax.adamw(1e-5)
        self.param_shardings = param_sharding_rules(params, mesh)
        self.params = jax.tree.map(jax.device_put, params, self.param_shardings)
        self.opt_state = self.optimizer.init(self.params)
        self.loss_fn = loss_fn

        dp = batch_sharding(mesh)

        @functools.partial(
            jax.jit,
            in_shardings=(self.param_shardings, None, dp),
            out_shardings=(self.param_shardings, None, None),
            donate_argnums=(0, 1),
        )
        def step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(self.loss_fn)(params, batch)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = step

    def train_step(self, batch) -> float:
        # trace with the Pallas kernels disabled: they have no VJPs, so the
        # differentiated forward must take the XLA paths (runtime.py); the
        # flag is read at trace time, so warm steps pay nothing
        from inklayer_tpu.runtime import disable_pallas

        with disable_pallas():
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, batch)
        return loss


def silog_loss(pred_depth, target_depth, valid_mask, lam: float = 0.5,
               eps: float = 1e-6):
    """Scale-invariant log loss (the reference's unused metric-depth trainer
    recipe, Depth_Anything_V2/metric_depth/train.py) for depth fine-tuning."""
    import jax.numpy as jnp

    d = jnp.log(pred_depth + eps) - jnp.log(target_depth + eps)
    m = valid_mask.astype(jnp.float32)
    n = jnp.maximum(m.sum(), 1.0)
    mean_sq = (d * d * m).sum() / n
    mean = (d * m).sum() / n
    return jnp.sqrt(jnp.maximum(mean_sq - lam * mean * mean, 1e-12))
