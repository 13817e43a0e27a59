"""Train state: AdamW + grad-clip + step LR, torch-parity parameter groups.

Capability parity with the reference optimization setup
(coocc_multi_r50_256x704.py:263-288 + mmcv DefaultOptimizerConstructor):
AdamW(lr 1e-4, wd 0.01, betas (0.9, 0.999), eps 1e-8), grad clip max_norm 5,
step LR x0.1 at epochs [20, 23], and norm_decay_mult=0 — no weight decay on
normalization params or biases.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..config.base import OptimConfig


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def _no_decay_mask(params) -> Any:
    """True where weight decay applies: exclude biases and norm scales.

    Norm params in this codebase live under modules named bn/gn/norm*/
    *_bn/batch_stats-adjacent scopes and have ndim <= 1; torch's
    norm_decay_mult=0 + mmcv's bias handling reduce to: decay only
    parameters with ndim >= 2.
    """
    return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)


def step_lr_schedule(cfg: OptimConfig, steps_per_epoch: int):
    boundaries = {int(e * steps_per_epoch): cfg.lr_step_gamma
                  for e in cfg.lr_step_epochs}
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int, params):
    sched = step_lr_schedule(cfg, steps_per_epoch)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(
            learning_rate=sched,
            b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            mask=_no_decay_mask(params),
        ),
    )
    return tx, sched


def create_train_state(model, variables, optim_cfg: OptimConfig,
                       steps_per_epoch: int) -> TrainState:
    params = variables["params"]
    tx, _ = make_optimizer(optim_cfg, steps_per_epoch, params)
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx,
        batch_stats=variables.get("batch_stats"),
    )
