"""Train state: params + batch stats + optimizer state + step counter."""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from conformer_tpu.config import OptimConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @staticmethod
    def create(params: Any, batch_stats: Any, tx: optax.GradientTransformation
               ) -> "TrainState":
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=batch_stats, opt_state=tx.init(params))


def make_optimizer(cfg: OptimConfig,
                   steps_per_epoch: Optional[int] = None
                   ) -> optax.GradientTransformation:
    """Adam + exponential LR decay.

    Mirrors the reference optimizer (reference: train.py:188-189: Adam lr=2e-5,
    ExponentialLR gamma=0.9999 stepped per epoch, train.py:251). When
    ``lr_decay_every_steps == 0`` the decay interval is `steps_per_epoch`
    (reference semantics); otherwise decay fires every N steps. Optional
    linear warmup and global-norm clipping are additive capabilities.
    """
    interval = cfg.lr_decay_every_steps or (steps_per_epoch or 1000)
    schedule = optax.exponential_decay(
        init_value=cfg.learning_rate,
        transition_steps=interval,
        decay_rate=cfg.lr_decay_gamma,
        staircase=True,
    )
    if cfg.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
        schedule = optax.join_schedules([warmup, schedule], [cfg.warmup_steps])

    chain = []
    if cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay > 0:
        chain.append(optax.adamw(schedule, b1=cfg.beta1, b2=cfg.beta2,
                                 eps=cfg.eps, weight_decay=cfg.weight_decay))
    else:
        chain.append(optax.adam(schedule, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps))
    return optax.chain(*chain)


def lr_at_step(cfg: OptimConfig, step: int, steps_per_epoch: Optional[int] = None) -> float:
    interval = cfg.lr_decay_every_steps or (steps_per_epoch or 1000)
    if cfg.warmup_steps > 0 and step < cfg.warmup_steps:
        return cfg.learning_rate * step / cfg.warmup_steps
    return cfg.learning_rate * cfg.lr_decay_gamma ** ((step - 0) // interval)


def param_count(params: Any) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
