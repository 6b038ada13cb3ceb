"""LR schedules as pure step->lr callables (jit-traceable).

Equivalent set to reference ``src/open_clip_train/scheduler.py``: warmup + cosine,
warmup + const, warmup + const + polynomial cooldown. Unlike the reference's
optimizer-mutating closures, these are pure functions fed to optax via
``inject_hyperparams`` — no tensorized-LR workaround needed for compiled steps.
"""

from __future__ import annotations

import jax.numpy as jnp


def _warmup(step, base_lr, warmup_length):
    return base_lr * (step + 1) / jnp.maximum(warmup_length, 1)


def const_lr(base_lr: float, warmup_length: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(step < warmup_length, _warmup(step, base_lr, warmup_length), base_lr)

    return schedule


def cosine_lr(base_lr: float, warmup_length: int, steps: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        e = step - warmup_length
        es = max(steps - warmup_length, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * jnp.clip(e / es, 0.0, 1.0))) * base_lr
        return jnp.where(step < warmup_length, _warmup(step, base_lr, warmup_length), cos)

    return schedule


def const_lr_cooldown(
    base_lr: float,
    warmup_length: int,
    steps: int,
    cooldown_steps: int,
    cooldown_power: float = 1.0,
    cooldown_end_lr: float = 0.0,
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        start_cooldown = steps - cooldown_steps
        frac = jnp.clip((step - start_cooldown) / jnp.maximum(cooldown_steps, 1), 0.0, 1.0)
        decay = (1 - frac) ** cooldown_power
        cooled = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        lr = jnp.where(step < start_cooldown, base_lr, cooled)
        return jnp.where(step < warmup_length, _warmup(step, base_lr, warmup_length), lr)

    return schedule


def create_scheduler(name: str, base_lr: float, warmup: int, total_steps: int, **kw):
    if name == "cosine":
        return cosine_lr(base_lr, warmup, total_steps)
    if name == "const":
        return const_lr(base_lr, warmup)
    if name == "const-cooldown":
        return const_lr_cooldown(base_lr, warmup, total_steps, **kw)
    raise ValueError(f"unknown scheduler {name!r}")
