"""Optimizer construction.

Mirrors the reference's effective optimizers: Adam at a constant LR with
host-driven ÷10 plateau decay (`/root/reference/train.py:43,157-163`), or
Adam + OneCycle for the signal trainers
(`/root/reference/train_signal_only.py:234-238`). The learning rate is an
injected hyperparameter (a device scalar in the optimizer state), so the
plateau decay is a pure functional state update — no recompilation.
"""

from __future__ import annotations

from typing import Optional

import optax

from ecgmm_tpu.config import TrainConfig


def make_optimizer(cfg: TrainConfig, steps_per_epoch: Optional[int] = None
                   ) -> optax.GradientTransformation:
    if cfg.schedule == "onecycle":
        if not steps_per_epoch:
            raise ValueError("onecycle needs steps_per_epoch")
        # torch OneCycleLR defaults (cos anneal, pct_start .3, div 25,
        # final_div 1e4) == optax.cosine_onecycle_schedule defaults.
        # optax returns NaN when the warmup interval rounds to zero width
        # (int(0.3·steps) == 0), so very short runs clamp to ≥4 steps.
        sched = optax.cosine_onecycle_schedule(
            transition_steps=max(steps_per_epoch * cfg.num_epochs, 4),
            peak_value=cfg.onecycle_peak_lr,
        )
        tx = optax.adam(learning_rate=sched)
    elif cfg.schedule == "constant":
        tx = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
    else:
        raise ValueError(f"unknown schedule {cfg.schedule!r}")
    if cfg.weight_decay:
        tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    return tx


def get_lr(opt_state) -> Optional[float]:
    """Current injected learning rate, if the optimizer exposes one.

    Traverses optax.chain tuple states (e.g. the weight_decay wrapper in
    make_optimizer) so plateau decay/LR logging keep working for any
    composition around the inject_hyperparams core."""
    hp = getattr(opt_state, "hyperparams", None)
    if hp and "learning_rate" in hp:
        return float(hp["learning_rate"])
    if isinstance(opt_state, tuple):
        for s in opt_state:
            if isinstance(s, tuple):
                lr = get_lr(s)
                if lr is not None:
                    return lr
    return None


def scale_lr(opt_state, factor: float):
    """LR ← LR × factor (the reference's ÷10-after-2-stale-epochs decay).
    Traverses chain tuples like get_lr; a no-op when no injected LR
    exists (callers gate on get_lr(...) is not None)."""
    hp = getattr(opt_state, "hyperparams", None)
    if hp is not None and "learning_rate" in hp:
        hp = dict(hp)
        hp["learning_rate"] = hp["learning_rate"] * factor
        return opt_state._replace(hyperparams=hp)
    if isinstance(opt_state, tuple):
        # recurse into BOTH plain chain tuples and namedtuple wrapper
        # states (optax.masked, MultiSteps, …) — get_lr descends into
        # them, so scale_lr must too or decay becomes a silent no-op
        new = [
            scale_lr(s, factor) if isinstance(s, tuple) else s
            for s in opt_state
        ]
        if hasattr(opt_state, "_fields"):
            return type(opt_state)(*new)
        return tuple(new)
    return opt_state
