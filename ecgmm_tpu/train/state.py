"""Train state: the complete, checkpointable training status.

Unlike the reference (which persists only model weights, losing optimizer
state and loop counters on crash — `/root/reference/train.py:142`), the
full state here — trainable/frozen param partitions, BatchNorm statistics,
optimizer state, PRNG key, step/epoch counters, best-val-loss and
plateau/early-stop counters — is one PyTree, saved atomically by orbax and
restored for exact resume.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ecgmm_tpu.utils.tree import merge_params, partition_params


@struct.dataclass
class TrainState:
    step: jnp.ndarray                       # global step
    trainable: Any                          # params receiving gradients
    frozen: Any                             # params excluded from grads
    model_state: Any                        # batch_stats etc. (mutable)
    opt_state: Any
    rng: jax.Array
    # host-loop counters (device scalars so they checkpoint with the tree)
    epoch: jnp.ndarray
    best_val_loss: jnp.ndarray
    early_stop_counter: jnp.ndarray
    lr_reduce_counter: jnp.ndarray

    @property
    def params(self):
        """Full parameter tree (trainable ∪ frozen)."""
        if not self.frozen:
            return self.trainable
        return merge_params(self.trainable, self.frozen)


def create_state(
    variables: Dict,
    tx,
    rng: jax.Array,
    freeze_predicate: Optional[Callable[[str], bool]] = None,
) -> TrainState:
    """Build a TrainState from freshly-initialised (or warm-started) Flax
    variables. freeze_predicate selects FROZEN paths (e.g. the three
    encoder prefixes, reference train.py:35-40)."""
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    if freeze_predicate is not None:
        frozen, trainable = partition_params(params, freeze_predicate)
    else:
        trainable, frozen = params, {}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        frozen=frozen,
        model_state=model_state,
        opt_state=tx.init(trainable),
        rng=rng,
        epoch=jnp.zeros((), jnp.int32),
        best_val_loss=jnp.asarray(jnp.inf, jnp.float32),
        early_stop_counter=jnp.zeros((), jnp.int32),
        lr_reduce_counter=jnp.zeros((), jnp.int32),
    )


ENCODER_PREFIXES = ("image_encoder", "signal_encoder", "clinical_encoder")


def encoder_freeze_predicate(path: str) -> bool:
    """Freeze all three modality encoders (reference train.py:35-40)."""
    return path.startswith(ENCODER_PREFIXES)
