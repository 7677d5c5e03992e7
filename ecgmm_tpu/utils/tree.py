"""PyTree utilities: path-based partitioning for encoder freezing and
partial warm-start loading.

The reference freezes all three encoders and optimizes only the fusion /
classifier heads (`/root/reference/train.py:35-43`), and warm-starts
sub-modules while excluding specific leaves (image fc, signal classifier.4,
TabNet final_mapping — `/root/reference/multimodal.py:423-436,150-168,
471-499`). Here both are expressed as pure path-prefix partitions of a
Flax params PyTree, so the gradient is only ever computed for the trainable
partition (frozen encoders cost zero backward FLOPs).
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util


def flatten_path_dict(tree) -> Dict[str, jnp.ndarray]:
    """Flatten a nested params dict to {'a/b/c': leaf}."""
    flat = traverse_util.flatten_dict(tree)
    return {"/".join(map(str, k)): v for k, v in flat.items()}


def unflatten_path_dict(flat: Mapping[str, jnp.ndarray]):
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()}
    )


def partition_params(
    params, predicate: Callable[[str], bool]
) -> Tuple[dict, dict]:
    """Split params into (selected, rest) by a path predicate.

    Paths are '/'-joined key chains, e.g. 'image_encoder/conv1/kernel'.
    """
    flat = flatten_path_dict(params)
    sel = {k: v for k, v in flat.items() if predicate(k)}
    rest = {k: v for k, v in flat.items() if not predicate(k)}
    return unflatten_path_dict(sel), unflatten_path_dict(rest)


def merge_params(a, b):
    """Merge two disjoint params trees (inverse of partition_params)."""
    flat = dict(flatten_path_dict(a))
    for k, v in flatten_path_dict(b).items():
        if k in flat:
            raise ValueError(f"overlapping param path: {k}")
        flat[k] = v
    return unflatten_path_dict(flat)


def label_params(params, predicate: Callable[[str], bool],
                 true_label: str = "trainable",
                 false_label: str = "frozen"):
    """Produce an optax.multi_transform label tree from a path predicate."""
    flat = flatten_path_dict(params)
    labels = {k: (true_label if predicate(k) else false_label) for k in flat}
    return unflatten_path_dict(labels)


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
