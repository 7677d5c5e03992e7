"""TabNet attention-mask explainability.

The reference visualises per-step TabNet masks and the aggregate mask as
seaborn heatmaps (`/root/reference/multimodal.py:170-240`). Our native
TabNetEncoder exposes the masks directly (return_masks=True); this module
renders the same artifacts.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def tabnet_masks(model, variables, x: jnp.ndarray
                 ) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Returns (M_explain[B, D], [per-step mask[B, D]])."""
    _, _, m_explain, masks = model.apply(variables, x, return_masks=True)
    return np.asarray(m_explain), [np.asarray(m) for m in masks]


def save_mask_heatmaps(
    m_explain: np.ndarray,
    masks: Sequence[np.ndarray],
    feature_names: Optional[Sequence[str]] = None,
    save_dir: str = "./output/tabnet",
    base_filename: str = "mask",
) -> List[str]:
    """Step masks M[i] + aggregate M_agg heatmaps (means over batch), the
    reference's PNG artifact set (multimodal.py:196-240)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(save_dir, exist_ok=True)
    d = m_explain.shape[1]
    names = list(feature_names or (f"var_{i}" for i in range(d)))
    paths = []

    def heat(row: np.ndarray, title: str, path: str):
        fig, ax = plt.subplots(figsize=(max(6, d * 0.5), 1.4))
        im = ax.imshow(row.reshape(1, -1), cmap="viridis", aspect="auto")
        ax.set_xticks(range(d), names, rotation=90, fontsize=6)
        ax.set_yticks([])
        ax.set_title(title)
        fig.colorbar(im, ax=ax)
        fig.tight_layout()
        fig.savefig(path)
        plt.close(fig)
        paths.append(path)

    for i, m in enumerate(masks):
        heat(
            m.mean(0), f"Step Mask M[{i + 1}] (mean over batch)",
            os.path.join(save_dir, f"{base_filename}_M[{i + 1}].png"),
        )
    heat(
        np.mean([m.mean(0) for m in masks], axis=0),
        "Aggregate Mask M_agg (mean over batch)",
        os.path.join(save_dir, f"{base_filename}_M_agg.png"),
    )
    return paths
