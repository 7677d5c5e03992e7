"""Test-time evaluation protocol: the reference ends every trainer with a
test pass over best.pth AND last.pth reporting Accuracy / F1 / AUROC, a
classification report, a confusion-matrix PNG and a ROC-curve PNG into
./output/<ts>/ (`/root/reference/train.py:174-336`). Same artifacts here,
plus optional F1-maximising threshold search
(`train_signal_only.py:333-334`)."""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ecgmm_tpu.train import metrics as M


def _save_confusion_png(cm: np.ndarray, path: str, class_names):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(4, 4))
    ax.imshow(cm, cmap="Blues")
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            ax.text(j, i, str(cm[i, j]), ha="center", va="center")
    ax.set_xticks(range(len(class_names)), class_names)
    ax.set_yticks(range(len(class_names)), class_names)
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def _save_roc_png(labels: np.ndarray, scores: np.ndarray, path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    order = np.argsort(-scores)
    y = labels[order]
    tps = np.cumsum(y)
    fps = np.cumsum(1 - y)
    tpr = tps / max(tps[-1], 1)
    fpr = fps / max(fps[-1], 1)
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.plot(fpr, tpr)
    ax.plot([0, 1], [0, 1], "--", color="gray")
    ax.set_xlabel("FPR")
    ax.set_ylabel("TPR")
    ax.set_title("ROC")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def test_report(
    logits: np.ndarray,
    labels: np.ndarray,
    output_dir: Optional[str] = None,
    tag: str = "best",
    class_names=("Normal", "Abnormal"),
    threshold_search: bool = False,
) -> Dict[str, float]:
    """Metrics bundle + artifacts for one checkpoint's test pass."""
    num_classes = logits.shape[-1]
    probs = np.asarray(jnp.asarray(logits) - jnp.max(jnp.asarray(logits), -1, keepdims=True))
    probs = np.exp(probs)
    probs = probs / probs.sum(-1, keepdims=True)

    out: Dict[str, float] = {}
    if num_classes == 2:
        scores = probs[:, 1]
        threshold = 0.5
        if threshold_search:
            threshold, _ = M.find_best_threshold(labels, scores)
            out["threshold"] = threshold
        out.update(M.summarize_binary(scores, labels, threshold))
        preds = (scores >= threshold).astype(np.int32)
    else:
        preds = probs.argmax(-1)
        out["accuracy"] = float((preds == labels).mean())
        out["f1_macro"] = float(
            M.macro_f1(jnp.asarray(preds), jnp.asarray(labels), num_classes)
        )
        out["auroc_ovr"] = float(
            M.auroc_ovr_macro(jnp.asarray(probs), jnp.asarray(labels),
                              num_classes)
        )

    names = list(class_names)[:num_classes]
    names += [f"class{i}" for i in range(len(names), num_classes)]
    report_txt = M.classification_report(preds, labels, num_classes, names)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        cm = M.confusion_matrix(preds, labels, num_classes)
        _save_confusion_png(
            cm, os.path.join(output_dir, f"confusion_{tag}.png"), names
        )
        if num_classes == 2:
            _save_roc_png(
                labels, probs[:, 1],
                os.path.join(output_dir, f"roc_{tag}.png"),
            )
        with open(os.path.join(output_dir, f"report_{tag}.txt"), "w") as f:
            f.write(report_txt + "\n\n" + json.dumps(out, indent=2))
    return out
