"""Torch-CPU floor cost of the reference's per-sample XAI loops.

The reference publishes no XAI throughput numbers, so — like
tools/torch_baseline.py for training — this mints one by re-executing
the COMPUTE-DOMINANT core of its explainability scripts on this host:

  * LIME (`/root/reference/lime_fusion_modal_balance.py:126-181`): per
    test sample, `explain_instance(num_samples=1000)` → generate 1000
    perturbations, one batched head forward, exponential kernel
    weights, one weighted ridge fit over all features. The serial
    per-sample Python loop is the reference's own structure.
  * gradient SHAP (`/root/reference/shap_fusion_modal_balance.py:
    139-200`): shap.GradientExplainer over the fusion head — per
    sample per class, `nsamples` background-interpolation points, each
    needing a head forward+backward, evaluated in the library's
    default chunks of 50.

This is a deliberate FLOOR (library bookkeeping, feature selection,
tqdm, and DataFrame writes are excluded), so the comparison in
BASELINE.md favors the reference. Run:

    python -m ecgmm_tpu.tools.xai_torch_baseline --n-test 205
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_head(dims=(512, 128, 32), n_cls: int = 2, seed: int = 0):
    """The attribution surface: attention fusion + MLP head over the
    concatenated 672-dim embedding (reference multimodal.py:389-415)."""
    import torch
    import torch.nn as tnn

    total = sum(dims)
    torch.manual_seed(seed)

    class Head(tnn.Module):
        def __init__(self):
            super().__init__()
            self.weights = tnn.Parameter(torch.ones(3))
            self.norm = tnn.LayerNorm(total)
            self.classifier = tnn.Sequential(
                tnn.Linear(total, 128), tnn.ReLU(), tnn.Dropout(0.3),
                tnn.Linear(128, n_cls),
            )

        def forward(self, e):
            sw = torch.softmax(self.weights, dim=0)
            d0, d1, _ = dims
            fused = torch.cat(
                [sw[0] * e[:, :d0], sw[1] * e[:, d0:d0 + d1],
                 sw[2] * e[:, d0 + d1:]], dim=1,
            )
            return self.classifier(self.norm(fused))

    return Head().eval(), total


def lime_floor(n_test: int, num_samples: int = 1000, seed: int = 0,
               dims=(512, 128, 32)) -> dict:
    import torch

    from sklearn.linear_model import Ridge

    head, total = build_head(dims)
    rng = np.random.default_rng(seed)
    test = rng.normal(size=(n_test, total)).astype(np.float32)
    std = test.std(axis=0) + 1e-8

    t0 = time.perf_counter()
    for i in range(n_test):
        pert = test[i] + rng.normal(size=(num_samples, total)
                                    ).astype(np.float32) * std
        pert[0] = test[i]
        with torch.no_grad():
            probs = torch.softmax(
                head(torch.from_numpy(pert)), dim=1
            ).numpy()
        dist = np.sqrt(((pert - test[i]) ** 2).sum(1))
        kernel = np.exp(-(dist ** 2) / (np.sqrt(total) * 0.75) ** 2)
        Ridge(alpha=1.0).fit(pert, probs[:, 1], sample_weight=kernel)
    wall = time.perf_counter() - t0
    return {
        "samples": n_test, "wall_s": round(wall, 2),
        "per_sample_ms": round(1000 * wall / n_test, 1),
        "samples_per_s": round(n_test / wall, 2),
    }


def shap_floor(n_test: int, nsamples: int = 200, chunk: int = 50,
               n_cls: int = 2, seed: int = 0,
               dims=(512, 128, 32)) -> dict:
    import torch

    head, total = build_head(dims)
    rng = np.random.default_rng(seed)
    test = rng.normal(size=(n_test, total)).astype(np.float32)
    background = rng.normal(size=(100, total)).astype(np.float32)

    t0 = time.perf_counter()
    for i in range(n_test):
        for c in range(n_cls):
            for s0 in range(0, nsamples, chunk):
                k = min(chunk, nsamples - s0)
                bg = background[rng.integers(0, len(background), k)]
                alpha = rng.random((k, 1)).astype(np.float32)
                pts = torch.from_numpy(
                    bg + alpha * (test[i] - bg)
                ).requires_grad_(True)
                out = head(pts)[:, c].sum()
                out.backward()
    wall = time.perf_counter() - t0
    return {
        "samples": n_test, "wall_s": round(wall, 2),
        "per_sample_ms": round(1000 * wall / n_test, 1),
        "samples_per_s": round(n_test / wall, 2),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-test", type=int, default=205)
    p.add_argument("--lime-samples", type=int, default=1000)
    p.add_argument("--shap-nsamples", type=int, default=200)
    args = p.parse_args(argv)

    out = {
        "lime_floor": lime_floor(args.n_test, args.lime_samples),
        "shap_floor": shap_floor(args.n_test, args.shap_nsamples),
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
