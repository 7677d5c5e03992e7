"""XAI batch CLI: per-sample modality-contribution CSVs.

Mirrors the reference's explainability scripts' output contract
(`/root/reference/shap_fusion.py:90-110`,
`lime_fusion_modal_balance.py:156-181`): for every test sample, the
percentage contribution of each modality (Image_%/Signal_%/Clinical_%)
per class, written to ./output/{shap,lime}/<model>_*.csv — plus the
fusion attention-weight printout
(shap_fusion_modal_balance.py:202-217).

    python -m ecgmm_tpu.explain.run_xai --method shap --n-synth 64
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ecgmm_tpu.config import get_preset
from ecgmm_tpu.data.pipeline import normalize_images
from ecgmm_tpu.explain.lime_fusion import (
    lime_modality_contributions,
    lime_tabular,
)
from ecgmm_tpu.explain.shap_fusion import explain_fusion
from ecgmm_tpu.models import ECGMultimodalModel


from functools import partial


@partial(jax.jit, static_argnames=("model",))
def _encode_batch(model, variables, img, sig, clin):
    # module-level jit keyed on the hashable Flax module: repeated calls
    # (and both splits) reuse one compiled program instead of re-tracing
    # a fresh closure each time
    feats = model.apply(
        variables, normalize_images(img), sig, clin,
        method=type(model).encode,
    )
    return jnp.concatenate(feats[:3], axis=1)


def compute_embeddings(model, variables, arrays, batch_size: int = 32
                       ) -> np.ndarray:
    """Concatenated LayerNorm'd per-branch features for a split — the
    explanation surface (reference shap_fusion_modal_balance.py:53-93).

    batch_size 32, measured (round 5, 1,843-sample cohort on the
    relayed chip): the encode pass is HOST→DEVICE UPLOAD-bound
    (~280 MB of uint8 images ⇒ 52–62 s warm at batch 32 AND at batch
    256), so a bigger batch buys nothing warm — and the batch-256
    encode program cost a 834 s cold compile vs ~50 s total for the
    batch-32 first run. The ragged tail is padded, so one program
    serves every cohort size."""
    out = []
    for i in range(0, arrays.n, batch_size):
        sl = slice(i, i + batch_size)
        img = np.asarray(arrays.images[sl])
        sig = np.asarray(arrays.signals[sl])
        clin = np.asarray(arrays.clinical[sl])
        pad = batch_size - img.shape[0]
        if pad > 0:  # pad the ragged tail: no second odd-shape compile
            img, sig, clin = (
                np.concatenate([a, np.repeat(a[-1:], pad, 0)])
                for a in (img, sig, clin)
            )
        emb = np.asarray(_encode_batch(model, variables, img, sig, clin))
        out.append(emb[:batch_size - pad] if pad > 0 else emb)
    return np.concatenate(out)


def class_balanced_background(
    embeddings: np.ndarray, labels: np.ndarray, per_class: int = 50,
    seed: int = 0,
) -> np.ndarray:
    """≤50/50 per-class background set
    (shap_fusion_modal_balance.py:53-93)."""
    rng = np.random.default_rng(seed)
    picks = []
    for c in np.unique(labels):
        idx = np.where(labels == c)[0]
        rng.shuffle(idx)
        picks.append(idx[:per_class])
    return embeddings[np.concatenate(picks)]


def xai_report(
    model, variables, train_arrays, test_arrays, dims,
    method: str = "shap", out_dir: str = "./output", tag: str = "fusion",
    n_samples: int = 64,
) -> Dict[int, pd.DataFrame]:
    import time

    t0 = time.perf_counter()
    emb_train = compute_embeddings(model, variables, train_arrays)
    emb_test = compute_embeddings(model, variables, test_arrays)
    t_encode = time.perf_counter() - t0
    labels_train = np.asarray(train_arrays.labels)
    test_idx = test_arrays.indices

    t0 = time.perf_counter()
    frames: Dict[int, pd.DataFrame] = {}
    if method in ("shap", "deep_shap"):
        background = class_balanced_background(emb_train, labels_train)
        if method == "deep_shap":
            # shap.DeepExplainer flavor (reference shap_fusion.py:42-55)
            from ecgmm_tpu.explain.deep_shap import explain_fusion_deep

            per_class = explain_fusion_deep(
                model, variables, emb_test, background, dims,
            )
        else:
            per_class = explain_fusion(
                model, variables, emb_test, background, dims,
                n_samples=n_samples,
            )
        for c, contrib in per_class.items():
            frames[c] = pd.DataFrame({"index": test_idx, **contrib})
    elif method == "lime":
        std = jnp.asarray(emb_train.std(axis=0) + 1e-8, jnp.float32)
        d0, d1, d2 = dims

        def predict(e):
            logits = model.apply(
                variables, e[:, :d0], e[:, d0:d0 + d1], e[:, d0 + d1:],
                method=type(model).fuse_embeddings,
            )
            return jax.nn.softmax(logits, -1)

        for c in range(2):
            coefs = lime_tabular(
                predict, jnp.asarray(emb_test), std, class_idx=c,
                num_samples=1000,
            )
            contrib = lime_modality_contributions(np.asarray(coefs), dims)
            frames[c] = pd.DataFrame({"index": test_idx, **contrib})
    else:
        raise ValueError(method)
    t_attrib = time.perf_counter() - t0

    n_test = len(test_idx)
    print(
        f"xai[{method}]: encode {train_arrays.n + n_test} samples in "
        f"{t_encode:.2f}s, attribution over {n_test} test samples in "
        f"{t_attrib:.2f}s "
        f"({n_test / t_attrib:.1f} samples/s attrib, incl. compile)"
    )

    sub = os.path.join(out_dir, method)
    os.makedirs(sub, exist_ok=True)
    for c, df in frames.items():
        df.to_csv(
            os.path.join(sub, f"{tag}_{method}_fusion_class{c}.csv"),
            index=False,
        )

    # fusion attention-weight printout (reference :202-217)
    sw = np.asarray(jax.nn.softmax(
        variables["params"]["attention_fusion"]["weights"]
    ))
    print(
        f"attention weights: image={sw[0]:.4f} signal={sw[1]:.4f} "
        f"clinical={sw[2]:.4f}"
    )
    return frames


def gradcam_report(model, variables, arrays, out_dir: str,
                   n_samples: int = 8) -> list:
    """Grad-CAM overlays through the fusion image branch for the first
    n_samples test strips → PNGs under out_dir/gradcam (the artifact the
    reference ships images of but never the code for)."""
    from PIL import Image

    from ecgmm_tpu.explain.gradcam import (
        grad_cam_fusion_image,
        overlay_heatmap,
    )

    sub = os.path.join(out_dir, "gradcam")
    os.makedirs(sub, exist_ok=True)
    imgs_u8 = np.asarray(arrays.images[:n_samples])
    cam, logits = grad_cam_fusion_image(
        model, variables, normalize_images(jnp.asarray(imgs_u8)),
    )
    paths = []
    for i in range(imgs_u8.shape[0]):
        overlay = overlay_heatmap(imgs_u8[i], np.asarray(cam[i]))
        pred = int(np.argmax(np.asarray(logits[i])))
        path = os.path.join(
            sub, f"sample{arrays.indices[i]}_class{pred}.png"
        )
        Image.fromarray(overlay).save(path)
        paths.append(path)
    print(f"gradcam: wrote {len(paths)} overlays to {sub}")
    return paths


def tabnet_masks_report(model, variables, arrays, out_dir: str) -> list:
    """Per-step + aggregate TabNet mask heatmaps over the test split
    (reference multimodal.py:196-240 artifact set). Requires the
    canonical (TabNet-clinical) fusion variant."""
    from ecgmm_tpu.explain.tabnet_masks import save_mask_heatmaps

    enc = model.cfg  # canonical config guard
    if enc.clinical_encoder != "tabnet":
        raise ValueError("tabnet_masks needs the TabNet clinical variant")

    def masks_fn(m, x):
        return m.clinical_encoder(x, return_masks=True)

    _, _, m_explain, masks = model.apply(
        variables, jnp.asarray(arrays.clinical), method=masks_fn,
    )
    # the reference's 2-feature clinical schema gets its real names;
    # wider configs fall back to save_mask_heatmaps' var_i labels
    names = ("AGE", "Wt") if enc.clinical_in_features == 2 else None
    paths = save_mask_heatmaps(
        np.asarray(m_explain), [np.asarray(m) for m in masks],
        feature_names=names,
        save_dir=os.path.join(out_dir, "tabnet"),
    )
    print(f"tabnet_masks: wrote {len(paths)} heatmaps")
    return paths


def main(argv=None):
    from ecgmm_tpu.workloads.run import load_data

    p = argparse.ArgumentParser()
    p.add_argument(
        "--method",
        choices=["shap", "deep_shap", "lime", "gradcam", "tabnet_masks"],
        default="shap",
    )
    p.add_argument("--n-synth", type=int, default=64)
    p.add_argument("--out-dir", default="./output")
    p.add_argument("--repeat", type=int, default=1,
                   help="run the report N times in-process: the first "
                        "pays trace/compile, later passes time the warm "
                        "jitted programs (the steady-state number)")
    args = p.parse_args(argv)

    cfg = get_preset("fusion")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype="float32")
    )
    data = load_data(cfg, "synthetic", args.n_synth)
    model = ECGMultimodalModel(cfg=cfg.model)
    from ecgmm_tpu.models import jit_init

    variables = jit_init(
        model, jax.random.PRNGKey(0),
        jnp.ones((1, cfg.data.img_height, cfg.data.img_width, 3)),
        jnp.ones((1, cfg.data.signal_len)),
        jnp.ones((1, cfg.model.clinical_in_features)),
    )
    dims = (cfg.model.image_dim, cfg.model.signal_dim,
            cfg.model.clinical_dim)
    if args.method == "gradcam":
        gradcam_report(model, variables, data.test, args.out_dir)
    elif args.method == "tabnet_masks":
        tabnet_masks_report(model, variables, data.test, args.out_dir)
    else:
        for _ in range(max(1, args.repeat)):
            xai_report(
                model, variables, data.train, data.test, dims,
                method=args.method, out_dir=args.out_dir,
            )


if __name__ == "__main__":
    main()
