"""Grad-CAM on jax.grad.

The reference repo ships Grad-CAM *artifacts* (gpt/normal_gradcam.png,
gpt/abnormal_gradcam_15_overlay.png) consumed by the GPT report layer and
the mobile app heatmap toggle, but contains no generation code anywhere
(SURVEY.md §0) — the serving backend that produced them is missing. This
module is that missing piece, implemented natively:

  class-score gradients w.r.t. the last conv feature map → GAP over
  space/time → channel weights → ReLU-weighted sum → normalised CAM →
  resized to input resolution.

Works for both the ResNet18 image branch (2-D CAM) and the ResNet1D-SE
signal branch (1-D CAM over time).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cam_from_feats(feats: jnp.ndarray, grads: jnp.ndarray,
                    spatial_axes: Tuple[int, ...]) -> jnp.ndarray:
    weights = jnp.mean(grads, axis=spatial_axes, keepdims=True)
    cam = jax.nn.relu(jnp.sum(weights * feats, axis=-1))
    lo = jnp.min(cam, axis=tuple(range(1, cam.ndim)), keepdims=True)
    hi = jnp.max(cam, axis=tuple(range(1, cam.ndim)), keepdims=True)
    return (cam - lo) / jnp.maximum(hi - lo, 1e-8)


def _head_score(variables, head_name: str, pooled: jnp.ndarray,
                class_idx: jnp.ndarray) -> jnp.ndarray:
    p = variables["params"][head_name]
    s = pooled @ p["kernel"] + p["bias"]
    return jnp.sum(s[jnp.arange(s.shape[0]), class_idx])


def grad_cam_image(
    model, variables, images: jnp.ndarray,
    class_idx: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CAM over a ResNet18 classifier. images: (B, H, W, 3) normalised.
    Returns (cam[B, H, W] in [0,1], logits[B, C])."""
    logits, feats = model.apply(variables, images, return_features=True)
    if class_idx is None:
        class_idx = jnp.argmax(logits, axis=-1)

    def score(f):
        return _head_score(variables, "fc", jnp.mean(f, axis=(1, 2)),
                           class_idx)

    grads = jax.grad(score)(feats)
    cam = _cam_from_feats(feats, grads, spatial_axes=(1, 2))
    cam = jax.image.resize(
        cam, (cam.shape[0], images.shape[1], images.shape[2]), "bilinear"
    )
    return cam, logits


def grad_cam_signal(
    model, variables, signals: jnp.ndarray,
    class_idx: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1-D CAM over a ResNet1D-SE classifier. signals: (B, T) or (B, T, C).
    Returns (cam[B, T] in [0,1], logits[B, C]). The head is GAP → Dense
    64 → ReLU → Dense out; the CAM differentiates the full head so
    ReLU-path saliency is preserved."""
    if signals.ndim == 2:
        signals = signals[..., None]
    logits, feats = model.apply(variables, signals, return_features=True)
    if class_idx is None:
        class_idx = jnp.argmax(logits, axis=-1)

    def score(f):
        pooled = jnp.mean(f, axis=1)
        p = variables["params"]
        h = jax.nn.relu(
            pooled @ p["head_dense"]["kernel"] + p["head_dense"]["bias"]
        )
        s = h @ p["head_out"]["kernel"] + p["head_out"]["bias"]
        return jnp.sum(s[jnp.arange(s.shape[0]), class_idx])

    grads = jax.grad(score)(feats)
    cam = _cam_from_feats(feats, grads, spatial_axes=(1,))
    cam = jax.image.resize(
        cam, (cam.shape[0], signals.shape[1]), "linear"
    )
    return cam, logits


def grad_cam_fusion_image(
    model, variables, images: jnp.ndarray,
    class_idx: Optional[jnp.ndarray] = None,
    resize_to_input: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CAM through the fusion model's image branch: class score =
    image_classifier(image_norm(fc(GAP(featmap)))) differentiated w.r.t.
    the last conv feature map. images: (B, H, W, 3) normalised.

    resize_to_input=False returns the feature-map-native CAM (e.g. 7×7
    for 224² inputs) — serving upsamples once on the host straight to the
    original strip resolution instead of interpolating twice, and only
    the tiny native map crosses the device link."""
    logits_emb, feats = model.apply(
        variables, images,
        method=lambda m, img: m.image_encoder(img, return_features=True),
    )
    p = variables["params"]

    def branch_logits(f):
        pooled = jnp.mean(f, axis=(1, 2))
        fc = p["image_encoder"]["fc"]
        emb = pooled @ fc["kernel"] + fc["bias"]
        mu = jnp.mean(emb, -1, keepdims=True)
        var = jnp.var(emb, -1, keepdims=True)
        ln = p["image_norm"]
        emb = (emb - mu) / jnp.sqrt(var + 1e-5) * ln["scale"] + ln["bias"]
        cls = p["image_classifier"]
        return emb @ cls["kernel"] + cls["bias"]

    logits = branch_logits(feats)
    if class_idx is None:
        class_idx = jnp.argmax(logits, axis=-1)

    def score(f):
        s = branch_logits(f)
        return jnp.sum(s[jnp.arange(s.shape[0]), class_idx])

    grads = jax.grad(score)(feats)
    cam = _cam_from_feats(feats, grads, spatial_axes=(1, 2))
    if resize_to_input:
        cam = jax.image.resize(
            cam, (cam.shape[0], images.shape[1], images.shape[2]),
            "bilinear",
        )
    return cam, logits


_JET_LUT = None


def _jet_lut() -> np.ndarray:
    """256-entry jet RGB LUT. Indexing a LUT is ~6× faster than calling
    matplotlib's generic colormap on a full-resolution strip (measured
    47 ms → ~7 ms on 250×2500), and the serving path renders one overlay
    per request."""
    global _JET_LUT
    if _JET_LUT is None:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import colormaps

        _JET_LUT = (
            colormaps["jet"](np.linspace(0.0, 1.0, 256))[:, :3] * 255
        ).astype(np.uint8)
    return _JET_LUT


def overlay_heatmap(
    image_u8: np.ndarray, cam: np.ndarray, alpha: float = 0.4
) -> np.ndarray:
    """Blend a jet-colormapped CAM over an RGB uint8 image — the artifact
    format the GPT layer and mobile app consume
    (gpt/abnormal_gradcam_15_overlay.png; ResultScreen.tsx heatmap)."""
    idx = np.clip(np.asarray(cam) * 255.0, 0, 255).astype(np.uint8)
    heat = _jet_lut()[idx]
    return (
        (1 - alpha) * image_u8.astype(np.float32)
        + alpha * heat.astype(np.float32)
    ).astype(np.uint8)
