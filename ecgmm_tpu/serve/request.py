"""Host side of one serving request: everything before and after the
single packed device dispatch that ServingPipeline.predict owns.

`prepare_inputs` turns the uploaded strip photo + questionnaire into
model-ready arrays exactly the way training does (digitize →
train-identical filtering → model-resolution resize → scaler-transformed
clinical vector); `assemble_response` turns the dispatch outputs into
the ResultScreen response contract
(`Groove/app/(tabs)/ResultScreen.tsx:26-56`): heatmap overlay encode,
modality/feature importance split, rule-based clinical report. Both are
pure host work (numpy/PIL/native C++) — no jit programs here."""

from __future__ import annotations

import base64
import io
from typing import Dict, Tuple

import jax
import numpy as np

from ecgmm_tpu.explain.gradcam import _jet_lut, overlay_heatmap
from ecgmm_tpu.explain.shap_fusion import modality_contributions
from ecgmm_tpu.serve import digitize as digitize_mod
from ecgmm_tpu.serve.report import rule_based_report
from ecgmm_tpu.serve.wire import BadRequest, _sex_from_questionnaire


def _native_heatmap():
    """The native overlay/PNG kernels (ecgmm_tpu/native/heatmap.cpp), or
    None — the PIL/numpy path below remains the fallback. The C++ render
    fuses the CAM bilinear upsample with the jet blend (bit-identical to
    the fallback, tests/test_native_heatmap.py) and encodes the PNG with
    band-parallel deflate, all with the GIL released, so concurrent
    requests stop serializing on the heatmap the way they used to on the
    digitizer. `ECGMM_NO_NATIVE_HEATMAP=1` forces the PIL path."""
    try:
        from ecgmm_tpu import native

        return native.maybe("ECGMM_NO_NATIVE_HEATMAP", need="heatmap")
    except Exception:
        return None


def prepare_inputs(pipe, image_u8: np.ndarray, questionnaire: Dict
                   ) -> Tuple:
    """Digitize + preprocess one request into model-ready arrays.

    Returns (img_norm, sig, clin, mv, dig_info, age, image_u8) where
    image_u8 is the located strip CROP when the digitizer found one —
    the image branch must see the strip, not the table it was
    photographed on, and the Grad-CAM overlay renders on the same crop
    (the client displays heatmap over waveform, i.e. over the strip)."""
    # 1. digitize the uploaded strip into a voltage series (the
    # metadata dict — scale source, grid pitch, crop, ink coverage
    # — is forwarded to the client under "digitization" so it can
    # warn when the photo had no calibrating grid)
    mv, dig_info = digitize_mod.digitize_lead2_info(
        image_u8, target_len=pipe.signal_len
    )
    if dig_info["crop"] is not None:
        y0, y1, x0, x1 = dig_info["crop"]
        image_u8 = image_u8[y0:y1, x0:x1]

    # 2. preprocess signal the training way — literally the same
    # helper the offline materialisation uses (native C++ when
    # available, JAX fallback), so serve-time inputs can't skew from
    # train-time preprocessing
    from ecgmm_tpu.data.pipeline import filter_signals_host

    sig = mv[None, :]
    if pipe.ecg_scaler is not None:
        sig = np.asarray(pipe.ecg_scaler.transform(sig))
    with jax.default_device(jax.devices("cpu")[0]):
        sig = filter_signals_host(np.asarray(sig, np.float32))

    # 3. model-resolution image + clinical vector
    from PIL import Image

    img = Image.fromarray(image_u8).resize(
        (pipe.img_hw[1], pipe.img_hw[0]), Image.Resampling.BILINEAR
    )
    img_u8 = np.asarray(img)[None]
    img_norm = img_u8.astype(np.float32) / 127.5 - 1.0

    def qnum(key, default):
        v = questionnaire.get(key, default)
        if v is None or v == "":
            return float(default)
        try:
            return float(v)
        except (TypeError, ValueError):
            # a malformed client field must be a 400, not a 500
            raise BadRequest(
                f"questionnaire field {key!r} must be numeric, "
                f"got {v!r}"
            )

    age = qnum("age", 60)
    wt = qnum("weight", 70)
    # Clinical vector sized to the MODEL's feature width (the app
    # only supplies age/weight; a modal-balance run has 24 features).
    # Unknown features sit at the scaler's training mean, i.e. 0
    # after standardisation — the neutral value.
    raw = np.zeros((1, pipe.n_clin), np.float32)
    if (pipe.clinical_scaler is not None
            and np.size(pipe.clinical_scaler.mean) == pipe.n_clin):
        raw[:] = np.asarray(pipe.clinical_scaler.mean, np.float32)
    raw[0, 0] = age
    if pipe.n_clin > 1:
        raw[0, 1] = wt
    clin = raw
    if pipe.clinical_scaler is not None:
        clin = np.asarray(
            pipe.clinical_scaler.transform(raw), np.float32
        )
    return img_norm, sig, clin, mv, dig_info, age, image_u8


def render_heatmap(image_u8: np.ndarray, cam_small: np.ndarray,
                   heatmap_format: str) -> Tuple[str, object, str]:
    """Upsample the CAM to the original strip on the HOST (PIL bilinear
    on a float map — the CAM is 7x7-native so nothing is lost) and
    encode with the fastest zlib level: the previous device-side
    jax.image.resize + default-level PNG encode was 168 ms of a
    ~230 ms request, vs 36 ms for ALL the model work. The encode is
    still the single largest host cost (~23 ms of a ~155 ms warm
    request), so clients can opt out of it entirely ("cam") or take
    the ~10× cheaper JPEG encode ("jpeg").

    Returns (heatmap_b64, heatmap_cam, heatmap_mime)."""
    from PIL import Image

    if heatmap_format == "cam":
        return "", cam_small.tolist(), "image/png"
    nat = _native_heatmap()
    if nat is not None:
        overlay = nat.cam_overlay(image_u8, cam_small, _jet_lut())
    else:
        cam_full = np.asarray(
            Image.fromarray(cam_small, mode="F").resize(
                (image_u8.shape[1], image_u8.shape[0]),
                Image.Resampling.BILINEAR,
            )
        )
        overlay = overlay_heatmap(image_u8, cam_full)
    heatmap_mime = "image/png"
    if heatmap_format == "jpeg":
        buf = io.BytesIO()
        Image.fromarray(overlay).save(buf, format="JPEG", quality=85)
        heatmap_mime = "image/jpeg"
        png_bytes = buf.getvalue()
    elif nat is not None:
        png_bytes = nat.png_encode(overlay, level=1)
    else:
        buf = io.BytesIO()
        Image.fromarray(overlay).save(
            buf, format="PNG", compress_level=1
        )
        png_bytes = buf.getvalue()
    return base64.b64encode(png_bytes).decode(), None, heatmap_mime


def assemble_response(pipe, *, mv, dig_info, image_u8, questionnaire,
                      probs, pred, cam, attr, ca_a, age,
                      heatmap_format) -> Dict:
    """Dispatch outputs → the ResultScreen response JSON."""
    label = "Abnormal" if pred == 1 else "Normal"
    cam_small = np.asarray(cam, np.float32)[0]
    heatmap_b64, heatmap_cam, heatmap_mime = render_heatmap(
        image_u8, cam_small, heatmap_format
    )

    contrib = modality_contributions(np.asarray(attr), pipe.dims)
    clin_pct = float(contrib["Clinical_%"][0])
    # split the clinical chunk between age and wt by each input
    # dimension's integrated-gradients attribution (not 50/50)
    ca = np.abs(np.asarray(ca_a))
    total = float(ca.sum())
    share = ca / total if total > 0 else np.full(ca.shape, 1.0 / len(ca))
    feature_importance = {
        "image": float(contrib["Image_%"][0]),
        "signal": float(contrib["Signal_%"][0]),
        "age": clin_pct * float(share[0]),
        "wt": clin_pct * float(share[1]),
    }

    # clinical report (offline rule-based backend; the GPT-4o path
    # in serve/report.py is used when the openai package is present)
    gpt_result = rule_based_report(
        mv, abnormal=(pred == 1), probability=float(probs[pred]),
        age=age, sex=_sex_from_questionnaire(questionnaire),
    )

    resp = {
        "label": label,
        "probability": float(probs[pred]),
        "ecg_signal": [
            {"Voltage (mV)": float(v)}
            for v in mv[:: max(1, len(mv) // 500)]
        ],
        "heatmap": heatmap_b64,
        "feature_importance": feature_importance,
        "gpt_result": gpt_result,
        "digitization": dig_info,
    }
    if heatmap_format == "jpeg":
        resp["heatmap_mime"] = heatmap_mime
    if heatmap_cam is not None:
        resp["heatmap_cam"] = heatmap_cam
    return resp
