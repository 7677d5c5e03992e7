"""Serving pipeline: digitize → infer → explain → report, one jitted call.

The compute core of the serving backend the reference's mobile app
expects but the reference repo never ships (SURVEY.md §0: the app POSTs
to `http://…:8080/api/public/upload-ecgImage-lead2only`,
`Groove/components/SubmitButton.tsx:35-48`). This module owns everything
request-shaped but transport-free: multipart encode/parse, the
`ServingPipeline` (model build/AOT load, the shape-cached jitted request
program, packing, micro-batching glue, warmup, Prometheus counter state),
and the response assembly matching the ResultScreen contract
(`Groove/app/(tabs)/ResultScreen.tsx:26-56`). The HTTP transport around
it — handler, /metrics exposition, graceful drain — lives in
ecgmm_tpu/serve/http.py; ecgmm_tpu/serve/api.py re-exports both for
compatibility.

Pipeline per request: digitize the strip → preprocess → trimodal fusion
forward (single jitted call, cached by shape) → Grad-CAM on the image
branch → gradient-SHAP modality attribution → report generation.
"""

from __future__ import annotations

import base64
import io
import json
import re
import threading
import time
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ecgmm_tpu.config import ModelConfig
from ecgmm_tpu.data import preprocess
from ecgmm_tpu.serve import batching
from ecgmm_tpu.explain.gradcam import _jet_lut, overlay_heatmap
from ecgmm_tpu.explain.shap_fusion import modality_contributions
from ecgmm_tpu.models import ECGMultimodalModel
from ecgmm_tpu.serve import digitize as digitize_mod
from ecgmm_tpu.serve.report import rule_based_report

ENDPOINT = "/api/public/upload-ecgImage-lead2only"

# /metrics latency-histogram bucket upper bounds, in seconds. Spans the
# measured serving envelope (BASELINE.md: ~56 ms cam … ~130 ms png warm,
# seconds when cold/under load) with Prometheus-convention powers of two.
LATENCY_BUCKETS = (0.025, 0.05, 0.1, 0.2, 0.4, 0.8, 1.6, 3.2, 6.4,
                   float("inf"))


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


def _sex_from_questionnaire(q: Dict) -> Optional[str]:
    """The questionnaire form posts the radio key 'gender' ('0'=male,
    '1'=female — QuestionnaireForm field schema); accept an explicit
    'sex' string too. Round-2 review finding: reading only 'sex' rendered
    '성별 None' in every report generated from the app."""
    sex = q.get("sex")
    if sex not in (None, ""):
        return str(sex)
    return {"0": "M", "1": "F"}.get(str(q.get("gender", "")))


def parse_multipart(body: bytes, content_type: str) -> Dict[str, bytes]:
    """Minimal multipart/form-data parser (stdlib cgi is deprecated)."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        raise ValueError("no multipart boundary")
    boundary = m.group(1).encode()
    parts = body.split(b"--" + boundary)
    fields: Dict[str, bytes] = {}
    for part in parts:
        # exactly ONE delimiter CRLF on each side — bytes.strip(b"\r\n")
        # would eat every trailing 0x0D/0x0A byte of the CONTENT too,
        # corrupting binary fields that legitimately end in CR/LF
        if part.startswith(b"\r\n"):
            part = part[2:]
        if part.endswith(b"\r\n"):
            part = part[:-2]
        if not part or part == b"--":
            continue
        if b"\r\n\r\n" not in part:
            continue
        header_blob, content = part.split(b"\r\n\r\n", 1)
        nm = re.search(rb'name="([^"]+)"', header_blob)
        if nm:
            fields[nm.group(1).decode()] = content
    return fields


def encode_multipart(
    fields: Dict[str, Tuple[Optional[str], bytes]],
    boundary: str = "ecgmmboundary42",
) -> Tuple[bytes, str]:
    """Inverse of parse_multipart: {name: (filename|None, content)} →
    (body, Content-Type). The single encoder shared by the client tools
    and the HTTP tests, so both stay in sync with the parser. If any
    field's raw bytes happen to contain the boundary (possible for
    arbitrary binary like compressed JPEGs), the boundary is lengthened
    until it collides with nothing — a fixed unchecked boundary would
    silently truncate the upload at the parser."""
    blobs = [content for _, content in fields.values()]
    while any(boundary.encode() in c for c in blobs):
        boundary += "x"
    lines = []
    for name, (filename, content) in fields.items():
        lines.append(f"--{boundary}".encode())
        disp = f'Content-Disposition: form-data; name="{name}"'
        if filename:
            disp += f'; filename="{filename}"'
        lines.append(disp.encode())
        lines.append(b"")
        lines.append(content)
    lines.append(f"--{boundary}--".encode())
    return (
        b"\r\n".join(lines),
        f"multipart/form-data; boundary={boundary}",
    )


def _pack_outputs(outs, batched: bool):
    """Flatten+cast the request program's output tuple into one f32 array
    (per row when batched) — the device side of the packed wire format
    whose host side is ServingPipeline._unpack."""
    if batched:
        b = outs[0].shape[0]
        return jnp.concatenate(
            [jnp.reshape(o, (b, -1)).astype(jnp.float32) for o in outs],
            axis=1,
        )
    return jnp.concatenate(
        [jnp.reshape(o, (-1,)).astype(jnp.float32) for o in outs]
    )


class ServingPipeline:
    """Holds the fusion model + variables and a scaler context; stateless
    per request (jit cache keyed by input shapes)."""

    def __init__(
        self,
        model: ECGMultimodalModel,
        variables,
        ecg_scaler: Optional[preprocess.Scaler] = None,
        clinical_scaler: Optional[preprocess.Scaler] = None,
        background_embeddings: Optional[np.ndarray] = None,
        signal_len: int = 2476,
        img_hw: Tuple[int, int] = (224, 224),
        temperature: float = 1.0,
    ):
        self.model = model
        self.variables = variables
        self.ecg_scaler = ecg_scaler
        self.clinical_scaler = clinical_scaler
        self.signal_len = signal_len
        self.img_hw = img_hw
        # temperature-scaled softmax (train/calibrate.py): a fitted T
        # from the training run's validation split makes the served
        # probability honest; 1.0 = raw softmax. Baked into the jitted
        # request program (and therefore into AOT exports). T ≤ 0 / NaN
        # would serve inverted or garbage probabilities — reject here
        # rather than at 1/T inside program build.
        self.temperature = float(temperature)
        if not (np.isfinite(self.temperature) and self.temperature > 0):
            raise ValueError(
                f"temperature must be a positive finite scalar, got "
                f"{temperature!r}"
            )
        cfg = model.cfg
        self.dims = (cfg.image_dim, cfg.signal_dim, cfg.clinical_dim)
        if background_embeddings is None:
            rng = np.random.default_rng(0)
            background_embeddings = rng.normal(
                size=(32, sum(self.dims))
            ).astype(np.float32)
        self.background = background_embeddings
        self.n_clin = cfg.clinical_in_features
        self._batcher = None
        self._exported_buckets = None
        self._init_stats()
        self._build_jitted()

    def _init_stats(self):
        self._stats_lock = threading.Lock()
        self._n_requests = 0
        self._latency_sum = 0.0
        self._n_errors = 0
        # per-bucket (non-cumulative) counts; metrics() cumulates into
        # the Prometheus le-convention at render time
        self._latency_hist = [0] * len(LATENCY_BUCKETS)
        self._init_packing()

    def _init_packing(self):
        self._pack_lock = threading.Lock()
        self._packed_fn = None
        self._packed_many_fn = None
        self._packed_many_sharded = {}
        self._serve_n_data = 1
        self._out_shapes = None
        # live-model pipelines overwrite these in _build_jitted; AOT
        # (from_exported) pipelines keep them None, which routes the
        # packed wrappers to the baked-weights closure path
        self._weights = None
        self._predict_all_impl = None
        self._predict_many_impl = None

    # -- single-readback output packing ---------------------------------
    #
    # On relayed TPU backends EVERY device->host array fetch pays a full
    # relay round trip (~25 ms measured); the request program returns 5
    # arrays, so fetching them separately costs ~125 ms of a ~210 ms
    # request. Packing the outputs into ONE flat f32 vector on device and
    # unpacking on the host makes the whole request a single round trip.
    # _pack_outputs and _unpack are the two sides of one wire format.

    def _ensure_packed(self, img, sig, clin) -> None:
        """Lazily build the packed batch-1 program ONCE (locked: two
        concurrent first requests must not each pay the cold compile).
        Accepts numpy arrays — only shapes are needed (jax.eval_shape)."""
        if self._packed_fn is not None:
            return
        with self._pack_lock:
            if self._packed_fn is not None:
                return
            base = self._predict_all
            self._out_shapes = [
                s.shape for s in jax.eval_shape(base, img, sig, clin)
            ]
            impl = self._predict_all_impl
            if impl is not None:  # live model: weights stay an argument

                @jax.jit
                def packed(w, img, sig, clin):
                    return _pack_outputs(
                        impl(w, img, sig, clin), batched=False
                    )

                self._packed_fn = partial(packed, self._weights)
            else:  # AOT bundle: weights already baked into the program

                @jax.jit
                def packed(img, sig, clin):
                    return _pack_outputs(
                        base(img, sig, clin), batched=False
                    )

                self._packed_fn = packed

    def _batched_packed_fn(self, mesh=None):
        """The per-row-packed batched program, built once and cached so
        re-enabling batching never retraces/recompiles the buckets.

        With a mesh, the batch axis of every bucketed dispatch is sharded
        across the mesh's `data` axis (GSPMD replicates the closed-over
        weights): one coalesced dispatch then runs on n_data chips at
        once, multiplying device-side serving capacity the same way it
        does in training. Requests are per-sample independent (the
        batched program is a vmap), so no collectives are inserted and
        the sharded outputs equal the single-device ones."""
        if mesh is not None:
            # keyed by mesh (Mesh hashes structurally — enable_batching
            # builds a fresh Mesh object per call, and a re-enable with
            # the same devices must reuse the compiled buckets; a
            # recompile costs 30–250 s per bucket on the relayed TPU).
            # A dict, not a single slot: ops toggling between n_data
            # values must not recompile on every toggle either.
            cached = self._packed_many_sharded.get(mesh)
            if cached is not None:
                return cached
            from jax.sharding import NamedSharding, PartitionSpec

            # enable_batching guarantees a live model here, so the
            # (w, …) impl exists; the weights are replicated over the
            # mesh while the batch rows shard across its data axis
            impl_many = self._predict_many_impl
            row = NamedSharding(mesh, PartitionSpec("data"))
            repl = NamedSharding(mesh, PartitionSpec())

            @partial(
                jax.jit,
                in_shardings=(repl, row, row, row),
                out_shardings=(row,),
            )
            def packed_many_sharded(w, img, sig, clin):
                return (
                    _pack_outputs(
                        impl_many(w, img, sig, clin), batched=True
                    ),
                )

            fn = partial(packed_many_sharded, self._weights)
            with self._pack_lock:
                self._packed_many_sharded[mesh] = fn
            return fn
        if self._packed_many_fn is None:
            with self._pack_lock:
                if self._packed_many_fn is None:
                    impl_many = self._predict_many_impl
                    if impl_many is not None:  # live model

                        @jax.jit
                        def packed_many(w, img, sig, clin):
                            return (
                                _pack_outputs(
                                    impl_many(w, img, sig, clin),
                                    batched=True,
                                ),
                            )

                        self._packed_many_fn = partial(
                            packed_many, self._weights
                        )
                    else:  # AOT bundle (per-bucket baked programs)
                        base_many = self._predict_many

                        @jax.jit
                        def packed_many(img, sig, clin):
                            return (
                                _pack_outputs(
                                    base_many(img, sig, clin),
                                    batched=True,
                                ),
                            )

                        self._packed_many_fn = packed_many
        return self._packed_many_fn

    def _unpack(self, flat: np.ndarray):
        flat = np.asarray(flat)
        sizes = [int(np.prod(s, dtype=np.int64)) for s in self._out_shapes]
        parts = np.split(flat, np.cumsum(sizes)[:-1])
        probs, pred, cam, attr, ca = (
            p.reshape(s) for p, s in zip(parts, self._out_shapes)
        )
        return probs, int(round(float(pred))), cam, attr, ca

    def stats(self) -> Dict:
        """Operational counters for the /stats endpoint."""
        with self._stats_lock:
            n, lat = self._n_requests, self._latency_sum
            errs = self._n_errors
        out = {
            "requests": n,
            "errors": errs,
            "mean_latency_ms": (lat / n * 1e3) if n else 0.0,
            "aot": self.model is None,
            "temperature": getattr(self, "temperature", 1.0),
            "batching": None,
        }
        b = self._batcher
        if b is not None:
            out["batching"] = b.stats()
            out["batching"]["n_data"] = self._serve_n_data
        return out

    def record_error(self) -> None:
        """Count a request answered 4xx/5xx (called by the HTTP handler;
        predict() itself only sees requests that reached the model)."""
        with self._stats_lock:
            self._n_errors += 1

    def metrics(self) -> str:
        """The /stats counters in Prometheus text exposition format
        (version 0.0.4), so production scrapers need no JSON mapping:
        request/error counters, an end-to-end predict() latency
        histogram over LATENCY_BUCKETS, and the micro-batcher's
        dispatch gauges when batching is on."""
        with self._stats_lock:
            n, lat = self._n_requests, self._latency_sum
            errs = self._n_errors
            hist = list(self._latency_hist)
        lines = [
            "# HELP ecgmm_requests_total Requests served a prediction.",
            "# TYPE ecgmm_requests_total counter",
            f"ecgmm_requests_total {n}",
            "# HELP ecgmm_request_errors_total Requests answered "
            "4xx/5xx.",
            "# TYPE ecgmm_request_errors_total counter",
            f"ecgmm_request_errors_total {errs}",
            "# HELP ecgmm_request_latency_seconds End-to-end predict() "
            "latency (digitize + device dispatch + explainers + "
            "heatmap encode).",
            "# TYPE ecgmm_request_latency_seconds histogram",
        ]
        cum = 0
        for ub, c in zip(LATENCY_BUCKETS, hist):
            cum += c
            le = "+Inf" if ub == float("inf") else f"{ub:g}"
            lines.append(
                f'ecgmm_request_latency_seconds_bucket{{le="{le}"}} {cum}'
            )
        lines.append(f"ecgmm_request_latency_seconds_sum {lat:.6f}")
        lines.append(f"ecgmm_request_latency_seconds_count {n}")
        b = self._batcher
        lines += [
            "# HELP ecgmm_batching_enabled Micro-batching active (gauge).",
            "# TYPE ecgmm_batching_enabled gauge",
            f"ecgmm_batching_enabled {0 if b is None else 1}",
        ]
        if b is not None:
            s = b.stats()
            lines += [
                "# TYPE ecgmm_batch_dispatches_total counter",
                f"ecgmm_batch_dispatches_total {s['dispatches']}",
                "# TYPE ecgmm_batch_requests_total counter",
                f"ecgmm_batch_requests_total {s['requests']}",
                "# HELP ecgmm_batch_mean_coalescence Requests per device "
                "dispatch since startup (gauge).",
                "# TYPE ecgmm_batch_mean_coalescence gauge",
                f"ecgmm_batch_mean_coalescence {s['mean_coalescence']:.4f}",
            ]
        return "\n".join(lines) + "\n"

    def _build_jitted(self):
        """Every device computation in the request path is jitted once —
        eager apply dispatches each op individually, which costs seconds
        per request on relayed backends (measured: 1.6 s eager vs ~10 ms
        jitted for the batch-1 fusion forward).

        The weights/background/temperature enter every program as one
        device-resident ARGUMENT pytree `w` (bound via functools.partial),
        not as closure constants. Traced constants are baked into the
        HLO, so two servers with different weights — every `demo()`
        start, every retrained checkpoint — hashed to different
        persistent-compilation-cache keys: each start re-paid the full
        relay compile (6–20 min measured) and left an unreusable ~45 MB
        cache entry. As arguments the programs are weight-independent,
        so any same-shape restart is a cache read. AOT export still
        bakes the weights: serve/export.py re-jits the bound partial,
        which constant-folds `w` into the exported StableHLO."""
        model = self.model
        d0, d1, _ = self.dims
        w = jax.device_put({
            "variables": self.variables,
            "bg": jnp.asarray(self.background),
            "inv_temp": jnp.float32(1.0 / self.temperature),
        })
        self._weights = w

        def forward(w, img, sig, clin):
            out = model.apply(w["variables"], img, sig, clin)
            return jax.nn.softmax(out.fusion_logits * w["inv_temp"], -1)

        def encode(w, img, sig, clin):
            feats = model.apply(
                w["variables"], img, sig, clin, method=type(model).encode
            )
            return jnp.concatenate(feats[:3], axis=1)

        from ecgmm_tpu.explain.gradcam import grad_cam_fusion_image
        from ecgmm_tpu.explain.shap_fusion import gradient_shap

        def gradcam(w, img, cls):
            cam, _ = grad_cam_fusion_image(
                model, w["variables"], img, cls
            )
            return cam

        def shap(w, emb, cls):
            def head(e):
                return model.apply(
                    w["variables"], e[:, :d0], e[:, d0:d0 + d1],
                    e[:, d0 + d1:], method=type(model).fuse_embeddings,
                )

            return gradient_shap(head, emb, w["bg"], cls, n_samples=32)

        def clinical_ig(w, img, sig, clin, cls):
            """Per-dimension attribution over the raw clinical INPUTS
            (age, wt) — integrated gradients of the predicted-class logit
            along the straight path from the scaled cohort mean (zeros
            after the StandardScaler) to the request's clinical vector,
            midpoint rule, 8 steps. The app's pie chart renders age and wt
            as separate features (Groove/app/(tabs)/ResultScreen.tsx:51-56),
            so splitting the clinical-chunk SHAP 50/50 would fabricate the
            numbers; this measures each dimension's actual pull. ONE
            definition, shared by the standalone jit below and
            predict_all, so the estimator cannot drift between the tested
            and the served path."""

            def f(c):
                out = model.apply(w["variables"], img, sig, c)
                return out.fusion_logits[0, cls]

            alphas = (jnp.arange(8, dtype=jnp.float32) + 0.5) / 8.0
            grads = jax.vmap(lambda a: jax.grad(f)(a * clin))(alphas)
            return (clin * jnp.mean(grads, axis=0))[0]  # (n_clin,)

        def predict_all(w, img, sig, clin):
            """The WHOLE request's device work in one program: forward,
            Grad-CAM, embedding SHAP, per-feature clinical IG. On relayed
            backends every dispatch pays a real round trip (~tens of ms),
            so collapsing the previous five jit calls into one is the
            dominant serving-latency lever; XLA also CSEs the encoder
            forwards shared by the prediction and the explainers."""
            variables = w["variables"]
            feats = model.apply(
                variables, img, sig, clin, method=type(model).encode
            )
            img_f, sig_f, clin_f = feats[:3]
            emb = jnp.concatenate([img_f, sig_f, clin_f], axis=1)
            logits = model.apply(
                variables, img_f, sig_f, clin_f,
                method=type(model).fuse_embeddings,
            )
            # temperature never moves argmax, only honesty of the prob
            probs = jax.nn.softmax(logits * w["inv_temp"], -1)
            pred = jnp.argmax(probs[0])
            # feature-map-native CAM (7×7): the host upsamples ONCE to the
            # original strip, and only the tiny map crosses the relay
            cam, _ = grad_cam_fusion_image(
                model, variables, img, pred[None], resize_to_input=False
            )
            attr = gradient_shap(
                lambda e: model.apply(
                    variables, e[:, :d0], e[:, d0:d0 + d1],
                    e[:, d0 + d1:], method=type(model).fuse_embeddings,
                ),
                emb, w["bg"], pred, n_samples=32,
            )
            ca = clinical_ig(w, img, sig, clin, pred)
            return probs, pred, cam, attr, ca

        def predict_many(w, img, sig, clin):
            """The batched request program: the single-sample request
            vmapped over a bucketed batch (serve/batching.py) with the
            weights broadcast (in_axes None). Batch-1 serving under-fills
            the MXU and pays a full dispatch round trip per request;
            coalescing concurrent requests into one vmapped dispatch is
            the TPU serving-throughput lever."""

            def one(i, s, c):
                probs, pred, cam, attr, ca = predict_all(
                    w, i[None], s[None], c[None]
                )
                return probs[0], pred, cam[0], attr[0], ca

            return jax.vmap(one)(img, sig, clin)

        # the unjitted (w, ...) bodies, for the packed wrappers in
        # _ensure_packed/_batched_packed_fn to compose without re-baking w
        self._predict_all_impl = predict_all
        self._predict_many_impl = predict_many
        self._forward = partial(jax.jit(forward), w)
        self._encode = partial(jax.jit(encode), w)
        self._gradcam = partial(jax.jit(gradcam), w)
        self._shap = partial(jax.jit(shap), w)
        self._clin_attr = partial(jax.jit(clinical_ig), w)
        self._predict_all = partial(jax.jit(predict_all), w)
        self._predict_many = partial(jax.jit(predict_many), w)

    @classmethod
    def from_run(
        cls,
        run_dir: str,
        data,
        model: Optional[ECGMultimodalModel] = None,
        which: str = "best",
        train_cfg=None,
    ) -> "ServingPipeline":
        """Production assembly: a fusion training run's checkpoint
        (workloads.run / workloads.pretrain output) + the run's fitted
        scalers + real background embeddings from its train split.

        train_cfg must match the run's TrainConfig closely enough to
        rebuild the same optimizer-state structure (orbax restores into a
        matching skeleton); the fusion preset default usually does."""
        from ecgmm_tpu.config import TrainConfig
        from ecgmm_tpu.data.pipeline import normalize_images
        from ecgmm_tpu.train.checkpoint import CheckpointManager
        from ecgmm_tpu.train.optim import make_optimizer
        from ecgmm_tpu.train.state import create_state, \
            encoder_freeze_predicate

        train_cfg = train_cfg or TrainConfig()
        model = model or ECGMultimodalModel(cfg=ModelConfig())
        sig_len = data.train.signals.shape[-1]
        n_clin = data.train.clinical.shape[-1]
        img_hw = data.train.images.shape[1:3]
        from ecgmm_tpu.models import jit_init

        variables = jit_init(
            model, jax.random.PRNGKey(0),
            jnp.ones((1,) + tuple(img_hw) + (3,)),
            jnp.ones((1, sig_len)), jnp.ones((1, n_clin)),
        )
        skeleton = create_state(
            variables,
            make_optimizer(train_cfg, steps_per_epoch=1),
            jax.random.PRNGKey(0),
            freeze_predicate=(
                encoder_freeze_predicate if train_cfg.freeze_encoders
                else None
            ),
        )
        ckpt = CheckpointManager(run_dir)
        state = ckpt.restore(which, skeleton)
        trained = {"params": state.params, **state.model_state}

        # fitted softmax temperature for this tag, if the run calibrated
        # (workloads.run saves one per best/last tag; train/calibrate.py)
        temperature = 1.0
        if ckpt.exists("calibration"):
            calib = ckpt.restore(
                "calibration",
                {"temperature_best": 1.0, "temperature_last": 1.0},
            )
            temperature = float(calib.get(f"temperature_{which}", 1.0))

        # real class-balanced background embeddings from the train split
        pipe = cls(
            model, trained,
            ecg_scaler=data.ecg_scaler,
            clinical_scaler=data.clinical_scaler,
            signal_len=sig_len, img_hw=tuple(img_hw),
            temperature=temperature,
        )
        emb = np.asarray(pipe._encode(
            normalize_images(data.train.images[:64]),
            data.train.signals[:64], data.train.clinical[:64],
        ))
        pipe.background = emb
        pipe._build_jitted()  # rebind SHAP to the real background
        return pipe

    @classmethod
    def demo(cls) -> "ServingPipeline":
        """Self-contained demo: fusion model with the shipped PTB-XL
        signal-encoder weights warm-started and random heads."""
        from ecgmm_tpu.tools import convert_pth

        mcfg = ModelConfig(dtype="float32")
        model = ECGMultimodalModel(cfg=mcfg)
        from ecgmm_tpu.models import jit_init

        variables = jit_init(
            model, jax.random.PRNGKey(0),
            jnp.ones((1, 224, 224, 3)), jnp.ones((1, 2476)),
            jnp.ones((1, 2)),
        )
        try:
            src = convert_pth.convert_resnet1d_se(
                convert_pth.load_torch_state_dict(
                    "/root/reference/best_ptbxl.pth"
                )
            )
            merged_params, _ = convert_pth.load_partial(
                variables["params"]["signal_encoder"], src["params"],
                exclude_prefixes=("head_out",),
            )
            variables = jax.tree_util.tree_map(lambda x: x, variables)
            variables["params"]["signal_encoder"] = merged_params
        except Exception as e:
            # The demo still serves (random signal-encoder weights), but
            # silently doing so is indistinguishable from the warm-started
            # state — say it loudly.
            import warnings

            warnings.warn(
                f"demo(): PTB-XL warm-start failed ({e!r}); serving "
                "RANDOM signal-encoder weights"
            )
        return cls(model, variables)

    @classmethod
    def from_exported(cls, bundle_dir: str) -> "ServingPipeline":
        """Rehydrate a pipeline from an AOT deployment bundle
        (serve/export.py): the deserialized StableHLO program — weights
        baked in as constants — replaces the jitted request program, so
        serving needs no model code, Flax init, or checkpoint read and
        cannot skew from the exporting run."""
        from ecgmm_tpu.serve.export import _load_scaler, load_bundle

        predict_all, meta, host = load_bundle(bundle_dir)
        pipe = cls.__new__(cls)
        pipe.model = None
        pipe.variables = None
        pipe.ecg_scaler = _load_scaler(host, "ecg_scaler")
        pipe.clinical_scaler = _load_scaler(host, "clinical_scaler")
        pipe.signal_len = int(meta["signal_len"])
        pipe.img_hw = tuple(meta["img_hw"])
        pipe.dims = tuple(meta["dims"])
        pipe.n_clin = int(meta["clinical_in_features"])
        pipe.background = host["background"]
        # informational only — the temperature is already baked into the
        # exported program's constants
        pipe.temperature = float(meta.get("temperature", 1.0))
        pipe._predict_all = predict_all
        pipe._batcher = None
        pipe._init_stats()
        # batched programs each carry a full weight copy — defer the
        # deserialization to enable_batching() so unbatched serving never
        # pays for them (only the cheap meta list is read here)
        pipe._bundle_dir = bundle_dir
        pipe._predict_many = None
        buckets = meta.get("batch_buckets") or ()
        pipe._exported_buckets = tuple(sorted(buckets)) or None
        return pipe

    def _load_exported_batched(self) -> None:
        from ecgmm_tpu.serve.export import load_batched_programs

        progs = load_batched_programs(self._bundle_dir)

        def predict_many(img, sig, clin, _progs=progs):
            fn = _progs.get(int(img.shape[0]))
            if fn is None:
                raise ValueError(
                    f"bundle has no batched program for bucket "
                    f"{img.shape[0]} (exported: {sorted(_progs)})"
                )
            return fn(img, sig, clin)

        self._predict_many = predict_many

    def enable_batching(
        self,
        window_ms: float = 4.0,
        max_batch: Optional[int] = None,
        buckets: Optional[Tuple[int, ...]] = None,
        n_data: int = 1,
    ) -> None:
        """Coalesce concurrent predict() calls into single bucketed
        vmapped dispatches (serve/batching.py). For AOT pipelines the
        bundle must have been exported with batch_buckets.

        n_data > 1 additionally shards each dispatch's batch axis over
        the first n_data visible devices (a 1-D `data` jax.sharding.Mesh)
        — data-parallel serving: n_data chips answer one coalesced
        dispatch together. Requires a live model (an AOT bundle is a
        fixed single-device program) and buckets divisible by n_data."""
        from ecgmm_tpu.serve.batching import MicroBatcher

        if self._predict_many is None:
            if self._exported_buckets:
                self._load_exported_batched()  # deferred from_exported
            else:
                raise ValueError(
                    "this pipeline has no batched request program — "
                    "export the bundle with batch_buckets=(8,) (or more "
                    "buckets) to serve batched from AOT"
                )
        if n_data < 1:
            raise ValueError(f"n_data must be >= 1, got {n_data}")
        mesh = None
        if n_data > 1:
            if self.model is None:
                raise ValueError(
                    "mesh serving (n_data > 1) needs a live model — an "
                    "AOT bundle is a fixed single-device program"
                )
            devices = jax.devices()
            if n_data > len(devices):
                raise ValueError(
                    f"n_data={n_data} exceeds the {len(devices)} visible "
                    "device(s)"
                )
            from jax.sharding import Mesh

            mesh = Mesh(np.array(devices[:n_data]), ("data",))
        if buckets is None:
            if n_data > 1:
                buckets = tuple(n_data * b for b in (1, 2, 4, 8))
            else:
                buckets = self._exported_buckets or (1, 2, 4, 8)
        if self._exported_buckets is not None and not (
            set(buckets) <= set(self._exported_buckets)
        ):
            raise ValueError(
                f"requested batch buckets {buckets} not all exported "
                f"(bundle has {self._exported_buckets})"
            )
        if mesh is not None:
            bad = tuple(b for b in buckets if b % n_data)
            if bad:
                raise ValueError(
                    f"batch buckets {bad} not divisible by "
                    f"n_data={n_data} — each device must take an equal "
                    "slice of every bucketed dispatch"
                )
        if max_batch is None:
            max_batch = max(buckets)
        # construct (and validate) the new batcher BEFORE tearing down a
        # live one, so a bad re-enable never leaves batching silently off;
        # the batcher's device program packs each sample's outputs into
        # one row, so a whole dispatch costs a single device→host fetch
        new = MicroBatcher(
            self._batched_packed_fn(mesh), window_ms=window_ms,
            max_batch=max_batch, buckets=buckets,
        )
        self.close_batching()
        self._batcher = new
        self._serve_n_data = n_data

    def close_batching(self) -> None:
        if self._batcher is not None:
            self._batcher.close()
            self._batcher = None
        self._serve_n_data = 1

    def warmup_batched(self) -> None:
        """Compile every batch bucket's (packed) program up front."""
        if self._batcher is None:
            return
        h, w = self.img_hw
        for b in self._batcher._buckets:
            out = self._batcher._batch_fn(
                jnp.zeros((b, h, w, 3), jnp.float32),
                jnp.zeros((b, self.signal_len), jnp.float32),
                jnp.zeros((b, self.n_clin), jnp.float32),
            )
            np.asarray(out[0])  # sync

    def warmup(self, strip_hw: Tuple[int, int] = (250, 2500)) -> None:
        """Compile every jit program in the request path once at startup
        so the first real request doesn't pay cold-start latency (minutes
        on remote-compile TPU backends)."""
        dummy = np.full(strip_hw + (3,), 255, np.uint8)
        dummy[strip_hw[0] // 2, :, :] = 0
        self.predict(dummy, {"age": 60, "weight": 70})
        if self._batcher is not None and self._packed_fn is not None:
            # with batching on, predict() routed through the batcher —
            # execute the unbatched program too, so the BatcherClosed
            # fallback (and any later close_batching()) doesn't pay the
            # cold compile inside a live request
            row = self._packed_fn(
                jnp.zeros((1,) + self.img_hw + (3,), jnp.float32),
                jnp.zeros((1, self.signal_len), jnp.float32),
                jnp.zeros((1, self.n_clin), jnp.float32),
            )
            np.asarray(row)  # sync
        # the warmup request's cold-compile latency (minutes on remote
        # backends) must not pollute the /stats serving metrics
        with self._stats_lock:
            self._n_requests = 0
            self._latency_sum = 0.0
            self._latency_hist = [0] * len(LATENCY_BUCKETS)

    def predict(self, image_u8: np.ndarray, questionnaire: Dict,
                heatmap_format: str = "png") -> Dict:
        """heatmap_format (request opt-in, multipart field of the same
        name): "png" (default — the mobile contract's base64 PNG),
        "jpeg" (~an order of magnitude faster encode + smaller payload;
        response adds heatmap_mime), or "cam" (skip the overlay encode
        entirely and return the raw low-res Grad-CAM grid under
        heatmap_cam for client-side rendering; heatmap is empty)."""
        _t0 = time.perf_counter()
        # 1. digitize the uploaded strip into a voltage series (the
        # metadata dict — scale source, grid pitch, crop, ink coverage
        # — is forwarded to the client under "digitization" so it can
        # warn when the photo had no calibrating grid)
        mv, dig_info = digitize_mod.digitize_lead2_info(
            image_u8, target_len=self.signal_len
        )
        # the image BRANCH must see the strip, not the table it was
        # photographed on — feed the located crop to the encoder and
        # render the Grad-CAM overlay on the same crop (the client
        # displays heatmap over waveform, i.e. over the strip)
        if dig_info["crop"] is not None:
            y0, y1, x0, x1 = dig_info["crop"]
            image_u8 = image_u8[y0:y1, x0:x1]

        # 2. preprocess signal the training way — literally the same
        # helper the offline materialisation uses (native C++ when
        # available, JAX fallback), so serve-time inputs can't skew from
        # train-time preprocessing
        from ecgmm_tpu.data.pipeline import filter_signals_host

        sig = mv[None, :]
        if self.ecg_scaler is not None:
            sig = np.asarray(self.ecg_scaler.transform(sig))
        with jax.default_device(jax.devices("cpu")[0]):
            sig = filter_signals_host(np.asarray(sig, np.float32))

        # 3. model-resolution image + clinical vector
        from PIL import Image

        img = Image.fromarray(image_u8).resize(
            (self.img_hw[1], self.img_hw[0]), Image.Resampling.BILINEAR
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
        raw = np.zeros((1, self.n_clin), np.float32)
        if (self.clinical_scaler is not None
                and np.size(self.clinical_scaler.mean) == self.n_clin):
            raw[:] = np.asarray(self.clinical_scaler.mean, np.float32)
        raw[0, 0] = age
        if self.n_clin > 1:
            raw[0, 1] = wt
        clin = raw
        if self.clinical_scaler is not None:
            clin = np.asarray(
                self.clinical_scaler.transform(raw), np.float32
            )

        # 4–6. forward + Grad-CAM + SHAP + per-feature clinical IG in ONE
        # device dispatch (see _predict_all) and ONE device→host readback
        # (_ensure_packed); with batching enabled, concurrent requests
        # share that dispatch too (serve/batching.py). Note: host arrays
        # go to the device exactly once — via the batcher's stack on the
        # batched path, via the jit call itself otherwise.
        self._ensure_packed(img_norm, sig, clin)
        # Snapshot the batcher once: a concurrent close_batching() /
        # enable_batching() between a None-check and .submit() would
        # otherwise AttributeError, and a submit that lands on a
        # just-closed batcher should degrade to the unbatched path
        # rather than 500 the in-flight request.
        batcher = self._batcher
        row = None
        if batcher is not None:
            try:
                (row,) = batcher.submit(img_norm[0], sig[0], clin[0])
            except batching.BatcherClosed:
                # close_batching() raced this request: it was never
                # dispatched, so quietly take the unbatched path. A
                # BatchDispatchError, by contrast, propagates — a failing
                # batched program must surface, not silently degrade.
                row = None
        if row is not None:
            probs_a, pred, cam, attr, ca_a = self._unpack(row)
        else:
            probs_a, pred, cam, attr, ca_a = self._unpack(
                self._packed_fn(
                    jnp.asarray(img_norm), jnp.asarray(sig),
                    jnp.asarray(clin),
                )
            )
        probs = np.asarray(probs_a)[0]
        label = "Abnormal" if pred == 1 else "Normal"

        # upsample the CAM to the original strip on the HOST (PIL bilinear
        # on a float map — the CAM is 7x7-native so nothing is lost) and
        # encode with the fastest zlib level: the previous device-side
        # jax.image.resize + default-level PNG encode was 168 ms of a
        # ~230 ms request, vs 36 ms for ALL the model work. The encode is
        # still the single largest host cost (~23 ms of a ~155 ms warm
        # request), so clients can opt out of it entirely ("cam") or take
        # the ~10× cheaper JPEG encode ("jpeg").
        cam_small = np.asarray(cam, np.float32)[0]
        heatmap_b64 = ""
        heatmap_cam = None
        heatmap_mime = "image/png"
        if heatmap_format == "cam":
            heatmap_cam = cam_small.tolist()
        else:
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
            heatmap_b64 = base64.b64encode(png_bytes).decode()

        contrib = modality_contributions(np.asarray(attr), self.dims)
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

        # 7. clinical report (offline rule-based backend; the GPT-4o path
        # in serve/report.py is used when the openai package is present)
        gpt_result = rule_based_report(
            mv, abnormal=(pred == 1), probability=float(probs[pred]),
            age=age, sex=_sex_from_questionnaire(questionnaire),
        )

        _dt = time.perf_counter() - _t0
        with self._stats_lock:
            self._n_requests += 1
            self._latency_sum += _dt
            for _i, _ub in enumerate(LATENCY_BUCKETS):
                if _dt <= _ub:
                    self._latency_hist[_i] += 1
                    break
        resp = {
            "label": label,
            "probability": float(probs[pred]),
            "ecg_signal": [
                {"Voltage (mV)": float(v)} for v in mv[:: max(1, len(mv) // 500)]
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


class BadRequest(ValueError):
    """Client-side request defect → HTTP 400 with a JSON error body."""
