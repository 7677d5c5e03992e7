"""Serving pipeline: digitize → infer → explain → report, one jitted call.

The compute core of the serving backend the reference's mobile app
expects but the reference repo never ships (SURVEY.md §0: the app POSTs
to `http://…:8080/api/public/upload-ecgImage-lead2only`,
`Groove/components/SubmitButton.tsx:35-48`). This module owns the
request-path compute: the `ServingPipeline` (the shape-cached jitted
request program, output packing, micro-batching glue, warmup, Prometheus
counter state) and the response assembly matching the ResultScreen
contract (`Groove/app/(tabs)/ResultScreen.tsx:26-56`). Around it:
assembly recipes in ecgmm_tpu/serve/loaders.py (checkpointed run / demo
/ AOT bundle), the wire codec in ecgmm_tpu/serve/wire.py, and the HTTP
transport — handler, /metrics exposition, graceful drain — in
ecgmm_tpu/serve/http.py; ecgmm_tpu/serve/api.py re-exports the whole
surface for compatibility.

Pipeline per request: digitize the strip → preprocess → trimodal fusion
forward (single jitted call, cached by shape) → Grad-CAM on the image
branch → gradient-SHAP modality attribution → report generation.
"""

from __future__ import annotations

import threading
import time
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ecgmm_tpu.config import ModelConfig
from ecgmm_tpu.data import preprocess
from ecgmm_tpu.models import ECGMultimodalModel
from ecgmm_tpu.serve import batching
from ecgmm_tpu.serve import request as request_host
from ecgmm_tpu.serve.request import _native_heatmap  # noqa: F401 (re-export)
from ecgmm_tpu.serve.wire import (  # noqa: F401  (re-exported surface)
    ENDPOINT,
    BadRequest,
    _sex_from_questionnaire,
    encode_multipart,
    parse_multipart,
)

# /metrics latency-histogram bucket upper bounds, in seconds. Spans the
# measured serving envelope (BASELINE.md: ~56 ms cam … ~130 ms png warm,
# seconds when cold/under load) with Prometheus-convention powers of two.
LATENCY_BUCKETS = (0.025, 0.05, 0.1, 0.2, 0.4, 0.8, 1.6, 3.2, 6.4,
                   float("inf"))


def _rss_bytes() -> int:
    """Resident set size from /proc (no psutil in this image)."""
    import os

    try:
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE")
    except Exception:
        return 0


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
        # leak-gate gauges for sustained-soak monitoring: host RSS and
        # total live device-array bytes. Scrape-time only (live_arrays
        # iterates every live jax array — cheap at serving's working-set
        # size, not something to poll per request).
        lines += [
            "# HELP ecgmm_process_rss_bytes Resident set size of the "
            "serving process.",
            "# TYPE ecgmm_process_rss_bytes gauge",
            f"ecgmm_process_rss_bytes {_rss_bytes()}",
        ]
        try:
            from ecgmm_tpu.train.profiler import live_buffer_bytes

            lines += [
                "# HELP ecgmm_live_buffer_bytes Total bytes of live "
                "device arrays (train/profiler.py).",
                "# TYPE ecgmm_live_buffer_bytes gauge",
                f"ecgmm_live_buffer_bytes {live_buffer_bytes()}",
            ]
        except Exception:
            pass
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

    # -- constructors (assembly recipes live in serve/loaders.py) --------

    @classmethod
    def from_run(cls, run_dir: str, data,
                 model: Optional[ECGMultimodalModel] = None,
                 which: str = "best", train_cfg=None) -> "ServingPipeline":
        """Checkpointed-run assembly — see loaders.pipeline_from_run."""
        from ecgmm_tpu.serve.loaders import pipeline_from_run

        return pipeline_from_run(cls, run_dir, data, model, which,
                                 train_cfg)

    @classmethod
    def demo(cls) -> "ServingPipeline":
        """Self-contained demo — see loaders.demo_pipeline."""
        from ecgmm_tpu.serve.loaders import demo_pipeline

        return demo_pipeline(cls)

    @classmethod
    def from_exported(cls, bundle_dir: str) -> "ServingPipeline":
        """AOT-bundle rehydrate — see loaders.pipeline_from_exported."""
        from ecgmm_tpu.serve.loaders import pipeline_from_exported

        return pipeline_from_exported(cls, bundle_dir)

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
        # 1–3. digitize + train-identical preprocessing + questionnaire
        # coercion (serve/request.py) — image_u8 comes back as the
        # located strip crop when the digitizer found one
        (img_norm, sig, clin, mv, dig_info, age, image_u8
         ) = request_host.prepare_inputs(self, image_u8, questionnaire)

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

        # 7. heatmap encode + importance split + clinical report
        # (serve/request.py)
        resp = request_host.assemble_response(
            self, mv=mv, dig_info=dig_info, image_u8=image_u8,
            questionnaire=questionnaire, probs=probs, pred=pred,
            cam=cam, attr=attr, ca_a=ca_a, age=age,
            heatmap_format=heatmap_format,
        )

        _dt = time.perf_counter() - _t0
        with self._stats_lock:
            self._n_requests += 1
            self._latency_sum += _dt
            for _i, _ub in enumerate(LATENCY_BUCKETS):
                if _dt <= _ub:
                    self._latency_hist[_i] += 1
                    break
        hook = getattr(self, "on_request_done", None)
        if hook is not None:  # e.g. --max-requests recycle (serve/http.py)
            hook()
        return resp
