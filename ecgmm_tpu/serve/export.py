"""AOT deployment bundles for the serving pipeline (jax.export).

The reference has no deployment story at all — its mobile app POSTs to a
server that is not in the repo (SURVEY §0; `/root/reference/Groove/
components/SubmitButton.tsx:44-48`). This framework's serving path is one
jitted program (`ServingPipeline._predict_all`, serve/api.py), which makes
it exportable: `export_bundle` lowers that program to StableHLO via
`jax.export` — model weights baked in as constants, multi-platform
(CPU + TPU) by default — and writes a self-contained directory next to the
host-side preprocessing constants (scalers, branch dims, strip geometry).

`ServingPipeline.from_exported(path)` rehydrates a fully working pipeline
from the bundle WITHOUT the model code, Flax, or the checkpoint: the
deserialized program is the only device computation, and the unchanged
`ServingPipeline.predict` drives it. Deployment therefore needs the bundle
plus this package's host-side code only — no retracing, no recompile
beyond XLA's fast AOT ingest, and no possibility of train/serve skew.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from ecgmm_tpu.data.preprocess import Scaler

_PROGRAM = "predict_all.stablehlo"
_META = "meta.json"
_HOST = "host_constants.npz"
_FORMAT_VERSION = 1


def export_bundle(
    pipeline,
    out_dir: str,
    platforms: Sequence[str] = ("cpu", "tpu"),
    batch_buckets: Optional[Sequence[int]] = None,
) -> str:
    """Serialize `pipeline`'s whole request program + host constants.

    Returns `out_dir`. The traced shapes are the pipeline's serving shapes
    (batch-1 strip image at model resolution, `signal_len` samples,
    `clinical_in_features` scaled clinical inputs) — the request path only
    ever sees these, so static shapes lose nothing.

    `batch_buckets` additionally exports the vmapped batched request
    program at each bucket size, so the bundle can serve with dynamic
    micro-batching (`ServingPipeline.enable_batching`, serve/batching.py).
    Every program carries its own copy of the baked-in weights, so each
    bucket adds ~one bundle-size to the directory; on TPU a batch-8
    dispatch costs the same wall-clock as batch-1 (BASELINE.md "Serving"),
    so `batch_buckets=(8,)` — every dispatch padded to 8 — is usually the
    right size/throughput trade-off there.
    """
    h, w = pipeline.img_hw
    # pipeline.n_clin is maintained for every construction path —
    # model.cfg would AttributeError on a bundle-backed pipeline whose
    # model is None (from_exported).
    n_clin = pipeline.n_clin

    def example(b):
        return (
            jnp.zeros((b, h, w, 3), jnp.float32),
            jnp.zeros((b, pipeline.signal_len), jnp.float32),
            jnp.zeros((b, n_clin), jnp.float32),
        )

    # _predict_all is a functools.partial binding the weights as a
    # device argument (api.py _build_jitted); re-jitting the partial
    # constant-folds them, so the exported StableHLO stays a baked,
    # self-contained deployment artifact
    exported = jax_export.export(
        jax.jit(pipeline._predict_all), platforms=tuple(platforms)
    )(*example(1))

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _PROGRAM), "wb") as f:
        f.write(exported.serialize())

    for b in batch_buckets or ():
        exp_b = jax_export.export(
            jax.jit(pipeline._predict_many), platforms=tuple(platforms)
        )(*example(b))
        with open(
            os.path.join(out_dir, f"predict_many_{b}.stablehlo"), "wb"
        ) as f:
            f.write(exp_b.serialize())

    host = {
        "background": np.asarray(pipeline.background, np.float32),
    }
    for name, scaler in (
        ("ecg_scaler", pipeline.ecg_scaler),
        ("clinical_scaler", pipeline.clinical_scaler),
    ):
        if scaler is not None:
            host[f"{name}_mean"] = np.asarray(scaler.mean)
            host[f"{name}_scale"] = np.asarray(scaler.scale)
    np.savez(os.path.join(out_dir, _HOST), **host)

    meta = {
        "format_version": _FORMAT_VERSION,
        "platforms": list(exported.platforms),
        "img_hw": list(pipeline.img_hw),
        "signal_len": pipeline.signal_len,
        "clinical_in_features": n_clin,
        "dims": list(pipeline.dims),
        "batch_buckets": sorted(batch_buckets or ()),
        # informational: the softmax temperature is BAKED into the
        # exported program (it's a constant in the traced request path);
        # recorded here so bundles are self-describing
        "temperature": float(getattr(pipeline, "temperature", 1.0)),
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


def _load_scaler(host, name: str) -> Optional[Scaler]:
    if f"{name}_mean" not in host:
        return None
    return Scaler(mean=host[f"{name}_mean"], scale=host[f"{name}_scale"])


def load_bundle(bundle_dir: str):
    """Deserialize a bundle into `(predict_all, meta, host_constants)`.

    `predict_all` is the jitted deserialized program — same signature and
    outputs as `ServingPipeline._predict_all`. Raises FileNotFoundError /
    ValueError on missing or incompatible bundles.
    """
    with open(os.path.join(bundle_dir, _META)) as f:
        meta = json.load(f)
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"bundle format {meta.get('format_version')!r} != "
            f"{_FORMAT_VERSION} (re-export with this package version)"
        )
    with open(os.path.join(bundle_dir, _PROGRAM), "rb") as f:
        exported = jax_export.deserialize(f.read())
    host = dict(np.load(os.path.join(bundle_dir, _HOST)))
    return jax.jit(exported.call), meta, host


def load_batched_programs(bundle_dir: str):
    """{bucket_size: jitted program} for bundles exported with
    batch_buckets; empty dict otherwise."""
    meta_path = os.path.join(bundle_dir, _META)
    if not os.path.exists(meta_path):
        return {}
    with open(meta_path) as f:
        meta = json.load(f)
    progs = {}
    for b in meta.get("batch_buckets") or ():
        with open(
            os.path.join(bundle_dir, f"predict_many_{b}.stablehlo"), "rb"
        ) as f:
            progs[int(b)] = jax.jit(jax_export.deserialize(f.read()).call)
    return progs


def main(argv=None):
    """CLI: export the demo/trained serving pipeline to a bundle.

        python -m ecgmm_tpu.serve.export --out ./bundle [--run-dir <ckpt>]
    """
    import argparse

    from ecgmm_tpu.serve.api import ServingPipeline

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--run-dir", default=None,
                   help="trained run to export (default: demo pipeline)")
    p.add_argument("--data", default="synthetic",
                   help="data source the run was trained on (scalers + "
                        "SHAP background come from its train split)")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--preset", default="fusion",
                   help="the preset the --run-dir checkpoint was trained "
                        "with (its model/train config rebuilds the "
                        "restore skeleton)")
    p.add_argument("--n-synth", type=int, default=244)
    p.add_argument("--platforms", default="cpu,tpu")
    p.add_argument("--batch-buckets", default="",
                   help="comma list — also export the batched request "
                        "program at these batch sizes (each adds ~one "
                        "bundle-size of weights; '8' alone is usually "
                        "right on TPU, see BASELINE.md)")
    args = p.parse_args(argv)

    if args.run_dir:
        import dataclasses

        from ecgmm_tpu.models import ECGMultimodalModel
        from ecgmm_tpu.workloads.run import get_preset, load_data

        # The preset must match the run being exported: the orbax
        # restore rebuilds the checkpoint's tree from this model/train
        # config (a fusion_modal_balance run cannot restore into the
        # canonical fusion skeleton).
        cfg = get_preset(args.preset)
        if args.data_dir:
            cfg = dataclasses.replace(
                cfg, data=dataclasses.replace(
                    cfg.data, data_dir=args.data_dir
                )
            )
        data = load_data(cfg, args.data, args.n_synth)
        pipe = ServingPipeline.from_run(
            args.run_dir, data,
            model=ECGMultimodalModel(cfg=cfg.model),
            train_cfg=cfg.train,
        )
    else:
        pipe = ServingPipeline.demo()
    buckets = tuple(
        int(b) for b in args.batch_buckets.split(",") if b.strip()
    )
    out = export_bundle(
        pipe, args.out,
        platforms=tuple(
            s.strip() for s in args.platforms.split(",") if s.strip()
        ),
        batch_buckets=buckets or None,
    )
    print(f"exported serving bundle -> {out}")


if __name__ == "__main__":
    main()
