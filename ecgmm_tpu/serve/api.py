"""Inference serving API — compatibility facade.

The backend the reference's mobile app expects but the reference repo
never ships (SURVEY.md §0: the app POSTs to
`http://…:8080/api/public/upload-ecgImage-lead2only`,
`Groove/components/SubmitButton.tsx:35-48`). The implementation lives in
four modules behind this unchanged import surface:

  * ecgmm_tpu/serve/pipeline.py — ServingPipeline: digitize → infer →
    Grad-CAM → SHAP → report as one shape-cached jitted program, plus
    micro-batching glue and the Prometheus counter state;
  * ecgmm_tpu/serve/loaders.py — pipeline assembly: checkpointed-run,
    demo, and AOT-bundle constructors (surfaced as ServingPipeline
    classmethods);
  * ecgmm_tpu/serve/wire.py — endpoint path, multipart codec,
    questionnaire coercion, BadRequest;
  * ecgmm_tpu/serve/http.py — the HTTP transport: endpoint handler,
    /metrics text exposition, landing page, SIGTERM/SIGINT graceful
    drain, and the `ecgmm-serve` CLI.

Response JSON (the ResultScreen contract,
`Groove/app/(tabs)/ResultScreen.tsx:26-56`):
  label, probability, ecg_signal: [{"Voltage (mV)": v}…], heatmap
  (base64 PNG Grad-CAM overlay), feature_importance
  {image, signal, age, wt} (percent), gpt_result {five Korean sections}.
"""

from ecgmm_tpu.serve.http import (  # noqa: F401
    GracefulHTTPServer,
    MAX_REQUEST_BYTES,
    install_graceful_shutdown,
    main,
    make_handler,
    serve,
)
from ecgmm_tpu.serve.pipeline import (  # noqa: F401
    ENDPOINT,
    LATENCY_BUCKETS,
    BadRequest,
    ServingPipeline,
    _native_heatmap,
    _pack_outputs,
    _sex_from_questionnaire,
    encode_multipart,
    parse_multipart,
)

if __name__ == "__main__":
    main()
