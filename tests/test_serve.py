"""Serving layer: digitizer round-trip, report generation, and the live
HTTP endpoint exercised with a real multipart POST (the mobile-app
contract)."""

import base64
import io
import json
import os
import urllib.request

import numpy as np
import pytest

from ecgmm_tpu.data import synthetic
from ecgmm_tpu.serve import digitize, report
from ecgmm_tpu.serve.api import ENDPOINT, ServingPipeline, serve


def test_digitize_roundtrip_correlation():
    """Render a known signal to a strip, digitize it back, demand high
    correlation with the original."""
    cohort = synthetic.make_cohort(n=3, signal_len=2476, img_hw=(250, 2500))
    for i in range(3):
        mv = digitize.digitize_lead2(cohort.images[i], target_len=2476)
        a = cohort.signals[i] - cohort.signals[i].mean()
        b = mv - mv.mean()
        corr = float(
            (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        )
        assert corr > 0.8, f"sample {i}: corr={corr}"


def test_report_sections_contract():
    cohort = synthetic.make_cohort(n=1, signal_len=2476, img_hw=(50, 100))
    out = report.rule_based_report(
        cohort.signals[0], abnormal=True, probability=0.87, age=70,
    )
    assert set(out) == set(report.SECTIONS)
    assert all(isinstance(v, str) and v for v in out.values())


def test_parse_sections_regex():
    txt = (
        "### [RR 간격]\nrr text\n### [QRS 파형]\nqrs\n### [T파]\nt\n"
        "### [P파]\np\n### [임상 권고]\n- rec\n"
    )
    out = report.parse_sections(txt)
    assert out["RR 간격"] == "rr text"
    # str.strip("---") removes edge dashes — reference gpt_analysis.py:147
    assert out["임상 권고"] == "rec"


_GPT_TEXT = (
    "### [RR 간격]\nrr 소견\n### [QRS 파형]\nqrs 소견\n### [T파]\nt 소견\n"
    "### [P파]\np 소견\n### [임상 권고]\n권고\n"
)


def test_openai_report_v0_sdk_branch():
    """openai<1.0 fake module: the reference-parity ChatCompletion.create
    call shape (gpt_analysis.py:112), no network."""
    from types import SimpleNamespace

    seen = {}

    class ChatCompletion:
        @staticmethod
        def create(model, messages, max_tokens):
            seen.update(model=model, messages=messages)
            return {"choices": [{"message": {"content": _GPT_TEXT}}]}

    fake = SimpleNamespace(ChatCompletion=ChatCompletion)
    out = report.openai_report(
        "b64png", abnormal=True, probability=0.9, age=70, client=fake,
    )
    assert out["RR 간격"] == "rr 소견"
    assert seen["model"] == "gpt-4o"
    # message shape: system + user(text, data-url image)
    assert seen["messages"][0]["role"] == "system"
    parts = seen["messages"][1]["content"]
    assert parts[1]["image_url"]["url"].startswith("data:image/png;base64,")


def test_openai_report_v1_sdk_branch():
    """openai>=1.0 fake module: OpenAI() client with
    chat.completions.create returning attribute-style response."""
    from types import SimpleNamespace

    seen = {}

    class _Completions:
        def create(self, model, messages, max_tokens):
            seen.update(model=model, n_msg=len(messages))
            msg = SimpleNamespace(content=_GPT_TEXT)
            return SimpleNamespace(
                choices=[SimpleNamespace(message=msg)]
            )

    class _Client:
        def __init__(self):
            self.chat = SimpleNamespace(completions=_Completions())

    # like the REAL openai>=1.0 module: OpenAI factory PLUS a leftover
    # module-level ChatCompletion proxy whose .create raises — the v1
    # branch must win or the live path explodes on current installs
    class _RemovedProxy:
        @staticmethod
        def create(**kw):
            raise RuntimeError("APIRemovedInV1")

    fake_module = SimpleNamespace(OpenAI=_Client, ChatCompletion=_RemovedProxy)
    out = report.openai_report(
        "b64png", abnormal=False, probability=0.2, client=fake_module,
    )
    assert set(out) == set(report.SECTIONS)
    assert seen == {"model": "gpt-4o", "n_msg": 2}


def test_signal_features_hr():
    fs = 250.0
    t = np.arange(2476) / fs
    sig = np.exp(-np.square(((t * 1.0) % 1.0 - 0.5) * 20))  # 60 bpm
    f = report.signal_features(sig, fs)
    assert abs(f["heart_rate"] - 60.0) < 5.0


@pytest.fixture(scope="module")
def demo_pipeline():
    return ServingPipeline.demo()


@pytest.fixture(scope="module")
def server(demo_pipeline):
    # ephemeral port: a fixed one collides when two suites overlap
    httpd = serve(demo_pipeline, port=0, background=True)
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _multipart(fields):
    from ecgmm_tpu.serve.api import encode_multipart

    return encode_multipart(fields, boundary="testboundary123")


def test_http_endpoint_full_contract(server):
    from PIL import Image

    cohort = synthetic.make_cohort(n=1, signal_len=2476, img_hw=(250, 2500))
    buf = io.BytesIO()
    Image.fromarray(cohort.images[0]).save(buf, format="JPEG")
    questionnaire = {"age": 66, "weight": 72, "height": 170, "sex": "F"}
    body, ctype = _multipart(
        {
            "file": ("photo.jpg", buf.getvalue()),
            "questionnaire": (None, json.dumps(questionnaire).encode()),
        }
    )
    req = urllib.request.Request(
        server + ENDPOINT, data=body,
        headers={"Content-Type": ctype},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        assert resp.status == 200
        data = json.loads(resp.read())

    # ResultScreen.tsx contract
    assert data["label"] in ("Normal", "Abnormal")
    assert 0.0 <= data["probability"] <= 1.0
    assert len(data["ecg_signal"]) > 100
    assert "Voltage (mV)" in data["ecg_signal"][0]
    png = base64.b64decode(data["heatmap"])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    fi = data["feature_importance"]
    assert set(fi) == {"image", "signal", "age", "wt"}
    assert abs(sum(fi.values()) - 100.0) < 1.0
    dig = data["digitization"]
    assert dig["scale_source"] in ("grid", "explicit", "assumed")
    assert dig["px_per_mv"] > 0
    assert 0.0 <= dig["ink_fraction"] <= 1.0
    assert set(data["gpt_result"]) == set(report.SECTIONS)


@pytest.mark.parametrize("fmt", ["jpeg", "cam"])
def test_http_endpoint_heatmap_format_opt_in(server, fmt):
    """heatmap_format multipart field: "jpeg" swaps the overlay encode to
    JPEG (heatmap_mime added), "cam" skips the overlay entirely and
    returns the raw low-res Grad-CAM grid (VERDICT r2 #6 — the PNG encode
    was the largest host cost of a warm request)."""
    from PIL import Image

    cohort = synthetic.make_cohort(n=1, signal_len=2476, img_hw=(250, 2500))
    buf = io.BytesIO()
    Image.fromarray(cohort.images[0]).save(buf, format="JPEG")
    body, ctype = _multipart(
        {
            "file": ("photo.jpg", buf.getvalue()),
            "questionnaire": (None, json.dumps({"age": 60}).encode()),
            "heatmap_format": (None, fmt.encode()),
        }
    )
    req = urllib.request.Request(
        server + ENDPOINT, data=body,
        headers={"Content-Type": ctype}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        data = json.loads(resp.read())
    assert data["label"] in ("Normal", "Abnormal")
    if fmt == "jpeg":
        assert data["heatmap_mime"] == "image/jpeg"
        jpg = base64.b64decode(data["heatmap"])
        assert jpg[:3] == b"\xff\xd8\xff"
    else:
        assert data["heatmap"] == ""
        cam = np.asarray(data["heatmap_cam"], np.float32)
        assert cam.ndim == 2 and cam.size > 0
        assert np.isfinite(cam).all()


def test_web_client_page(server):
    with urllib.request.urlopen(server + "/", timeout=60) as resp:
        assert resp.status == 200
        html = resp.read().decode()
    assert "upload-ecgImage-lead2only" in html
    assert "feature_importance" in html


def _post_raw(server, body, ctype="multipart/form-data; boundary=b",
              headers=None):
    req = urllib.request.Request(
        server + ENDPOINT, data=body,
        headers={"Content-Type": ctype, **(headers or {})}, method="POST",
    )
    return urllib.request.urlopen(req, timeout=60)


def test_http_endpoint_client_errors_are_400(server):
    """Validation failures must be 400s with a JSON error, not blanket
    500s: missing file field, undecodable image, malformed questionnaire,
    non-object questionnaire, missing multipart boundary."""
    good_img = io.BytesIO()
    from PIL import Image

    Image.fromarray(
        np.zeros((20, 40, 3), np.uint8)
    ).save(good_img, format="JPEG")

    cases = []
    body, ctype = _multipart({"notfile": (None, b"x")})
    cases.append((body, ctype, "missing multipart field 'file'"))
    body, ctype = _multipart({"file": ("f.jpg", b"not an image")})
    cases.append((body, ctype, "not a decodable image"))
    body, ctype = _multipart({
        "file": ("f.jpg", good_img.getvalue()),
        "questionnaire": (None, b"{broken"),
    })
    cases.append((body, ctype, "not valid JSON"))
    body, ctype = _multipart({
        "file": ("f.jpg", good_img.getvalue()),
        "questionnaire": (None, b"[1, 2]"),
    })
    cases.append((body, ctype, "must be a JSON object"))
    cases.append((b"xx", "application/octet-stream", "boundary"))
    body, ctype = _multipart({
        "file": ("f.jpg", good_img.getvalue()),
        "questionnaire": (None, b"{}"),
        "heatmap_format": (None, b"jpg"),  # typo for jpeg: reject, don't
    })                                      # silently coerce to png
    cases.append((body, ctype, "unknown heatmap_format"))
    blank = io.BytesIO()  # decodable image with no ECG in it
    Image.fromarray(np.full((250, 500, 3), 245, np.uint8)).save(
        blank, format="JPEG"
    )
    body, ctype = _multipart({
        "file": ("f.jpg", blank.getvalue()),
        "questionnaire": (None, b"{}"),
    })
    cases.append((body, ctype, "no ECG trace"))

    for body, ctype, want in cases:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_raw(server, body, ctype)
        assert e.value.code == 400, want
        assert want in json.loads(e.value.read())["error"]


def test_http_endpoint_oversize_body_is_413(server):
    """A huge claimed Content-Length must be rejected BEFORE the server
    allocates for it (no body of that size is ever sent)."""
    import http.client

    from ecgmm_tpu.serve.api import MAX_REQUEST_BYTES

    host = server.split("//")[1]
    conn = http.client.HTTPConnection(host, timeout=60)
    try:
        conn.putrequest("POST", ENDPOINT)
        conn.putheader("Content-Type", "multipart/form-data; boundary=b")
        conn.putheader("Content-Length", str(MAX_REQUEST_BYTES + 1))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        assert "exceeds" in json.loads(resp.read())["error"]
    finally:
        conn.close()


def test_http_endpoint_404(server):
    req = urllib.request.Request(
        server + "/nope", data=b"x", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 404


def test_clinical_attribution_is_per_feature(demo_pipeline):
    """Age and wt must get their own attributions (ResultScreen renders
    them as separate pie slices); round 1 fabricated a 50/50 split."""
    import jax.numpy as jnp

    p = demo_pipeline
    img = jnp.zeros((1, 224, 224, 3), jnp.float32)
    sig = jnp.zeros((1, 2476), jnp.float32)

    # Exact IG property with a zero baseline: a feature AT the baseline
    # (wt = 0 here) has exactly zero attribution, while age != 0 pulls.
    clin = jnp.asarray([[2.0, 0.0]], jnp.float32)
    attr = np.asarray(p._clin_attr(img, sig, clin, jnp.asarray(1)))
    assert attr.shape == (2,)
    assert attr[1] == 0.0
    assert attr[0] != 0.0

    # generic inputs: the two dimensions differ (no fabricated tie)
    clin2 = jnp.asarray([[1.5, -0.7]], jnp.float32)
    attr2 = np.asarray(p._clin_attr(img, sig, clin2, jnp.asarray(0)))
    assert attr2[0] != attr2[1]


def test_scene_photo_feeds_cropped_strip_to_image_branch(demo_pipeline):
    """A strip photographed on a table: the image encoder and the
    Grad-CAM overlay must see the LOCATED STRIP, not the whole scene —
    the heatmap's pixel dimensions therefore match the crop box, and
    the digitization metadata records that a crop happened."""
    import sys

    from PIL import Image

    sys.path.insert(0, os.path.dirname(__file__))
    from test_digitize_robust import _embed_in_photo, _render, _signal

    sig, _ = _signal(seed=30)
    photo = _embed_in_photo(_render(sig, grid_step=10), offset=(300, 250))
    out = demo_pipeline.predict(photo, {"age": 60, "weight": 70})
    dig = out["digitization"]
    assert dig["crop"] is not None
    y0, y1, x0, x1 = dig["crop"]
    heat = Image.open(io.BytesIO(base64.b64decode(out["heatmap"])))
    assert heat.size == (x1 - x0, y1 - y0)
    assert heat.size != (photo.shape[1], photo.shape[0])


def test_feature_importance_age_wt_not_tied(server):
    from PIL import Image

    cohort = synthetic.make_cohort(n=1, signal_len=2476, img_hw=(250, 2500))
    buf = io.BytesIO()
    Image.fromarray(cohort.images[0]).save(buf, format="JPEG")
    body, ctype = _multipart(
        {
            "file": ("photo.jpg", buf.getvalue()),
            "questionnaire": (
                None,
                json.dumps({"age": 80, "weight": 55}).encode(),
            ),
        }
    )
    req = urllib.request.Request(
        server + ENDPOINT, data=body,
        headers={"Content-Type": ctype}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        fi = json.loads(resp.read())["feature_importance"]
    assert fi["age"] != fi["wt"]
    assert fi["age"] >= 0.0 and fi["wt"] >= 0.0


def test_health_and_stats_endpoints(server):
    from PIL import Image

    h = json.load(urllib.request.urlopen(server + "/healthz", timeout=60))
    assert h == {"status": "ok"}

    # issue one POST ourselves so the assertions hold under test isolation
    cohort = synthetic.make_cohort(n=1, signal_len=2476, img_hw=(250, 2500))
    buf = io.BytesIO()
    Image.fromarray(cohort.images[0]).save(buf, format="PNG")
    body, ctype = _multipart({
        "file": ("e.png", buf.getvalue()),
        "questionnaire": (None, json.dumps({"age": 60}).encode()),
    })
    req = urllib.request.Request(server + ENDPOINT, data=body,
                                 headers={"Content-Type": ctype},
                                 method="POST")
    urllib.request.urlopen(req, timeout=600).read()

    s = json.load(urllib.request.urlopen(server + "/stats", timeout=60))
    assert s["requests"] >= 1
    assert s["mean_latency_ms"] > 0.0
    assert s["aot"] is False
    assert s["batching"] is None  # demo server runs unbatched


def test_sex_from_questionnaire_gender_mapping():
    """The app posts the radio key 'gender' ('0' male / '1' female); the
    report layer must receive a sex, not None (round-2 review finding)."""
    from ecgmm_tpu.serve.api import _sex_from_questionnaire

    assert _sex_from_questionnaire({"gender": "0"}) == "M"
    assert _sex_from_questionnaire({"gender": "1"}) == "F"
    assert _sex_from_questionnaire({"sex": "F", "gender": "0"}) == "F"
    assert _sex_from_questionnaire({}) is None


def test_encode_multipart_boundary_collision():
    """Binary content containing the default boundary must not truncate
    at the parser: the encoder lengthens the boundary until it collides
    with nothing (round-3 review finding)."""
    from ecgmm_tpu.serve.api import encode_multipart, parse_multipart

    evil = b"head\r\n--ecgmmboundary42\r\ntail" * 3
    body, ctype = encode_multipart({"file": ("f.bin", evil)})
    fields = parse_multipart(body, ctype)
    assert fields["file"] == evil


def test_r_peaks_survive_single_artifact_spike():
    """A lone photo-artifact spike 3x the true R amplitude must not raise
    the detection threshold past every real beat (round-3 review
    finding: the threshold anchors on a high percentile, not the max)."""
    fs = 250.0
    t = np.arange(2476) / fs
    sig = np.exp(-np.square(((t * 1.0) % 1.0 - 0.5) * 20))  # 60 bpm, ~1mV
    sig[700] = 3.0  # smudge/pen-mark spike
    f = report.signal_features(sig, fs)
    assert abs(f["heart_rate"] - 60.0) < 6.0


def test_questionnaire_non_numeric_is_400(server):
    """A valid-JSON questionnaire with a non-numeric age must be a 400,
    not a 500 from float('sixty') inside predict (round-3 review
    finding)."""
    from PIL import Image

    cohort = synthetic.make_cohort(n=1, signal_len=2476, img_hw=(250, 2500))
    buf = io.BytesIO()
    Image.fromarray(cohort.images[0]).save(buf, format="JPEG")
    body, ctype = _multipart({
        "file": ("f.jpg", buf.getvalue()),
        "questionnaire": (None, json.dumps({"age": "sixty"}).encode()),
    })
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_raw(server, body, ctype)
    assert e.value.code == 400
    assert "must be numeric" in json.loads(e.value.read())["error"]


def test_parse_multipart_preserves_trailing_crlf_bytes():
    """Binary field content legitimately ending in CR/LF must survive:
    bytes.strip(b'\\r\\n') ate every trailing 0x0D/0x0A (round-3 review
    finding)."""
    from ecgmm_tpu.serve.api import encode_multipart, parse_multipart

    payload = b"\x00\x01data\r\n\n\r"
    body, ctype = encode_multipart({"file": ("f.bin", payload)})
    assert parse_multipart(body, ctype)["file"] == payload


@pytest.mark.slow
def test_request_program_hlo_is_weight_independent():
    """The serving request program must NOT bake the weights in as HLO
    constants: two pipelines with different weights have to lower to the
    IDENTICAL program text, so a server restart with fresh weights hits
    the persistent compilation cache instead of re-paying the full
    relayed-TPU compile (6-20 min measured per demo() start before the
    weights became a bound argument)."""
    import jax
    import jax.numpy as jnp

    from ecgmm_tpu.config import ModelConfig
    from ecgmm_tpu.models.fusion import ECGMultimodalModel
    from ecgmm_tpu.serve.api import ServingPipeline

    mcfg = ModelConfig(dtype="float32")
    model = ECGMultimodalModel(cfg=mcfg)
    ex = (jnp.ones((1, 224, 224, 3)), jnp.ones((1, 2476)),
          jnp.ones((1, 2)))

    def lowered_text(seed):
        variables = model.init(jax.random.PRNGKey(seed), *ex)
        pipe = ServingPipeline(model, variables, temperature=1.5 + seed)
        return jax.jit(pipe._predict_all_impl).lower(
            pipe._weights, *ex
        ).as_text()

    t1, t2 = lowered_text(1), lowered_text(2)
    assert t1 == t2


def test_pipeline_rejects_garbage_temperature():
    """T ≤ 0 / NaN would serve inverted or garbage probabilities (the
    program divides by T) — the constructor must reject it like it
    rejects non-finite px_per_mv, not crash later inside program
    build."""
    import jax
    import jax.numpy as jnp

    from ecgmm_tpu.config import ModelConfig
    from ecgmm_tpu.models.fusion import ECGMultimodalModel
    from ecgmm_tpu.serve.api import ServingPipeline

    mcfg = ModelConfig(dtype="float32")
    model = ECGMultimodalModel(cfg=mcfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 224, 224, 3)),
        jnp.ones((1, 2476)), jnp.ones((1, 2)),
    )
    for bad in (0.0, -1.0, float("nan"), float("inf")):
        with pytest.raises(ValueError, match="temperature"):
            ServingPipeline(model, variables, temperature=bad)


def test_metrics_endpoint_prometheus(server):
    """/metrics: text exposition with a latency histogram consistent
    with /stats, and an error counter that moves on bad requests."""
    import re

    from PIL import Image

    # one successful request so the counters are non-zero under isolation
    cohort = synthetic.make_cohort(n=1, signal_len=2476, img_hw=(250, 2500))
    buf = io.BytesIO()
    Image.fromarray(cohort.images[0]).save(buf, format="PNG")
    body, ctype = _multipart({
        "file": ("e.png", buf.getvalue()),
        "questionnaire": (None, json.dumps({"age": 60}).encode()),
    })
    req = urllib.request.Request(server + ENDPOINT, data=body,
                                 headers={"Content-Type": ctype},
                                 method="POST")
    urllib.request.urlopen(req, timeout=600).read()

    resp = urllib.request.urlopen(server + "/metrics", timeout=60)
    assert resp.headers["Content-Type"].startswith("text/plain")
    text = resp.read().decode()

    # histogram: cumulative buckets, +Inf bucket == _count == /stats
    buckets = [
        int(v) for v in re.findall(
            r'ecgmm_request_latency_seconds_bucket\{le="[^"]+"\} (\d+)',
            text,
        )
    ]
    assert buckets and buckets == sorted(buckets)
    assert re.search(
        r'ecgmm_request_latency_seconds_bucket\{le="\+Inf"\}', text
    )
    count = int(
        re.search(r"ecgmm_request_latency_seconds_count (\d+)", text)
        .group(1)
    )
    assert buckets[-1] == count >= 1
    stats = json.load(urllib.request.urlopen(server + "/stats", timeout=60))
    assert count == stats["requests"]
    lat_sum = float(
        re.search(r"ecgmm_request_latency_seconds_sum ([\d.]+)", text)
        .group(1)
    )
    assert lat_sum > 0.0
    assert "ecgmm_batching_enabled 0" in text  # demo server runs unbatched

    # a malformed POST (undecodable image) must move the error counter
    errs_before = int(
        re.search(r"ecgmm_request_errors_total (\d+)", text).group(1)
    )
    assert errs_before == stats["errors"]
    bad_body, bad_ctype = _multipart({
        "file": ("junk.bin", b"not an image"),
    })
    bad = urllib.request.Request(server + ENDPOINT, data=bad_body,
                                 headers={"Content-Type": bad_ctype},
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(bad, timeout=60)
    assert ei.value.code == 400
    text2 = urllib.request.urlopen(
        server + "/metrics", timeout=60
    ).read().decode()
    errs_after = int(
        re.search(r"ecgmm_request_errors_total (\d+)", text2).group(1)
    )
    assert errs_after == errs_before + 1


def test_graceful_shutdown_drains_in_flight(demo_pipeline):
    """SIGTERM-style drain: a request whose body is still arriving when
    the drain fires must complete with a 200 before the server exits —
    GracefulHTTPServer joins the handler thread in server_close()
    instead of killing it mid-reply (ThreadingHTTPServer's daemon
    default)."""
    import socket
    import threading
    import time

    from PIL import Image

    from ecgmm_tpu.serve.api import (
        GracefulHTTPServer,
        install_graceful_shutdown,
        make_handler,
    )

    httpd = GracefulHTTPServer(
        ("127.0.0.1", 0), make_handler(demo_pipeline)
    )
    loop = threading.Thread(target=httpd.serve_forever)
    loop.start()
    try:
        port = httpd.server_address[1]
        cohort = synthetic.make_cohort(
            n=1, signal_len=2476, img_hw=(250, 2500)
        )
        buf = io.BytesIO()
        Image.fromarray(cohort.images[0]).save(buf, format="PNG")
        body, ctype = _multipart({
            "file": ("e.png", buf.getvalue()),
            "questionnaire": (None, json.dumps({"age": 60}).encode()),
        })
        head = (
            f"POST {ENDPOINT} HTTP/1.1\r\nHost: t\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()

        s = socket.create_connection(("127.0.0.1", port), timeout=120)
        try:
            # deliver all but the tail: the handler thread blocks inside
            # rfile.read(length) — guaranteed in-flight when we drain
            s.sendall(head + body[:-64])
            time.sleep(0.5)

            drain = install_graceful_shutdown(httpd, demo_pipeline)
            drain()  # what SIGTERM/SIGINT invoke
            # accept loop exits even though the request is unfinished
            loop.join(timeout=30)
            assert not loop.is_alive()

            s.sendall(body[-64:])  # now let the in-flight request finish
            s.settimeout(600)
            chunks = []
            while True:
                c = s.recv(65536)
                if not c:
                    break
                chunks.append(c)
            raw = b"".join(chunks)
        finally:
            s.close()
        assert raw.startswith(b"HTTP/1.0 200"), raw[:80]
        payload = json.loads(raw.split(b"\r\n\r\n", 1)[1])
        assert payload["label"] in ("Normal", "Abnormal")

        # the drain: joins the (non-daemon) handler threads
        httpd.server_close()
    finally:
        if loop.is_alive():  # defensive: never leak the accept loop
            httpd.shutdown()
            loop.join(timeout=10)
            httpd.server_close()


def test_metrics_leak_gauges_and_soak_scraper(server):
    """Round-5 soak support: /metrics carries the RSS and live-device-
    buffer leak gauges, and serve_hammer's scraper parses the live
    exposition (names, gauges, histogram buckets)."""
    from ecgmm_tpu.tools import serve_hammer

    m = serve_hammer._scrape_metrics(server)
    assert m["ecgmm_process_rss_bytes"] > 1e6  # a real process RSS
    assert "ecgmm_live_buffer_bytes" in m
    assert any(k.startswith("bucket_") for k in m)
    assert "ecgmm_requests_total" in m


def test_soak_histogram_percentiles_interpolate():
    """_hist_percentile: linear interpolation within the cumulative
    bucket delta between two scrapes."""
    from ecgmm_tpu.tools.serve_hammer import _hist_percentile

    m0 = {"bucket_0.05": 10, "bucket_0.1": 10, "bucket_0.2": 10,
          "bucket_+Inf": 10}
    m1 = {"bucket_0.05": 10, "bucket_0.1": 60, "bucket_0.2": 110,
          "bucket_+Inf": 110}
    assert abs(_hist_percentile(m0, m1, 0.5) - 0.1) < 1e-9
    assert abs(_hist_percentile(m0, m1, 0.9) - 0.18) < 1e-9
    assert abs(_hist_percentile(m0, m1, 0.99) - 0.198) < 1e-9
    assert _hist_percentile(m0, m0, 0.5) == 0.0


def test_max_requests_recycle_drains_and_exits(demo_pipeline):
    """--max-requests worker recycling: after N served predictions the
    accept loop exits (graceful drain) so the process can exit 0 and a
    supervisor restarts it — the production bound on the axon relay
    client's per-upload-byte host-RSS growth (BASELINE 'Serving
    soak')."""
    import threading

    from PIL import Image

    from ecgmm_tpu.serve.http import (
        GracefulHTTPServer,
        install_max_requests_recycle,
        make_handler,
    )

    start = demo_pipeline.stats()["requests"]
    httpd = GracefulHTTPServer(("127.0.0.1", 0),
                               make_handler(demo_pipeline))
    install_max_requests_recycle(httpd, demo_pipeline, start + 2)
    t = threading.Thread(target=httpd.serve_forever)
    t.start()
    try:
        cohort = synthetic.make_cohort(n=1, signal_len=2476,
                                       img_hw=(250, 2500))
        buf = io.BytesIO()
        Image.fromarray(cohort.images[0]).save(buf, format="PNG")
        body, ctype = _multipart({
            "file": ("e.png", buf.getvalue()),
            "questionnaire": (None, json.dumps({"age": 60}).encode()),
        })
        url = (f"http://127.0.0.1:{httpd.server_address[1]}"
               + ENDPOINT)
        for _ in range(2):
            req = urllib.request.Request(
                url, data=body, headers={"Content-Type": ctype},
                method="POST",
            )
            urllib.request.urlopen(req, timeout=600).read()
        # the 2nd request trips the recycle: serve_forever must return
        t.join(timeout=30)
        assert not t.is_alive(), "accept loop did not drain after " \
                                 "max_requests"
        assert demo_pipeline.stats()["requests"] == start + 2
    finally:
        if t.is_alive():
            httpd.shutdown()
            t.join(timeout=10)
        httpd.server_close()
        demo_pipeline.on_request_done = None
