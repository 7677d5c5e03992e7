"""The Expo client (mobile/) and the serving layer speak the same wire
contract. There is no node toolchain in this image, so the TypeScript is
checked lexically against the Python source of truth: endpoint path,
questionnaire keys, and the result-JSON fields."""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MOBILE = os.path.join(REPO, "mobile")


def _read(*rel):
    with open(os.path.join(MOBILE, *rel), encoding="utf-8") as f:
        return f.read()


def test_endpoint_matches_server():
    from ecgmm_tpu.serve.api import ENDPOINT

    assert f"'{ENDPOINT}'" in _read("lib", "api.ts")


def test_questionnaire_keys_cover_server_fields():
    """Keys the server reads from the questionnaire must be producible by
    the form (serve/api.py uses age + weight; the full clinical schema
    matches the reference app's field set)."""
    form = _read("components", "QuestionnaireForm.tsx")
    keys = set(re.findall(r"key: '([a-z_]+)'", form))
    # numeric + choice groups the server/report layer consumes
    for needed in ("age", "height", "weight", "gender"):
        assert needed in keys, needed
    # the reference questionnaire schema (SubmitButton posts all fields)
    expected = {
        "age", "height", "weight", "gender", "smoke", "alcohol",
        "phy_act", "hx_stroke", "hx_mi", "hx_htn", "hx_dm", "hx_dysli",
        "hx_athero", "fhx_stroke", "fhx_mi", "fhx_htn", "fhx_dm",
    }
    assert expected <= keys, expected - keys


def test_result_fields_match_serving_response():
    """Every field the client renders must exist in the serving response
    (built in serve/api.py predict())."""
    api_ts = _read("lib", "api.ts")
    result_tsx = _read("app", "result.tsx")
    with open(
        os.path.join(REPO, "ecgmm_tpu", "serve", "api.py"), encoding="utf-8"
    ) as f:
        server = f.read()
    for field in ("label", "probability", "ecg_signal", "heatmap",
                  "feature_importance", "gpt_result", "digitization"):
        assert field in api_ts, field
        assert f'"{field}"' in server, field
    for slice_key in ("image", "signal", "age", "wt"):
        assert slice_key in result_tsx, slice_key
    assert "Voltage (mV)" in api_ts  # the ecg_signal row schema


def test_form_posts_multipart_like_server_expects():
    api_ts = _read("lib", "api.ts")
    assert "form.append('file'" in api_ts
    assert "form.append('questionnaire'" in api_ts


def test_label_type_pinned_to_string_union():
    """The serving layer emits `label` as the STRING "Abnormal"/"Normal"
    and the client branches on the string — pin both sides so a serving
    change can't silently flip every mobile verdict (the reference app
    expected numeric label===1, ResultScreen.tsx:175; this repo's
    deliberate string contract is a PARITY.md row)."""
    with open(
        os.path.join(REPO, "ecgmm_tpu", "serve", "api.py"), encoding="utf-8"
    ) as f:
        server = f.read()
    assert 'label = "Abnormal" if pred == 1 else "Normal"' in server
    assert "label: 'Normal' | 'Abnormal'" in _read("lib", "api.ts")
    assert "data.label === 'Abnormal'" in _read("app", "result.tsx")


def test_capture_share_flow_present():
    """Result capture/share parity (reference ResultScreen.tsx:67-91):
    view capture → ECG_Results media album → share sheet."""
    result_tsx = _read("app", "result.tsx")
    for token in (
        "captureRef", "MediaLibrary.requestPermissionsAsync",
        "MediaLibrary.createAssetAsync",
        "MediaLibrary.createAlbumAsync('ECG_Results'",
        "Sharing.isAvailableAsync", "Sharing.shareAsync",
    ):
        assert token in result_tsx, token
    pkg = _read("package.json")
    for dep in ("react-native-view-shot", "expo-media-library",
                "expo-sharing"):
        assert dep in pkg, dep


def test_typescript_typecheck_when_toolchain_available():
    """`tsc --noEmit` gate over the Expo app. The CI image has no node
    toolchain and no network (a real package lock cannot be minted —
    package.json pins exact versions instead), so this runs wherever
    node_modules exists and skips honestly otherwise."""
    import shutil
    import subprocess

    tsc = shutil.which("tsc") or shutil.which("npx")
    has_modules = os.path.isdir(os.path.join(MOBILE, "node_modules"))
    if not (tsc and has_modules):
        pytest.skip("node toolchain / node_modules unavailable offline")
    cmd = (
        [tsc, "--noEmit"] if tsc.endswith("tsc")
        else [tsc, "tsc", "--", "--noEmit"]
    )
    proc = subprocess.run(
        cmd, cwd=MOBILE, capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
