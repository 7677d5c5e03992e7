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


def _server_source() -> str:
    """The response-assembly source of truth (serve/request.py —
    assemble_response builds the ResultScreen response dict behind the
    api.py facade)."""
    with open(
        os.path.join(REPO, "ecgmm_tpu", "serve", "request.py"),
        encoding="utf-8",
    ) as f:
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
    server = _server_source()
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
    server = _server_source()
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


# ---------------------------------------------------------------------------
# No-toolchain verification floor (this image can never run node): a
# Python-side lint that makes the ~700 LoC of TSX impossible to break
# TRIVIALLY — unresolvable imports, contract drift between the client's
# AnalysisResult type and the server response, or inconsistent packaging
# metadata — even though it cannot type-check.
# ---------------------------------------------------------------------------

_TS_EXTS = (".ts", ".tsx")


def _mobile_sources():
    out = {}
    for root, dirs, files in os.walk(MOBILE):
        dirs[:] = [d for d in dirs if d != "node_modules"]
        for f in files:
            if f.endswith(_TS_EXTS):
                p = os.path.join(root, f)
                with open(p, encoding="utf-8") as fh:
                    out[os.path.relpath(p, MOBILE)] = fh.read()
    return out


def _imports(src: str):
    """All import module specifiers: `import … from 'X'`, `import 'X'`,
    `export … from 'X'`, `require('X')`."""
    pats = [
        r"import\s+(?:type\s+)?[\w{}*,\s]+?\s+from\s+['\"]([^'\"]+)['\"]",
        r"import\s+['\"]([^'\"]+)['\"]",
        r"export\s+[\w{}*,\s]+?\s+from\s+['\"]([^'\"]+)['\"]",
        r"require\(['\"]([^'\"]+)['\"]\)",
    ]
    found = []
    for p in pats:
        found.extend(re.findall(p, src))
    return found


def _resolves_local(base_dir: str, spec: str) -> bool:
    target = os.path.normpath(os.path.join(MOBILE, base_dir, spec))
    if os.path.isfile(target) and target.endswith(_TS_EXTS):
        return True
    for ext in _TS_EXTS + (".js", ".json"):
        if os.path.isfile(target + ext):
            return True
    return any(
        os.path.isfile(os.path.join(target, "index" + ext))
        for ext in _TS_EXTS
    )


def test_mobile_import_graph_resolves():
    """Every local import in mobile/**/*.ts(x) must resolve to a file
    (with TS extension/index conventions, incl. the tsconfig '@/'
    alias), and every package import's root must be a declared
    package.json dependency — a renamed/deleted module or a missing dep
    fails here, not on a phone."""
    import json as _json

    pkg = _json.loads(_read("package.json"))
    deps = set(pkg.get("dependencies", {})) | set(
        pkg.get("devDependencies", {})
    )
    srcs = _mobile_sources()
    assert len(srcs) >= 7, sorted(srcs)  # the app's known module count
    for rel, src in srcs.items():
        base = os.path.dirname(rel)
        for spec in _imports(src):
            if spec.startswith("."):
                assert _resolves_local(base, spec), (
                    f"{rel}: unresolvable local import {spec!r}"
                )
            elif spec.startswith("@/"):
                # tsconfig paths alias '@/*' → './*'
                assert _resolves_local("", spec[2:]), (
                    f"{rel}: unresolvable aliased import {spec!r}"
                )
            else:
                root = "/".join(spec.split("/")[:2]) \
                    if spec.startswith("@") else spec.split("/")[0]
                assert root in deps or root in ("react",), (
                    f"{rel}: package import {spec!r} not in "
                    "package.json dependencies"
                )


def test_analysis_result_type_matches_server_response():
    """Every field of the client's AnalysisResult interface must be a
    key the server actually emits (serve/pipeline.py response dict), and
    every always-present server key must be typed on the client — the
    wire contract can't drift in either direction."""
    api_ts = _read("lib", "api.ts")
    m = re.search(
        r"interface AnalysisResult \{(.*?)\n\}", api_ts, re.S
    )
    assert m, "AnalysisResult interface not found in lib/api.ts"
    client_fields = set(re.findall(r"^\s{2}(\w+)\??:", m.group(1), re.M))
    assert client_fields, "no fields parsed from AnalysisResult"
    server = _server_source()
    rm = re.search(r"\n(\s+)resp = \{(.*?)\n\1\}", server, re.S)
    assert rm, "response dict not found in serve/request.py"
    always = set(re.findall(r'"(\w+)":', rm.group(2)))
    # keys attached only for non-default heatmap_format requests
    # (resp["…"] = …) — the app never requests those, so the client may
    # omit them but must not invent fields beyond always ∪ conditional
    conditional = set(re.findall(r'resp\["(\w+)"\] =', server))
    unknown = client_fields - always - conditional
    assert not unknown, (
        f"client types fields the server never emits: {unknown}"
    )
    untyped_on_client = always - client_fields
    assert not untyped_on_client, (
        f"server always emits fields the client type misses: "
        f"{untyped_on_client}"
    )


def test_packaging_metadata_consistent():
    """package.json / app.json / tsconfig.json must agree: every expo
    plugin and the router entry are declared dependencies, the pinned
    Expo SDK matches its react-native/react pairing (SDK 53 ⇒ RN 0.79 /
    React 19), and the tsconfig alias used by the import lint exists."""
    import json as _json

    pkg = _json.loads(_read("package.json"))
    app = _json.loads(_read("app.json"))["expo"]
    ts = _json.loads(_read("tsconfig.json"))
    deps = pkg["dependencies"]
    for plugin in app.get("plugins", []):
        name = plugin[0] if isinstance(plugin, list) else plugin
        assert name in deps, f"app.json plugin {name} not a dependency"
    assert pkg["main"].split("/")[0] in deps        # expo-router/entry
    assert deps["expo"].startswith("53."), deps["expo"]
    assert deps["react-native"].startswith("0.79."), deps["react-native"]
    assert deps["react"].startswith("19."), deps["react"]
    assert pkg["devDependencies"]["typescript"].startswith("5.")
    url = app["extra"]["serverUrl"]
    assert re.match(r"^https?://[\w.:-]+$", url), url
    assert "@/*" in ts["compilerOptions"]["paths"]
    assert pkg["scripts"]["typecheck"] == "tsc --noEmit"
