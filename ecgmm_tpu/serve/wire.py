"""Request/response wire helpers shared by the serving pipeline, the HTTP
transport, the client tools, and the tests: the mobile app's endpoint
path (`Groove/components/SubmitButton.tsx:35-48`), a minimal
multipart/form-data codec (stdlib cgi is deprecated), questionnaire
field coercion, and the client-defect exception the transport maps to
HTTP 400. Everything here is bytes/str-shaped — no model, no JAX."""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

ENDPOINT = "/api/public/upload-ecgImage-lead2only"


class BadRequest(ValueError):
    """Client-side request defect → HTTP 400 with a JSON error body."""


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
