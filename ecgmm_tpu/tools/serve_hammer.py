"""Concurrent serving load test ("the 8-client hammer", BASELINE.md).

Hits a running ecgmm_tpu serving endpoint with N client threads posting
the same multipart request (rendered synthetic strip + questionnaire) for
a fixed duration, and reports req/s + latency percentiles. Used to
measure the end-to-end effect of micro-batching and of the
`heatmap_format` opt-ins (png / jpeg / cam).

    python -m ecgmm_tpu.serve.api --synthetic --port 8080 &
    python -m ecgmm_tpu.tools.serve_hammer --port 8080 --clients 8 \
        --seconds 20 --heatmap-format jpeg
"""

from __future__ import annotations

import argparse
import io
import json
import math
import threading
import time
import urllib.request
from typing import List


def _request_body(heatmap_format: str):
    from PIL import Image

    from ecgmm_tpu.data import synthetic
    from ecgmm_tpu.serve.api import encode_multipart

    cohort = synthetic.make_cohort(n=1, signal_len=2476, img_hw=(250, 2500))
    buf = io.BytesIO()
    Image.fromarray(cohort.images[0]).save(buf, format="JPEG")
    fields = {
        "file": ("photo.jpg", buf.getvalue()),
        "questionnaire": (
            None, json.dumps({"age": 66, "weight": 72}).encode()
        ),
    }
    if heatmap_format != "png":
        fields["heatmap_format"] = (None, heatmap_format.encode())
    return encode_multipart(fields)


def hammer(url: str, clients: int, seconds: float,
           heatmap_format: str = "png") -> dict:
    body, ctype = _request_body(heatmap_format)
    latencies: List[float] = []
    errors = [0]
    lock = threading.Lock()
    stop_at = [0.0]

    def worker():
        while time.perf_counter() < stop_at[0]:
            req = urllib.request.Request(
                url, data=body, headers={"Content-Type": ctype},
                method="POST",
            )
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=600) as resp:
                    resp.read()
                dt = time.perf_counter() - t0
                with lock:
                    latencies.append(dt)
            except Exception:
                with lock:
                    errors[0] += 1

    # one warmup request (compile/caches) before the timed window
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": ctype}, method="POST"
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        resp.read()

    stop_at[0] = time.perf_counter() + seconds
    t_start = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start

    lat = sorted(latencies)

    def pct(p):
        # nearest-rank: ceil(p*n)-1 — int(p*n) is one rank high whenever
        # p*n is integral (pct(0.9) of 10 samples returned the MAX)
        if not lat:
            return 0.0
        return lat[min(len(lat) - 1,
                       max(0, math.ceil(p * len(lat)) - 1))]

    return {
        "clients": clients,
        "heatmap_format": heatmap_format,
        "requests": len(lat),
        "errors": errors[0],
        "req_per_sec": round(len(lat) / wall, 2),
        "latency_median_ms": round(pct(0.5) * 1e3, 1),
        "latency_p90_ms": round(pct(0.9) * 1e3, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--heatmap-format", default="png",
                   choices=("png", "jpeg", "cam"))
    args = p.parse_args(argv)

    from ecgmm_tpu.serve.api import ENDPOINT

    url = f"http://{args.host}:{args.port}{ENDPOINT}"
    print(json.dumps(hammer(
        url, args.clients, args.seconds, args.heatmap_format
    )))


if __name__ == "__main__":
    main()
