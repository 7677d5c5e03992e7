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
        "latency_p99_ms": round(pct(0.99) * 1e3, 1),
    }


# -- sustained soak ---------------------------------------------------------

def _scrape_metrics(base_url: str) -> dict:
    """Parse the server's /metrics exposition into a flat dict:
    counters/gauges by name, histogram buckets as
    {'bucket_<le>': cumulative_count}."""
    with urllib.request.urlopen(base_url + "/metrics", timeout=30) as r:
        text = r.read().decode()
    out: dict = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        name, _, value = line.rpartition(" ")
        if "_bucket{le=" in name:
            le = name.split('le="')[1].split('"')[0]
            out[f"bucket_{le}"] = float(value)
        else:
            out[name] = float(value)
    return out


def _hist_percentile(m0: dict, m1: dict, q: float) -> float:
    """q-quantile (seconds) of the latency histogram DELTA between two
    scrapes, linearly interpolated within the bucket."""
    les, counts = [], []
    for k, v1 in m1.items():
        if k.startswith("bucket_"):
            le = k[len("bucket_"):]
            les.append(float("inf") if le == "+Inf" else float(le))
            counts.append(v1 - m0.get(k, 0.0))
    order = sorted(range(len(les)), key=lambda i: les[i])
    les = [les[i] for i in order]
    counts = [counts[i] for i in order]  # cumulative
    total = counts[-1]
    if total <= 0:
        return 0.0
    target = q * total
    prev_le, prev_c = 0.0, 0.0
    for le, c in zip(les, counts):
        if c >= target:
            if le == float("inf"):
                return prev_le
            span = c - prev_c
            frac = (target - prev_c) / span if span > 0 else 1.0
            return prev_le + frac * (le - prev_le)
        prev_le, prev_c = le, c
    return les[-2] if len(les) > 1 else 0.0


def soak(base_url: str, url: str, clients: int, seconds: float,
         heatmap_format: str = "png", min_requests: int = 0) -> dict:
    """Sustained load with leak/tail gates: hammer for `seconds`
    (extending until `min_requests` have completed), scraping /metrics
    at start, midpoint, and end. Reports server-histogram p50/p90/p99
    over exactly the soak window, client-side exact percentiles, the
    server error delta, and RSS + live device-buffer bytes at the three
    scrape points (the leak gate)."""
    m_start = _scrape_metrics(base_url)
    mid_holder: dict = {}
    timer = threading.Timer(
        seconds / 2,
        lambda: mid_holder.update(_scrape_metrics(base_url)),
    )
    timer.daemon = True
    timer.start()

    res = hammer(url, clients, seconds, heatmap_format)
    while res["requests"] < min_requests:
        extra = hammer(url, clients, seconds / 4, heatmap_format)
        for k in ("requests", "errors"):
            res[k] += extra[k]
    timer.cancel()
    m_end = _scrape_metrics(base_url)

    def tri(key):
        return [m.get(key) for m in (m_start, mid_holder, m_end)]

    return {
        **res,
        "soak_seconds": seconds,
        "server_hist_p50_ms": round(
            1e3 * _hist_percentile(m_start, m_end, 0.5), 1),
        "server_hist_p90_ms": round(
            1e3 * _hist_percentile(m_start, m_end, 0.9), 1),
        "server_hist_p99_ms": round(
            1e3 * _hist_percentile(m_start, m_end, 0.99), 1),
        "server_errors_delta": (
            m_end.get("ecgmm_request_errors_total", 0)
            - m_start.get("ecgmm_request_errors_total", 0)
        ),
        "rss_bytes_start_mid_end": tri("ecgmm_process_rss_bytes"),
        "live_buffer_bytes_start_mid_end": tri("ecgmm_live_buffer_bytes"),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--heatmap-format", default="png",
                   choices=("png", "jpeg", "cam"))
    p.add_argument("--soak", action="store_true",
                   help="sustained-soak mode: scrape /metrics at "
                        "start/mid/end, report server-histogram "
                        "p50/p90/p99, error delta, and RSS/live-buffer "
                        "leak gauges")
    p.add_argument("--min-requests", type=int, default=0,
                   help="soak only: keep hammering until at least this "
                        "many requests completed")
    args = p.parse_args(argv)

    from ecgmm_tpu.serve.api import ENDPOINT

    base = f"http://{args.host}:{args.port}"
    url = base + ENDPOINT
    if args.soak:
        print(json.dumps(soak(
            base, url, args.clients, args.seconds, args.heatmap_format,
            args.min_requests,
        )))
    else:
        print(json.dumps(hammer(
            url, args.clients, args.seconds, args.heatmap_format
        )))


if __name__ == "__main__":
    main()
