"""tools/trace_report: device-plane extraction + rollups over a
synthetic chrome-trace file."""

import gzip
import json
import os

from ecgmm_tpu.tools import trace_report


def _write_trace(tmp_path):
    tr = {
        "traceEvents": [
            {"ph": "M", "pid": 3, "name": "process_name",
             "args": {"name": "/device:TPU:0"}},
            {"ph": "M", "pid": 9, "name": "process_name",
             "args": {"name": "/host:CPU"}},
            # module + step rows must be excluded from op rollups
            {"ph": "X", "pid": 3, "tid": 1, "name": "jit_step(123)",
             "dur": 1000, "ts": 0},
            {"ph": "X", "pid": 3, "tid": 2, "name": "0", "dur": 900,
             "ts": 0},
            {"ph": "X", "pid": 3, "tid": 3, "name": "conv_fusion.1",
             "dur": 600, "ts": 0,
             "args": {"hlo_category": "convolution fusion",
                      "bytes_accessed": "600000"}},
            {"ph": "X", "pid": 3, "tid": 3, "name": "conv_fusion.1",
             "dur": 600, "ts": 700,
             "args": {"hlo_category": "convolution fusion",
                      "bytes_accessed": "600000"}},
            {"ph": "X", "pid": 3, "tid": 3, "name": "loop_fusion.7",
             "dur": 100, "ts": 650,
             "args": {"hlo_category": "loop fusion",
                      "bytes_accessed": "400000"}},
            # host event: excluded entirely
            {"ph": "X", "pid": 9, "tid": 1, "name": "python", "dur": 5000,
             "ts": 0},
        ]
    }
    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump(tr, f)
    return str(tmp_path)


def test_device_events_and_rollups(tmp_path):
    root = _write_trace(tmp_path)
    rows = trace_report.op_rows(trace_report.load_device_events(root))
    # module/step/host rows excluded
    assert {r["name"] for r in rows} == {"conv_fusion.1", "loop_fusion.7"}
    by_cat = trace_report.rollup(rows, "category")
    us, by, n = by_cat["convolution fusion"]
    assert (us, by, n) == (1200.0, 1200000, 2)
    assert by_cat["loop fusion"] == (100.0, 400000, 1)


def test_print_report_runs(tmp_path, capsys):
    root = _write_trace(tmp_path)
    trace_report.print_report(root, steps=2, top=5)
    out = capsys.readouterr().out
    assert "by hlo_category" in out and "convolution fusion" in out
    # 1300us over 2 steps = 0.650 ms/step
    assert "0.650 ms/step" in out
