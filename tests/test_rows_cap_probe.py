"""Rows-cap probe (tools/rows_cap_probe.py) + the loud inert-guard
report in the fold-parallel harness (VERDICT r4 weak-point #5: the wave
caps rested on one crash datapoint and the byte-budget guard's
inertness on the relayed backend was silent)."""

import numpy as np
import pytest

from ecgmm_tpu.tools import rows_cap_probe


def test_search_finds_cliff():
    """Bisection brackets the cliff to one step for any threshold."""
    for cliff in (300, 512, 700, 1040):
        calls = []

        def trial(rows, _c=cliff):
            calls.append(rows)
            return rows <= _c

        out = rows_cap_probe.search(256, 2048, 16, trial)
        assert out["safe_rows"] <= cliff < out["first_failing_rows"]
        assert out["first_failing_rows"] - out["safe_rows"] == 16
        assert len(calls) <= 10  # log2((2048-256)/16) + 1


def test_search_no_cliff_in_range():
    out = rows_cap_probe.search(256, 1024, 16, lambda rows: True)
    assert out["safe_rows"] == 1024
    assert out["first_failing_rows"] is None


@pytest.mark.slow
def test_probe_trial_runs_one_wave():
    """The child-mode trial end-to-end on the CPU backend (signal-only
    config, tiny shapes): builds N identical folds, runs one uncapped
    wave, prints TRIAL_OK."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rows_cap_probe.run_trial(
            rows=16, batch_size=8, preset="signal_only", epochs=1,
        )
    assert "TRIAL_OK rows=16 folds=2" in buf.getvalue()


@pytest.mark.slow
def test_inert_byte_guard_is_reported_loudly(capsys, monkeypatch):
    """When the backend reports no bytes_limit and no env budget is
    set, a raw-pack fold-parallel run must SAY that the rows cap is the
    only active guard; with an explicit byte budget the message goes
    away."""
    import dataclasses

    from ecgmm_tpu.config import get_preset
    from ecgmm_tpu.data import synthetic
    from ecgmm_tpu.train import cv_parallel
    from ecgmm_tpu.workloads.run import build_model_and_task

    cfg = get_preset("signal_only")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, signal_len=192),
        train=dataclasses.replace(
            cfg.train, batch_size=8, num_epochs=1,
            patience=2, schedule="constant",
        ),
    )
    cohort = synthetic.make_cohort(n=40, signal_len=192, img_hw=(8, 16))

    class Split:
        def __init__(self, tr, va, te):
            self.train, self.val, self.test = tr, va, te

    rng = np.random.default_rng(0)
    perm = rng.permutation(40)
    folds = [Split(perm[:24], perm[24:32], perm[32:])] * 2

    monkeypatch.delenv("ECGMM_HBM_BUDGET_BYTES", raising=False)
    task, tx, state0, pack = cv_parallel.prepare_folds(
        build_model_and_task, cohort, folds, cfg, mesh=None,
    )
    cv_parallel.run_fold_parallel(
        task, tx, state0, pack, cfg.train, mesh=None, verbose=True,
    )
    out = capsys.readouterr().out
    assert "byte-budget guard INERT" in out
    assert "ONLY active wave guard" in out

    # with a byte budget the guard is live — no inertness message
    monkeypatch.setenv("ECGMM_HBM_BUDGET_BYTES", str(1 << 30))
    cv_parallel.run_fold_parallel(
        task, tx, state0, pack, cfg.train, mesh=None, verbose=True,
    )
    out2 = capsys.readouterr().out
    assert "INERT" not in out2
