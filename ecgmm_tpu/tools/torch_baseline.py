"""Baseline minting: faithful CPU re-execution of the reference's
signal-only training recipe in PyTorch vs this framework on identical
data.

The reference publishes zero benchmark numbers (BASELINE.md), so parity
gates need *measured* baselines. This module trains
  (a) a PyTorch ResNet1D_SE with the reference recipe
      (train_signal_only.py:115,234-238: bs 8, lr 1e-3, FocalLoss α=1 γ=2,
      OneCycleLR) — architecture identical to signal_model.py:59-88, and
  (b) this framework's ResNet1DSE with the same preset,
on the same synthetic cohort, split and preprocessing, and reports
epoch-time and test AUROC for both. Run:

    python -m ecgmm_tpu.tools.torch_baseline --epochs 5
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Dict

import numpy as np


def _build_torch_model(in_ch: int = 1, n_out: int = 2, base: int = 64):
    import torch.nn as tnn

    class SE(tnn.Module):
        def __init__(self, ch, red=16):
            super().__init__()
            self.pool = tnn.AdaptiveAvgPool1d(1)
            self.fc = tnn.Sequential(
                tnn.Linear(ch, ch // red), tnn.ReLU(),
                tnn.Linear(ch // red, ch), tnn.Sigmoid(),
            )

        def forward(self, x):
            b, c, _ = x.shape
            return x * self.fc(self.pool(x).view(b, c)).view(b, c, 1)

    class Block(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv1d(cin, cout, 3, stride=stride, padding=1)
            self.bn1 = tnn.BatchNorm1d(cout)
            self.relu = tnn.ReLU()
            self.conv2 = tnn.Conv1d(cout, cout, 3, padding=1)
            self.bn2 = tnn.BatchNorm1d(cout)
            self.se = SE(cout)
            self.down = (
                tnn.Sequential(tnn.Conv1d(cin, cout, 1, stride=stride),
                               tnn.BatchNorm1d(cout))
                if (cin != cout or stride != 1) else None
            )

        def forward(self, x):
            idt = self.down(x) if self.down else x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.se(self.bn2(self.conv2(out)))
            return self.relu(out + idt)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.initial = tnn.Sequential(
                tnn.Conv1d(in_ch, base, 7, stride=2, padding=3),
                tnn.BatchNorm1d(base), tnn.ReLU(),
                tnn.MaxPool1d(3, stride=2, padding=1),
            )
            self.layer1 = Block(base, base)
            self.layer2 = Block(base, base * 2, stride=2)
            self.layer3 = Block(base * 2, base * 4, stride=2)
            self.pool = tnn.AdaptiveAvgPool1d(1)
            self.classifier = tnn.Sequential(
                tnn.Flatten(), tnn.Linear(base * 4, 64), tnn.ReLU(),
                tnn.Dropout(0.3), tnn.Linear(64, n_out),
            )

        def forward(self, x):
            x = self.initial(x)
            x = self.layer3(self.layer2(self.layer1(x)))
            return self.classifier(self.pool(x))

    return Net()


def train_torch_reference(data, epochs: int, batch_size: int = 8,
                          lr: float = 1e-3, seed: int = 42) -> Dict:
    """Reference recipe on CPU torch. data: pipeline.MaterializedData."""
    import torch
    import torch.nn.functional as F
    from torch.utils.data import DataLoader, TensorDataset

    from ecgmm_tpu.train import metrics as M

    torch.manual_seed(seed)

    def to_ds(arr):
        x = torch.from_numpy(np.asarray(arr.signals, np.float32))
        if x.ndim == 2:
            x = x.unsqueeze(1)  # (N, 1, T)
        y = torch.from_numpy(np.asarray(arr.labels, np.int64))
        return TensorDataset(x, y)

    train_loader = DataLoader(
        to_ds(data.train), batch_size=batch_size, shuffle=True
    )
    val_loader = DataLoader(to_ds(data.val), batch_size=batch_size)
    model = _build_torch_model()
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=lr, total_steps=max(1, len(train_loader) * epochs)
    )

    def focal(logits, y, alpha=1.0, gamma=2.0):
        ce = F.cross_entropy(logits, y, reduction="none")
        pt = torch.exp(-ce)
        return (alpha * (1 - pt) ** gamma * ce).mean()

    # Per-epoch val pass INSIDE the timed region + best-val-loss
    # checkpointing: the reference trainer validates every epoch and
    # restores best.pth before test (train_signal_only.py:270-308), and
    # the jax arm's Time/Epoch includes its val eval — both sides must
    # measure the same protocol.
    epoch_times = []
    best_val, best_sd = float("inf"), None
    for _ in range(epochs):
        t0 = time.perf_counter()
        model.train()
        for xb, yb in train_loader:
            opt.zero_grad()
            loss = focal(model(xb), yb)
            loss.backward()
            opt.step()
            sched.step()
        model.eval()
        vloss, nb = 0.0, 0
        with torch.no_grad():
            for xb, yb in val_loader:
                vloss += float(focal(model(xb), yb))
                nb += 1
        epoch_times.append(time.perf_counter() - t0)
        vloss = vloss / max(nb, 1)
        if vloss < best_val:
            best_val = vloss
            best_sd = {k: v.clone() for k, v in model.state_dict().items()}

    if best_sd is not None:
        model.load_state_dict(best_sd)
    model.eval()
    with torch.no_grad():
        x = torch.from_numpy(np.asarray(data.test.signals, np.float32))
        if x.ndim == 2:
            x = x.unsqueeze(1)
        probs = torch.softmax(model(x), -1)[:, 1].numpy()
    labels = np.asarray(data.test.labels)
    return {
        "framework": "pytorch-cpu",
        "epoch_time_s": float(np.mean(epoch_times)),
        **M.summarize_binary(probs, labels),
    }


def train_jax(data, epochs: int, cfg=None) -> Dict:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ecgmm_tpu.config import signal_only_preset
    from ecgmm_tpu.data import pipeline
    from ecgmm_tpu.models import ResNet1DSE
    from ecgmm_tpu.parallel import make_mesh
    from ecgmm_tpu.train import engine, metrics as M, optim as optim_lib
    from ecgmm_tpu.train.state import create_state
    from ecgmm_tpu.workloads.tasks import make_signal_task

    cfg = cfg or signal_only_preset()
    t = dataclasses.replace(cfg.train, num_epochs=epochs, patience=1000)
    model = ResNet1DSE(num_classes=2)
    tx = optim_lib.make_optimizer(
        t, pipeline.num_batches(data.train.n, t.batch_size)
    )
    sig_len = data.train.signals.shape[-1]
    from ecgmm_tpu.models import jit_init

    variables = jit_init(model, jax.random.PRNGKey(t.seed),
                         jnp.ones((1, sig_len, 1)))
    state = create_state(variables, tx, jax.random.PRNGKey(t.seed))
    task = make_signal_task(model, t)
    mesh = make_mesh()
    result = engine.fit(
        task, state, tx, data.train, data.val, t, mesh=mesh,
        verbose=False, keep_best=True,
    )
    # first epoch includes compile; report steady-state epochs
    times = [h["Time/Epoch"] for h in result.history[1:]] or [
        result.history[0]["Time/Epoch"]
    ]
    # test the best-val state, like the reference protocol (and the
    # torch arm above)
    best = result.best_state if result.best_state is not None \
        else result.state
    ev = engine.evaluate(
        engine.make_eval_step(task), best, data.test, t.eval_bs,
        mesh,
    )
    probs = np.asarray(jax.nn.softmax(jnp.asarray(ev.logits))[:, 1])
    return {
        "framework": f"ecgmm_tpu-{jax.default_backend()}",
        "epoch_time_s": float(np.mean(times)),
        **M.summarize_binary(probs, ev.labels),
    }


def main(argv=None):
    from ecgmm_tpu.config import signal_only_preset
    from ecgmm_tpu.data import pipeline, preprocess, splits, synthetic

    import jax.numpy as jnp

    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--n", type=int, default=244)
    p.add_argument("--signal-len", type=int, default=2476)
    args = p.parse_args(argv)

    cohort = synthetic.make_cohort(
        n=args.n, signal_len=args.signal_len, img_hw=(16, 32), seed=42
    )
    split = splits.stratified_811(cohort.labels, 42)
    data = pipeline.materialize_signal(
        cohort.signals, cohort.labels, split,
        preprocess_fn=lambda s: np.asarray(
            preprocess.preprocess_hospital(jnp.asarray(s, jnp.float32))
        ),
    )
    torch_res = train_torch_reference(data, args.epochs)
    jax_res = train_jax(data, args.epochs)
    out = {"torch": torch_res, "jax": jax_res,
           "speedup_epoch_time": torch_res["epoch_time_s"] / max(
               jax_res["epoch_time_s"], 1e-9)}
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
