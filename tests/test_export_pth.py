"""Reverse-converter gates (tools/export_pth.py): JAX → reference-format
torch state dicts.

Two directions of proof:
  * BIT-EXACT round trip: a reference-layout torch state dict (minted
    from the replica models the parity suites already trust) pushed
    through convert_pth → export_pth reproduces every tensor exactly —
    so the export schema is byte-compatible with what the reference's
    own `torch.load` consumers expect (`/root/reference/
    evaluation_signal.py:176`, `shap_fusion_modal_balance.py:100-102`).
  * NATIVE-TRAINED parity: a model initialized and briefly trained in
    THIS framework, exported and strict-loaded into the torch replica,
    reproduces logits to the same tolerance the import direction meets
    (2e-4 signal-only, 2e-3 through the fusion LayerNorms).

The CRNN LSTM biases are the one deliberate non-bit-exact export (flax
fuses torch's two per-gate biases; export emits the sum as bias_ih and
zero bias_hh — behaviorally identical), so its round trip compares the
bias SUMS.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ecgmm_tpu.tools import convert_pth, export_pth  # noqa: E402


def _mint_sd(tmodel, seed=0):
    """Randomised BN stats so running_mean/var round-trips are
    non-trivial."""
    torch.manual_seed(seed)
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    return {k: v.detach().numpy().copy()
            for k, v in tmodel.state_dict().items()}


def _build(arch):
    if arch == "resnet1d_se":
        from tests.test_models import _torch_resnet1d_se

        return _torch_resnet1d_se(), convert_pth.convert_resnet1d_se
    if arch == "resnet18":
        from tests.test_resnet18_parity import _torch_resnet18

        return _torch_resnet18(num_classes=512), convert_pth.convert_resnet18
    if arch == "clinical_mlp":
        import torch.nn as tnn

        net = tnn.Sequential(
            tnn.Linear(24, 64), tnn.BatchNorm1d(64), tnn.ReLU(),
            tnn.Dropout(0.3), tnn.Linear(64, 256),
        )
        return net, convert_pth.convert_clinical_mlp
    if arch == "tabnet":
        from tests.test_tabnet_parity import _torch_tabnet

        return _torch_tabnet(2, 32), convert_pth.convert_tabnet
    if arch == "crnn":
        from tests.test_crnn_parity import TorchCRNN

        return TorchCRNN(), convert_pth.convert_crnn
    if arch == "transformer1d":
        from tests.test_transformer1d_parity import TorchECGTransformer1D

        return (TorchECGTransformer1D(),
                lambda sd: convert_pth.convert_transformer1d(sd, nhead=4))
    if arch == "fusion_canonical":
        from tests.test_fusion_parity import _torch_fusion_canonical

        return _torch_fusion_canonical(), convert_pth.convert_fusion_canonical
    from tests.test_fusion_parity import _torch_fusion_modal_balance

    return (_torch_fusion_modal_balance(),
            convert_pth.convert_fusion_modal_balance)


@pytest.mark.parametrize("arch", sorted(export_pth.EXPORTERS))
def test_export_roundtrip_bitexact(arch):
    tmodel, importer = _build(arch)
    sd = _mint_sd(tmodel)
    back = export_pth.EXPORTERS[arch](importer(sd))

    assert set(back) == set(sd), (
        sorted(set(sd) ^ set(back))[:10]
    )
    for k in sd:
        if "num_batches_tracked" in k:
            continue  # emitted as 0; torch only reads it with momentum=None
        if ".bias_hh_" in k:
            continue  # compared via the ih+hh sum below
        if ".bias_ih_" in k:
            want = sd[k] + sd[k.replace("bias_ih", "bias_hh")]
            got = back[k] + back[k.replace("bias_ih", "bias_hh")]
            np.testing.assert_allclose(got, want, atol=1e-6, err_msg=k)
            continue
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


@pytest.mark.slow
def test_native_trained_resnet1d_se_export_strict_load_parity():
    """Init + briefly train the flax ResNet1DSE natively, export, and
    strict-load into the torch replica: logit parity at the import
    direction's own 2e-4 bar."""
    import optax

    from ecgmm_tpu.models import ResNet1DSE
    from tests.test_models import _torch_resnet1d_se

    model = ResNet1DSE(num_classes=2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 600, 1)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 2, size=(8,)))
    variables = model.init(jax.random.PRNGKey(3), x)

    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    def loss_fn(params, stats):
        logits, mut = model.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        one_hot = jax.nn.one_hot(y, 2)
        return -jnp.mean(
            jnp.sum(jax.nn.log_softmax(logits) * one_hot, -1)
        ), mut["batch_stats"]

    params, stats = variables["params"], variables["batch_stats"]
    for _ in range(3):
        (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    trained = {"params": params, "batch_stats": stats}

    sd = export_pth.export_resnet1d_se(trained)
    tmodel = _torch_resnet1d_se()
    tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()},
        strict=True,
    )
    tmodel.eval()

    probe = rng.normal(size=(4, 1, 600)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(probe)).numpy()
    got = np.asarray(model.apply(
        trained, jnp.asarray(probe.transpose(0, 2, 1))
    ))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


@pytest.mark.slow
def test_native_trained_fusion_export_strict_load_parity():
    """The VERDICT round-trip gate: train the canonical fusion model
    briefly in this framework → export → strict-load into the torch
    replica → full-forward parity (branch + fusion logits, attention
    weights, var loss) at the import suite's tolerances."""
    import optax

    from ecgmm_tpu.config import ModelConfig
    from ecgmm_tpu.models import ECGMultimodalModel, jit_init
    from tests.test_fusion_parity import _torch_fusion_canonical

    model = ECGMultimodalModel(cfg=ModelConfig(dtype="float32"))
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))
    sig = jnp.asarray(rng.normal(size=(4, 600)).astype(np.float32))
    clin = jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 2, size=(4,)))

    variables = jit_init(model, jax.random.PRNGKey(11), img, sig, clin)

    tx = optax.adam(1e-4)
    opt_state = tx.init(variables["params"])

    def loss_fn(params, stats, key):
        out, mut = model.apply(
            {"params": params, "batch_stats": stats}, img, sig, clin,
            train=True, mutable=["batch_stats"], rngs={"dropout": key},
        )
        one_hot = jax.nn.one_hot(y, 2)
        ce = -jnp.mean(
            jnp.sum(jax.nn.log_softmax(out.fusion_logits) * one_hot, -1)
        )
        return ce + 0.1 * out.var_loss, mut["batch_stats"]

    params, stats = variables["params"], variables["batch_stats"]
    step = jax.jit(
        lambda p, s, o, k: _train_step(tx, loss_fn, p, s, o, k)
    )
    for i in range(2):
        params, stats, opt_state = step(
            params, stats, opt_state, jax.random.PRNGKey(100 + i)
        )
    trained = {"params": params, "batch_stats": stats}

    sd = export_pth.export_fusion_canonical(trained)
    tmodel = _torch_fusion_canonical()
    tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
         for k, v in sd.items()},
        strict=True,
    )
    tmodel.eval()

    p_img = rng.normal(size=(3, 3, 64, 64)).astype(np.float32)
    p_sig = rng.normal(size=(3, 600)).astype(np.float32)
    p_clin = rng.normal(size=(3, 2)).astype(np.float32)
    with torch.no_grad():
        ti, ts, tc, tf, tvar, tsw, _ = tmodel(
            torch.from_numpy(p_img), torch.from_numpy(p_sig),
            torch.from_numpy(p_clin),
        )
    out = model.apply(
        trained, jnp.asarray(p_img.transpose(0, 2, 3, 1)),
        jnp.asarray(p_sig), jnp.asarray(p_clin),
    )
    np.testing.assert_allclose(
        np.asarray(out.image_logits), ti.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.signal_logits), ts.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.clinical_logits), tc.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.fusion_logits), tf.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.soft_weights), tsw.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(float(out.var_loss), float(tvar), rtol=1e-3)


def _train_step(tx, loss_fn, params, stats, opt_state, key):
    import optax

    (_, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, stats, key
    )
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_stats, opt_state


def test_export_cli_msgpack_and_run_dir(tmp_path):
    """`ecgmm-convert --export` end-to-end on both accepted inputs: a
    msgpack variable tree and an orbax run directory (best/ checkpoint
    of a TrainState-shaped tree)."""
    import orbax.checkpoint as ocp

    from ecgmm_tpu.models import ResNet1DSE
    from tests.test_models import _torch_resnet1d_se

    model = ResNet1DSE(num_classes=2)
    x = jnp.ones((2, 600, 1))
    variables = jax.tree_util.tree_map(
        np.asarray, model.init(jax.random.PRNGKey(5), x)
    )
    variables = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }

    # (a) msgpack input
    msg = tmp_path / "m.msgpack"
    convert_pth.save_converted(variables, str(msg))
    out_a = tmp_path / "a.pth"
    convert_pth.main([
        str(msg), "--arch", "resnet1d_se", "--export", "--out", str(out_a)
    ])

    # (b) run-dir input: TrainState-shaped tree under <run>/best
    run = tmp_path / "run"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        str(run / "best"),
        {
            "params": variables["params"],
            "model_state": {"batch_stats": variables["batch_stats"]},
            "step": np.asarray(7),
        },
    )
    ckptr.wait_until_finished()
    out_b = tmp_path / "b.pth"
    convert_pth.main([
        str(run), "--arch", "resnet1d_se", "--export", "--out", str(out_b)
    ])

    tmodel = _torch_resnet1d_se()
    for out in (out_a, out_b):
        sd = torch.load(str(out), map_location="cpu")
        tmodel.load_state_dict(sd, strict=True)  # schema-complete
    tmodel.eval()
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            np.ones((2, 1, 600), np.float32)
        )).numpy()
    got = np.asarray(model.apply(variables, x))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)
