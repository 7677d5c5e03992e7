"""Pin every preset's effective hyperparameters to the reference
trainers' values so a config edit can't silently drift off parity.

Each assertion cites the reference line the value comes from. The
control-flow quirks matter most: several reference trainers ship with
early stopping commented out (patience=0 here disables it), and only
train.py / train_paper_modal_balance.py have the plateau LR÷10 block.
"""

from ecgmm_tpu.config import PRESETS, get_preset


def test_all_presets_constructible_and_named():
    for name in PRESETS:
        assert get_preset(name).name == name


def test_global_contract():
    """seed 42 (config.py:8), CV 5x3 (config.py:39-40), signal geometry
    2476 @ 250 Hz (evaluation_signal.py:36-38), AGE/Wt clinical pair
    (dataset.py:28,198), image 224x224 (dataset.py:58)."""
    for name in PRESETS:
        cfg = get_preset(name)
        assert cfg.train.seed == 42
        assert cfg.train.k_outer == 5 and cfg.train.k_inner == 3
        assert (cfg.data.img_height, cfg.data.img_width) == (224, 224)
    d = get_preset("fusion").data
    assert d.signal_len == 2476 and d.signal_fs == 250.0
    assert d.clinical_dim == 2
    assert d.known_missing == (17, 23, 36, 43, 51, 62, 115, 158)


def test_fusion_preset_matches_train_py():
    """reference config.py:33-36 + train.py:35-43,78,157-167."""
    t = get_preset("fusion").train
    assert t.batch_size == 16 and t.num_epochs == 30 and t.lr == 1e-4
    assert t.patience == 5
    assert t.plateau_patience == 2 and t.plateau_factor == 0.1
    assert t.var_loss_weight == 0.1
    assert t.freeze_encoders and t.loss == "cross_entropy"
    assert t.schedule == "constant"
    m = get_preset("fusion").model
    assert (m.image_dim, m.signal_dim, m.clinical_dim) == (512, 128, 32)
    assert m.clinical_encoder == "tabnet" and m.clinical_in_features == 2


def test_fusion_cached_preset_is_fusion_plus_cache():
    """fusion_cached = the fusion recipe with cache_embeddings=True —
    identical reference hyperparameters (train.py:35-43), only the
    frozen-encoder forward is precomputed (train/embed.py; PARITY.md
    'Cached-embedding fusion training')."""
    import dataclasses

    cfg = get_preset("fusion_cached")
    assert cfg.train.cache_embeddings
    assert dataclasses.replace(cfg.train, cache_embeddings=False) == \
        get_preset("fusion").train
    assert cfg.model == get_preset("fusion").model


def test_modal_balance_preset_matches_paper_variant():
    """multimodal_paper_modal_balance.py:197-263: 256^3 dims, 24-feature
    MLP clinical encoder; trainer loop identical to train.py."""
    cfg = get_preset("fusion_modal_balance")
    m = cfg.model
    assert (m.image_dim, m.signal_dim, m.clinical_dim) == (256, 256, 256)
    assert m.clinical_encoder == "mlp" and m.clinical_in_features == 24
    assert cfg.train == get_preset("fusion").train


def test_image_only_preset_matches_train_image_only():
    """train_image_only.py:85-111,160-174: bs 16 / lr 1e-4 (Config), CE,
    early stop 5, NO plateau decay block."""
    t = get_preset("image_only").train
    assert t.batch_size == 16 and t.lr == 1e-4
    assert t.loss == "cross_entropy" and t.schedule == "constant"
    assert t.patience == 5
    assert t.plateau_patience == 0  # no LR reduction in that trainer
    assert not t.freeze_encoders


def test_signal_only_family_matches_train_signal_only():
    """train_signal_only.py:115,234-238 (bs 8, OneCycle max 1e-3, focal);
    early stopping commented out :301-304 -> patience=0."""
    for name in ("signal_only", "signal_af", "signal_arr"):
        t = get_preset(name).train
        assert t.batch_size == 8 and t.lr == 1e-3, name
        assert t.loss == "focal" and t.schedule == "onecycle", name
        assert t.onecycle_peak_lr == 1e-3, name
        assert t.focal_alpha == 1.0 and t.focal_gamma == 2.0, name
        assert t.num_epochs == 30, name
        assert t.patience == 0, name


def test_signal_12lead_keeps_active_early_stop():
    """train_signal_12_af.py:129,249-251 (bs 8, OneCycle 1e-3) but —
    unlike the other signal trainers — early stop IS active :312-316."""
    cfg = get_preset("signal_12lead")
    t = cfg.train
    assert t.batch_size == 8 and t.schedule == "onecycle"
    assert t.patience == 5
    assert cfg.model.signal_input_channels == 12


def test_ptbxl_preset_matches_train_signal_only_ptb():
    """train_signal_only_ptb.py:227-257: bs 16, 10 epochs, OneCycle
    max 1e-3, focal; no early-stop counter exists -> patience=0."""
    t = get_preset("ptbxl_af").train
    assert t.batch_size == 16 and t.num_epochs == 10
    assert t.schedule == "onecycle" and t.loss == "focal"
    assert t.patience == 0


def test_physionet_presets_match_reference_trainers():
    """train_physionet.py:128-130,278-281 and train_physionet_multi.py:
    106-108,230-243: bs 8, OneCycle max 1e-3 over 30 epochs, focal,
    early-stop counter never incremented -> patience=0. The transformer
    variant is the same script with the model swapped
    (train_physionet.py:275-276)."""
    for name in ("physionet", "physionet_multi", "physionet_transformer"):
        cfg = get_preset(name)
        t = cfg.train
        assert t.batch_size == 8, name
        assert t.lr == 1e-3 and t.schedule == "onecycle", name
        assert t.loss == "focal" and t.num_epochs == 30, name
        assert t.patience == 0, name
        assert cfg.data.signal_len == 3000, name
        assert cfg.data.signal_fs == 300.0, name
    assert get_preset("physionet_multi").model.num_classes == 3


def test_physionet_crnn_matches_train_physionet2():
    """train_physionet2.py:163-170: bs 16 / lr 1e-4 via Config, plain
    constant-LR Adam (no scheduler, no plateau), focal defaults (1, 2),
    early stopping commented out :226-229."""
    t = get_preset("physionet_crnn").train
    assert t.batch_size == 16 and t.lr == 1e-4
    assert t.schedule == "constant"
    assert t.plateau_patience == 0  # no plateau block in that trainer
    assert t.patience == 0
    assert t.loss == "focal"
    assert t.focal_alpha == 1.0 and t.focal_gamma == 2.0
