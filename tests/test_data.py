"""Data layer: alignment, split determinism, synthetic cohort, loaders,
materialization and sharded batching."""

import numpy as np
import pandas as pd
import pytest
from sklearn.model_selection import train_test_split

import jax

from ecgmm_tpu.config import Config
from ecgmm_tpu.data import align, pipeline, sources, splits, synthetic


def test_filter_and_map_labels():
    df = pd.DataFrame(
        {
            "index": [1, 2, 3, 4],
            "label": ["Normal", "Abnormal", "Borderline", "Normal"],
        }
    )
    out = align.filter_and_map_labels(df)
    assert list(out["label"]) == [0, 1, 0]
    assert list(out["index"]) == [1, 2, 4]


def test_intersect_indices_known_missing():
    common = align.intersect_indices(
        label_indices=range(1, 30),
        ecg_indices=range(1, 25),
        clinical_indices=range(1, 28),
        image_indices=range(1, 40),
        known_missing=(17, 23),
    )
    assert common == set(range(1, 25)) - {17, 23}


def test_stratified_811_matches_sklearn_reference_recipe():
    """Exact replication of the reference's chained train_test_split
    (dataset.py:167-173)."""
    rng = np.random.default_rng(0)
    labels = (rng.random(244) < 0.4).astype(int)
    sp = splits.stratified_811(labels, seed=42)

    indices = np.arange(len(labels))
    tr, temp, _, temp_y = train_test_split(
        indices, labels, test_size=0.2, stratify=labels, random_state=42
    )
    va, te = train_test_split(
        temp, test_size=0.5, stratify=temp_y, random_state=42
    )
    np.testing.assert_array_equal(sp.train, tr)
    np.testing.assert_array_equal(sp.val, va)
    np.testing.assert_array_equal(sp.test, te)
    # disjoint and complete
    allidx = np.sort(np.concatenate(sp))
    np.testing.assert_array_equal(allidx, indices)


def test_nested_kfold_shapes():
    labels = np.arange(60) % 2
    folds = list(splits.nested_kfold(labels, k_outer=5, k_inner=3, seed=42))
    assert len(folds) == 5
    for _, outer_test, inner in folds:
        assert len(inner) == 3
        for s in inner:
            assert set(s.train) | set(s.val) == (
                set(range(60)) - set(outer_test)
            )
            np.testing.assert_array_equal(s.test, outer_test)


def test_exhaustive_pairs_count():
    labels = np.arange(100) % 2
    pairs = list(splits.exhaustive_fold_pairs(labels, k=10, seed=42))
    assert len(pairs) == 90
    ti, vi, s = pairs[0]
    assert set(s.train).isdisjoint(s.val) and set(s.train).isdisjoint(s.test)


def test_synthetic_cohort_learnable_structure():
    c = synthetic.make_cohort(n=40, signal_len=600, img_hw=(50, 300))
    assert c.signals.shape == (40, 600)
    assert c.images.shape == (40, 50, 300, 3)
    assert c.images.dtype == np.uint8
    assert set(np.unique(c.labels)) <= {0, 1}
    # deterministic
    c2 = synthetic.make_cohort(n=40, signal_len=600, img_hw=(50, 300))
    np.testing.assert_array_equal(c.signals, c2.signals)


def test_fixture_roundtrip_through_loaders(tmp_path):
    cohort = synthetic.write_fixture_tree(str(tmp_path), n=24)
    labels_df, clinical_df, ecg = sources.load_hospital_tables(
        str(tmp_path / "labels.csv"),
        str(tmp_path / "clinical.csv"),
        str(tmp_path / "ecg_signals.csv"),
    )
    labels_df = align.filter_and_map_labels(labels_df)
    img_idx = sources.list_image_indices(str(tmp_path / "images"))
    common = align.intersect_indices(
        labels_df["index"], ecg.index, clinical_df["index"], img_idx
    )
    # Borderline rows are excluded from labels
    assert len(common) < 24 and len(common) > 10
    labels_df, ecg, clinical_df = align.align_frames(
        labels_df, ecg, clinical_df, common
    )
    assert len(labels_df) == len(ecg) == len(clinical_df) == len(common)
    imgs = sources.load_images(
        str(tmp_path / "images"), labels_df["index"].tolist(), hw=(224, 224)
    )
    assert imgs.shape == (len(common), 224, 224, 3)


def test_materialize_and_batch_sharded(mesh8):
    cohort = synthetic.make_cohort(n=48, signal_len=512, img_hw=(32, 64))
    cfg = Config()
    data = pipeline.materialize_trimodal(cohort, cfg)
    assert data.train.n + data.val.n + data.test.n == 48
    # scaler fit on train only: train signals ~zero-mean per column
    tr = np.asarray(data.train.signals)
    assert abs(tr.mean()) < 0.2

    batches = list(
        pipeline.iterate_batches(
            data.train, 16, shuffle=True, seed=42, mesh=mesh8
        )
    )
    total = sum(int(b.mask.sum()) for b in batches)
    assert total == data.train.n
    b0 = batches[0]
    assert b0.images.shape[0] % 8 == 0
    # sharded over the data axis
    assert len(b0.signals.sharding.device_set) == 8


def test_batch_shuffle_determinism():
    cohort = synthetic.make_cohort(n=32, signal_len=256, img_hw=(32, 64))
    data = pipeline.materialize_trimodal(cohort, Config())

    def first_labels(epoch):
        it = pipeline.iterate_batches(
            data.train, 8, shuffle=True, seed=42, epoch=epoch
        )
        return np.asarray(next(iter(it)).labels)

    np.testing.assert_array_equal(first_labels(0), first_labels(0))
    assert not np.array_equal(first_labels(0), first_labels(1))
