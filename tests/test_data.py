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


def test_merge_signal_csvs_headerless_first_column_and_gaps(tmp_path):
    """The reference reads headerless per-record CSVs (header=None,
    first column) and logs absent ids as missing (signal_analysis.py:
    14-26): the first sample must survive, and directory gaps must be
    reported (round-3 review findings)."""
    d = tmp_path / "signals"
    d.mkdir()
    for idx, vals in [(1, [0.5, 1.0, 2.0]), (3, [9.0, 8.0, 7.0])]:
        with open(d / f"{idx}.csv", "w") as f:
            f.write("\n".join(str(v) for v in vals))
    (d / "4.csv").write_text("not,a,signal\nx,y,z\n")  # parse failure
    frame, missing = sources.merge_signal_csvs(str(d))
    # first value 0.5 is DATA, not a header
    np.testing.assert_allclose(frame.loc[1].to_numpy()[:3], [0.5, 1.0, 2.0])
    np.testing.assert_allclose(frame.loc[3].to_numpy()[:3], [9.0, 8.0, 7.0])
    assert 2 in missing  # the directory gap
    assert 4 in missing  # the unparsable file


def test_load_12lead_selects_leads_by_name(tmp_path):
    """Lead columns are selected by name like the reference
    (train_signal_12_af.py:54-58); an extra time column must not shift
    the permutation, and a wrong column set must raise."""
    rng = np.random.default_rng(0)
    leads = rng.normal(size=(16, 12)).astype(np.float32)
    df = pd.DataFrame(leads, columns=[f"Lead_{i}" for i in range(1, 13)])
    df.insert(0, "time", np.arange(16))  # extra column, first position
    df.to_csv(tmp_path / "7_12leads.csv", index=False)
    out = sources.load_12lead_xlsx(
        str(tmp_path / "{idx}_12leads.csv"), [7]
    )
    perm = [0, 4, 8, 5, 1, 9, 2, 6, 10, 3, 7, 11]
    np.testing.assert_allclose(out[0], leads.T[perm], rtol=1e-6)

    bad = pd.DataFrame(rng.normal(size=(16, 5)))
    bad.to_csv(tmp_path / "8_12leads.csv", index=False)
    with pytest.raises(ValueError, match="Lead_1"):
        sources.load_12lead_xlsx(str(tmp_path / "{idx}_12leads.csv"), [8])


def test_af_label_map_keeps_borderline_drops_normal():
    """filter_and_map_labels with LABEL_MAP_AF must reproduce the
    reference AF cohort (train_signal_only_af.py:81-82): Normal dropped
    (unmapped), Borderline kept as class 0 — the old default
    drop=('Borderline',) silently changed the negative pool."""
    df = pd.DataFrame({
        "index": [1, 2, 3, 4],
        "label": ["Normal", "Abnormal", "AF", "Borderline"],
    })
    out = align.filter_and_map_labels(df, align.LABEL_MAP_AF)
    assert out["index"].tolist() == [2, 3, 4]
    assert out["label"].tolist() == [0, 1, 0]
    # canonical binary map still drops Borderline (unmapped)
    out2 = align.filter_and_map_labels(df)
    assert out2["index"].tolist() == [1, 2]
