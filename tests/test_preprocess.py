"""Golden-parity tests: jittable preprocessing vs scipy/numpy/sklearn.

Tolerance gates correspond to BASELINE.json's 'logits within tolerance on
the CPU baseline' requirement — if preprocessing drifts, logits drift.
"""

import numpy as np
import pytest
import scipy.signal as sps
from sklearn.preprocessing import StandardScaler

import jax.numpy as jnp

from ecgmm_tpu.data import preprocess as pp


@pytest.fixture()
def sig(rng):
    # synthetic ECG-ish: baseline wander + beats + noise
    t = np.arange(2476) / 250.0
    x = (
        0.3 * np.sin(2 * np.pi * 0.3 * t)
        + np.sin(2 * np.pi * 1.2 * t) ** 31
        + 0.05 * rng.normal(size=t.shape)
    )
    return x.astype(np.float64)


def test_zscore_matches_numpy(sig):
    got = np.asarray(pp.zscore(jnp.asarray(sig, jnp.float32)))
    want = (sig - sig.mean()) / (sig.std() + 1e-8)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_remove_baseline_drift_matches_numpy(sig):
    for w in (200, 199, 50):
        want = sig - np.convolve(sig, np.ones(w) / w, mode="same")
        got = np.asarray(
            pp.remove_baseline_drift(jnp.asarray(sig, jnp.float32), w)
        )
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_remove_baseline_drift_batched(rng):
    x = rng.normal(size=(4, 3, 500))
    want = np.stack(
        [
            np.stack(
                [r - np.convolve(r, np.ones(200) / 200, "same") for r in row]
            )
            for row in x
        ]
    )
    got = np.asarray(pp.remove_baseline_drift(jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_lfilter_matches_scipy(sig):
    f = pp.butter_lowpass_ptb()
    want = sps.lfilter(f.b, f.a, sig)
    got = np.asarray(pp.lfilter(f, jnp.asarray(sig)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


@pytest.mark.parametrize(
    "filt",
    [pp.butter_lowpass(), pp.butter_lowpass_ptb(), pp.butter_bandpass()],
    ids=["hospital_lp", "ptb_lp40", "physionet_bp"],
)
def test_filtfilt_matches_scipy(sig, filt):
    want = sps.filtfilt(filt.b, filt.a, sig)
    got = np.asarray(pp.filtfilt(filt, jnp.asarray(sig)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_filtfilt_batched(rng):
    f = pp.butter_lowpass_ptb()
    x = rng.normal(size=(5, 800))
    want = sps.filtfilt(f.b, f.a, x, axis=-1)
    got = np.asarray(pp.filtfilt(f, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_scaler_matches_sklearn(rng):
    x = rng.normal(size=(100, 7)) * rng.uniform(0.1, 5, size=7)
    x[:, 3] = 2.0  # zero-variance column
    sk = StandardScaler().fit(x)
    ours = pp.Scaler.fit(x)
    np.testing.assert_allclose(ours.mean, sk.mean_, rtol=1e-12)
    np.testing.assert_allclose(ours.scale, sk.scale_, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(ours.transform(x.astype(np.float32))),
        sk.transform(x),
        rtol=0, atol=1e-4,
    )


def test_pad_or_crop():
    x = jnp.arange(10.0)
    assert pp.pad_or_crop(x, 6).shape == (6,)
    padded = pp.pad_or_crop(x, 14)
    assert padded.shape == (14,)
    np.testing.assert_array_equal(np.asarray(padded[10:]), 0)


def test_decimate2(sig):
    np.testing.assert_array_equal(
        np.asarray(pp.decimate2(jnp.asarray(sig))),
        sig[::2].astype(np.float32),
    )


@pytest.mark.parametrize("num", [200, 300, 450, 151])
def test_fourier_resample_matches_scipy(sig, num):
    x = sig[:300]
    want = sps.resample(x, num)
    got = np.asarray(pp.fourier_resample(jnp.asarray(x), num))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_preprocess_hospital_matches_reference_pipeline(sig):
    # reference dataset.py:91-95: remove_baseline_drift then filtfilt LP
    f = pp.butter_lowpass()
    base = sig - np.convolve(sig, np.ones(200) / 200, "same")
    want = sps.filtfilt(f.b, f.a, base)
    got = np.asarray(pp.preprocess_hospital(jnp.asarray(sig)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_preprocess_ptbxl_shape(rng):
    x = jnp.asarray(rng.normal(size=(3, 5000)))  # 10 s @500 Hz
    y = pp.preprocess_ptbxl(x)
    assert y.shape == (3, 2476)


def test_augment_signal_deterministic_and_shaped(rng):
    import jax

    x = jnp.asarray(rng.normal(size=(16, 300)), jnp.float32)
    key = jax.random.PRNGKey(0)
    y1 = pp.augment_signal(key, x)
    y2 = pp.augment_signal(key, x)
    assert y1.shape == x.shape
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3 = pp.augment_signal(jax.random.PRNGKey(1), x)
    assert not np.allclose(np.asarray(y1), np.asarray(y3))


def test_filtfilt_short_signal_raises_like_scipy():
    """scipy.signal.filtfilt requires x.shape[-1] > padlen; the jittable
    port must raise the same loud ValueError instead of silently
    returning misaligned output (round-3 review finding)."""
    filt = pp.butter_lowpass()
    padlen = 3 * len(filt.b)
    short = jnp.ones((padlen,), jnp.float32)
    with pytest.raises(ValueError, match="padlen"):
        pp.filtfilt(filt, short)
    # one sample over the limit works
    out = pp.filtfilt(filt, jnp.ones((padlen + 1,), jnp.float32))
    assert out.shape == (padlen + 1,)
