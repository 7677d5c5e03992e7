"""Jittable signal-preprocessing ops, numerically matched to the reference's
scipy/numpy host pipeline.

The reference runs `np.convolve` baseline removal + Butterworth
`scipy.signal.filtfilt` **per sample inside DataLoader __getitem__**
(`/root/reference/dataset.py:76-116`, `train_signal_only_ptb.py:19-27`,
`train_physionet.py:23-33`) — the CPU bottleneck of its training loop. Here
the same math is expressed as batched JAX ops (conv for the moving average,
`lax.scan` for the sequential IIR recurrence) so the whole dataset is
materialised once, on device, before training; nothing runs on the hot path.

Filter *design* (Butterworth coefficients, steady-state initial conditions)
stays on host via scipy — it is data-independent and happens once.

Every op is golden-tested against scipy/numpy in tests/test_preprocess.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sps


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

def zscore(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """Per-sample z-score (reference train_physionet.py:23-26)."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    std = jnp.std(x, axis=axis, keepdims=True)
    return (x - mean) / (std + eps)


class Scaler(NamedTuple):
    """StandardScaler fit on the train split only
    (reference dataset.py:194-200). Matches sklearn: ddof=0 std, and
    zero-variance columns get scale 1."""

    mean: np.ndarray
    scale: np.ndarray

    @staticmethod
    def fit(x: np.ndarray) -> "Scaler":
        x64 = np.asarray(x, dtype=np.float64)
        mean = x64.mean(axis=0)
        scale = x64.std(axis=0)
        scale = np.where(scale == 0.0, 1.0, scale)
        return Scaler(mean=mean, scale=scale)

    def transform(self, x) -> jnp.ndarray:
        return (jnp.asarray(x) - self.mean.astype(np.float32)) / (
            self.scale.astype(np.float32)
        )


# ---------------------------------------------------------------------------
# Moving-average baseline removal
# ---------------------------------------------------------------------------

def remove_baseline_drift(x: jnp.ndarray, window_size: int = 200) -> jnp.ndarray:
    """signal - np.convolve(signal, ones(w)/w, mode='same'), batched.

    Matches numpy 'same' alignment exactly: the full convolution of length
    N+w-1 is sliced starting at (w-1)//2. Reference dataset.py:81-83.
    Works on any leading batch dims; filters the last axis.
    """
    w = window_size
    n = x.shape[-1]
    lead = x.shape[:-1]
    # f64 to match the reference's numpy accumulation (pandas float64 in,
    # torch float32 only at tensor creation). Offline op — not on hot path.
    with jax.enable_x64():
        xb = jnp.asarray(x, jnp.float64).reshape((-1, 1, n))  # (B, C=1, T)
        kernel = jnp.full((1, 1, w), 1.0 / w, dtype=jnp.float64)  # (O, I, W)
        # numpy 'same' slices the full convolution at (w-1)//2; with the
        # (flipped) convolution kernel this corresponds to correlation
        # padding of (w//2, (w-1)//2) — asymmetric when w is even.
        baseline = jax.lax.conv_general_dilated(
            xb, kernel,
            window_strides=(1,),
            padding=[(w // 2, (w - 1) // 2)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        out = (xb - baseline).reshape(lead + (n,))
    return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# IIR filtering (lfilter / filtfilt)
# ---------------------------------------------------------------------------

class IIRFilter(NamedTuple):
    """Host-designed digital IIR filter + steady-state initial conditions.

    b, a: transfer-function coefficients (a[0] normalised to 1).
    zi: scipy.signal.lfilter_zi steady state, used by filtfilt.
    """

    b: np.ndarray
    a: np.ndarray
    zi: np.ndarray

    @staticmethod
    def butter(order: int, cutoff, fs: float, btype: str) -> "IIRFilter":
        b, a = sps.butter(order, np.asarray(cutoff) / (0.5 * fs), btype=btype)
        zi = sps.lfilter_zi(b, a)
        return IIRFilter(b=np.asarray(b, np.float64),
                         a=np.asarray(a, np.float64),
                         zi=np.asarray(zi, np.float64))


def butter_lowpass(cutoff: float = 0.05, fs: float = 1.0, order: int = 5
                   ) -> IIRFilter:
    """Reference dataset.py:85-89 defaults (cutoff 0.05, fs 1.0)."""
    return IIRFilter.butter(order, cutoff, fs, "low")


def butter_lowpass_ptb(cutoff: float = 40.0, fs: float = 250.0, order: int = 5
                       ) -> IIRFilter:
    """Reference train_signal_only_ptb.py:23-27."""
    return IIRFilter.butter(order, cutoff, fs, "low")


def butter_bandpass(lowcut: float = 16.0, highcut: float = 149.0,
                    fs: float = 300.0, order: int = 4) -> IIRFilter:
    """Reference train_physionet.py:28-33."""
    return IIRFilter.butter(order, [lowcut, highcut], fs, "band")


def _lfilter_scan(b: jnp.ndarray, a: jnp.ndarray, x: jnp.ndarray,
                  zi: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Direct-form-II-transposed IIR over the last axis via lax.scan.

    x: (..., T) float64. zi: (..., n-1) initial delay-line state.
    Returns (y, final_state). The recurrence is inherently sequential; the
    scan carry is vectorised over all leading dims so the VPU processes the
    whole batch per time step.
    """
    n = b.shape[0]
    lead = x.shape[:-1]
    xt = jnp.moveaxis(x, -1, 0)  # (T, ...)

    def step(d, x_t):
        y_t = b[0] * x_t + d[..., 0]
        # d_i <- b_{i+1} x_t + d_{i+1} - a_{i+1} y_t ; d_{n-1} term uses 0
        d_next = (
            b[1:] * x_t[..., None]
            - a[1:] * y_t[..., None]
            + jnp.concatenate(
                [d[..., 1:], jnp.zeros(lead + (1,), x.dtype)], axis=-1
            )
        )
        return d_next, y_t

    d_final, y = jax.lax.scan(step, zi, xt)
    return jnp.moveaxis(y, 0, -1), d_final


def lfilter(filt: IIRFilter, x: jnp.ndarray) -> jnp.ndarray:
    """Causal IIR filter along the last axis (zero initial state)."""
    with jax.enable_x64():
        b = jnp.asarray(filt.b, jnp.float64)
        a = jnp.asarray(filt.a, jnp.float64)
        x64 = jnp.asarray(x, jnp.float64)
        zi = jnp.zeros(x.shape[:-1] + (filt.b.shape[0] - 1,), jnp.float64)
        y, _ = _lfilter_scan(b, a, x64, zi)
    return y.astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=())
def _filtfilt_impl(b, a, zi, x):
    n = x.shape[-1]
    padlen = 3 * b.shape[0]  # scipy default: 3*max(len(a),len(b)); equal here

    # Odd extension at both ends (scipy padtype='odd').
    left = 2.0 * x[..., :1] - x[..., padlen:0:-1]
    right = 2.0 * x[..., -1:] - x[..., -2:-(padlen + 2):-1]
    ext = jnp.concatenate([left, x, right], axis=-1)

    # Forward pass, initial state scaled by first sample.
    zi_f = zi * ext[..., :1]
    y, _ = _lfilter_scan(b, a, ext, zi_f)
    # Backward pass on the reversed forward output.
    y_rev = y[..., ::-1]
    zi_b = zi * y_rev[..., :1]
    y2, _ = _lfilter_scan(b, a, y_rev, zi_b)
    y2 = y2[..., ::-1]
    return y2[..., padlen:padlen + n]


def filtfilt(filt: IIRFilter, x: jnp.ndarray) -> jnp.ndarray:
    """Zero-phase forward-backward IIR filtering, matching
    scipy.signal.filtfilt's default method='pad', padtype='odd',
    padlen=3*max(len(a),len(b)) (reference dataset.py:89).

    Runs in float64 internally (matching scipy, and necessary: the 5th-order
    Butterworth at cutoff 0.1·Nyquist is numerically stiff in fp32).
    """
    padlen = 3 * len(filt.b)
    if x.shape[-1] <= padlen:
        # scipy raises here too; the odd-extension slices below would
        # silently misalign for T <= padlen rather than error.
        raise ValueError(
            f"filtfilt needs x.shape[-1] > padlen ({padlen}); got "
            f"{x.shape[-1]}"
        )
    with jax.enable_x64():
        b = jnp.asarray(filt.b, jnp.float64)
        a = jnp.asarray(filt.a, jnp.float64)
        zi = jnp.asarray(filt.zi, jnp.float64)
        zi = jnp.broadcast_to(zi, x.shape[:-1] + zi.shape)
        y = _filtfilt_impl(b, a, zi, jnp.asarray(x, jnp.float64))
    return y.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Resampling / shaping
# ---------------------------------------------------------------------------

def decimate2(x: jnp.ndarray) -> jnp.ndarray:
    """Naive 2x downsample (reference train_signal_only_ptb.py:45: [::2])."""
    return x[..., ::2]


def pad_or_crop(x: jnp.ndarray, length: int) -> jnp.ndarray:
    """Right-pad with zeros or truncate to `length` along the last axis
    (reference train_signal_only_ptb.py:48-52, keras pad_sequences 'post')."""
    n = x.shape[-1]
    if n >= length:
        return x[..., :length]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, length - n)]
    return jnp.pad(x, pad)


def fourier_resample(x: jnp.ndarray, num: int) -> jnp.ndarray:
    """scipy.signal.resample equivalent (FFT method, real input) along the
    last axis (reference train_physionet.py:36-40)."""
    n = x.shape[-1]
    X = jnp.fft.rfft(x, axis=-1)
    newbins = num // 2 + 1
    nkeep = min(num, n) // 2 + 1
    Y = jnp.zeros(x.shape[:-1] + (newbins,), X.dtype)
    Y = Y.at[..., :nkeep].set(X[..., :nkeep])
    if num < n and num % 2 == 0:
        # Fold energy above the new Nyquist into the (real) Nyquist bin.
        Y = Y.at[..., -1].set(2.0 * jnp.real(X[..., nkeep - 1]))
    if num > n and n % 2 == 0:
        # Split the old Nyquist bin when upsampling from an even length.
        Y = Y.at[..., nkeep - 1].multiply(0.5)
    return jnp.fft.irfft(Y, n=num, axis=-1) * (num / n)


# ---------------------------------------------------------------------------
# Train-time augmentation (reference train_physionet.py:47-60)
# ---------------------------------------------------------------------------

def augment_signal(key: jax.Array, x: jnp.ndarray,
                   noise_std: float = 0.01,
                   scale_range: Tuple[float, float] = (0.8, 1.2),
                   max_shift: int = 10) -> jnp.ndarray:
    """Per-sample random noise / amplitude scale / circular shift, each
    applied with probability 0.5. x: (B, T). Fully vectorised (the
    reference draws per-sample numpy randomness in __getitem__)."""
    b, t = x.shape
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)

    do_noise = jax.random.bernoulli(k1, 0.5, (b, 1))
    noise = jax.random.normal(k2, x.shape) * noise_std
    x = jnp.where(do_noise, x + noise, x)

    do_scale = jax.random.bernoulli(k3, 0.5, (b, 1))
    scale = jax.random.uniform(
        k4, (b, 1), minval=scale_range[0], maxval=scale_range[1]
    )
    x = jnp.where(do_scale, x * scale, x)

    do_shift = jax.random.bernoulli(k5, 0.5, (b,))
    shift = jax.random.randint(k6, (b,), -max_shift, max_shift)
    shift = jnp.where(do_shift, shift, 0)
    idx = (jnp.arange(t)[None, :] - shift[:, None]) % t
    x = jnp.take_along_axis(x, idx, axis=1)
    return x


# ---------------------------------------------------------------------------
# Composite pipelines mirroring the reference's per-task preprocessing
# ---------------------------------------------------------------------------

def preprocess_hospital(x: jnp.ndarray) -> jnp.ndarray:
    """Canonical trimodal pipeline: baseline removal + LP(0.05, fs 1)
    filtfilt (reference dataset.py:91-95). x: (..., T) already
    StandardScaler'd."""
    filt = butter_lowpass()
    return filtfilt(filt, remove_baseline_drift(x))


def preprocess_ptbxl(x: jnp.ndarray, length: int = 2476) -> jnp.ndarray:
    """PTB-XL: 500→250 Hz decimation, baseline removal, LP 40 Hz, pad/crop
    `length` (the reference pins 2476, train_signal_only_ptb.py:40-53).
    x: (..., T) @500 Hz. length is configurable so shrunk configs don't
    silently train on 2476 zero-padded samples."""
    filt = butter_lowpass_ptb()
    y = decimate2(x)
    y = remove_baseline_drift(y)
    y = filtfilt(filt, y)
    return pad_or_crop(y, length)


def preprocess_physionet(x: jnp.ndarray) -> jnp.ndarray:
    """PhysioNet 2017: bandpass 16–149 Hz @300 Hz + per-sample z-score
    (reference train_physionet.py:42-45)."""
    filt = butter_bandpass()
    return zscore(filtfilt(filt, x))
