"""Batched STFT log-spectrogram in pure JAX.

Matches scipy.signal.stft semantics for the reference's CRNN front-end
(`/root/reference/train_physionet2.py:30-35`: window='tukey', which
scipy resolves to tukey with its DEFAULT alpha=0.5 — verified against
get_window — nperseg 64, noverlap 32, zero-padded boundary,
scaling='spectrum'-style window normalisation). Runs as one batched rfft on device rather than the
reference's per-sample host scipy call.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def tukey_window(m: int, alpha: float = 0.5, periodic: bool = False
                 ) -> np.ndarray:
    """scipy.signal.windows.tukey. periodic=True matches
    scipy.signal.get_window's fftbins=True default (what stft uses)."""
    if periodic:
        return tukey_window(m + 1, alpha, periodic=False)[:-1]
    if alpha <= 0:
        return np.ones(m)
    n = np.arange(m)
    width = int(np.floor(alpha * (m - 1) / 2.0))
    w = np.ones(m)
    left = n[: width + 1]
    w[: width + 1] = 0.5 * (
        1 + np.cos(np.pi * (-1 + 2.0 * left / alpha / (m - 1)))
    )
    right = n[m - width - 1:]
    w[m - width - 1:] = 0.5 * (
        1 + np.cos(np.pi * (-2.0 / alpha + 1 + 2.0 * right / alpha / (m - 1)))
    )
    return w


def stft_mag(
    x: jnp.ndarray, nperseg: int = 64, noverlap: int = 32,
    window_alpha: float = 0.5,
) -> jnp.ndarray:
    """|STFT| with scipy's default framing: the signal is extended by
    nperseg//2 zeros on both ends (boundary='zeros', padded=True), frames
    hop by nperseg−noverlap, and values scale by 1/sum(window).

    x: (..., T) → (..., F, N) with F = nperseg//2 + 1.
    """
    hop = nperseg - noverlap
    win = jnp.asarray(
        tukey_window(nperseg, window_alpha, periodic=True), jnp.float32
    )
    scale = 1.0 / jnp.sum(win)

    half = nperseg // 2
    t = x.shape[-1] + 2 * half
    n_frames = 1 + (t - nperseg) // hop
    # pad the tail so the last partial frame is included (scipy padded=True)
    needed = (n_frames - 1) * hop + nperseg
    if needed < t:
        n_frames += 1
        needed = (n_frames - 1) * hop + nperseg
    xe = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, half + needed - t)])

    idx = (
        np.arange(n_frames)[:, None] * hop + np.arange(nperseg)[None, :]
    )
    frames = xe[..., idx] * win  # (..., N, nperseg)
    spec = jnp.fft.rfft(frames, axis=-1) * scale
    return jnp.moveaxis(jnp.abs(spec), -1, -2)  # (..., F, N)


def log_spectrogram(
    x: jnp.ndarray, nperseg: int = 64, noverlap: int = 32,
) -> jnp.ndarray:
    """log(1 + |STFT|) (reference train_physionet2.py:30-35)."""
    return jnp.log1p(stft_mag(x, nperseg, noverlap))
