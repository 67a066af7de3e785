"""STFT / iSTFT / mel filterbank as XLA-friendly JAX ops.

The reference relies on torchaudio's C++ MelSpectrogram (reference
zipvoice/utils/feature.py:47-60: n_fft=1024, hop=256, n_mels=100, power=1,
center=True) and the external Vocos package's iSTFT head for synthesis.
Here both directions are expressed so XLA maps them onto the MXU:

- framing is a strided gather (lowers to dynamic-slices), windowing fuses in;
- rFFT via jnp.fft.rfft;
- mel projection is a (freq x mel) matmul;
- iSTFT overlap-add avoids scatter: frames are split into hop-sized chunks
  and summed along shifted diagonals, which is pure reshape/pad/add.

Numerics follow torch.stft / torchaudio.functional.melscale_fbanks
(HTK mel scale, no norm, f_min=0, f_max=sr/2) so converted reference
checkpoints reproduce the same features.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> np.ndarray:
    """torch.hann_window(periodic=True)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * math.pi * n / win_length)).astype(np.float32)


def melscale_fbanks(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: float = None,
) -> np.ndarray:
    """HTK-scale triangular mel filterbank, (n_freqs, n_mels), matching
    torchaudio.functional.melscale_fbanks(norm=None, mel_scale='htk')."""
    if f_max is None:
        f_max = sample_rate / 2.0

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)

    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fb.astype(np.float32)


def frame_signal(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """(..., n) -> (..., num_frames, frame_length) strided framing."""
    n = x.shape[-1]
    num_frames = 1 + (n - frame_length) // hop
    idx = (
        np.arange(num_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    )
    return x[..., idx]


@partial(jax.jit, static_argnums=(1, 2))
def stft_magnitude(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """|STFT| with center=True reflect padding, hann window.

    x: (..., n) -> (..., num_frames, n_fft//2 + 1) where
    num_frames = n // hop + 1 (torch.stft center semantics).
    """
    pad = n_fft // 2
    x = jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect"
    )
    frames = frame_signal(x, n_fft, hop)
    frames = frames * jnp.asarray(hann_window(n_fft))
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.abs(spec)


def log_mel_spectrogram(
    x: jax.Array,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 100,
    sample_rate: int = 24000,
) -> jax.Array:
    """VocosFbank-equivalent log-mel (reference feature.py:47-60):
    magnitude STFT -> HTK mel matmul -> clamp(1e-7) -> log.

    x: (..., n) waveform -> (..., num_frames, n_mels).
    """
    mag = stft_magnitude(x, n_fft, hop)
    fb = jnp.asarray(melscale_fbanks(n_fft // 2 + 1, n_mels, sample_rate))
    mel = mag @ fb
    return jnp.log(jnp.clip(mel, min=1e-7))


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """Scatter-free overlap-add.

    frames: (..., T, L) with L = frame length, hop | L.
    Output: (..., (T-1)*hop + L).

    Chunk each frame into r = L // hop hop-sized pieces; output chunk k is
    sum_{j} frames[k - j, j-th piece]; realized by padding shifted stacks.
    """
    *lead, T, L = frames.shape
    r = L // hop
    assert r * hop == L
    chunks = frames.reshape(*lead, T, r, hop)
    out_chunks = T + r - 1
    acc = jnp.zeros((*lead, out_chunks, hop), frames.dtype)
    for j in range(r):
        # piece j of frame t lands at output chunk t + j
        padded = jnp.pad(
            chunks[..., :, j, :],
            [(0, 0)] * len(lead) + [(j, out_chunks - T - j), (0, 0)],
        )
        acc = acc + padded
    return acc.reshape(*lead, out_chunks * hop)


def istft(
    spec_real: jax.Array,
    spec_imag: jax.Array,
    n_fft: int = 1024,
    hop: int = 256,
    length: int = None,
) -> jax.Array:
    """Inverse STFT with hann window and center trimming (torch.istft
    semantics, as used by Vocos's ISTFT head with padding='center').

    spec_*: (..., T, n_fft//2 + 1) -> waveform (..., length).
    """
    spec = jax.lax.complex(spec_real, spec_imag)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)
    window = jnp.asarray(hann_window(n_fft))
    y = overlap_add(frames * window, hop)
    # window envelope normalization
    T = spec_real.shape[-2]
    wsq = jnp.broadcast_to(window * window, (T, n_fft))
    envelope = overlap_add(wsq, hop)
    y = y / jnp.clip(envelope, min=1e-11)
    pad = n_fft // 2
    y = y[..., pad:]
    if length is not None:
        y = y[..., :length]
    else:
        y = y[..., : y.shape[-1] - pad]
    return y
