"""STFT / mel / iSTFT numerics: vs torch.stft and roundtrip properties."""

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU platform)

import jax
import jax.numpy as jnp

from zipvoice_tpu.ops.stft import (
    hann_window,
    istft,
    log_mel_spectrogram,
    melscale_fbanks,
    overlap_add,
    stft_magnitude,
)

torch = pytest.importorskip("torch")


def test_stft_magnitude_vs_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 24000).astype(np.float32)
    ours = np.asarray(stft_magnitude(jnp.asarray(x), 1024, 256))
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=1024,
        hop_length=256,
        window=torch.hann_window(1024),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    ).abs()
    ref = ref.numpy().transpose(0, 2, 1)  # (B, T, F)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_melscale_fbanks_properties():
    fb = melscale_fbanks(513, 100, 24000)
    assert fb.shape == (513, 100)
    assert fb.min() >= 0.0
    # every filter has support, and interior frequencies are covered
    assert (fb.sum(axis=0) > 0).all()
    assert (fb[1:-1].sum(axis=1) >= 0).all()


def test_log_mel_shape():
    x = jnp.zeros((1, 24000))
    mel = log_mel_spectrogram(x)
    assert mel.shape == (1, 24000 // 256 + 1, 100)
    # silence -> log(clamp) = log(1e-7)
    np.testing.assert_allclose(np.asarray(mel), np.log(1e-7), atol=1e-5)


def test_overlap_add_identity():
    # frames of ones with rectangular window must sum to r at each sample
    hop, L, T = 4, 16, 10
    frames = jnp.ones((T, L))
    y = np.asarray(overlap_add(frames, hop))
    r = L // hop
    # interior samples (beyond ramp-up) equal r
    assert np.allclose(y[L - hop : -(L - hop)], r)


def test_istft_roundtrip_vs_torch():
    """istft(stft(x)) == x away from edges; also cross-check vs torch.istft."""
    rng = np.random.RandomState(1)
    n = 256 * 40
    x = rng.randn(n).astype(np.float32)
    spec = torch.stft(
        torch.from_numpy(x),
        n_fft=1024,
        hop_length=256,
        window=torch.hann_window(1024),
        center=True,
        return_complex=True,
    )
    ref = torch.istft(
        spec,
        n_fft=1024,
        hop_length=256,
        window=torch.hann_window(1024),
        center=True,
        length=n,
    ).numpy()
    sr = spec.real.numpy().T[None]
    si = spec.imag.numpy().T[None]
    ours = np.asarray(
        istft(jnp.asarray(sr), jnp.asarray(si), n_fft=1024, hop=256, length=n)
    )[0]
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    np.testing.assert_allclose(ours, x, atol=1e-4)


def test_hann_window_matches_torch():
    ref = torch.hann_window(1024).numpy()
    np.testing.assert_allclose(hann_window(1024), ref, atol=1e-6)
