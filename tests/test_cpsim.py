"""cpSIM diarizer internals: VAD, 2-means, two-speaker separation."""

import numpy as np

import conftest  # noqa: F401

from zipvoice_tpu.eval.cpsim_cli import diarize_two, energy_vad, kmeans2


def test_energy_vad():
    sr = 16000
    tone = 0.3 * np.sin(2 * np.pi * 300 * np.arange(sr) / sr)
    sil = np.zeros(sr)
    wav = np.concatenate([sil, tone, sil]).astype(np.float32)
    speech, segments = energy_vad(wav, sr)
    assert len(segments) == 1
    s, e = segments[0]
    assert abs(s - sr) < sr * 0.1 and abs(e - 2 * sr) < sr * 0.1


def test_kmeans2_separates():
    rng = np.random.RandomState(0)
    a = rng.randn(20, 8) + np.array([5.0] + [0] * 7)
    b = rng.randn(20, 8) + np.array([-5.0] + [0] * 7)
    X = np.concatenate([a, b])
    labels = kmeans2(X)
    assert len(set(labels[:20])) == 1
    assert len(set(labels[20:])) == 1
    assert labels[0] != labels[20]


def test_diarize_two_distinct_tones():
    """Two alternating 'speakers' (distinct spectra) should split cleanly
    given an embedding that captures spectral shape."""
    sr = 16000

    def seg(f0, dur=1.0):
        t = np.arange(int(dur * sr)) / sr
        return (0.3 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)

    sil = np.zeros(sr // 2, np.float32)
    wav = np.concatenate(
        [seg(200), sil, seg(1200), sil, seg(200), sil, seg(1200)]
    )

    def embed(x):
        spec = np.abs(np.fft.rfft(x * np.hanning(len(x)), n=4096))[:512]
        return spec / (np.linalg.norm(spec) + 1e-9)

    a, b = diarize_two(wav, sr, embed)
    # each side should be spectrally homogeneous: dominated by one tone
    def dom_freq(x):
        spec = np.abs(np.fft.rfft(x, n=8192))
        return np.argmax(spec) * sr / 8192

    fa, fb = dom_freq(a), dom_freq(b)
    assert {round(fa / 100), round(fb / 100)} == {2, 12}, (fa, fb)
