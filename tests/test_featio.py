"""Native feature codec: accuracy, file roundtrip, native/numpy agreement."""

import numpy as np

import conftest  # noqa: F401

from zipvoice_tpu.data import featio


def test_encode_decode_accuracy():
    rng = np.random.RandomState(0)
    x = (rng.randn(200, 100) * np.exp(rng.randn(200, 1))).astype(np.float32)
    q, scales = featio.encode(x)
    y = featio.decode(q, scales)
    rel = np.abs(y - x).max(axis=1) / (np.abs(x).max(axis=1) + 1e-9)
    assert rel.max() < 1e-4, rel.max()


def test_file_roundtrip_and_size(tmp_path):
    rng = np.random.RandomState(1)
    x = rng.randn(500, 100).astype(np.float32)
    p = str(tmp_path / "f.fz")
    featio.save_feats(p, x)
    y = featio.load_feats(p)
    np.testing.assert_allclose(y, x, atol=2e-4 * np.abs(x).max())
    import os

    raw = x.nbytes
    assert os.path.getsize(p) < 0.55 * raw  # ~2x compression


def test_native_matches_numpy():
    rng = np.random.RandomState(2)
    x = rng.randn(64, 80).astype(np.float32)
    lib = featio._load_lib()
    q_ref = np.clip(
        np.round(
            x / np.where(
                np.abs(x).max(axis=1) > 0,
                np.abs(x).max(axis=1) / 32767.0, 1.0
            )[:, None]
        ), -32768, 32767,
    ).astype(np.int16)
    q, scales = featio.encode(x)
    if lib is None:
        np.testing.assert_array_equal(q, q_ref)
    else:
        # native rounding is round-half-away-from-zero; allow 1 LSB
        assert np.abs(q.astype(np.int32) - q_ref.astype(np.int32)).max() <= 1


def test_zero_frames_edge():
    x = np.zeros((3, 10), np.float32)
    q, s = featio.encode(x)
    y = featio.decode(q, s)
    np.testing.assert_array_equal(y, x)


def test_manifest_integration(tmp_path):
    from zipvoice_tpu.data.manifest import Cut

    x = np.random.RandomState(3).randn(40, 100).astype(np.float32)
    p = str(tmp_path / "u0.fz")
    featio.save_feats(p, x)
    cut = Cut(id="u0", features=p, num_frames=40, duration=40 / 93.75)
    y = cut.load_features()
    np.testing.assert_allclose(y, x, atol=2e-4 * np.abs(x).max())
