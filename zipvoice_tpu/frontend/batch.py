"""Host-side batching helpers: token padding and length bucketing.

These run in numpy on the host, producing static-shape arrays for the jitted
programs.
"""

from typing import List, Sequence, Tuple

import numpy as np


def pad_tokens(
    tokens: Sequence[Sequence[int]], pad_id: int, pad_to: int = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad token id lists to a common length.

    Reproduces the reference's pad_labels (common.py:261-274): one extra
    trailing pad is appended to EVERY sequence (the average-duration
    upsampler points overflow frames at it), then all are padded to the same
    length.  Returns (tokens (B, S), tokens_lens (B,)) with
    S = max_len + 1 (or ``pad_to`` if given).
    """
    lens = np.array([len(t) for t in tokens], dtype=np.int32)
    S = int(lens.max()) + 1
    if pad_to is not None:
        assert pad_to >= S, (pad_to, S)
        S = pad_to
    out = np.full((len(tokens), S), pad_id, dtype=np.int32)
    for i, t in enumerate(tokens):
        out[i, : len(t)] = np.asarray(t, dtype=np.int32)
    return out, lens


def bucket_length(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (compile-once length bucketing)."""
    for b in buckets:
        if b >= n:
            return b
    raise ValueError(f"length {n} exceeds largest bucket {buckets[-1]}")


def pad_features(
    feats: Sequence[np.ndarray], pad_to: int = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack variable-length (T_i, F) features into (B, T, F) + lengths."""
    lens = np.array([f.shape[0] for f in feats], dtype=np.int32)
    T = int(lens.max()) if pad_to is None else pad_to
    F = feats[0].shape[1]
    out = np.zeros((len(feats), T, F), dtype=np.float32)
    for i, f in enumerate(feats):
        out[i, : f.shape[0]] = f
    return out, lens
