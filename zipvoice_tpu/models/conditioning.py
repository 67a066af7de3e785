"""Static-shape text/speech conditioning utilities.

The reference computes these with dynamic shapes and python loops
(reference zipvoice/utils/common.py:252-301, zipvoice/models/zipvoice.py:214-251);
here everything is masked, padded, vectorized arithmetic so it lives inside a
single jitted program.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def make_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) lengths -> (B, max_len) bool mask, True at padded positions
    (reference zipvoice/utils/common.py:401-426)."""
    seq = jnp.arange(max_len, dtype=lengths.dtype)
    return seq[None, :] >= lengths[:, None]


def avg_upsample_index(
    tokens_lens: jax.Array, features_lens: jax.Array, num_frames: int
) -> jax.Array:
    """Frame -> token index map for average-duration upsampling.

    Reproduces reference prepare_avg_tokens_durations + get_tokens_index
    (common.py:252-301): every token of utterance i gets duration
    ``features_lens[i] // tokens_lens[i]``; frames past the last token map to
    index ``tokens_lens[i]`` (the extra pad token appended by pad_labels,
    common.py:271).

    Returns (B, num_frames) int32.
    """
    avg = jnp.where(tokens_lens > 0, features_lens // tokens_lens, 0)
    frame = jnp.arange(num_frames, dtype=jnp.int32)[None, :]
    idx = jnp.where(
        avg[:, None] > 0,
        jnp.minimum(
            frame // jnp.maximum(avg, 1)[:, None].astype(jnp.int32),
            tokens_lens[:, None].astype(jnp.int32),
        ),
        tokens_lens[:, None].astype(jnp.int32),
    )
    return idx


def upsample_text_embed(
    embed: jax.Array,
    tokens_lens: jax.Array,
    features_lens: jax.Array,
    num_frames: int,
) -> Tuple[jax.Array, jax.Array]:
    """Broadcast token-rate embeddings to frame rate by average duration
    (reference zipvoice.py:214-251).  Returns (text_condition, padding_mask)."""
    idx = avg_upsample_index(tokens_lens, features_lens, num_frames)
    text_condition = jnp.take_along_axis(embed, idx[:, :, None], axis=1)
    padding_mask = make_pad_mask(features_lens, num_frames)
    return text_condition, padding_mask


def predict_features_lens(
    prompt_features_lens: jax.Array,
    prompt_tokens_lens: jax.Array,
    tokens_lens: jax.Array,
    speed: float = 1.0,
) -> jax.Array:
    """Duration prediction from the prompt's token rate
    (reference zipvoice.py:323-325): prompt_len + ceil(prompt_len /
    prompt_tokens * tokens / speed), in fp32 like torch's int-division."""
    ratio = (
        prompt_features_lens.astype(jnp.float32)
        / prompt_tokens_lens.astype(jnp.float32)
        * tokens_lens.astype(jnp.float32)
        / speed
    )
    return prompt_features_lens + jnp.ceil(ratio).astype(prompt_features_lens.dtype)


def condition_time_mask(
    rng: jax.Array,
    features_lens: jax.Array,
    max_len: int,
    mask_percent: Tuple[float, float] = (0.7, 1.0),
    suffix: bool = False,
) -> jax.Array:
    """Random span mask for the speech condition during training
    (reference common.py:331-398).  True = masked (non-condition) positions.

    ``suffix=True`` anchors the span at the end (dialog models,
    common.py:366-398).
    """
    B = features_lens.shape[0]
    k1, k2 = jax.random.split(rng)
    pct = jax.random.uniform(
        k1, (B,), minval=mask_percent[0], maxval=mask_percent[1]
    )
    mask_size = (pct * features_lens).astype(jnp.int32)
    if suffix:
        mask_starts = (features_lens - mask_size).astype(jnp.int32)
    else:
        mask_starts = (
            jax.random.uniform(k2, (B,)) * (features_lens - mask_size)
        ).astype(jnp.int32)
    mask_ends = mask_starts + mask_size
    seq = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    return (seq >= mask_starts[:, None]) & (seq < mask_ends[:, None])
