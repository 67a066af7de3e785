"""Pallas TPU kernel: fused relative-position attention weights.

Computes softmax(q@k^T + rel2abs(p@pe^T) + mask) in one VMEM-resident pass.

The XLA fallback (models/zipformer.py RelPosAttentionWeights) materializes
pos_scores (B, h, T, 2T-1) in HBM, skews it to (B, h, T, T), adds, masks,
and softmaxes — several HBM round trips over O(T^2) tensors.  This kernel
keeps everything for an R-row query tile in VMEM:

  grid = (B*h, T/R): per tile
    - qk  = q_tile (R, qd) @ k^T (qd, T)                        [MXU]
    - pos = p_tile (R, pd) @ pe_window^T (pd, T+R)              [MXU]
      where pe_window is the per-tile slice of the (2T-1)-row rel-pos
      table that covers every rel offset the tile's rows can read —
      pre-sliced OUTSIDE the kernel (it's tiny), so the kernel never
      touches the full-width (R, 2T-1) layout
    - rel->abs skew (reference zipformer.py:1239-1248:
      out[r, j] = pos[r, (R-1-r) + j]): ONE hardware strided roll
      (pltpu.roll with stride 1 along rows == right-roll row r by
      T+1+r, congruent mod T+R to the left-shift by R-1-r)        [VPU]
    - mask fill -1000, row softmax (f32)                          [VPU]

I/O stays in the caller's dtype (bf16 at inference) with f32 accumulation
inside; the (B, h, T, T) weights tensor is written to HBM exactly once.

Used by RelPosAttentionWeights(use_pallas=True); numerics validated against
the jnp path in tests/test_pallas_attention.py (interpret mode on CPU).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Policy knob: with use_pallas on, only sequence lengths >= MIN_SEQ_LEN take
# the kernel path (shorter levels fall back to the XLA skew path).  On-chip
# profiling (PERF.md) shows the XLA path is only pathological at the top
# U-Net level (T=1280: 20.5 ms vs quadratic-predicted 9 ms; T<=640 is fine),
# and each kernel shape costs a long Mosaic compile over this environment's
# relay — so the default only kernels the top level.
MIN_SEQ_LEN = 1024


def _row_tile(T: int) -> int:
    """Largest sublane-friendly divisor of T (all U-Net levels qualify for
    frame buckets that are multiples of 8)."""
    for r in (128, 64, 32, 16, 8):
        if T % r == 0:
            return r
    raise ValueError(f"T={T} not a multiple of 8")


def _attn_weights_kernel(q_ref, k_ref, p_ref, pe_ref, mask_ref, out_ref):
    # blocks carry leading singleton (batch*head[, tile]) dims:
    # q_ref: (1, R, qd); k_ref: (1, T, qd); p_ref: (1, R, pd)
    # pe_ref: (1, 1, T+R, pd) per-tile window; mask_ref: (1, 1, T) bool
    # out_ref: (1, R, T)
    T = k_ref.shape[1]
    R = q_ref.shape[1]
    W = T + R  # window width

    qk = jnp.dot(
        q_ref[0], k_ref[0].T, preferred_element_type=jnp.float32
    )  # (R, T)
    pos_win = jnp.dot(
        p_ref[0], pe_ref[0, 0].T, preferred_element_type=jnp.float32
    )  # (R, W)

    # rel->abs within the window: out[r, j] = pos_win[r, (R-1-r) + j].
    # A left-shift of row r by (R-1-r) equals a right-roll by
    # W-(R-1)+r = T+1+r — one strided roll (shift T+1, stride 1 over rows).
    # Reads stay in [R-1-r, R-1-r+T) ⊂ [0, W): no wraparound corruption.
    pos = pltpu.roll(pos_win, T + 1, 1, stride=1, stride_axis=0)[:, :T]

    scores = qk + pos
    scores = jnp.where(mask_ref[0, 0, :][None, :], -1000.0, scores)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    out_ref[0] = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(
        out_ref.dtype
    )


def rel_pos_attention_weights(
    q: jax.Array,
    k: jax.Array,
    p: jax.Array,
    pe: jax.Array,
    key_padding_mask: jax.Array,
    interpret: bool = None,
) -> jax.Array:
    """q, k: (B, h, T, qd); p: (B, h, T, pd); pe: (h, 2T-1, pd)
    (head-projected positional table); key_padding_mask: (B, T) bool.
    Returns (B, h, T, T) softmaxed weights in q's dtype.
    """
    if interpret is None:
        # pallas has no compiled CPU path; interpret there (tests)
        interpret = jax.default_backend() == "cpu"
    return _rel_pos_attention_weights(
        q, k, p, pe, key_padding_mask, interpret
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rel_pos_attention_weights(
    q: jax.Array,
    k: jax.Array,
    p: jax.Array,
    pe: jax.Array,
    key_padding_mask: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    B, h, T, qd = q.shape
    pd = p.shape[-1]
    R = _row_tile(T)
    n_tiles = T // R
    W = T + R

    qf = q.reshape(B * h, T, qd)
    kf = k.reshape(B * h, T, qd)
    pf = p.reshape(B * h, T, pd)
    # per-tile pe windows: tile i's rows read rel offsets
    # [T-R-i*R, 2T-1-i*R); pad the table by one slack row so every window
    # is the same width W = T+R (the slack is sliced off by [:, :T])
    pe_pad = jnp.concatenate(
        [pe, jnp.zeros((h, 1, pd), pe.dtype)], axis=1
    )  # (h, 2T, pd)
    pe_windows = jnp.stack(
        [pe_pad[:, T - R - i * R : 2 * T - i * R, :] for i in range(n_tiles)],
        axis=1,
    )  # (h, n_tiles, W, pd)
    maskf = jnp.repeat(key_padding_mask, h, axis=0)[:, None, :]  # (B*h, 1, T)

    grid = (B * h, n_tiles)
    out = pl.pallas_call(
        _attn_weights_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, R, qd), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, T, qd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, R, pd), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, W, pd), lambda b, i: (b % h, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, T), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, R, T), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B * h, T, T), q.dtype),
        interpret=interpret,
    )(qf, kf, pf, pe_windows, maskf)
    return out.reshape(B, h, T, T)
