"""Pallas TPU kernel: fused relative-position attention weights.

Computes softmax(q@k^T + rel2abs(p@pe^T) + mask) in one VMEM-resident pass.

The XLA fallback (models/zipformer.py RelPosAttentionWeights) materializes
pos_scores (B, h, T, 2T-1) in HBM, skews it to (B, h, T, T), adds, masks,
and softmaxes — several HBM round trips over O(T^2) tensors.  This kernel
keeps everything for a 128-row query tile in VMEM:

  grid = (B*h, T/128): per tile
    - qk  = q_tile (128, qd) @ k^T (qd, T)                     [MXU]
    - pos = p_tile (128, pd) @ pe^T (pd, 2T-1)                 [MXU]
    - rel->abs skew (reference zipformer.py:1239-1248:
      out[r, j] = pos[r, (T-1-row) + j]): one dynamic-slice window of
      width T+127 shared by the tile, then per-row left-shift by
      (127 - r) realized as 7 bit-decomposed pltpu.rolls with row masks —
      no per-row gathers or loops, so Mosaic compiles it flat   [VPU]
    - mask fill -1000, row softmax                              [VPU]

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
# and each kernel shape costs a ~20 min Mosaic compile over this
# environment's relay — so the default only kernels the top level.
MIN_SEQ_LEN = 1024

def _row_tile(T: int) -> int:
    """Largest sublane-friendly divisor of T (all U-Net levels qualify for
    frame buckets that are multiples of 8)."""
    for r in (128, 64, 32, 16, 8):
        if T % r == 0:
            return r
    raise ValueError(f"T={T} not a multiple of 8")


def _attn_weights_kernel(q_ref, k_ref, p_ref, pe_ref, mask_ref, out_ref):
    # blocks carry a leading singleton (batch*head) dim:
    # q_ref: (1, R, qd); k_ref: (1, T, qd); p_ref: (1, R, pd)
    # pe_ref: (1, 2T-1, pd); mask_ref: (1, 1, T) bool; out_ref: (1, R, T)
    i = pl.program_id(1)
    T = k_ref.shape[1]
    R = q_ref.shape[1]

    qk = jnp.dot(
        q_ref[0], k_ref[0].T, preferred_element_type=jnp.float32
    )  # (R, T)
    pos_full = jnp.dot(
        p_ref[0], pe_ref[0].T, preferred_element_type=jnp.float32
    )  # (R, 2T-1)

    # rel->abs: out[r, j] = pos_full[r, s_r + j] with
    # s_r = (T-1) - (row_base + r) in [0, T-1].  Realized as a per-row
    # circular left shift by s_r, bit-decomposed into static-amount rolls
    # gated by per-row masks (Mosaic supports neither value dynamic_slice
    # nor per-row shifts directly; it does support full-tile rolls).
    # Reads stay in [s_r, s_r+T) ⊂ [0, 2T-1): no wraparound corruption.
    row_base = i * R
    W = 2 * T - 1
    shift = (T - 1 - row_base) - jax.lax.broadcasted_iota(
        jnp.int32, (R, 1), 0
    )
    x = pos_full
    b = 1
    while b < T:
        # left-by-b == right-by-(W-b); pltpu.roll wants non-negative shifts
        rolled = pltpu.roll(x, W - b, axis=1)
        x = jnp.where((shift & b) != 0, rolled, x)
        b *= 2
    pos = x[:, :T]

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
    Returns (B, h, T, T) softmaxed weights.
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
    ROW_TILE = _row_tile(T)
    n_tiles = T // ROW_TILE

    qf = q.reshape(B * h, T, qd).astype(jnp.float32)
    kf = k.reshape(B * h, T, qd).astype(jnp.float32)
    pf = p.reshape(B * h, T, pd).astype(jnp.float32)
    pef = jnp.broadcast_to(pe[None], (B, h, 2 * T - 1, pd)).reshape(
        B * h, 2 * T - 1, pd
    ).astype(jnp.float32)
    maskf = jnp.repeat(key_padding_mask, h, axis=0)[:, None, :]  # (B*h, 1, T)

    grid = (B * h, n_tiles)
    out = pl.pallas_call(
        _attn_weights_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, ROW_TILE, qd), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, T, qd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, ROW_TILE, pd), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2 * T - 1, pd), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, T), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, ROW_TILE, T), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B * h, T, T), jnp.float32),
        interpret=interpret,
    )(qf, kf, pf, pef, maskf)
    return out.reshape(B, h, T, T)
