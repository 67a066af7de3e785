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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Policy knob: with use_pallas on, only sequence lengths >= MIN_SEQ_LEN take
# the kernel path (shorter levels fall back to the XLA skew path).
# Env-overridable.  Default 640: round-4 on-chip A/Bs overturned the
# round-3 "XLA is fine below 1024" policy — kerneling the U-Net levels
# down to T=640 measured (PERF.md round 4):
#   headline T=1280 bucket: RTF 0.01083 -> 0.00897 (the 640 mid level)
#   T=1536 bucket:          RTF 0.01684 -> 0.00908 (the 768 mid level)
#   123M train fwd+bwd:     114.4 -> 109.8 ms (the f32 unskew backward)
# The standalone round-1 kernel-vs-XLA deltas at T=640 (~0.1 ms) badly
# underpredicted the in-context win: the XLA skew path's (B,h,T,2T-1)
# intermediates contend for HBM with the rest of the layer.  T<=320
# levels stay XLA (kernel call overhead ~2 ms loses at 0.14 ms of work).
MIN_SEQ_LEN = int(os.environ.get("ZIPVOICE_PALLAS_MIN_SEQ", "640"))

# Independent toggles for the two application-side kernels (A/B-able via
# env without code edits; the weights kernel itself is governed by the
# model's use_pallas_attention flag + MIN_SEQ_LEN alone).
# NA fusion defaults OFF: its nv/na blocks add ~2.4 MB per grid step,
# forcing the R=128 tile whose per-step overhead eats the fused saving
# (on-chip A/B: fused 3.78 ms vs weights-only 3.33 ms at R=128, while
# R=256 weights-only + separate NA einsum is faster than both; at R=256
# the fused variant exceeds the 16 MB scoped-VMEM limit by 156 KB).
FUSE_NONLIN = os.environ.get("ZIPVOICE_PALLAS_FUSE_NONLIN", "0") == "1"
# Application kernel defaults OFF: full-pipeline on-chip A/B (bench.py,
# 16-step base, B=8, T=1280) measured RTF 0.01097 with the XLA einsum
# apply vs 0.01269 with the kernel — XLA fuses the bhts,bhsd einsum with
# its surrounding projections better than the standalone kernel's DMA
# schedule, even at whole-sequence row tiles.
APPLY_KERNEL = os.environ.get("ZIPVOICE_PALLAS_APPLY", "0") == "1"
# pallas backward for the trainable weights kernel (vs the XLA backward,
# which materializes a (B, h, T, 3T-2) f32 unskew intermediate)
BWD_KERNEL = os.environ.get("ZIPVOICE_PALLAS_BWD", "1") == "1"
# application-kernel threshold when enabled: T=640 is the mid U-Net
# level, T=320 is too small to matter
MIN_APPLY_SEQ_LEN = int(os.environ.get("ZIPVOICE_PALLAS_APPLY_MIN", "640"))


_TILES = (1280, 1024, 768, 640, 512, 384, 320, 256, 128, 64, 32, 16, 8)


def _divisor_tile(T: int, max_rows: int) -> int:
    """Largest divisor of T from the ladder that is <= max_rows."""
    for r in _TILES:
        if r <= max_rows and T % r == 0:
            return r
    raise ValueError(f"T={T} not a multiple of 8")


def _row_tile(T: int) -> int:
    """Row tile for the weights kernels.  On-chip profiling shows ~6 us of
    fixed per-grid-step cost dominates at R=128 (640 steps for the bench
    shape), so prefer R=256 — bounded by the f32 (R, T) score/exp
    intermediates against the ~16 MB VMEM budget (R*T <= 320k keeps them
    ~5.5 MB plus double-buffered blocks)."""
    return _divisor_tile(T, max(128, min(256, 327680 // T)))


def _apply_row_tile(T: int) -> int:
    """Row tile for the application kernel: intermediates are tiny, so the
    only bound is the double-buffered (R, T) bf16 weights block — allow up
    to 4 MB per block (whole-sequence rows at T=1280: grid collapses from
    640 to 64 steps)."""
    return _divisor_tile(T, max(8, (4 * 1024 * 1024) // (2 * T)))


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


# ---------------------------------------------------------------------------
# Fused weights + NonlinAttention application (VERDICT round-2 Next #3).
#
# The reference layer consumes one attention-weights tensor three times
# (reference zipformer.py:1325-1544): NonlinAttention (head 0 only), then
# SelfAttention #1, then — after conv/ff — SelfAttention #2.  The consumers
# are *sequentially dependent* (SelfAttention #1's values are projected
# from the residual stream AFTER NonlinAttention's output is added), so
# only the NonlinAttention application can fuse with the weights pass: its
# gated value tensor depends on feed_forward1 alone, which is available
# before the weights are needed.  This kernel computes each weights tile
# in VMEM, writes it to HBM once (for the two SelfAttentions), and on
# head 0 immediately applies it to the NonlinAttention values — saving one
# full (B, T, T) HBM read of head-0 weights plus a kernel↔XLA boundary.
#
# Grid layout (B, n_tiles, heads) — heads fastest — so the nonlin output
# block (indexed by (b, i) only) stays resident in VMEM across the head
# iterations: it is written under @pl.when(head == 0) and flushed when
# (b, i) advances (the standard pallas block-revisiting pattern).
# ---------------------------------------------------------------------------


def _attn_weights_nonlin_kernel(
    q_ref, k_ref, p_ref, pe_ref, mask_ref, nv_ref, w_ref, na_ref,
):
    # q_ref: (1, R, qd); k_ref: (1, T, qd); p_ref: (1, R, pd)
    # pe_ref: (1, 1, W, pd); mask_ref: (1, 1, T); nv_ref: (1, T, hid)
    # w_ref: (1, R, T); na_ref: (1, R, hid)
    T = k_ref.shape[1]

    qk = jnp.dot(q_ref[0], k_ref[0].T, preferred_element_type=jnp.float32)
    pos_win = jnp.dot(
        p_ref[0], pe_ref[0, 0].T, preferred_element_type=jnp.float32
    )
    pos = pltpu.roll(pos_win, T + 1, 1, stride=1, stride_axis=0)[:, :T]
    scores = qk + pos
    scores = jnp.where(mask_ref[0, 0, :][None, :], -1000.0, scores)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    w = e / jnp.sum(e, axis=-1, keepdims=True)  # (R, T) f32
    wc = w.astype(w_ref.dtype)
    w_ref[0] = wc

    @pl.when(pl.program_id(2) == 0)
    def _():
        na_ref[0] = jnp.dot(
            wc, nv_ref[0], preferred_element_type=jnp.float32
        ).astype(na_ref.dtype)


def rel_pos_attention_weights_nonlin(
    q: jax.Array,
    k: jax.Array,
    p: jax.Array,
    pe: jax.Array,
    key_padding_mask: jax.Array,
    nv: jax.Array,
    interpret: bool = None,
):
    """Fused weights + NonlinAttention application pass.

    q, k: (B, h, T, qd); p: (B, h, T, pd); pe: (h, 2T-1, pd);
    key_padding_mask: (B, T) bool; nv: (B, T, hid) (NonlinAttention's
    tanh-gated value tensor, reference zipformer.py:1504-1520).

    Returns (weights (B, h, T, T), na (B, T, hid)) where
    na[b] = weights[b, 0] @ nv[b].
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _rel_pos_attention_weights_nonlin(
        q, k, p, pe, key_padding_mask, nv, interpret
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rel_pos_attention_weights_nonlin(q, k, p, pe, key_padding_mask, nv,
                                      interpret=False):
    B, h, T, qd = q.shape
    pd = p.shape[-1]
    hid = nv.shape[-1]
    # R=128 cap: the nv/na blocks put the R=256 variant 156 KB over the
    # 16 MB scoped-VMEM limit at the bench shape
    R = _divisor_tile(T, 128)
    n_tiles = T // R
    W = T + R

    qf = q.reshape(B * h, T, qd)
    kf = k.reshape(B * h, T, qd)
    pf = p.reshape(B * h, T, pd)
    pe_pad = jnp.concatenate([pe, jnp.zeros((h, 1, pd), pe.dtype)], axis=1)
    pe_windows = jnp.stack(
        [pe_pad[:, T - R - i * R : 2 * T - i * R, :] for i in range(n_tiles)],
        axis=1,
    )  # (h, n_tiles, W, pd)
    maskf = key_padding_mask[:, None, :]  # (B, 1, T)

    grid = (B, n_tiles, h)
    w, na = pl.pallas_call(
        _attn_weights_nonlin_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, qd), lambda b, i, hh: (b * h + hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, qd), lambda b, i, hh: (b * h + hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, pd), lambda b, i, hh: (b * h + hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, pd), lambda b, i, hh: (hh, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda b, i, hh: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, hid), lambda b, i, hh: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R, T), lambda b, i, hh: (b * h + hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, hid), lambda b, i, hh: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * h, T, T), q.dtype),
            jax.ShapeDtypeStruct((B, T, hid), q.dtype),
        ],
        interpret=interpret,
    )(qf, kf, pf, pe_windows, maskf, nv)
    return w.reshape(B, h, T, T), na


# ---------------------------------------------------------------------------
# Attention application kernel (SelfAttention's weights @ values).
#
# The reference applies precomputed weights via a batched matmul with a
# tiny N dimension (value_head_dim=12, reference zipformer.py:1325-1396).
# XLA's lowering of einsum("bhts,bshd->bthd") pays layout transposes and a
# narrow-N matmul that together cost ~15× the HBM floor of reading the
# (B, h, T, T) weights once (measured 3.83 ms vs ~0.26 ms at B=16, h=4,
# T=1280 — PERF.md component profile).  This kernel streams weight tiles
# through VMEM exactly once with the values resident, and runs twice per
# encoder layer (both SelfAttentions), making it the largest single lever
# on the fm_decoder step.
# ---------------------------------------------------------------------------


def _attn_apply_kernel(w_ref, v_ref, out_ref):
    # w_ref: (1, R, T); v_ref: (1, T, vd); out_ref: (1, R, vd)
    out_ref[0] = jnp.dot(
        w_ref[0], v_ref[0], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def attention_apply(w: jax.Array, v: jax.Array,
                    interpret: bool = None) -> jax.Array:
    """w: (B, h, T, T) attention weights; v: (B, h, T, vd) values.
    Returns (B, h, T, vd) = w @ v per (batch, head)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _attention_apply(w, v, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attention_apply(w, v, interpret=False):
    B, h, T, _ = w.shape
    vd = v.shape[-1]
    R = _apply_row_tile(T)
    n_tiles = T // R

    wf = w.reshape(B * h, T, T)
    vf = v.reshape(B * h, T, vd)
    out = pl.pallas_call(
        _attn_apply_kernel,
        grid=(B * h, n_tiles),
        in_specs=[
            pl.BlockSpec((1, R, T), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, vd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, vd), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * h, T, vd), v.dtype),
        interpret=interpret,
    )(wf, vf)
    return out.reshape(B, h, T, vd)


# ---------------------------------------------------------------------------
# Trainable path: pallas forward + custom VJP (VERDICT round-1 Missing #8).
#
# Backward math (out = softmax(mask_fill(qk + skew(p @ pe^T)))):
#   ds   = w * (g - rowsum(g * w))          # softmax VJP; w==0 at masked
#   dq   = ds @ k ;  dk = ds^T @ q          # MXU
#   drel = unskew(ds)                       # (B,h,T,2T-1), pure data movement
#   dp   = drel @ pe ;  dpe = sum_b p^T drel
# plus the reference's failsafe score penalty (zipformer.py:1254-1269):
# d/ds [penalty * relu(|s| - limit)] recomputed ONLY when the forward saw
# |score| > limit anywhere (a per-call flag the kernel emits) — in healthy
# training the penalty is exactly zero and the recompute branch never runs.
# ---------------------------------------------------------------------------

_SCORE_LIMIT = 25.0
_SCORE_PENALTY = 1.0e-04


def _attn_weights_train_kernel(
    q_ref, k_ref, p_ref, pe_ref, mask_ref, out_ref, smax_ref
):
    """Same as _attn_weights_kernel, additionally writing the tile's max
    |pre-mask score| so the backward can skip the penalty recompute."""
    T = k_ref.shape[1]
    R = q_ref.shape[1]

    qk = jnp.dot(q_ref[0], k_ref[0].T, preferred_element_type=jnp.float32)
    pos_win = jnp.dot(
        p_ref[0], pe_ref[0, 0].T, preferred_element_type=jnp.float32
    )
    pos = pltpu.roll(pos_win, T + 1, 1, stride=1, stride_axis=0)[:, :T]
    scores = qk + pos
    # the whole (B*h, n_tiles) smax buffer is one SMEM block shared across
    # grid steps (constant index map); each step writes its own cell
    smax_ref[pl.program_id(0), pl.program_id(1)] = jnp.max(jnp.abs(scores))
    masked = jnp.where(mask_ref[0, 0, :][None, :], -1000.0, scores)
    masked = masked - jnp.max(masked, axis=-1, keepdims=True)
    e = jnp.exp(masked)
    out_ref[0] = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(
        out_ref.dtype
    )


def _pallas_fwd_train(q, k, p, pe, key_padding_mask, interpret):
    B, h, T, qd = q.shape
    pd = p.shape[-1]
    R = _row_tile(T)
    n_tiles = T // R
    W = T + R

    qf = q.reshape(B * h, T, qd)
    kf = k.reshape(B * h, T, qd)
    pf = p.reshape(B * h, T, pd)
    pe_pad = jnp.concatenate([pe, jnp.zeros((h, 1, pd), pe.dtype)], axis=1)
    pe_windows = jnp.stack(
        [pe_pad[:, T - R - i * R : 2 * T - i * R, :] for i in range(n_tiles)],
        axis=1,
    )
    maskf = jnp.repeat(key_padding_mask, h, axis=0)[:, None, :]

    out, smax = pl.pallas_call(
        _attn_weights_train_kernel,
        grid=(B * h, n_tiles),
        in_specs=[
            pl.BlockSpec((1, R, qd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, qd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, pd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, pd), lambda b, i: (b % h, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R, T), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (B * h, n_tiles), lambda b, i: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * h, T, T), q.dtype),
            jax.ShapeDtypeStruct((B * h, n_tiles), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, pf, pe_windows, maskf)
    return out.reshape(B, h, T, T), jnp.max(smax)


def _skew(pos_scores):
    """(B, h, T, 2T-1) rel -> (B, h, T, T) abs, as in the XLA fallback."""
    B, h, T, _ = pos_scores.shape
    padded = jnp.pad(pos_scores, ((0, 0), (0, 0), (0, 0), (0, 1)))
    flat = padded.reshape(B, h, 2 * T * T)
    flat = jax.lax.slice_in_dim(flat, T - 1, T - 1 + T * (2 * T - 1), axis=-1)
    return flat.reshape(B, h, T, 2 * T - 1)[..., :T]


def _unskew(ds):
    """Adjoint of _skew: (B, h, T, T) -> (B, h, T, 2T-1) with
    out[t, n] = ds[t, t + n - (T-1)], zero outside — pure pad/reshape/slice
    (no gather)."""
    B, h, T, _ = ds.shape
    W2 = 3 * T - 2
    padded = jnp.pad(ds, ((0, 0), (0, 0), (0, 0), (T - 1, T - 1)))
    flat = padded.reshape(B, h, T * W2)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (0, T)))
    rows = flat[..., : T * (W2 + 1)].reshape(B, h, T, W2 + 1)
    return rows[..., : 2 * T - 1]


def _attn_weights_bwd_kernel(
    coin_ref, g_ref, w_ref, q_ref, k_ref, p_ref, pe_ref,
    dq_ref, dk_ref, dp_ref, dpe_ref,
):
    """Tiled backward: softmax VJP + failsafe penalty + windowed unskew +
    all four input grads, without materializing the (B, h, T, 3T-2)
    unskew intermediate in HBM.

    coin_ref: (1, 1) SMEM — 1.0 when the penalty coin landed this call;
    g/w: (1, R, T) upstream grad / saved softmax; q/p: (1, R, qd/pd);
    k: (1, T, qd); pe_ref: (1, 1, W, pd) per-tile window (same windows as
    the forward).  dk accumulates across row tiles (block index constant
    in i); dpe_ref emits per-(batchhead, tile) window contributions the
    caller folds into the global table.
    """
    T = k_ref.shape[1]
    R = g_ref.shape[1]
    W = T + R
    i = pl.program_id(1)

    g = g_ref[0].astype(jnp.float32)
    w = w_ref[0].astype(jnp.float32)
    ds = w * (g - jnp.sum(g * w, axis=-1, keepdims=True))  # (R, T)

    # failsafe score-penalty grad (reference zipformer.py:1254-1269):
    # recompute the raw scores tile (two small matmuls + the forward's
    # strided roll — MXU noise next to the HBM-bound g/w reads) and gate
    # by the coin; exactly zero when no |score| exceeds the limit
    qk = jnp.dot(q_ref[0], k_ref[0].T, preferred_element_type=jnp.float32)
    pos_win = jnp.dot(
        p_ref[0], pe_ref[0, 0].T, preferred_element_type=jnp.float32
    )
    pos = pltpu.roll(pos_win, T + 1, 1, stride=1, stride_axis=0)[:, :T]
    scores = qk + pos
    ds = ds + (
        coin_ref[0, 0]
        * _SCORE_PENALTY
        * jnp.sign(scores)
        * (jnp.abs(scores) > _SCORE_LIMIT)
    )

    dq_ref[0] = jnp.dot(
        ds, k_ref[0].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)

    dk_contrib = jnp.dot(
        ds.T, q_ref[0].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # (T, qd)

    @pl.when(i == 0)
    def _():
        dk_ref[0] = dk_contrib

    @pl.when(i != 0)
    def _():
        dk_ref[0] += dk_contrib

    # windowed unskew (adjoint of the forward roll): forward read
    # pos[r, c] = pos_win[r, (R-1-r) + c], so drel_win is the zero-padded
    # ds with row r right-shifted by R-1-r.  The hardware strided roll
    # only shifts by INCREASING row index, so conjugate it with a row
    # reversal; Mosaic has no `rev` primitive, so the reversal is an MXU
    # matmul with the (R, R) exchange matrix (trivial FLOPs next to the
    # kernel's HBM traffic).  Wraparound is safe: reversed row r' shifts
    # by r' <= R-1 and columns [W-r', W) are zero padding.
    ds_pad = jnp.concatenate(
        [ds, jnp.zeros((R, W - T), jnp.float32)], axis=1
    )
    ii = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    exch = (ii + jj == R - 1).astype(jnp.float32)
    rev = jnp.dot(exch, ds_pad, preferred_element_type=jnp.float32)
    rolled = pltpu.roll(rev, 0, 1, stride=1, stride_axis=0)
    drel_win = jnp.dot(
        exch, rolled, preferred_element_type=jnp.float32
    )  # (R, W)

    dp_ref[0] = jnp.dot(
        drel_win, pe_ref[0, 0].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(dp_ref.dtype)
    dpe_ref[0, 0] = jnp.dot(
        drel_win.T, p_ref[0].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(dpe_ref.dtype)


def _pallas_bwd(q, k, p, pe, g, w, coin_live, interpret):
    """Returns (dq, dk, dp, dpe) in f32 via the tiled backward kernel."""
    B, h, T, qd = q.shape
    pd = p.shape[-1]
    # conservative tile: the backward holds ~2x the forward's f32
    # intermediates (ds, ds_pad, drel_win, scores) per step
    R = _divisor_tile(T, 128)
    n_tiles = T // R
    W = T + R

    qf = q.reshape(B * h, T, qd)
    kf = k.reshape(B * h, T, qd)
    pf = p.reshape(B * h, T, pd)
    gf = g.reshape(B * h, T, T)
    wf = w.reshape(B * h, T, T)
    pe_pad = jnp.concatenate([pe, jnp.zeros((h, 1, pd), pe.dtype)], axis=1)
    pe_windows = jnp.stack(
        [pe_pad[:, T - R - i * R : 2 * T - i * R, :] for i in range(n_tiles)],
        axis=1,
    )  # (h, n_tiles, W, pd)
    coin_arr = jnp.reshape(coin_live.astype(jnp.float32), (1, 1))

    dq, dk, dp, dpe_win = pl.pallas_call(
        _attn_weights_bwd_kernel,
        grid=(B * h, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, T), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, T), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, qd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, qd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, pd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, pd), lambda b, i: (b % h, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R, qd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, qd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, pd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, pd), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * h, T, qd), jnp.float32),
            jax.ShapeDtypeStruct((B * h, T, qd), jnp.float32),
            jax.ShapeDtypeStruct((B * h, T, pd), jnp.float32),
            jax.ShapeDtypeStruct((B * h, n_tiles, W, pd), jnp.float32),
        ],
        interpret=interpret,
    )(coin_arr, gf, wf, qf, kf, pf, pe_windows)

    dq = dq.reshape(B, h, T, qd)
    dk = dk.reshape(B, h, T, qd)
    dp = dp.reshape(B, h, T, pd)
    # fold overlapping window contributions (summed over batch) back into
    # the global (2T-1)-row table: window i starts at global row T-R-i*R
    dpe_win = dpe_win.reshape(B, h, n_tiles, W, pd).sum(axis=0)
    dpe_pad = jnp.zeros((h, 2 * T, pd), jnp.float32)
    for i in range(n_tiles):
        start = T - R - i * R
        dpe_pad = dpe_pad.at[:, start : start + W, :].add(dpe_win[:, i])
    return dq, dk, dp, dpe_pad[:, : 2 * T - 1, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def rel_pos_attention_weights_trainable(
    q, k, p, pe, key_padding_mask, penalty_coin, interpret: bool = False,
):
    """Differentiable fused attention weights: pallas forward, XLA backward.

    ``penalty_coin``: traced 0/1 scalar — whether this call applies the
    reference's failsafe score penalty (the caller draws the
    0.1-probability coin, zipformer.py:1254-1269).  The penalty recompute
    runs under lax.cond only when the coin landed AND the forward actually
    saw |score| > limit (i.e. essentially never in healthy training; the
    penalty grad is exactly zero otherwise).
    """
    out, _ = _pallas_fwd_train(q, k, p, pe, key_padding_mask, interpret)
    return out


def _trainable_fwd(q, k, p, pe, key_padding_mask, penalty_coin, interpret):
    out, smax = _pallas_fwd_train(q, k, p, pe, key_padding_mask, interpret)
    return out, (q, k, p, pe, key_padding_mask, penalty_coin, out, smax)


def _float0(x):
    import numpy as _np

    return _np.zeros(x.shape, dtype=jax.dtypes.float0)


def _trainable_bwd(interpret, res, g):
    q, k, p, pe, mask, coin, w, smax = res
    if BWD_KERNEL:
        # the penalty grad is exactly zero unless the coin landed AND some
        # |score| exceeded the limit; the kernel recomputes the score tile
        # and gates on this scalar (always-on recompute is MXU noise)
        coin_live = ((coin > 0) & (smax > _SCORE_LIMIT))
        dq, dk, dp, dpe = _pallas_bwd(
            q, k, p, pe, g, w, coin_live, interpret
        )
        return (
            dq.astype(q.dtype), dk.astype(k.dtype), dp.astype(p.dtype),
            dpe.astype(pe.dtype), _float0(mask), jnp.zeros_like(coin),
        )
    g32 = g.astype(jnp.float32)
    w32 = w.astype(jnp.float32)
    ds = w32 * (g32 - jnp.sum(g32 * w32, axis=-1, keepdims=True))

    def with_penalty(ds):
        # recompute raw scores — only reachable when the coin landed and
        # the forward saw |score| > limit (relu' is zero otherwise)
        qk = jnp.einsum(
            "bhtd,bhsd->bhts", q.astype(jnp.float32), k.astype(jnp.float32)
        )
        pos = _skew(jnp.einsum(
            "bhtd,hnd->bhtn", p.astype(jnp.float32), pe.astype(jnp.float32)
        ))
        scores = qk + pos
        extra = _SCORE_PENALTY * jnp.sign(scores) * (
            jnp.abs(scores) > _SCORE_LIMIT
        )
        return ds + extra

    ds = jax.lax.cond(
        (coin > 0) & (smax > _SCORE_LIMIT), with_penalty, lambda d: d, ds
    )

    dq = jnp.einsum("bhts,bhsd->bhtd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bhts,bhtd->bhsd", ds, q.astype(jnp.float32))
    drel = _unskew(ds)  # (B, h, T, 2T-1)
    dp = jnp.einsum("bhtn,hnd->bhtd", drel, pe.astype(jnp.float32))
    dpe = jnp.einsum("bhtn,bhtd->hnd", drel, p.astype(jnp.float32))
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dp.astype(p.dtype),
        dpe.astype(pe.dtype), _float0(mask), jnp.zeros_like(coin),
    )


rel_pos_attention_weights_trainable.defvjp(_trainable_fwd, _trainable_bwd)
