"""TTS Zipformer backbone in JAX/flax, designed for TPU.

A from-scratch functional reimplementation of the U-Net-style Zipformer stack
used by ZipVoice (reference: /root/reference/zipvoice/models/modules/zipformer.py).
Differences from the reference that are intentional TPU-first design choices:

- batch-major layout (B, T, C) everywhere (the reference is time-major);
- static shapes: sequence length is fixed per compiled program (length
  bucketing happens in the caller); padding is carried via boolean masks;
- the rel->abs position-score conversion (reference zipformer.py:1239-1248
  uses ``as_strided``) is a gather with a precomputed (T, T) index map that
  XLA lowers to an efficient dynamic-slice pattern;
- all training-only gradient-shaping modules (Balancer/Whiten/...) are
  identity at inference (proof: the reference's ONNX export strips them,
  zipvoice/utils/scaling_converter.py) and are applied as custom-vjp hooks
  only when ``train=True``;
- fp32 parameters with a configurable compute dtype (bf16 on TPU for speed).

Numerical parity targets (verified by tests/test_zipformer_parity.py against
the reference run on CPU):
- timestep_embedding: reference zipformer.py:47-69
- CompactRelPositionalEncoding: reference zipformer.py:938-1056
- RelPositionMultiheadAttentionWeights: reference zipformer.py:1059-1306
- SelfAttention: :1325-1396, NonlinAttention: :1442-1544,
  FeedforwardModule: :1399-1439, ConvolutionModule: :1547-1680,
  BypassModule: :747-804, SimpleDownsample/Upsample: :873-935,
  Zipformer2EncoderLayer forward ordering: :489-642.
"""

import math
from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from zipvoice_tpu.ops import schedule as sched
from zipvoice_tpu.ops.scaling import (
    balancer,
    bias_norm,
    limit_param_value,
    penalize_abs_values_gt,
    swoosh_l,
    swoosh_r,
    whiten,
)


def _stochastic(module: nn.Module, prob: float, fn, x):
    """Apply a backward-only (identity-forward) regularizer with
    probability ``prob``, like the reference's per-call random gating
    (e.g. scaling.py:655-657, zipformer.py:1254).  The forward value is
    unchanged either way.

    lax.cond (not jnp.where) so the regularizer's BACKWARD runs only when
    the coin lands: where evaluates both cotangent branches, paying the
    balancer/whiten stats passes at 100% duty cycle for transforms the
    reference fires 4-25% of the time — measured 93 ms of backward in the
    123M step before this change (PERF.md round 4).  Uses the 'reg' rng.
    """
    apply = jax.random.bernoulli(module.make_rng("reg"), prob)
    return jax.lax.cond(apply, fn, lambda v: v, x)


def _rand_uniform(rng, shape):
    """Single entry point for all schedule-driven stochastic draws (sequence
    skips, const-attention / pos-emb coins, scheduled dropout); tests pin it
    to a constant to get deterministic grad parity vs the reference."""
    return jax.random.uniform(rng, shape)


def _seq_skip_mask(module, batch_size, rate, dtype):
    """Per-sequence keep mask, shape (B, 1, 1): 1 keeps the sequence, 0
    drops the submodule's contribution for it (reference
    zipformer.py:463-487 get_sequence_dropout_mask; no 1/(1-p) rescale)."""
    u = _rand_uniform(module.make_rng("skip"), (batch_size, 1, 1))
    return (u > rate).astype(dtype)


def _shared_dropout(module, x, rate):
    """Dropout with the mask shared along the time axis (axis 1) and the
    torch 1/(1-p) rescale, accepting a traced rate (the reference's
    scheduled ``dropout_shared_dim=0`` dropout, scaling.py:1209-1360)."""
    B, _, C = x.shape
    keep = (
        _rand_uniform(module.make_rng("dropout"), (B, 1, C)) >= rate
    ).astype(x.dtype)
    return x * keep / (1.0 - rate)


def _static_zero(v) -> bool:
    return isinstance(v, (int, float)) and float(v) == 0.0


# ---------------------------------------------------------------------------
# Initializers matching torch semantics (so training-from-scratch starts from
# the same distribution family as the reference).
# ---------------------------------------------------------------------------


def torch_linear_kernel_init(scale: float = 1.0):
    """torch nn.Linear default init (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)))
    times ScaledLinear's initial_scale (reference scaling.py:475-495)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = 1.0 / math.sqrt(fan_in) * scale
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_bias_init(fan_in: int, scale: float = 1.0):
    """torch default bias U(+-1/sqrt(fan_in)); ScaledLinear overrides with
    U(+-0.1*initial_scale) (reference scaling.py:494)."""

    def init(key, shape, dtype=jnp.float32):
        if scale == 1.0:
            bound = 1.0 / math.sqrt(fan_in)
        else:
            bound = 0.1 * scale
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def dense(features: int, fan_in: int, *, use_bias: bool = True,
          initial_scale: float = 1.0, dtype=jnp.float32, name: str = None):
    """nn.Dense with torch-compatible init (ScaledLinear when initial_scale != 1)."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=torch_linear_kernel_init(initial_scale),
        bias_init=torch_linear_bias_init(fan_in, initial_scale),
        name=name,
    )


# ---------------------------------------------------------------------------
# Positional / timestep embeddings
# ---------------------------------------------------------------------------


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embedding (reference zipformer.py:47-69).

    t: (B,) -> (B, dim); layout is [cos(all freqs), sin(all freqs)].
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[..., :1])], axis=-1)
    return emb


def compact_rel_pos_encoding(
    seq_len: int, pos_dim: int, length_factor: float = 1.0
) -> jax.Array:
    """Compact relative positional encoding table, shape (2T-1, pos_dim).

    Row n encodes relative offset n - (T-1) in [-(T-1), T-1]: a log-compressed,
    atan-warped Fourier basis with the last channel pinned to 1.0 as a bias
    (reference zipformer.py:983-1032).  Pure function of the offset, so
    building it at length T equals slicing the reference's cached max-length
    table (zipformer.py:1044-1055).
    """
    T = seq_len
    x = jnp.arange(-(T - 1), T, dtype=jnp.float32)[:, None]
    freqs = 1.0 + jnp.arange(pos_dim // 2, dtype=jnp.float32)
    compression_length = pos_dim ** 0.5
    x_compressed = (
        compression_length
        * jnp.sign(x)
        * (jnp.log(jnp.abs(x) + compression_length) - math.log(compression_length))
    )
    length_scale = length_factor * pos_dim / (2.0 * math.pi)
    x_atan = jnp.arctan(x_compressed / length_scale)
    cosines = jnp.cos(x_atan * freqs)
    sines = jnp.sin(x_atan * freqs)
    # interleave: pe[:, 0::2] = cos, pe[:, 1::2] = sin, then pe[:, -1] = 1.0
    # (built by concatenation — .at[].set would lower to a scatter)
    pe = jnp.stack([cosines, sines], axis=-1).reshape(2 * T - 1, pos_dim)
    pe = jnp.concatenate(
        [pe[:, :-1], jnp.ones((2 * T - 1, 1), pe.dtype)], axis=1
    )
    return pe


# ---------------------------------------------------------------------------
# Sub-modules
# ---------------------------------------------------------------------------


class BiasNorm(nn.Module):
    """BiasNorm (reference scaling.py:393-472)."""

    num_channels: int

    @nn.compact
    def __call__(self, x):
        log_scale = self.param("log_scale", lambda k: jnp.asarray(1.0, jnp.float32))
        bias = self.param("bias", nn.initializers.zeros, (self.num_channels,))
        return bias_norm(x, bias, log_scale)


class BypassModule(nn.Module):
    """Learnable per-channel bypass scale (reference zipformer.py:747-804).

    When training with an active batch count, the scale is clamped to the
    scheduled [scale_min, 1.0] window via limit_param_value (reference
    :770-782) and, if ``skip_rate`` is set (the per-layer layerdrop ramp,
    :692-698), whole sequences randomly bypass the module (:783-788).
    """

    embed_dim: int
    skip_rate: Optional[sched.ScheduledFloat] = None

    @nn.compact
    def __call__(self, src_orig, src, *, train: bool = False,
                 batch_count=None):
        scale = self.param(
            "bypass_scale", lambda k, s: jnp.full(s, 0.5, jnp.float32),
            (self.embed_dim,),
        )
        if train and batch_count is not None:
            scale = limit_param_value(
                scale, sched.BYPASS_SCALE_MIN(batch_count), 1.0
            )
            if self.skip_rate is not None:
                B = src.shape[0]
                mask = _seq_skip_mask(
                    self, B, self.skip_rate(batch_count), scale.dtype
                )
                scale = scale * mask  # (B, 1, C): zero => skip this layer
        return src_orig + (src - src_orig) * scale


class RelPosAttentionWeights(nn.Module):
    """Relative-position attention weights (reference zipformer.py:1059-1306).

    Produces (B, num_heads, T, T) softmaxed weights consumed by SelfAttention
    and NonlinAttention.  The 1/sqrt(d) scaling is baked into in_proj's
    initial_scale (query_head_dim ** -0.25), matching the reference.
    """

    embed_dim: int
    pos_dim: int
    num_heads: int
    query_head_dim: int
    pos_head_dim: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, pos_emb, key_padding_mask=None,
                 train: bool = False, batch_count=None,
                 return_projections: bool = False):
        h, qd, pd = self.num_heads, self.query_head_dim, self.pos_head_dim
        B, T, _ = x.shape
        proj = dense(
            (2 * qd + pd) * h, self.embed_dim,
            initial_scale=qd ** -0.25, dtype=self.dtype, name="in_proj",
        )(x)
        q = proj[..., : h * qd].reshape(B, T, h, qd)
        k = proj[..., h * qd : 2 * h * qd].reshape(B, T, h, qd)
        if train:
            # balance_keys + whiten_keys (reference zipformer.py:1115-1138)
            k = _stochastic(
                self, 0.025,
                lambda t: balancer(t, 0.4, 0.6, 0.0, 100.0, 0.04), k,
            )
            k = _stochastic(
                self, 0.15,
                lambda t: whiten(
                    t, h, sched.WHITEN_KEYS(batch_count), 0.025
                ),
                k,
            )
        p = proj[..., 2 * h * qd :].reshape(B, T, h, pd)

        pe_proj = dense(
            h * pd, self.pos_dim, use_bias=False,
            initial_scale=0.05, dtype=self.dtype, name="linear_pos",
        )

        from zipvoice_tpu.ops import pallas_attention as _pa

        if return_projections:
            # inference-only fused path (ZipformerEncoderLayer defers the
            # weights computation so the kernel can also apply
            # NonlinAttention's values in the same VMEM pass)
            assert not train
            pe_h = pe_proj(pos_emb).reshape(2 * T - 1, h, pd).transpose(
                1, 0, 2
            )
            mask = (
                key_padding_mask
                if key_padding_mask is not None
                else jnp.zeros((B, T), bool)
            )
            return (
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                p.transpose(0, 2, 1, 3),
                pe_h,
                mask,
            )

        if self.use_pallas and T % 8 == 0 and T >= _pa.MIN_SEQ_LEN:
            pe_h = pe_proj(pos_emb).reshape(2 * T - 1, h, pd).transpose(
                1, 0, 2
            )
            mask = (
                key_padding_mask
                if key_padding_mask is not None
                else jnp.zeros((B, T), bool)
            )
            if not train:
                return _pa.rel_pos_attention_weights(
                    q.transpose(0, 2, 1, 3),
                    k.transpose(0, 2, 1, 3),
                    p.transpose(0, 2, 1, 3),
                    pe_h,
                    mask,
                ).astype(x.dtype)
            # training: custom-VJP kernel.  The scheduled pos-emb skip coin
            # scales p (equivalent to zeroing pos_scores: the term is linear
            # in p and the coin is 0/1); the failsafe score-penalty coin
            # (reference zipformer.py:1254-1269) rides the backward's
            # lax.cond, firing only when |score| actually exceeds the limit.
            if batch_count is not None:
                use_pos = (
                    _rand_uniform(self.make_rng("skip"), ())
                    >= sched.POS_EMB_SKIP(batch_count)
                )
                p = p * use_pos.astype(p.dtype)
            coin = jax.random.bernoulli(self.make_rng("reg"), 0.1).astype(
                jnp.float32
            )
            return _pa.rel_pos_attention_weights_trainable(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                p.transpose(0, 2, 1, 3),
                pe_h,
                mask,
                coin,
                interpret=jax.default_backend() == "cpu",
            ).astype(x.dtype)

        attn_scores = jnp.einsum("bthd,bshd->bhts", q, k)

        # positional part: project pos table per head, then rel->abs gather
        pe = pe_proj(pos_emb).reshape(2 * T - 1, h, pd)
        pos_scores = jnp.einsum("bthd,nhd->bhtn", p, pe)
        # abs_score[i, j] = rel_score[i, (j - i) + T - 1]
        # (defined by the reference's as_strided at zipformer.py:1239-1248).
        # Realized gather-free via the skew trick: pad one column, flatten,
        # shift by T-1, restride — element (i, j) of the result reads flat
        # index (T-1) + i*(2T-1) + j, which is exactly rel index j-i+T-1 of
        # row i.  Pure pad/reshape/slice, so XLA lowers it to data movement
        # instead of a (slow) per-element gather.
        padded = jnp.pad(pos_scores, ((0, 0), (0, 0), (0, 0), (0, 1)))
        flat = padded.reshape(B, h, 2 * T * T)
        flat = jax.lax.slice_in_dim(
            flat, T - 1, T - 1 + T * (2 * T - 1), axis=-1
        )
        pos_scores = flat.reshape(B, h, T, 2 * T - 1)[..., :T]
        if train and batch_count is not None:
            # scheduled pos-emb skip: with prob pos_emb_skip_rate the pos
            # term is dropped for this whole forward call (reference
            # zipformer.py:1207-1227 uses a python random() coin)
            use_pos = (
                _rand_uniform(self.make_rng("skip"), ())
                >= sched.POS_EMB_SKIP(batch_count)
            )
            pos_scores = pos_scores * use_pos.astype(pos_scores.dtype)
        attn_scores = attn_scores + pos_scores

        if train:
            # failsafe score penalty (reference zipformer.py:1254-1269)
            attn_scores = _stochastic(
                self, 0.1,
                lambda t: penalize_abs_values_gt(t, 25.0, 1.0e-04),
                attn_scores,
            )

        if key_padding_mask is not None:
            # -1000 (not -inf) so that fully-masked rows stay finite
            # (reference zipformer.py:1273-1289)
            attn_scores = jnp.where(
                key_padding_mask[:, None, None, :], -1000.0, attn_scores
            )
        if not train and attn_scores.dtype == jnp.bfloat16:
            # inference: keep the materialized O(T^2) exp intermediate in
            # bf16 (halves this path's HBM traffic) while accumulating the
            # normalizer in f32 — the stored weights are bf16 either way
            m = jnp.max(attn_scores, axis=-1, keepdims=True)
            e = jnp.exp(attn_scores - m)
            s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            return (e.astype(jnp.float32) / s).astype(attn_scores.dtype)
        return jax.nn.softmax(attn_scores.astype(jnp.float32), axis=-1).astype(
            attn_scores.dtype
        )


class SelfAttention(nn.Module):
    """Attention application with precomputed weights (reference :1325-1396)."""

    embed_dim: int
    num_heads: int
    value_head_dim: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, attn_weights, train: bool = False,
                 batch_count=None):
        B, T, _ = x.shape
        h, vd = self.num_heads, self.value_head_dim
        v = dense(h * vd, self.embed_dim, dtype=self.dtype, name="in_proj")(x)
        v = v.reshape(B, T, h, vd)
        from zipvoice_tpu.ops import pallas_attention as _pa

        if (self.use_pallas and _pa.APPLY_KERNEL and not train
                and T % 8 == 0 and T >= _pa.MIN_APPLY_SEQ_LEN):
            # weights @ values with a tiny N dim (vd=12) pays ~15× the HBM
            # floor under XLA's layout choices; stream it through VMEM
            out = _pa.attention_apply(attn_weights, v.transpose(0, 2, 1, 3))
            out = out.transpose(0, 2, 1, 3)
        else:
            out = jnp.einsum("bhts,bshd->bthd", attn_weights, v)
        out = out.reshape(B, T, h * vd)
        out = dense(
            self.embed_dim, h * vd, initial_scale=0.05, dtype=self.dtype,
            name="out_proj",
        )(out)
        if train:
            # whiten (reference zipformer.py:1352-1357)
            out = _stochastic(
                self, 0.15,
                lambda v: whiten(
                    v, 1, sched.WHITEN_SELF_ATTN(batch_count), 0.01
                ),
                out,
            )
        return out


class NonlinAttention(nn.Module):
    """Attention-weight-reuse conv replacement (reference :1442-1544).

    Uses only head 0's attention weights across all hidden channels.
    """

    channels: int
    hidden_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_weights_head0, train: bool = False,
                 batch_count=None, apply_fn=None):
        # attn_weights_head0: (B, T, T); or None with apply_fn set, in
        # which case apply_fn(v) performs the weights @ v application
        # (the layer's fused pallas path, which computes the weights and
        # this product in one VMEM pass)
        proj = dense(
            self.hidden_channels * 3, self.channels, dtype=self.dtype,
            name="in_proj",
        )(x)
        s, v, y = jnp.split(proj, 3, axis=-1)
        if train:
            # pre-tanh balancer w/ scheduled positivity bounds (reference
            # zipformer.py:1467-1474)
            s = _stochastic(
                self, sched.BALANCER_PROB(batch_count),
                lambda t: balancer(
                    t,
                    sched.NONLIN_MIN_POSITIVE(batch_count),
                    sched.NONLIN_MAX_POSITIVE(batch_count),
                    0.5, 5.0, 0.04,
                ),
                s,
            )
        v = v * jnp.tanh(s)
        if train:
            v = _stochastic(
                self, 0.15,
                lambda t: whiten(
                    t, 1, sched.WHITEN_NONLIN(batch_count), 0.01
                ),
                v,
            )
        if apply_fn is not None:
            v = apply_fn(v)
        else:
            v = jnp.einsum("bts,bsd->btd", attn_weights_head0, v)
        v = v * y
        v = dense(
            self.channels, self.hidden_channels, initial_scale=0.05,
            dtype=self.dtype, name="out_proj",
        )(v)
        if train:
            v = _stochastic(
                self, 0.15,
                lambda t: whiten(
                    t, 1, sched.WHITEN_NONLIN2(batch_count), 0.01
                ),
                v,
            )
        return v


class FeedforwardModule(nn.Module):
    """FF module: Linear -> SwooshL -> (dropout) -> Linear (reference :1399-1439)."""

    embed_dim: int
    feedforward_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, dropout_rate=0.0,
                 batch_count=None):
        x = dense(
            self.feedforward_dim, self.embed_dim, dtype=self.dtype, name="in_proj"
        )(x)
        if train:
            # hidden_balancer (reference zipformer.py:1406-1413)
            x = _stochastic(
                self, sched.BALANCER_PROB(batch_count),
                lambda v: balancer(v, 0.3, 1.0, 0.75, 5.0, 0.04), x,
            )
        x = swoosh_l(x)
        if train and not _static_zero(dropout_rate):
            # shared along the time axis (reference dropout_shared_dim=0);
            # dropout_rate may be a traced scheduled scalar
            x = _shared_dropout(self, x, dropout_rate)
        x = dense(
            self.embed_dim, self.feedforward_dim, initial_scale=0.1,
            dtype=self.dtype, name="out_proj",
        )(x)
        if train:
            # out_whiten (reference zipformer.py:1426-1431)
            x = _stochastic(
                self, 0.15,
                lambda v: whiten(v, 1, sched.WHITEN_FF(batch_count), 0.01),
                x,
            )
        return x


class ConvolutionModule(nn.Module):
    """Sigmoid-GLU -> depthwise conv1d -> SwooshR -> Linear (reference :1547-1680)."""

    channels: int
    kernel_size: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    pallas_interpret: bool = False  # CPU-test hook

    @nn.compact
    def __call__(self, x, key_padding_mask=None, train: bool = False,
                 batch_count=None):
        C, k = self.channels, self.kernel_size
        proj = dense(2 * C, C, dtype=self.dtype, name="in_proj")(x)
        v, s = jnp.split(proj, 2, axis=-1)
        if train:
            # balancer1 before the sigmoid gate, scheduled min_positive /
            # max_abs (reference :1589-1596)
            s = _stochastic(
                self, sched.BALANCER_PROB(batch_count),
                lambda t: balancer(
                    t,
                    sched.CONV_B1_MIN_POSITIVE(batch_count),
                    1.0, 1.5,
                    sched.CONV_B1_MAX_ABS(batch_count),
                    0.04,
                ),
                s,
            )
        v = v * jax.nn.sigmoid(s)
        if key_padding_mask is not None:
            v = jnp.where(key_padding_mask[:, :, None], 0.0, v)
        # depthwise conv over time, SAME padding; torch weight (C,1,k) is
        # stored here as (k, C) and reshaped to WIO=(k, 1, C)
        fan_in = k  # = in_channels/groups * kernel_size
        w = self.param(
            "depthwise_weight", torch_linear_kernel_init(1.0), (fan_in, C)
        )
        b = self.param("depthwise_bias", torch_linear_bias_init(fan_in), (C,))
        if self.use_pallas:
            # custom-VJP kernel: pallas forward AND pallas backward
            # (dv/dw/db), so the flag is usable in training where the
            # XLA depthwise weight-grad is the layer's worst bwd/fwd
            # ratio (PERF.md round-5 backward budget)
            from zipvoice_tpu.ops.pallas_conv import depthwise_conv1d_vjp

            v = depthwise_conv1d_vjp(
                v.astype(self.dtype), w.astype(self.dtype),
                b.astype(self.dtype), self.pallas_interpret,
            )
        else:
            v = jax.lax.conv_general_dilated(
                v.astype(self.dtype),
                w.reshape(k, 1, C).astype(self.dtype),
                window_strides=(1,),
                padding=[(k // 2, k // 2)],
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=C,
            ) + b.astype(self.dtype)
        if train:
            # balancer2 + whiten after the depthwise conv, scheduled
            # min_positive / min_abs / whitening limit (reference :1614-1628)
            v = _stochastic(
                self, sched.BALANCER_PROB(batch_count),
                lambda t: balancer(
                    t,
                    sched.CONV_B2_MIN_POSITIVE(batch_count),
                    1.0,
                    sched.CONV_B2_MIN_ABS(batch_count),
                    10.0, 0.04,
                ),
                v,
            )
            v = _stochastic(
                self, 0.15,
                lambda t: whiten(t, 1, sched.WHITEN_CONV(batch_count), 0.01),
                v,
            )
        v = swoosh_r(v)
        return dense(
            C, C, initial_scale=0.05, dtype=self.dtype, name="out_proj"
        )(v)


class ZipformerEncoderLayer(nn.Module):
    """One Zipformer2 layer (forward ordering: reference zipformer.py:489-642)."""

    embed_dim: int
    pos_dim: int
    num_heads: int
    query_head_dim: int
    pos_head_dim: int
    value_head_dim: int
    feedforward_dim: int
    cnn_module_kernel: int
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas_attention: bool = False
    use_pallas_conv: bool = False
    # per-layer layerdrop ramp (set by ZipformerEncoder; reference :692-698)
    bypass_skip_rate: Optional[sched.ScheduledFloat] = None

    def _skip(self, x, rate_schedule, batch_count):
        """Scheduled sequence-level dropout of a submodule's contribution
        (reference sequence_dropout, zipformer.py:481-487)."""
        if batch_count is None:
            return x
        mask = _seq_skip_mask(
            self, x.shape[0], rate_schedule(batch_count), x.dtype
        )
        return x * mask

    @nn.compact
    def __call__(
        self,
        src,
        pos_emb,
        time_emb=None,
        key_padding_mask=None,
        *,
        train: bool = False,
        dropout_rate=0.0,
        batch_count=None,
    ):
        d = self.embed_dim
        src_orig = src
        scheds_on = train and batch_count is not None
        bc = batch_count if train else None

        from zipvoice_tpu.ops import pallas_attention as _pa

        # inference fused path: defer the weights kernel until
        # NonlinAttention's gated values exist, so one VMEM pass emits both
        use_fused = (
            not train
            and self.use_pallas_attention
            and _pa.FUSE_NONLIN
            and src.shape[1] % 8 == 0
            and src.shape[1] >= _pa.MIN_SEQ_LEN
        )
        attn_mod = RelPosAttentionWeights(
            embed_dim=d,
            pos_dim=self.pos_dim,
            num_heads=self.num_heads,
            query_head_dim=self.query_head_dim,
            pos_head_dim=self.pos_head_dim,
            dtype=self.dtype,
            use_pallas=self.use_pallas_attention,
            name="self_attn_weights",
        )
        if use_fused:
            q_t, k_t, p_t, pe_h, kp_mask = attn_mod(
                src, pos_emb, key_padding_mask, return_projections=True
            )
            attn_weights = None
        else:
            attn_weights = attn_mod(
                src, pos_emb, key_padding_mask, train=train, batch_count=bc
            )

        ff_kw = dict(train=train, dropout_rate=dropout_rate, batch_count=bc)

        if time_emb is not None:
            src = src + time_emb
        src = src + FeedforwardModule(
            embed_dim=d, feedforward_dim=(self.feedforward_dim * 3) // 4,
            dtype=self.dtype, name="feed_forward1",
        )(src, **ff_kw)

        # one sequence-level skip mask shared by nonlin-attention and both
        # self-attention applications (reference zipformer.py:538-540)
        attn_skip_mask = None
        if scheds_on:
            attn_skip_mask = _seq_skip_mask(
                self, src.shape[0], sched.ATTENTION_SKIP(batch_count),
                src.dtype,
            )

        if use_fused:
            fused_w = {}

            def _fused_apply(nv):
                w, na_raw = _pa.rel_pos_attention_weights_nonlin(
                    q_t, k_t, p_t, pe_h, kp_mask, nv
                )
                fused_w["w"] = w
                return na_raw

            na = NonlinAttention(
                channels=d, hidden_channels=3 * d // 4, dtype=self.dtype,
                name="nonlin_attention",
            )(src, None, train=train, batch_count=bc,
              apply_fn=_fused_apply)
            attn_weights = fused_w["w"].astype(src.dtype)
        else:
            # head-0 weights consumed by NonlinAttention; under the
            # scheduled const-attention coin they become a uniform average
            # over the positions the softmax kept (reference
            # zipformer.py:542-556)
            sel_weights = attn_weights[:, 0]
            if scheds_on:
                coin = (
                    _rand_uniform(self.make_rng("skip"), ())
                    < sched.CONST_ATTENTION(batch_count)
                )
                nonzero = (sel_weights > 0.0).astype(sel_weights.dtype)
                const_w = nonzero / jnp.sum(nonzero, axis=-1, keepdims=True)
                sel_weights = jnp.where(coin, const_w, sel_weights)

            na = NonlinAttention(
                channels=d, hidden_channels=3 * d // 4, dtype=self.dtype,
                name="nonlin_attention",
            )(src, sel_weights, train=train, batch_count=bc)
        if train:
            # balancer_na, scheduled min_abs (reference zipformer.py:416-423)
            na = _stochastic(
                self, 0.05,
                lambda t: balancer(
                    t, 0.3, 0.7, sched.BALANCER_NA_MIN_ABS(bc), 100.0, 0.04
                ),
                na,
            )
        if attn_skip_mask is not None:
            na = na * attn_skip_mask
        src = src + na

        self_attn = SelfAttention(
            embed_dim=d, num_heads=self.num_heads,
            value_head_dim=self.value_head_dim, dtype=self.dtype,
            use_pallas=self.use_pallas_attention,
            name="self_attn1",
        )(src, attn_weights, train=train, batch_count=bc)
        if attn_skip_mask is not None:
            self_attn = self_attn * attn_skip_mask
        src = src + self_attn

        if self.use_conv:
            if time_emb is not None:
                src = src + time_emb
            conv = ConvolutionModule(
                channels=d, kernel_size=self.cnn_module_kernel,
                dtype=self.dtype, use_pallas=self.use_pallas_conv,
                name="conv_module1",
            )(src, key_padding_mask, train=train, batch_count=bc)
            if scheds_on:
                conv = self._skip(conv, sched.CONV_SKIP, batch_count)
            src = src + conv

        ff2 = FeedforwardModule(
            embed_dim=d, feedforward_dim=self.feedforward_dim,
            dtype=self.dtype, name="feed_forward2",
        )(src, **ff_kw)
        if train:
            # balancer_ff2, scheduled min_abs (reference zipformer.py:428-436)
            ff2 = _stochastic(
                self, 0.05,
                lambda t: balancer(
                    t, 0.3, 0.7, sched.BALANCER_FF2_MIN_ABS(bc), 2.0, 0.04
                ),
                ff2,
            )
        if scheds_on:
            ff2 = self._skip(ff2, sched.FF2_SKIP, batch_count)
        src = src + ff2

        src = BypassModule(embed_dim=d, name="bypass_mid")(
            src_orig, src, train=train, batch_count=bc
        )

        self_attn = SelfAttention(
            embed_dim=d, num_heads=self.num_heads,
            value_head_dim=self.value_head_dim, dtype=self.dtype,
            use_pallas=self.use_pallas_attention,
            name="self_attn2",
        )(src, attn_weights, train=train, batch_count=bc)
        if attn_skip_mask is not None:
            self_attn = self_attn * attn_skip_mask
        src = src + self_attn

        if self.use_conv:
            if time_emb is not None:
                src = src + time_emb
            conv = ConvolutionModule(
                channels=d, kernel_size=self.cnn_module_kernel,
                dtype=self.dtype, use_pallas=self.use_pallas_conv,
                name="conv_module2",
            )(src, key_padding_mask, train=train, batch_count=bc)
            if scheds_on:
                conv = self._skip(conv, sched.CONV_SKIP, batch_count)
            src = src + conv

        ff3 = FeedforwardModule(
            embed_dim=d, feedforward_dim=(self.feedforward_dim * 5) // 4,
            dtype=self.dtype, name="feed_forward3",
        )(src, **ff_kw)
        if train:
            # balancer_ff3, scheduled min_abs (reference zipformer.py:438-446)
            ff3 = _stochastic(
                self, 0.05,
                lambda t: balancer(
                    t, 0.3, 0.7, sched.BALANCER_FF3_MIN_ABS(bc), 4.0, 0.04
                ),
                ff3,
            )
        if scheds_on:
            ff3 = self._skip(ff3, sched.FF3_SKIP, batch_count)
        src = src + ff3

        if train:
            # balancer1 (reference zipformer.py:406-413)
            src = _stochastic(
                self, sched.BALANCER_PROB(bc),
                lambda t: balancer(t, 0.45, 0.55, 0.2, 4.0, 0.04), src,
            )
        src = BiasNorm(num_channels=d, name="norm")(src)
        src = BypassModule(
            embed_dim=d, skip_rate=self.bypass_skip_rate, name="bypass"
        )(src_orig, src, train=train, batch_count=bc)
        if train:
            # balancer2 + whiten w/ scheduled limit (reference
            # zipformer.py:448-462,640)
            src = _stochastic(
                self, sched.BALANCER_PROB(bc),
                lambda t: balancer(t, 0.45, 0.55, 0.1, 4.0, 0.04), src,
            )
            src = _stochastic(
                self, 0.15,
                lambda t: whiten(t, 1, sched.WHITEN_LAYER(bc), 0.01), src
            )
        return src


class ZipformerEncoder(nn.Module):
    """Stack of encoder layers sharing one positional table (reference :645-744)."""

    num_layers: int
    embed_dim: int
    time_embed_dim: int  # -1 => no time embedding
    pos_dim: int
    num_heads: int
    query_head_dim: int
    pos_head_dim: int
    value_head_dim: int
    feedforward_dim: int
    cnn_module_kernel: int
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas_attention: bool = False
    use_pallas_conv: bool = False
    # layerdrop warmup window for this stack (reference zipformer.py:206-209)
    warmup_begin: float = 0.0
    warmup_end: float = 0.0
    final_layerdrop_rate: float = 0.05

    @nn.compact
    def __call__(
        self, src, time_emb=None, key_padding_mask=None, *,
        train: bool = False, dropout_rate=0.0, batch_count=None,
    ):
        T = src.shape[1]
        pos_emb = compact_rel_pos_encoding(T, self.pos_dim).astype(src.dtype)
        if train and not _static_zero(dropout_rate):
            # reference uses Dropout2(0.15) on the whole pos table.  A
            # SCHEDULED dropout_rate is a traced value (never static zero),
            # so this stays active even when the schedule anneals to 0 —
            # matching the reference's schedule-independent Dropout2.  A
            # literal 0.0 is the caller's explicit all-dropout-off switch
            # (tests, eval-mode probes) and disables it.
            pos_emb = nn.Dropout(rate=0.15, deterministic=False)(pos_emb)

        if self.time_embed_dim != -1:
            assert time_emb is not None
            # reference: nn.Sequential(SwooshR(), Linear(time_embed_dim, embed_dim))
            time_emb = dense(
                self.embed_dim, self.time_embed_dim, dtype=self.dtype,
                name="time_emb_proj",
            )(swoosh_r(time_emb))
            time_emb = time_emb[:, None, :]  # (B, 1, D) broadcast over time
        else:
            assert time_emb is None

        out = src
        for i in range(self.num_layers):
            out = ZipformerEncoderLayer(
                embed_dim=self.embed_dim,
                pos_dim=self.pos_dim,
                num_heads=self.num_heads,
                query_head_dim=self.query_head_dim,
                pos_head_dim=self.pos_head_dim,
                value_head_dim=self.value_head_dim,
                feedforward_dim=self.feedforward_dim,
                cnn_module_kernel=self.cnn_module_kernel,
                use_conv=self.use_conv,
                dtype=self.dtype,
                use_pallas_attention=self.use_pallas_attention,
                use_pallas_conv=self.use_pallas_conv,
                bypass_skip_rate=sched.layerdrop_schedule(
                    self.warmup_begin, self.warmup_end, self.num_layers, i,
                    final_layerdrop_rate=self.final_layerdrop_rate,
                ),
                name=f"layers_{i}",
            )(
                out, pos_emb, time_emb, key_padding_mask,
                train=train, dropout_rate=dropout_rate,
                batch_count=batch_count,
            )
        return out


class EncoderStack(nn.Module):
    """One U-Net stack: optional softmax-weighted temporal downsampling around
    a ZipformerEncoder (reference DownsampledZipformer2Encoder :807-935)."""

    downsample_factor: int
    num_layers: int
    embed_dim: int
    time_embed_dim: int
    pos_dim: int
    num_heads: int
    query_head_dim: int
    pos_head_dim: int
    value_head_dim: int
    feedforward_dim: int
    cnn_module_kernel: int
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas_attention: bool = False
    use_pallas_conv: bool = False
    warmup_begin: float = 0.0
    warmup_end: float = 0.0

    @nn.compact
    def __call__(
        self, src, time_emb=None, key_padding_mask=None, *,
        train: bool = False, dropout_rate=0.0, batch_count=None,
    ):
        ds = self.downsample_factor
        encoder = ZipformerEncoder(
            num_layers=self.num_layers,
            embed_dim=self.embed_dim,
            time_embed_dim=self.time_embed_dim,
            pos_dim=self.pos_dim,
            num_heads=self.num_heads,
            query_head_dim=self.query_head_dim,
            pos_head_dim=self.pos_head_dim,
            value_head_dim=self.value_head_dim,
            feedforward_dim=self.feedforward_dim,
            cnn_module_kernel=self.cnn_module_kernel,
            use_conv=self.use_conv,
            dtype=self.dtype,
            use_pallas_attention=self.use_pallas_attention,
            use_pallas_conv=self.use_pallas_conv,
            warmup_begin=self.warmup_begin,
            warmup_end=self.warmup_end,
            # reference zipformer.py:211: 0.035 * sqrt(downsampling_factor)
            final_layerdrop_rate=0.035 * (ds ** 0.5),
            name="encoder",
        )
        enc_kw = dict(
            train=train, dropout_rate=dropout_rate, batch_count=batch_count
        )
        if ds == 1:
            return encoder(src, time_emb, key_padding_mask, **enc_kw)

        src_orig = src
        B, T, C = src.shape
        if key_padding_mask is not None:
            # Bucketed inference pads T beyond the batch's real extent;
            # the reference runs at exactly max(features_lens) and
            # SimpleDownsample right-pads by repeating the LAST frame
            # (reference :897-901).  Replicate that semantic: frames
            # beyond the batch-max valid length read the frame at that
            # boundary, so downsample groups average the same values as
            # the reference's repeat-padded exact-length run (mel parity
            # through the bucketed pipeline, tests/test_goldens_rehearsal
            # .py).  Rows shorter than the batch max keep their own pad
            # values inside [fl_b, max_fl) — exactly the reference's
            # ragged-batch behavior (parity tests pin it).
            valid_max = jnp.max(jnp.sum(
                (~key_padding_mask).astype(jnp.int32), axis=1
            ))
            idx = jnp.minimum(
                jnp.arange(T), jnp.maximum(valid_max - 1, 0)
            )
            src = jnp.take(src, idx, axis=1)
        d_seq_len = (T + ds - 1) // ds
        pad = d_seq_len * ds - T
        if pad > 0:
            # right-pad repeating the last frame (reference :897-901)
            src = jnp.concatenate(
                [src, jnp.broadcast_to(src[:, -1:, :], (B, pad, C))], axis=1
            )
        src = src.reshape(B, d_seq_len, ds, C)
        ds_bias = self.param(
            "downsample_bias", nn.initializers.zeros, (ds,)
        )
        weights = jax.nn.softmax(ds_bias)[None, None, :, None]
        src = jnp.sum(src * weights.astype(src.dtype), axis=2)

        mask_ds = None
        if key_padding_mask is not None:
            mask_ds = key_padding_mask[:, ::ds]

        src = encoder(src, time_emb, mask_ds, **enc_kw)

        # upsample by repetition, trim, combine (reference :866-870,916-935)
        src = jnp.repeat(src, ds, axis=1)[:, :T]
        return BypassModule(embed_dim=C, name="out_combiner")(
            src_orig, src, train=train,
            batch_count=batch_count if train else None,
        )


class TTSZipformer(nn.Module):
    """The full TTS Zipformer (reference zipformer.py:72-293).

    Call: (B, T, in_dim) [+ t (B,), padding_mask (B,T), guidance_scale (B,)]
    -> (B, T, out_dim).

    Two-stream mode (reference zipformer_two_stream.py:58-264, used by
    ZipVoice-Dialog-Stereo): pass 2-tuples for in_dim/out_dim; the input's
    feature dim selects which projection pair routes through the shared
    trunk.  Note with @nn.compact only the projections actually exercised
    get initialized — when self-initializing (not converting a reference
    checkpoint), init once per input width and merge the param trees.
    """

    in_dim: Union[int, Tuple[int, int]]
    out_dim: Union[int, Tuple[int, int]]
    downsampling_factor: Sequence[int] = (2, 4)
    num_encoder_layers: Sequence[int] = (4,)
    cnn_module_kernel: Sequence[int] = (31,)
    encoder_dim: int = 384
    query_head_dim: int = 24
    pos_head_dim: int = 4
    value_head_dim: int = 12
    num_heads: int = 8
    feedforward_dim: int = 1536
    pos_dim: int = 192
    use_time_embed: bool = True
    time_embed_dim: int = 192
    use_guidance_scale_embed: bool = False
    guidance_scale_embed_dim: int = 192
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas_attention: bool = False
    use_pallas_conv: bool = False
    # layerdrop warmup horizon (reference zipformer.py:100-103,124)
    warmup_batches: float = 4000.0

    def _per_stack(self, val):
        n = len(self.downsampling_factor)
        if isinstance(val, int):
            return (val,) * n
        if len(val) == 1:
            return tuple(val) * n
        assert len(val) == n
        return tuple(val)

    @nn.compact
    def __call__(
        self,
        x,
        t: Optional[jax.Array] = None,
        padding_mask: Optional[jax.Array] = None,
        guidance_scale: Optional[jax.Array] = None,
        *,
        train: bool = False,
        dropout_rate=0.0,
        batch_count=None,
    ):
        num_layers = self._per_stack(self.num_encoder_layers)
        kernels = self._per_stack(self.cnn_module_kernel)

        if dropout_rate is None:
            # reference default: ScheduledFloat((0, 0.3), (20000, 0.1))
            # (zipformer.py:133-134); traced when a batch count is threaded
            dropout_rate = sched.DROPOUT(batch_count if train else None)

        two_stream = isinstance(self.in_dim, (tuple, list))
        if two_stream:
            assert x.shape[-1] in tuple(self.in_dim), (x.shape, self.in_dim)
            index = 0 if x.shape[-1] == self.in_dim[0] else 1
            x = dense(
                self.encoder_dim, self.in_dim[index], dtype=self.dtype,
                name=f"in_proj_{index}",
            )(x)
        else:
            x = dense(
                self.encoder_dim, self.in_dim, dtype=self.dtype, name="in_proj"
            )(x)

        if t is not None:
            assert self.use_time_embed
            time_emb = timestep_embedding(t, self.time_embed_dim)
            if guidance_scale is not None:
                gs_emb = timestep_embedding(
                    guidance_scale, self.guidance_scale_embed_dim
                )
                gs_emb = dense(
                    self.time_embed_dim, self.guidance_scale_embed_dim,
                    use_bias=False, initial_scale=0.1, dtype=self.dtype,
                    name="guidance_scale_embed",
                )(gs_emb)
                time_emb = time_emb + gs_emb
            # reference MLP: Linear(d, 2d) -> SwooshR -> Linear(2d, d)
            time_emb = dense(
                self.time_embed_dim * 2, self.time_embed_dim, dtype=self.dtype,
                name="time_embed_in",
            )(time_emb)
            time_emb = swoosh_r(time_emb)
            time_emb = dense(
                self.time_embed_dim, self.time_embed_dim * 2, dtype=self.dtype,
                name="time_embed_out",
            )(time_emb)
        else:
            time_emb = None

        n_stacks = len(self.downsampling_factor)
        for i, ds in enumerate(self.downsampling_factor):
            x = EncoderStack(
                downsample_factor=ds,
                num_layers=num_layers[i],
                embed_dim=self.encoder_dim,
                time_embed_dim=self.time_embed_dim if self.use_time_embed else -1,
                pos_dim=self.pos_dim,
                num_heads=self.num_heads,
                query_head_dim=self.query_head_dim,
                pos_head_dim=self.pos_head_dim,
                value_head_dim=self.value_head_dim,
                feedforward_dim=self.feedforward_dim,
                cnn_module_kernel=kernels[i],
                use_conv=self.use_conv,
                dtype=self.dtype,
                use_pallas_attention=self.use_pallas_attention,
                use_pallas_conv=self.use_pallas_conv,
                # staggered layerdrop warmup per stack (reference :206-209)
                warmup_begin=self.warmup_batches * (i + 1) / (n_stacks + 1),
                warmup_end=self.warmup_batches * (i + 2) / (n_stacks + 1),
                name=f"encoders_{i}",
            )(
                x, time_emb, padding_mask,
                train=train, dropout_rate=dropout_rate,
                batch_count=batch_count,
            )

        if two_stream:
            x = dense(
                self.out_dim[index], self.encoder_dim, dtype=self.dtype,
                name=f"out_proj_{index}",
            )(x)
        else:
            x = dense(
                self.out_dim, self.encoder_dim, dtype=self.dtype,
                name="out_proj",
            )(x)
        return x
