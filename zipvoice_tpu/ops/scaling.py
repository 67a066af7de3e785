"""Numeric primitives of the Zipformer "scaling" toolkit, TPU-first.

The reference implements these as torch autograd Functions with hand-written
memory tricks (uint8-quantized activation derivatives, recompute-in-backward,
fused k2 CUDA kernels); see ``/root/reference/zipvoice/models/modules/scaling.py``.
On TPU, XLA fuses elementwise chains into the surrounding matmuls and
``jax.checkpoint`` provides rematerialisation, so the *forward* math is plain
jnp and the training-only gradient-shaping modules (Balancer, Whiten,
limit_param_value, penalize_abs_values_gt) are ``jax.custom_vjp`` transforms
whose forward is the identity.

Schedule-driven bounds (e.g. Balancer's min_abs, Bypass scale_min) are traced
scalars, NOT static python floats: the training loop feeds new values every
step and a static float would force a recompile per step.

Parity notes (reference file:line):
- swoosh_l / swoosh_r constants: scaling.py:1036,1113
- BiasNorm formula: scaling.py:337-391
- Balancer backward math: scaling.py:498-583 (incl. the abs->rms and
  positive-proportion->mean conversions at :661-693)
- Whiten metric + backward: scaling.py:754-837
- limit_param_value: scaling.py:928-962
- penalize_abs_values_gt/with_loss: scaling.py:711-740,905-925
"""

from functools import partial

import jax
import jax.numpy as jnp


def swoosh_l(x: jax.Array) -> jax.Array:
    """SwooshL activation: log(1 + exp(x-4)) - 0.08x - 0.035."""
    return jnp.logaddexp(0.0, x - 4.0) - 0.08 * x - 0.035


def swoosh_r(x: jax.Array) -> jax.Array:
    """SwooshR activation: log(1 + exp(x-1)) - 0.08x - 0.313261687."""
    return jnp.logaddexp(0.0, x - 1.0) - 0.08 * x - 0.313261687


def bias_norm(x: jax.Array, bias: jax.Array, log_scale: jax.Array) -> jax.Array:
    """BiasNorm: LayerNorm replacement (reference scaling.py:337-472).

    scales = mean((x - bias)^2, axis=-1)^-0.5 * exp(log_scale); returns x*scales.
    The channel axis is the last one (all uses in the TTS models are -1).
    """
    scales = jax.lax.rsqrt(jnp.mean(jnp.square(x - bias), axis=-1, keepdims=True))
    return x * (scales * jnp.exp(log_scale))


# ---------------------------------------------------------------------------
# Training-only gradient-shaping transforms (identity in the forward pass).
# ---------------------------------------------------------------------------


@jax.custom_vjp
def limit_param_value(x: jax.Array, min_val, max_val) -> jax.Array:
    """Identity fwd; bwd flips gradient signs pushing x back into [min,max].

    Reference scaling.py:928-948: where x < min and grad > 0, negate the grad
    (making the update increase x); where x > max and grad < 0, negate.
    min_val/max_val may be traced scalars (schedules); they get zero grads.
    """
    return x


def _limit_param_value_fwd(x, min_val, max_val):
    return x, (x, min_val, max_val)


def _limit_param_value_bwd(res, g):
    x, min_val, max_val = res
    g = g * jnp.where((g > 0) & (x < min_val), -1.0, 1.0)
    g = g * jnp.where((g < 0) & (x > max_val), -1.0, 1.0)
    return g, jnp.zeros_like(min_val), jnp.zeros_like(max_val)


limit_param_value.defvjp(_limit_param_value_fwd, _limit_param_value_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def penalize_abs_values_gt(x: jax.Array, limit: float, penalty: float) -> jax.Array:
    """Identity fwd; bwd adds d/dx [penalty * relu(|x| - limit)].sum().

    Reference scaling.py:711-740: the aux loss contributes
    penalty * sign(x) * 1(|x| > limit) to the gradient of each element.
    """
    return x


def _penalize_fwd(x, limit, penalty):
    return x, x


def _penalize_bwd(limit, penalty, x, g):
    extra = penalty * jnp.sign(x) * (jnp.abs(x) > limit).astype(x.dtype)
    return (g + extra,)


penalize_abs_values_gt.defvjp(_penalize_fwd, _penalize_bwd)


def _abs_to_rms(v):
    # E[|x|] -> rms for normal data (reference scaling.py:661-664)
    return 1.25331413732 * v


def _proportion_positive_to_mean(v):
    # reference scaling.py:666-688 (crude inverse erf via atanh)
    eps = 1.0e-10
    t = -1.0 + 2.0 * v
    atanh = (jnp.log(1 + t + eps) - jnp.log(1 - t + eps)) / 2.0
    return 0.8139535143 * atanh


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def balancer(
    x: jax.Array,
    min_positive,
    max_positive,
    min_abs,
    max_abs,
    grad_scale,
    channel_dim: int = -1,
) -> jax.Array:
    """Identity fwd; bwd nudges per-channel mean/rms stats toward the given
    ranges (reference scaling.py:498-583).

    Unlike the reference (which applies this stochastically per call with a
    scheduled probability, scaling.py:655-657), this is the deterministic
    transform; callers either gate it on an outside-jit coin flip or fold the
    application probability into ``grad_scale`` (same gradient in
    expectation).  All bounds may be traced scalars.
    """
    return x


def _balancer_stats_grad(x, min_mean, max_mean, min_rms, max_rms, channel_dim):
    """grad of sum(m_loss + r_loss) wrt x (reference scaling.py:536-568).

    Channels whose stats are within bounds are explicitly zeroed: their
    analytic loss-grad is zero, but float32 autodiff leaves ~1e-8 residue
    which the per-channel rms normalization in the caller would otherwise
    amplify to full grad_scale magnitude (the reference's torch autograd
    cancels exactly, so unviolated channels contribute nothing)."""
    reduce_axes = tuple(i for i in range(x.ndim) if i != channel_dim)

    def loss_fn(x):
        uncentered_var = jnp.mean(jnp.square(x), axis=reduce_axes, keepdims=True)
        mean = jnp.mean(x, axis=reduce_axes, keepdims=True)
        stddev = jnp.sqrt(jnp.clip(uncentered_var - mean * mean, min=1.0e-20))
        rms = jnp.sqrt(jnp.clip(uncentered_var, min=1.0e-20))
        m = mean / stddev
        m_loss = jnp.abs(m - jnp.clip(m, min_mean, max_mean))
        r_loss = jnp.abs(jnp.log(jnp.clip(rms, min_rms, max_rms) / rms))
        return jnp.sum(m_loss + r_loss)

    grad = jax.grad(loss_fn)(x)

    uncentered_var = jnp.mean(jnp.square(x), axis=reduce_axes, keepdims=True)
    mean = jnp.mean(x, axis=reduce_axes, keepdims=True)
    stddev = jnp.sqrt(jnp.clip(uncentered_var - mean * mean, min=1.0e-20))
    rms = jnp.sqrt(jnp.clip(uncentered_var, min=1.0e-20))
    m = mean / stddev
    violated = (
        (m < min_mean) | (m > max_mean) | (rms < min_rms) | (rms > max_rms)
    )
    return grad * violated.astype(grad.dtype)


def _balancer_fwd(x, min_positive, max_positive, min_abs, max_abs, grad_scale,
                  channel_dim):
    return x, (x, min_positive, max_positive, min_abs, max_abs, grad_scale)


def _balancer_bwd(channel_dim, res, g):
    x, min_positive, max_positive, min_abs, max_abs, grad_scale = res
    if channel_dim < 0:
        channel_dim += x.ndim
    min_mean = _proportion_positive_to_mean(min_positive)
    max_mean = _proportion_positive_to_mean(max_positive)
    min_rms = _abs_to_rms(min_abs)
    max_rms = _abs_to_rms(max_abs)
    x32 = x.astype(jnp.float32)
    loss_grad = _balancer_stats_grad(
        x32, min_mean, max_mean, min_rms, max_rms, channel_dim
    )
    reduce_axes = tuple(i for i in range(x.ndim) if i != channel_dim)
    loss_grad_rms = jnp.clip(
        jnp.sqrt(jnp.mean(jnp.square(loss_grad), axis=reduce_axes, keepdims=True)),
        min=1.0e-20,
    )
    loss_grad = loss_grad * (grad_scale / loss_grad_rms)
    g32 = g.astype(jnp.float32)
    out = (g32 + jnp.abs(g32) * loss_grad).astype(g.dtype)
    zeros = lambda v: jnp.zeros_like(v)  # noqa: E731
    return (out, zeros(min_positive), zeros(max_positive), zeros(min_abs),
            zeros(max_abs), zeros(grad_scale))


balancer.defvjp(_balancer_fwd, _balancer_bwd)


def _whitening_metric(x: jax.Array, num_groups: int) -> jax.Array:
    """Reference scaling.py:754-788: >=1.0; 1.0 iff covariance is white."""
    x = x.reshape(-1, x.shape[-1])
    num_frames, num_channels = x.shape
    cpg = num_channels // num_groups
    x = x.reshape(num_frames, num_groups, cpg).transpose(1, 0, 2)
    x = x - jnp.mean(x, axis=1, keepdims=True)
    x_covar = jnp.einsum("gtc,gtd->gcd", x, x)
    diag = jnp.diagonal(x_covar, axis1=1, axis2=2)
    x_covar_mean_diag = jnp.mean(diag)
    x_covarsq_mean_diag = jnp.sum(jnp.square(x_covar)) / (num_groups * cpg)
    return x_covarsq_mean_diag / (jnp.square(x_covar_mean_diag) + 1.0e-20)


@partial(jax.custom_vjp, nondiff_argnums=(1, 3))
def whiten(
    x: jax.Array,
    num_groups: int,
    whitening_limit,
    grad_scale: float,
) -> jax.Array:
    """Identity fwd; bwd adds a scaled whitening-metric gradient when the
    metric exceeds ``whitening_limit`` (reference scaling.py:791-837).
    ``whitening_limit`` may be a traced scalar (it is scheduled)."""
    return x


def _whiten_fwd(x, num_groups, whitening_limit, grad_scale):
    return x, (x, whitening_limit)


def _whiten_bwd(num_groups, grad_scale, res, g):
    x, whitening_limit = res
    x32 = x.astype(jnp.float32)
    metric, penalty_grad = jax.value_and_grad(
        lambda v: _whitening_metric(v, num_groups)
    )(x32)
    g32 = g.astype(jnp.float32)
    scale = grad_scale * (
        jnp.linalg.norm(g32) / (jnp.linalg.norm(penalty_grad) + 1.0e-20)
    )
    out = jnp.where(metric < whitening_limit, g32, g32 + penalty_grad * scale)
    return out.astype(g.dtype), jnp.zeros_like(whitening_limit)


whiten.defvjp(_whiten_fwd, _whiten_bwd)
