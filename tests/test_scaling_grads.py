"""Backward parity of the gradient-shaping custom-VJPs vs the reference
autograd Functions (Balancer, Whiten, limit_param_value,
penalize_abs_values_gt)."""

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _vjp(fn, x, g):
    _, pull = jax.vjp(fn, jnp.asarray(x))
    return np.asarray(pull(jnp.asarray(g))[0])


@requires_reference
def test_balancer_backward_parity():
    from zipvoice.models.modules.scaling import BalancerFunction

    from zipvoice_tpu.ops.scaling import (
        _abs_to_rms,
        _proportion_positive_to_mean,
        balancer,
    )

    rng = np.random.RandomState(0)
    x = (rng.randn(6, 9, 16) * 2.5).astype(np.float32)
    g = rng.randn(6, 9, 16).astype(np.float32)

    min_pos, max_pos, min_abs, max_abs, grad_scale = 0.3, 0.7, 0.5, 1.2, 0.04
    tx = torch.from_numpy(x.copy()).requires_grad_(True)
    ref_out = BalancerFunction.apply(
        tx,
        float(_proportion_positive_to_mean(min_pos)),
        float(_proportion_positive_to_mean(max_pos)),
        float(_abs_to_rms(min_abs)),
        float(_abs_to_rms(max_abs)),
        grad_scale,
        2,  # channel_dim
    )
    ref_out.backward(torch.from_numpy(g.copy()))
    ref_grad = tx.grad.numpy()

    ours = _vjp(
        lambda v: balancer(v, min_pos, max_pos, min_abs, max_abs, grad_scale),
        x, g,
    )
    np.testing.assert_allclose(ours, ref_grad, atol=1e-5, rtol=1e-4)


@requires_reference
def test_whiten_backward_parity():
    from zipvoice.models.modules import scaling as ref_scaling

    from zipvoice_tpu.ops.scaling import whiten

    rng = np.random.RandomState(1)
    # strongly correlated features -> metric above limit -> penalty active
    base = rng.randn(40, 1).astype(np.float32)
    x = np.concatenate([base + 0.05 * rng.randn(40, 8)], axis=-1).astype(
        np.float32
    )
    g = rng.randn(40, 8).astype(np.float32)

    class W:
        num_groups = 1
        whitening_limit = 1.5
        grad_scale = 0.02
        min_prob = 0.25
        max_prob = 0.25
        prob = 0.25
        name = None

    tx = torch.from_numpy(x.copy()).requires_grad_(True)
    out = ref_scaling.WhiteningPenaltyFunction.apply(tx, W())
    out.backward(torch.from_numpy(g.copy()))
    ref_grad = tx.grad.numpy()

    ours = _vjp(lambda v: whiten(v, 1, 1.5, 0.02), x, g)
    np.testing.assert_allclose(ours, ref_grad, atol=1e-5, rtol=1e-4)

    # below the limit the gradient passes through unchanged
    white = rng.randn(64, 8).astype(np.float32)
    g2 = rng.randn(64, 8).astype(np.float32)
    ours2 = _vjp(lambda v: whiten(v, 1, 10.0, 0.02), white, g2)
    np.testing.assert_allclose(ours2, g2, atol=1e-6)


@requires_reference
def test_limit_param_value_backward_parity():
    from zipvoice.models.modules.scaling import LimitParamValue

    from zipvoice_tpu.ops.scaling import limit_param_value

    rng = np.random.RandomState(2)
    x = (rng.randn(32) * 2).astype(np.float32)
    g = rng.randn(32).astype(np.float32)

    tx = torch.from_numpy(x.copy()).requires_grad_(True)
    out = LimitParamValue.apply(tx, -1.0, 1.0)
    out.backward(torch.from_numpy(g.copy()))
    ref_grad = tx.grad.numpy()

    ours = _vjp(lambda v: limit_param_value(v, -1.0, 1.0), x, g)
    np.testing.assert_allclose(ours, ref_grad, atol=1e-6)


@requires_reference
def test_penalize_abs_values_gt_backward_parity():
    from zipvoice.models.modules.scaling import penalize_abs_values_gt as ref_fn

    from zipvoice_tpu.ops.scaling import penalize_abs_values_gt

    rng = np.random.RandomState(3)
    x = (rng.randn(8, 8) * 30).astype(np.float32)
    g = rng.randn(8, 8).astype(np.float32)

    tx = torch.from_numpy(x.copy()).requires_grad_(True)
    out = ref_fn(tx, limit=25.0, penalty=1.0e-4)
    out.backward(torch.from_numpy(g.copy()))
    ref_grad = tx.grad.numpy()

    ours = _vjp(lambda v: penalize_abs_values_gt(v, 25.0, 1.0e-4), x, g)
    np.testing.assert_allclose(ours, ref_grad, atol=1e-6)
