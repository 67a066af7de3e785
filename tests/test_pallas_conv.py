"""Pallas depthwise-conv kernel vs the lax grouped-conv path (interpret
mode on CPU; the kernel itself targets TPU)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("k", [7, 15, 31])
@pytest.mark.parametrize("T", [64, 96])
def test_depthwise_conv_matches_lax(k, T):
    from zipvoice_tpu.ops.pallas_conv import depthwise_conv1d

    B, C = 3, 128
    rng = np.random.RandomState(k + T)
    v = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    w = jnp.asarray((rng.randn(k, C) * 0.1).astype(np.float32))
    b = jnp.asarray((rng.randn(C) * 0.1).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        v, w.reshape(k, 1, C), window_strides=(1,),
        padding=[(k // 2, k // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C,
    ) + b

    out = depthwise_conv1d(v, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_depthwise_conv_bf16():
    from zipvoice_tpu.ops.pallas_conv import depthwise_conv1d

    B, T, C, k = 2, 64, 128, 15
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(B, T, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, C) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.randn(C) * 0.1, jnp.bfloat16)
    out = depthwise_conv1d(v, w, b, interpret=True)
    ref = jax.lax.conv_general_dilated(
        v.astype(jnp.float32), w.astype(jnp.float32).reshape(k, 1, C),
        window_strides=(1,), padding=[(k // 2, k // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=C,
    ) + b.astype(jnp.float32)
    assert out.dtype == jnp.bfloat16
    # f32 accumulation inside the kernel: only the output rounds to bf16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_conv_module_pallas_flag():
    """ConvolutionModule(use_pallas=True) matches the lax path exactly."""
    from zipvoice_tpu.models.zipformer import ConvolutionModule

    B, T, C, k = 2, 48, 64, 15
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    mask = jnp.zeros((B, T), bool).at[:, -5:].set(True)

    mod = ConvolutionModule(channels=C, kernel_size=k)
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x, key_padding_mask=mask)

    mod_p = ConvolutionModule(channels=C, kernel_size=k, use_pallas=True,
                              pallas_interpret=True)
    out = mod_p.apply(params, x, key_padding_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("k", [7, 15, 31])
def test_depthwise_conv_vjp_grads_match_lax(k):
    """Pallas fwd+bwd (custom VJP) vs lax grouped-conv autodiff."""
    from zipvoice_tpu.ops.pallas_conv import depthwise_conv1d_vjp

    B, T, C = 2, 64, 128
    rng = np.random.RandomState(k)
    v = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    w = jnp.asarray((rng.randn(k, C) * 0.1).astype(np.float32))
    b = jnp.asarray((rng.randn(C) * 0.1).astype(np.float32))
    ct = jnp.asarray(rng.randn(B, T, C).astype(np.float32))

    def ref_fn(v, w, b):
        out = jax.lax.conv_general_dilated(
            v, w.reshape(k, 1, C), window_strides=(1,),
            padding=[(k // 2, k // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=C,
        ) + b
        return jnp.sum(out * ct)

    def pal_fn(v, w, b):
        return jnp.sum(depthwise_conv1d_vjp(v, w, b, True) * ct)

    ref_grads = jax.grad(ref_fn, argnums=(0, 1, 2))(v, w, b)
    pal_grads = jax.grad(pal_fn, argnums=(0, 1, 2))(v, w, b)
    for rg, pg in zip(ref_grads, pal_grads):
        np.testing.assert_allclose(np.asarray(pg), np.asarray(rg),
                                   rtol=1e-4, atol=1e-4)
