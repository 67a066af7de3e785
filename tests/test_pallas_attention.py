"""Pallas fused rel-pos attention weights vs the jnp reference path
(interpret mode on CPU)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp


def jnp_reference(q, k, p, pe, mask):
    B, h, T, qd = q.shape
    attn = jnp.einsum("bhtd,bhsd->bhts", q, k)
    pos = jnp.einsum("bhtd,hnd->bhtn", p, pe)
    idx = jnp.arange(T)[None, :] - jnp.arange(T)[:, None] + (T - 1)
    pos = jnp.take_along_axis(pos, idx[None, None], axis=-1)
    scores = attn + pos
    scores = jnp.where(mask[:, None, None, :], -1000.0, scores)
    return jax.nn.softmax(scores, axis=-1)


def test_pallas_attention_weights_matches():
    from zipvoice_tpu.ops.pallas_attention import rel_pos_attention_weights

    rng = np.random.RandomState(0)
    B, h, T, qd, pd = 2, 4, 128, 8, 4
    q = rng.randn(B, h, T, qd).astype(np.float32)
    k = rng.randn(B, h, T, qd).astype(np.float32)
    p = rng.randn(B, h, T, pd).astype(np.float32) * 0.3
    pe = rng.randn(h, 2 * T - 1, pd).astype(np.float32)
    lens = np.array([T, T - 37])
    mask = np.arange(T)[None, :] >= lens[:, None]

    ref = np.asarray(
        jnp_reference(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(p),
            jnp.asarray(pe), jnp.asarray(mask),
        )
    )
    # note: pe is per-head here; the kernel takes (h, 2T-1, pd) too
    out = np.asarray(
        rel_pos_attention_weights(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(p),
            jnp.asarray(pe), jnp.asarray(mask), interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=2e-6, rtol=1e-5)


def test_module_gate_pallas_matches_xla():
    """RelPosAttentionWeights(use_pallas=True) kernels only levels with
    T >= ops.pallas_attention.MIN_SEQ_LEN; at such a T the two paths agree
    (interpret mode on CPU)."""
    from zipvoice_tpu.models.zipformer import (
        RelPosAttentionWeights,
        compact_rel_pos_encoding,
    )
    from zipvoice_tpu.ops import pallas_attention as pa

    B, T, D, h = 1, pa.MIN_SEQ_LEN, 64, 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    mask = jnp.zeros((B, T), bool).at[:, -17:].set(True)
    pos = compact_rel_pos_encoding(T, 48)

    kw = dict(embed_dim=D, pos_dim=48, num_heads=h, query_head_dim=8,
              pos_head_dim=4)
    mod = RelPosAttentionWeights(**kw)
    params = mod.init(jax.random.PRNGKey(0), x, pos)
    ref = mod.apply(params, x, pos, mask)
    out = RelPosAttentionWeights(**kw, use_pallas=True).apply(
        params, x, pos, mask
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def _xla_weights(q, k, p, pe, mask, penalty=False):
    """The XLA fallback formula (models/zipformer.py skew path), for
    train-path grad parity."""
    import jax.numpy as jnp

    from zipvoice_tpu.ops.scaling import penalize_abs_values_gt

    B, h, T, _ = q.shape
    attn = jnp.einsum("bhtd,bhsd->bhts", q, k)
    pos_scores = jnp.einsum("bhtd,hnd->bhtn", p, pe)
    padded = jnp.pad(pos_scores, ((0, 0), (0, 0), (0, 0), (0, 1)))
    flat = padded.reshape(B, h, 2 * T * T)
    flat = jax.lax.slice_in_dim(flat, T - 1, T - 1 + T * (2 * T - 1), axis=-1)
    pos = flat.reshape(B, h, T, 2 * T - 1)[..., :T]
    scores = attn + pos
    if penalty:
        scores = penalize_abs_values_gt(scores, 25.0, 1.0e-04)
    scores = jnp.where(mask[:, None, None, :], -1000.0, scores)
    return jax.nn.softmax(scores, axis=-1)


@pytest.mark.parametrize("penalty_on", [False, True])
def test_trainable_kernel_grad_parity(penalty_on):
    """Custom-VJP pallas path == XLA path for values AND all input grads,
    including the failsafe score penalty when scores exceed the limit."""
    import jax.numpy as jnp

    from zipvoice_tpu.ops.pallas_attention import (
        rel_pos_attention_weights_trainable,
    )

    B, h, T, qd, pd = 2, 2, 32, 8, 4
    rng = np.random.RandomState(0)
    scale = 4.0 if penalty_on else 0.5  # push |scores| > 25 when testing it
    q = (scale * rng.randn(B, h, T, qd)).astype(np.float32)
    k = (scale * rng.randn(B, h, T, qd)).astype(np.float32)
    p = rng.randn(B, h, T, pd).astype(np.float32)
    pe = rng.randn(h, 2 * T - 1, pd).astype(np.float32)
    mask = np.zeros((B, T), bool)
    mask[1, -5:] = True
    g = rng.randn(B, h, T, T).astype(np.float32)
    coin = jnp.asarray(1.0 if penalty_on else 0.0)

    def f_kernel(q, k, p, pe):
        w = rel_pos_attention_weights_trainable(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(p), jnp.asarray(pe),
            jnp.asarray(mask), coin, interpret=True,
        )
        return jnp.sum(w * g)

    def f_xla(q, k, p, pe):
        w = _xla_weights(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(p), jnp.asarray(pe),
            jnp.asarray(mask), penalty=penalty_on,
        )
        return jnp.sum(w * g)

    v1, g1 = jax.value_and_grad(f_kernel, argnums=(0, 1, 2, 3))(q, k, p, pe)
    v2, g2 = jax.value_and_grad(f_xla, argnums=(0, 1, 2, 3))(q, k, p, pe)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    if penalty_on:
        # the penalty recompute branch must actually have fired
        assert np.abs(np.asarray(g1[0]) - np.asarray(g2[0])).max() < 1e-4
    for a, b, name in zip(g1, g2, "qkp e"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3,
            err_msg=f"grad {name}",
        )


def test_attention_apply_matches():
    """attention_apply kernel == einsum application (interpret on CPU)."""
    from zipvoice_tpu.ops.pallas_attention import attention_apply

    rng = np.random.RandomState(1)
    B, h, T, vd = 2, 4, 128, 12
    w = jax.nn.softmax(
        jnp.asarray(rng.randn(B, h, T, T).astype(np.float32)), axis=-1
    )
    v = jnp.asarray(rng.randn(B, h, T, vd).astype(np.float32))
    ref = jnp.einsum("bhts,bhsd->bhtd", w, v)
    out = attention_apply(w, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5
    )


def test_weights_nonlin_fused_matches():
    """Fused weights+NonlinAttention kernel == split jnp computation."""
    from zipvoice_tpu.ops.pallas_attention import (
        rel_pos_attention_weights_nonlin,
    )

    rng = np.random.RandomState(2)
    B, h, T, qd, pd, hid = 2, 4, 128, 8, 4, 48
    q = rng.randn(B, h, T, qd).astype(np.float32)
    k = rng.randn(B, h, T, qd).astype(np.float32)
    p = (rng.randn(B, h, T, pd) * 0.3).astype(np.float32)
    pe = rng.randn(h, 2 * T - 1, pd).astype(np.float32)
    nv = rng.randn(B, T, hid).astype(np.float32)
    lens = np.array([T, T - 29])
    mask = np.arange(T)[None, :] >= lens[:, None]

    ref_w = np.asarray(
        jnp_reference(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(p),
            jnp.asarray(pe), jnp.asarray(mask),
        )
    )
    ref_na = np.einsum("bts,bsd->btd", ref_w[:, 0], nv)
    w, na = rel_pos_attention_weights_nonlin(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(p), jnp.asarray(pe),
        jnp.asarray(mask), jnp.asarray(nv), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(w), ref_w, atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(na), ref_na, atol=1e-4, rtol=1e-4)


def test_layer_fused_path_matches_xla():
    """Full ZipformerEncoderLayer: fused pallas inference path (weights +
    nonlin application in one kernel, pallas SelfAttention application) ==
    plain XLA path."""
    from zipvoice_tpu.models.zipformer import (
        ZipformerEncoderLayer,
        compact_rel_pos_encoding,
    )
    from zipvoice_tpu.ops import pallas_attention as pa

    B, T, D = 1, pa.MIN_SEQ_LEN, 64
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    mask = jnp.zeros((B, T), bool).at[:, -33:].set(True)
    pos = compact_rel_pos_encoding(T, 48)

    kw = dict(embed_dim=D, pos_dim=48, num_heads=4, query_head_dim=8,
              pos_head_dim=4, value_head_dim=12, feedforward_dim=96,
              cnn_module_kernel=15)
    mod = ZipformerEncoderLayer(**kw)
    params = mod.init(jax.random.PRNGKey(0), x, pos)
    ref = mod.apply(params, x, pos, key_padding_mask=mask)
    out = ZipformerEncoderLayer(**kw, use_pallas_attention=True).apply(
        params, x, pos, key_padding_mask=mask
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=2e-5
    )


def test_trainable_bwd_multi_tile():
    """Backward-kernel paths that only exist with n_tiles > 1: dk
    accumulation across row tiles and the overlapping dpe window fold
    (T=256 -> R=128 -> 2 tiles)."""
    import jax.numpy as jnp

    from zipvoice_tpu.ops.pallas_attention import (
        rel_pos_attention_weights_trainable,
    )

    B, h, T, qd, pd = 1, 2, 256, 8, 4
    rng = np.random.RandomState(5)
    q = (0.5 * rng.randn(B, h, T, qd)).astype(np.float32)
    k = (0.5 * rng.randn(B, h, T, qd)).astype(np.float32)
    p = rng.randn(B, h, T, pd).astype(np.float32)
    pe = rng.randn(h, 2 * T - 1, pd).astype(np.float32)
    mask = np.zeros((B, T), bool)
    mask[0, -19:] = True
    g = rng.randn(B, h, T, T).astype(np.float32)
    coin = jnp.asarray(0.0)

    def f_kernel(q, k, p, pe):
        w = rel_pos_attention_weights_trainable(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(p), jnp.asarray(pe),
            jnp.asarray(mask), coin, interpret=True,
        )
        return jnp.sum(w * g)

    def f_xla(q, k, p, pe):
        w = _xla_weights(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(p), jnp.asarray(pe),
            jnp.asarray(mask),
        )
        return jnp.sum(w * g)

    v1, g1 = jax.value_and_grad(f_kernel, argnums=(0, 1, 2, 3))(q, k, p, pe)
    v2, g2 = jax.value_and_grad(f_xla, argnums=(0, 1, 2, 3))(q, k, p, pe)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b, name in zip(g1, g2, ["dq", "dk", "dp", "dpe"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-3,
            err_msg=f"grad {name}",
        )
