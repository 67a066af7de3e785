"""Pallas fused rel-pos attention weights vs the jnp reference path
(interpret mode on CPU)."""

import numpy as np

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
