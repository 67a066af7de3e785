"""Tensor-parallel (model-axis) sharding: same results as single device."""

import numpy as np

import conftest  # noqa: F401

import jax
import jax.numpy as jnp


def test_tp_forward_matches_replicated():
    from zipvoice_tpu.models.zipvoice import ZipVoice
    from zipvoice_tpu.parallel.mesh import make_mesh
    from zipvoice_tpu.parallel.sharding_rules import (
        make_param_shardings,
        shard_params,
    )
    from __graft_entry__ import _TINY_CFG

    cfg = dict(_TINY_CFG)
    cfg.update(fm_decoder_dim=64, fm_decoder_feedforward_dim=128)
    model = ZipVoice(**cfg)
    B, T, F = 2, 32, model.feat_dim
    rng = np.random.RandomState(0)
    xt = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    tc = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    sc = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    t = jnp.full((B,), 0.5)
    mask = jnp.zeros((B, T), bool)

    params = model.init(
        jax.random.PRNGKey(0), t=t, xt=xt, text_condition=tc,
        speech_condition=sc, padding_mask=mask,
        method="forward_fm_decoder",
    )["params"]

    def fwd(p, t, xt, tc, sc, mask):
        return model.apply(
            {"params": p}, t=t, xt=xt, text_condition=tc,
            speech_condition=sc, padding_mask=mask,
            method="forward_fm_decoder",
        )

    ref = np.asarray(jax.jit(fwd)(params, t, xt, tc, sc, mask))

    mesh = make_mesh(n_data=2, n_model=4)
    shardings = make_param_shardings(params, mesh)
    # some leaves must actually shard over the model axis
    from jax.sharding import PartitionSpec as P

    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any("model" in str(s) for s in specs), specs

    sharded = shard_params(params, mesh)
    out = np.asarray(jax.jit(fwd)(sharded, t, xt, tc, sc, mask))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)
