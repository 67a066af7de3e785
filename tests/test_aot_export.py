"""AOT export/reload roundtrip on the tiny model (CPU)."""

import numpy as np

import conftest  # noqa: F401

import jax
import jax.numpy as jnp


def test_export_roundtrip(tmp_path):
    from zipvoice_tpu.models.zipvoice import ZipVoice
    from zipvoice_tpu.serving.aot import (
        export_sample_program,
        load_exported,
        _sample_args,
    )
    from __graft_entry__ import _TINY_CFG

    model = ZipVoice(**_TINY_CFG)
    B, S, T = 1, 8, 32
    kwargs = _sample_args(model, B, S, T)
    params = model.init(
        jax.random.PRNGKey(0), **kwargs, num_step=1, guidance_scale=1.0,
        t_shift=0.5, method="sample",
    )
    manifest = export_sample_program(
        model, params, str(tmp_path), buckets=[(B, S, T)], num_step=2,
    )
    assert len(manifest["buckets"]) == 1
    fn = load_exported(
        str(tmp_path / manifest["buckets"][0]["file"])
    )
    x1, mask = fn(params, *kwargs.values())
    assert x1.shape == (B, T, model.feat_dim)
    assert np.isfinite(np.asarray(x1)).all()

    # direct-call equivalence
    ref, _ = model.apply(
        params, **kwargs, num_step=2, guidance_scale=1.0, t_shift=0.5,
        method="sample",
    )
    np.testing.assert_allclose(
        np.asarray(x1), np.asarray(ref), atol=1e-5
    )
