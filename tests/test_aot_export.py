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


def test_pipeline_engine_dispatch(tmp_path):
    """InferencePipeline.attach_engines: a matching (B, S, T) bucket is
    served from the exported program (the jit path provably not taken) and
    produces the same features as the jit path."""
    from zipvoice_tpu.infer.pipeline import InferencePipeline
    from zipvoice_tpu.models.zipvoice import ZipVoice
    from zipvoice_tpu.serving.aot import export_sample_program, _sample_args
    from __graft_entry__ import _TINY_CFG

    model = ZipVoice(**_TINY_CFG)
    params = model.init(
        jax.random.PRNGKey(0), **_sample_args(model, 1, 8, 32),
        num_step=1, guidance_scale=1.0, t_shift=0.5, method="sample",
    )
    # pipeline shape math: tokens 10 + prompt 5 (+1) -> S bucket 32;
    # fl = 50 + ceil(50/5*10) = 150 -> T bucket 256
    export_sample_program(
        model, params, str(tmp_path / "eng"), buckets=[(1, 32, 256)],
        num_step=2, guidance_scale=1.0,
    )

    rng = np.random.RandomState(7)
    batch_tokens = [list(rng.randint(1, model.vocab_size, 10))]
    prompt_tokens = list(rng.randint(1, model.vocab_size, 5))
    prompt_features = rng.randn(50, model.feat_dim).astype(np.float32)

    kw = dict(num_step=2, guidance_scale=1.0, speed=1.0, t_shift=0.5)
    ref_pipe = InferencePipeline(model, params, None, None, None, seed=0)
    ref_feats, ref_lens = ref_pipe._sample_batch(
        batch_tokens, prompt_tokens, prompt_features, **kw
    )

    eng_pipe = InferencePipeline(model, params, None, None, None, seed=0)
    eng_pipe.attach_engines(str(tmp_path / "eng"))
    eng_pipe._sample_fn = None  # jit path must not be touched
    eng_feats, eng_lens = eng_pipe._sample_batch(
        batch_tokens, prompt_tokens, prompt_features, **kw
    )
    np.testing.assert_array_equal(eng_lens, ref_lens)
    np.testing.assert_allclose(eng_feats, ref_feats, atol=1e-5)

    # non-matching num_step falls back to jit (engine manifest mismatch)
    fb_pipe = InferencePipeline(model, params, None, None, None, seed=0)
    fb_pipe.attach_engines(str(tmp_path / "eng"))
    fb = fb_pipe._sample_batch(
        batch_tokens, prompt_tokens, prompt_features,
        num_step=1, guidance_scale=1.0, speed=1.0, t_shift=0.5,
    )
    assert np.isfinite(fb[0]).all()
