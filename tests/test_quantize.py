"""Weight-only int8 serving path (reference's dynamic-int8 ONNX analog,
onnx_export.py:403-417)."""

import numpy as np

import conftest  # noqa: F401

import jax
import jax.numpy as jnp


def test_quantize_roundtrip_error_bounded():
    from zipvoice_tpu.serving.quantize import (
        dequantize_params,
        quantize_params,
        quantized_bytes,
    )

    rng = np.random.RandomState(0)
    params = {
        "dense": {"kernel": rng.randn(256, 64).astype(np.float32),
                  "bias": rng.randn(64).astype(np.float32)},
        "small": {"scale": rng.randn(8).astype(np.float32)},
    }
    q = quantize_params(params)
    # kernel quantized, bias/scale untouched
    assert q["dense"]["kernel"]["q"].dtype == np.int8
    assert q["dense"]["bias"].dtype == np.float32
    d = jax.device_get(dequantize_params(q, jnp.float32))
    w = params["dense"]["kernel"]
    err = np.abs(d["dense"]["kernel"] - w).max(axis=0)
    amax = np.abs(w).max(axis=0)
    assert (err <= amax / 127.0 * 0.5 + 1e-7).all()
    np.testing.assert_array_equal(d["dense"]["bias"], params["dense"]["bias"])
    # byte shrink: ~4x on the kernel
    assert quantized_bytes(q) < 0.4 * quantized_bytes(params)


def test_quantized_pipeline_sample_close():
    """End-to-end: quantized _sample_batch stays close to fp32 (tolerance
    reflects int8 weight rounding through the ODE, not bitwise parity)."""
    from zipvoice_tpu.infer.pipeline import InferencePipeline
    from zipvoice_tpu.models.zipvoice import ZipVoice
    from zipvoice_tpu.serving.aot import _sample_args
    from __graft_entry__ import _TINY_CFG

    model = ZipVoice(**_TINY_CFG)
    params = model.init(
        jax.random.PRNGKey(0), **_sample_args(model, 1, 8, 32),
        num_step=1, guidance_scale=1.0, t_shift=0.5, method="sample",
    )
    rng = np.random.RandomState(3)
    batch_tokens = [list(rng.randint(1, model.vocab_size, 10))]
    prompt_tokens = list(rng.randint(1, model.vocab_size, 5))
    prompt_features = (rng.randn(50, model.feat_dim) * 0.1).astype(np.float32)
    kw = dict(num_step=2, guidance_scale=1.0, speed=1.0, t_shift=0.5)

    ref = InferencePipeline(model, params, None, None, None, seed=0)
    rf, rl = ref._sample_batch(batch_tokens, prompt_tokens,
                               prompt_features, **kw)
    qp = InferencePipeline(model, params, None, None, None, seed=0,
                           quantize="int8")
    qf, ql = qp._sample_batch(batch_tokens, prompt_tokens,
                              prompt_features, **kw)
    np.testing.assert_array_equal(rl, ql)
    assert np.isfinite(qf).all()
    # int8 weights: outputs track fp32 closely but not bitwise
    rel = np.abs(qf - rf).mean() / (np.abs(rf).mean() + 1e-9)
    assert rel < 0.15, rel
