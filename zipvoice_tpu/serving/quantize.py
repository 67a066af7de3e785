"""Weight-only int8 quantization for serving.

The reference ships dynamic-int8 ONNX graphs for CPU serving
(reference zipvoice/bin/onnx_export.py:403-417; the int8 model is selected
by infer_zipvoice_onnx.py:805-807).  The TPU-native analog is weight-only
quantization: matrix parameters are stored in HBM as int8 with per-output-
channel float scales (~4x smaller than f32, ~2x smaller than bf16) and
dequantized inside the jitted program, where XLA fuses the
``scale * int8`` expansion into the consuming matmul's operand load.  This
halves parameter HBM traffic and footprint; activations and accumulation
stay bf16/f32, so quality loss is bounded by the ~0.4% per-channel
rounding error (measured end-to-end in tests/test_quantize.py).

Usage:
    qparams = quantize_params(jax.device_get(params))
    # inside jit:  model.apply(dequantize_params(qparams, dtype), ...)
The serving path wires this via InferencePipeline(..., quantize="int8")
and ``server.py --quantize int8``.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# leaves smaller than this stay unquantized (biases, norms, scalars —
# negligible bytes, high sensitivity)
_MIN_QUANT_SIZE = 4096


def _is_quantizable(x) -> bool:
    return (
        hasattr(x, "ndim") and x.ndim >= 2
        and np.issubdtype(np.asarray(x).dtype, np.floating)
        and x.size >= _MIN_QUANT_SIZE
    )


def quantize_params(params) -> Dict[str, Any]:
    """Symmetric per-output-channel int8 quantization of matrix leaves.

    Each quantizable leaf ``w`` (last axis = output channels, the flax
    Dense kernel convention) becomes ``{"q": int8, "scale": f32[out]}``
    with w ≈ q * scale.  Returns a pytree mirror of ``params``.
    """

    def quant(x):
        if not _is_quantizable(x):
            return np.asarray(x)
        w = np.asarray(x, np.float32)
        amax = np.abs(w).max(axis=tuple(range(w.ndim - 1)), keepdims=True)
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        return {"q": q, "scale": scale.astype(np.float32)}

    return jax.tree.map(quant, params)


def dequantize_params(qparams, dtype=jnp.bfloat16):
    """Inverse of ``quantize_params`` — jit-traceable, so XLA fuses the
    expansion into consumers while HBM holds the int8 tensors."""

    def dequant(x):
        if isinstance(x, dict) and set(x) == {"q", "scale"}:
            return (x["q"].astype(jnp.float32) * x["scale"]).astype(dtype)
        return x

    return jax.tree.map(
        dequant, qparams,
        is_leaf=lambda x: isinstance(x, dict) and set(x) == {"q", "scale"},
    )


def quantized_bytes(qparams) -> int:
    leaves = jax.tree.leaves(qparams)
    return sum(np.asarray(v).nbytes for v in leaves)
