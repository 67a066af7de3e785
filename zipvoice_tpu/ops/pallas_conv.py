"""Pallas TPU kernel: depthwise 1-D convolution (ConvolutionModule hot op).

The reference's ConvolutionModule (zipvoice/models/modules/zipformer.py:
1547-1679) runs a depthwise conv1d with kernel 31/15/7 per U-Net stack.
XLA lowers grouped convs with feature_group_count=C to a general conv —
fine, but it round-trips HBM per tap.  This kernel keeps a whole (T, C)
utterance slab in VMEM (≈1.3 MB at T=1280, C=512, bf16) and accumulates
the k taps as static-offset slices with VPU multiply-adds:

  grid = (B,): per batch element
    acc[t, c] = sum_j v_padded[t + j, c] * w[j, c]   (f32 accumulation)
    out = acc + bias

Input is pre-padded by k//2 on both sides of the time axis outside the
kernel (SAME padding).  Numerics validated against the lax grouped-conv
path in tests/test_pallas_conv.py (interpret mode on CPU; exact in f32).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _dwconv_kernel(v_ref, w_ref, b_ref, o_ref, *, kernel_size: int):
    # v_ref: (1, T+k-1, C); w_ref: (k, C); b_ref: (1, C); o_ref: (1, T, C)
    T = o_ref.shape[1]
    C = o_ref.shape[2]
    acc = jnp.zeros((T, C), jnp.float32)
    for j in range(kernel_size):
        acc = acc + (
            v_ref[0, j : j + T, :].astype(jnp.float32)
            * w_ref[j, :].astype(jnp.float32)[None, :]
        )
    o_ref[0] = (acc + b_ref[0].astype(jnp.float32)[None, :]).astype(
        o_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def depthwise_conv1d(v: jax.Array, w: jax.Array, b: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """SAME-padded depthwise conv over time.

    v: (B, T, C); w: (k, C) one filter column per channel; b: (C,).
    Matches lax.conv_general_dilated(..., feature_group_count=C) with
    dimension_numbers ("NWC", "WIO", "NWC") and padding k//2.
    """
    B, T, C = v.shape
    k = w.shape[0]
    pad = k // 2
    vp = jnp.pad(v, ((0, 0), (pad, k - 1 - pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_dwconv_kernel, kernel_size=k),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T + k - 1, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((k, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), v.dtype),
        interpret=interpret,
    )(vp, w, b.reshape(1, C))
    return out
