"""Vocos-style mel -> waveform vocoder in JAX.

ZipVoice renders audio with the external Vocos package
(charactr/vocos-mel-24khz; reference zipvoice/bin/infer_zipvoice.py:77,301-312):
a ConvNeXt-1D backbone followed by an iSTFT head.  This is a full
reimplementation of that architecture (Siuzdak, "Vocos: Closing the gap
between time-domain and Fourier-based neural vocoders", arXiv:2303.00748):

- embed: Conv1d(n_mels -> dim, k=7, same padding)
- LayerNorm, then num_layers x ConvNeXtBlock:
    dwconv(k=7, groups=dim) -> LayerNorm -> Linear(dim->intermediate) -> GELU
    -> Linear(intermediate->dim) -> layer-scale gamma -> residual
- final LayerNorm
- ISTFTHead: Linear(dim -> n_fft+2) -> split (log-magnitude, phase)
    -> clip(exp(mag), max 1e2) * exp(i*phase) -> iSTFT (center padding)

mel-24khz config: n_mels=100, dim=512, intermediate_dim=1536, num_layers=8,
n_fft=1024, hop=256.  ``convert_vocos_state_dict`` maps the published
checkpoint's keys onto this module.
"""

from typing import Dict, Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from zipvoice_tpu.ops.stft import istft


class ConvNeXtBlock(nn.Module):
    dim: int
    intermediate_dim: int
    layer_scale_init_value: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C)
        residual = x
        C = self.dim
        w = self.param(
            "dwconv_weight", nn.initializers.normal(0.02), (7, C)
        )
        b = self.param("dwconv_bias", nn.initializers.zeros, (C,))
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.reshape(7, 1, C).astype(self.dtype),
            window_strides=(1,),
            padding=[(3, 3)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=C,
        ) + b.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, dtype=self.dtype, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param(
            "gamma",
            lambda k, s: jnp.full(s, self.layer_scale_init_value, jnp.float32),
            (C,),
        )
        return residual + x * gamma


class Vocos(nn.Module):
    """ConvNeXt backbone + iSTFT head; mel (B, T, n_mels) -> wav (B, n)."""

    n_mels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        C = self.dim
        w = self.param(
            "embed_weight", nn.initializers.normal(0.02), (7, self.n_mels, C)
        )
        b = self.param("embed_bias", nn.initializers.zeros, (C,))
        x = jax.lax.conv_general_dilated(
            mel.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(1,),
            padding=[(3, 3)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + b.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        scale = 1.0 / self.num_layers
        for i in range(self.num_layers):
            x = ConvNeXtBlock(
                dim=C,
                intermediate_dim=self.intermediate_dim,
                layer_scale_init_value=scale,
                dtype=self.dtype,
                name=f"convnext_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="final_layer_norm")(x)
        x = nn.Dense(self.n_fft + 2, dtype=self.dtype, name="head_out")(x)
        mag, phase = jnp.split(x, 2, axis=-1)
        mag = jnp.clip(jnp.exp(mag), max=1e2)
        real = mag * jnp.cos(phase)
        imag = mag * jnp.sin(phase)
        T = mel.shape[1]
        wav = istft(
            real.astype(jnp.float32),
            imag.astype(jnp.float32),
            n_fft=self.n_fft,
            hop=self.hop_length,
            length=T * self.hop_length,
        )
        return wav


def convert_vocos_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map the published Vocos checkpoint (pytorch_model.bin key layout:
    backbone.embed.*, backbone.convnext.{i}.*, backbone.final_layer_norm.*,
    head.out.*) onto this module's flax params."""

    def np_(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    p: Dict[str, Any] = {}
    p["embed_weight"] = np_(state_dict["backbone.embed.weight"]).transpose(2, 1, 0)
    p["embed_bias"] = np_(state_dict["backbone.embed.bias"])
    p["norm"] = {
        "scale": np_(state_dict["backbone.norm.weight"]),
        "bias": np_(state_dict["backbone.norm.bias"]),
    }
    i = 0
    while f"backbone.convnext.{i}.dwconv.weight" in state_dict:
        blk = {
            "dwconv_weight": np_(
                state_dict[f"backbone.convnext.{i}.dwconv.weight"]
            )[:, 0, :].T,
            "dwconv_bias": np_(state_dict[f"backbone.convnext.{i}.dwconv.bias"]),
            "norm": {
                "scale": np_(state_dict[f"backbone.convnext.{i}.norm.weight"]),
                "bias": np_(state_dict[f"backbone.convnext.{i}.norm.bias"]),
            },
            "pwconv1": {
                "kernel": np_(state_dict[f"backbone.convnext.{i}.pwconv1.weight"]).T,
                "bias": np_(state_dict[f"backbone.convnext.{i}.pwconv1.bias"]),
            },
            "pwconv2": {
                "kernel": np_(state_dict[f"backbone.convnext.{i}.pwconv2.weight"]).T,
                "bias": np_(state_dict[f"backbone.convnext.{i}.pwconv2.bias"]),
            },
            "gamma": np_(state_dict[f"backbone.convnext.{i}.gamma"]),
        }
        p[f"convnext_{i}"] = blk
        i += 1
    p["final_layer_norm"] = {
        "scale": np_(state_dict["backbone.final_layer_norm.weight"]),
        "bias": np_(state_dict["backbone.final_layer_norm.bias"]),
    }
    p["head_out"] = {
        "kernel": np_(state_dict["head.out.weight"]).T,
        "bias": np_(state_dict["head.out.bias"]),
    }
    return p
