"""AOT model export: serialized StableHLO executables.

The reference exports the text encoder + fm_decoder to ONNX and builds
TensorRT engines (reference zipvoice/bin/onnx_export.py,
tensorrt_export.py).  The XLA-native equivalent is ``jax.export``: trace the
jitted program at fixed bucket shapes, serialize the StableHLO, and reload
it anywhere (including other hosts/TPU generations with compatible ops) —
the "engine" role is played by the XLA executable, rebuilt from the portable
artifact on load.

Artifacts: one ``.shlo`` file per (batch, token, frame, num_step) bucket of
the full sampling program, plus a ``manifest.json`` describing shapes.
"""

import json
import os
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _sample_args(model, B: int, S: int, T: int):
    F = model.feat_dim
    return dict(
        tokens=jnp.zeros((B, S), jnp.int32),
        tokens_lens=jnp.ones((B,), jnp.int32),
        prompt_tokens_lens=jnp.ones((B,), jnp.int32),
        prompt_features=jnp.zeros((B, T, F)),
        prompt_features_lens=jnp.ones((B,), jnp.int32),
        features_lens=jnp.full((B,), T, jnp.int32),
        noise=jnp.zeros((B, T, F)),
    )


def export_sample_program(
    model,
    params,
    out_dir: str,
    buckets: Sequence[Tuple[int, int, int]] = ((1, 128, 1024),),
    num_step: int = 16,
    guidance_scale: float = 1.0,
    t_shift: float = 0.5,
) -> Dict:
    """Export the jitted ``sample`` program for each (B, S, T) bucket."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = {
        "num_step": num_step,
        "guidance_scale": guidance_scale,
        "t_shift": t_shift,
        "buckets": [],
    }

    for B, S, T in buckets:
        kwargs = _sample_args(model, B, S, T)

        def fn(params, tokens, tokens_lens, prompt_tokens_lens,
               prompt_features, prompt_features_lens, features_lens, noise):
            return model.apply(
                params, tokens=tokens, tokens_lens=tokens_lens,
                prompt_tokens_lens=prompt_tokens_lens,
                prompt_features=prompt_features,
                prompt_features_lens=prompt_features_lens,
                features_lens=features_lens, noise=noise,
                num_step=num_step, guidance_scale=guidance_scale,
                t_shift=t_shift, method="sample",
            )

        exported = jax.export.export(jax.jit(fn))(
            params, *kwargs.values()
        )
        name = f"sample_b{B}_s{S}_t{T}_n{num_step}.shlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exported.serialize())
        manifest["buckets"].append(
            {"B": B, "S": S, "T": T, "file": name}
        )

    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_exported(path: str):
    """Load one serialized program; returns a callable over device arrays."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    return exported.call


def load_engine_dir(path: str):
    """Load an engine directory produced by ``export_sample_program``.

    Returns (manifest, {(B, S, T): callable}) — the serving path
    (InferencePipeline.attach_engines) dispatches matching shape buckets to
    these programs instead of tracing the model, the analog of the
    reference's Triton server loading prebuilt TensorRT engines
    (runtime/nvidia_triton/run.sh stages 4-6).
    """
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    engines = {
        (b["B"], b["S"], b["T"]): load_exported(os.path.join(path, b["file"]))
        for b in manifest["buckets"]
    }
    return manifest, engines
