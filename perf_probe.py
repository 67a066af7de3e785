"""Perf probe: time the fm_decoder forward on the real TPU, jnp vs pallas
attention, plus the vocoder — to locate where sampling time goes.

Usage: python perf_probe.py [--pallas] [--vocoder] [--b B] [--t T]
"""

import argparse
import os
import time

import jax

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--vocoder", action="store_true")
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--t", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from bench import host_init_params

    rng = np.random.RandomState(0)
    B, T = args.b, args.t

    if args.vocoder:
        from zipvoice_tpu.vocoder.vocos import Vocos

        vocos = Vocos(dtype=jnp.bfloat16)
        shapes = jax.eval_shape(
            lambda: vocos.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 100)))
        )
        vp = jax.device_put(jax.tree.map(
            lambda s: (rng.randn(*s.shape) * 0.02).astype(s.dtype), shapes
        ))
        mel = jnp.asarray(rng.randn(8, T, 100).astype(np.float32))

        @jax.jit
        def f(vp, mel):
            return jnp.sum(jnp.abs(vocos.apply(vp, mel)))

        t0 = time.perf_counter()
        _ = float(f(vp, mel))
        print(f"# vocoder warmup: {time.perf_counter() - t0:.2f}s", flush=True)
        for i in range(args.iters):
            m2 = jnp.asarray(rng.randn(8, T, 100).astype(np.float32))
            t0 = time.perf_counter()
            _ = float(f(vp, m2))
            print(f"vocoder iter: {time.perf_counter() - t0:.3f}s", flush=True)
        return

    from zipvoice_tpu.models.zipformer import TTSZipformer

    model = TTSZipformer(
        in_dim=300, out_dim=100, downsampling_factor=(1, 2, 4, 2, 1),
        num_encoder_layers=(2, 2, 4, 4, 4),
        cnn_module_kernel=(31, 15, 7, 15, 31), encoder_dim=512,
        feedforward_dim=1536, num_heads=4, query_head_dim=32, pos_head_dim=4,
        value_head_dim=12, pos_dim=48, use_time_embed=True,
        time_embed_dim=192, dtype=jnp.bfloat16,
        use_pallas_attention=args.pallas,
    )
    x = jnp.asarray(rng.randn(B, T, 300).astype(np.float32))
    t = jnp.full((B,), 0.5)
    mask = jnp.zeros((B, T), bool)
    params = jax.device_put(host_init_params(
        model, rng, x=x, t=t, padding_mask=mask
    ))

    @jax.jit
    def f(params, x):
        return jnp.sum(jnp.abs(model.apply(params, x, t=t, padding_mask=mask)))

    t0 = time.perf_counter()
    _ = float(f(params, x))
    print(f"# fm_decoder warmup (pallas={args.pallas}): "
          f"{time.perf_counter() - t0:.2f}s", flush=True)
    for i in range(args.iters):
        x2 = jnp.asarray(rng.randn(B, T, 300).astype(np.float32))
        t0 = time.perf_counter()
        _ = float(f(params, x2))
        print(f"fm_decoder fwd (B={B},T={T},pallas={args.pallas}): "
              f"{time.perf_counter() - t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
