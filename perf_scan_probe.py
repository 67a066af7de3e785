"""Component-level perf profile on the real TPU, relay-proof.

The remote-TPU relay costs ~1.5 s per dispatch and ~25 MB/s for uploads,
which buries sub-100 ms kernels.  This probe times each component by
scanning it N times inside ONE jitted program with on-device PRNG inputs
(no upload in the timed region), returning a scalar checksum.  Per-call
time = (t(N) - t(1)) / (N - 1), which also cancels the dispatch overhead.

Components (all at bench shapes, bf16):
  full        fm_decoder forward  (B=16, T=1280) — the CFG-doubled hot call
  attnw       RelPositionMultiheadAttentionWeights at T=1280/640/320
  attnw_pallas  same, pallas kernel path
  skew        the rel->abs skew pipeline alone (pad/reshape/slice)
  softmax     (B, h, T, T) softmax alone
  selfatt     SelfAttention application alone
  nonlin      NonlinAttention alone
  conv        ConvolutionModule alone
  ff          FeedforwardModule alone

Usage: python perf_scan_probe.py [--only full,attnw,...] [--n 8]
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

B, H, QD, PD, D, FF = 16, 4, 32, 4, 512, 1536
DT = jnp.bfloat16


def timed_scan(name, make_fn, n, params=None):
    """make_fn(params, key) -> scalar; scan it n times vs once and report
    the delta.  `params` MUST be passed as an explicit jit argument — a
    closed-over device tree would be serialized as constants into the
    remote compile request (HTTP 413 over the relay)."""

    def loop(nn_):
        @jax.jit
        def run(params, key):
            def body(c, k):
                return c + make_fn(params, k), None

            s, _ = jax.lax.scan(
                body, jnp.float32(0.0), jax.random.split(key, nn_)
            )
            return s

        return run

    r1, rn = loop(1), loop(n)
    # warm both programs (compile + first dispatch), results discarded
    _ = float(r1(params, jax.random.PRNGKey(100)))
    _ = float(rn(params, jax.random.PRNGKey(101)))

    def med(f, seeds):
        ts = []
        for s in seeds:
            t0 = time.perf_counter()
            _ = float(f(params, jax.random.PRNGKey(s)))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    # fresh keys every call: the relay caches identical executions
    c1 = med(r1, (1, 2, 3))
    cn = med(rn, (11, 12, 13))
    per = (cn - c1) / (n - 1)
    print(f"{name:28s} {per * 1e3:9.2f} ms/call   "
          f"(t1 {c1:.3f}s, t{n} {cn:.3f}s)", flush=True)
    return per


def module_fn(mod, shapes, **apply_kw):
    """Init mod host-side and return a key->scalar closure over random inputs."""
    from bench import host_init_params

    rng = np.random.RandomState(0)
    init_kw = {
        k: jnp.zeros(s, DT) if k != "padding_mask" else jnp.zeros(s, bool)
        for k, s in shapes.items()
    }
    params = jax.device_put(host_init_params(mod, rng, **init_kw, **apply_kw))

    def fn(p, key):
        keys = jax.random.split(key, len(shapes))
        args = {
            k: (jax.random.normal(kk, s, DT) if k != "padding_mask"
                else jnp.zeros(s, bool))
            for kk, (k, s) in zip(keys, shapes.items())
        }
        return jnp.sum(jnp.abs(mod.apply(p, **args, **apply_kw))
                       .astype(jnp.float32))

    return params, fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--t", type=int, default=1280)
    ap.add_argument("--levels", type=str, default=None,
                    help="comma list of T levels for attnw (default T,T/2,T/4)")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    from zipvoice_tpu.models import zipformer as zf

    T = args.t

    if want("full") or want("full_pallas"):
        from bench import host_init_params

        model = zf.TTSZipformer(
            in_dim=300, out_dim=100, downsampling_factor=(1, 2, 4, 2, 1),
            num_encoder_layers=(2, 2, 4, 4, 4),
            cnn_module_kernel=(31, 15, 7, 15, 31), encoder_dim=D,
            feedforward_dim=FF, num_heads=H, query_head_dim=QD,
            pos_head_dim=PD, value_head_dim=12, pos_dim=48,
            use_time_embed=True, time_embed_dim=192, dtype=DT,
            use_pallas_attention=want("full_pallas"),
        )
        rng = np.random.RandomState(0)
        mask = jnp.zeros((B, T), bool)
        t_in = jnp.full((B,), 0.5)
        params = jax.device_put(host_init_params(
            model, rng, x=jnp.zeros((B, T, 300)), t=t_in, padding_mask=mask
        ))

        def full_fn(p, key):
            x = jax.random.normal(key, (B, T, 300), DT)
            return jnp.sum(
                jnp.abs(model.apply(p, x, t=t_in, padding_mask=mask))
                .astype(jnp.float32)
            )

        label = "full fm_decoder" + (
            " (pallas)" if want("full_pallas") else ""
        )
        timed_scan(label, full_fn, args.n, params)

    levels = (
        tuple(int(x) for x in args.levels.split(","))
        if args.levels else (T, T // 2, T // 4)
    )
    for t_lvl in levels:
        if want("attnw"):
            mod = zf.RelPosAttentionWeights(
                embed_dim=D, pos_dim=48, num_heads=H, query_head_dim=QD,
                pos_head_dim=PD, dtype=DT,
            )
            pos = zf.compact_rel_pos_encoding(t_lvl, 48).astype(DT)
            p0, fn0 = module_fn(mod, {"x": (B, t_lvl, D)}, pos_emb=pos)
            timed_scan(f"attn_weights T={t_lvl}", fn0, args.n, p0)
        if want("attnw_pallas"):
            mod = zf.RelPosAttentionWeights(
                embed_dim=D, pos_dim=48, num_heads=H, query_head_dim=QD,
                pos_head_dim=PD, dtype=DT, use_pallas=True,
            )
            pos = zf.compact_rel_pos_encoding(t_lvl, 48).astype(DT)
            p0, fn0 = module_fn(mod, {"x": (B, t_lvl, D)}, pos_emb=pos)
            timed_scan(f"attn_weights pallas T={t_lvl}", fn0, args.n, p0)

    if want("skew"):
        def skew_fn(p, key):
            ps = jax.random.normal(key, (B, H, T, 2 * T - 1), DT)
            padded = jnp.pad(ps, ((0, 0), (0, 0), (0, 0), (0, 1)))
            flat = padded.reshape(B, H, 2 * T * T)
            flat = jax.lax.slice_in_dim(
                flat, T - 1, T - 1 + T * (2 * T - 1), axis=-1
            )
            out = flat.reshape(B, H, T, 2 * T - 1)[..., :T]
            return jnp.sum(jnp.abs(out).astype(jnp.float32))

        timed_scan("skew rel->abs", skew_fn, args.n)

    if want("softmax"):
        def sm_fn(p, key):
            s = jax.random.normal(key, (B, H, T, T), DT)
            w = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(DT)
            return jnp.sum(jnp.abs(w).astype(jnp.float32))

        timed_scan("softmax f32 (B,h,T,T)", sm_fn, args.n)

        def sm16_fn(p, key):
            s = jax.random.normal(key, (B, H, T, T), DT)
            w = jax.nn.softmax(s, axis=-1)
            return jnp.sum(jnp.abs(w).astype(jnp.float32))

        timed_scan("softmax bf16 (B,h,T,T)", sm16_fn, args.n)

    if want("selfatt"):
        mod = zf.SelfAttention(embed_dim=D, num_heads=H, value_head_dim=12,
                               dtype=DT)
        p0, fn0 = module_fn(
            mod, {"x": (B, T, D), "attn_weights": (B, H, T, T)}
        )
        timed_scan("self_attention", fn0, args.n, p0)

    if want("selfatt_pallas"):
        mod = zf.SelfAttention(embed_dim=D, num_heads=H, value_head_dim=12,
                               dtype=DT, use_pallas=True)
        p0, fn0 = module_fn(
            mod, {"x": (B, T, D), "attn_weights": (B, H, T, T)}
        )
        timed_scan("self_attention (pallas)", fn0, args.n, p0)

    if want("apply_xla") or want("apply_pallas"):
        # raw weights@values application, isolating layout/matmul cost
        from zipvoice_tpu.ops.pallas_attention import attention_apply

        def mk(apply):
            def fn(p, key):
                k1, k2 = jax.random.split(key)
                w = jax.random.normal(k1, (B, H, T, T), DT)
                v = jax.random.normal(k2, (B, H, T, 12), DT)
                return jnp.sum(jnp.abs(apply(w, v)).astype(jnp.float32))
            return fn

        if want("apply_xla"):
            timed_scan(
                "apply einsum bhts,bhsd",
                mk(lambda w, v: jnp.einsum("bhts,bhsd->bhtd", w, v)), args.n,
            )
        if want("apply_pallas"):
            timed_scan("apply pallas", mk(attention_apply), args.n)

    if want("attnw_nonlin"):
        from zipvoice_tpu.ops.pallas_attention import (
            rel_pos_attention_weights_nonlin,
        )

        hid = 3 * D // 4

        def wn_fn(p, key):
            ks = jax.random.split(key, 5)
            q = jax.random.normal(ks[0], (B, H, T, QD), DT)
            k = jax.random.normal(ks[1], (B, H, T, QD), DT)
            pp = jax.random.normal(ks[2], (B, H, T, PD), DT)
            pe = jax.random.normal(ks[3], (H, 2 * T - 1, PD), DT)
            nv = jax.random.normal(ks[4], (B, T, hid), DT)
            mask = jnp.zeros((B, T), bool)
            w, na = rel_pos_attention_weights_nonlin(q, k, pp, pe, mask, nv)
            return (jnp.sum(jnp.abs(w).astype(jnp.float32))
                    + jnp.sum(jnp.abs(na).astype(jnp.float32)))

        timed_scan("attnw+nonlin fused", wn_fn, args.n)

    if want("nonlin"):
        mod = zf.NonlinAttention(channels=D, hidden_channels=3 * D // 4,
                                 dtype=DT)
        p0, fn0 = module_fn(
            mod, {"x": (B, T, D), "attn_weights_head0": (B, T, T)}
        )
        timed_scan("nonlin_attention", fn0, args.n, p0)

    if want("conv"):
        mod = zf.ConvolutionModule(channels=D, kernel_size=31, dtype=DT)
        p0, fn0 = module_fn(mod, {"x": (B, T, D)})
        timed_scan("conv_module k=31", fn0, args.n, p0)

    if want("ff"):
        mod = zf.FeedforwardModule(embed_dim=D, feedforward_dim=FF, dtype=DT)
        p0, fn0 = module_fn(mod, {"x": (B, T, D)})
        timed_scan("feedforward", fn0, args.n, p0)

    vocoder_probes(args, want)


def vocoder_probes(args, want):
    """Vocoder internals at bench shapes (B=8, T frames)."""
    import perf_scan_probe as _self  # noqa: F401 (namespace consistency)
    Bv, Tv = 8, args.t

    if want("vocos"):
        from zipvoice_tpu.vocoder.vocos import Vocos

        voc = Vocos(dtype=DT)
        p0, fn0 = module_fn(voc, {"mel": (Bv, Tv, 100)})
        timed_scan("vocos full", fn0, args.n, p0)

    if want("convnext"):
        from zipvoice_tpu.vocoder.vocos import ConvNeXtBlock

        blk = ConvNeXtBlock(dim=512, intermediate_dim=1536,
                            layer_scale_init_value=1 / 8, dtype=DT)
        p0, fn0 = module_fn(blk, {"x": (Bv, Tv, 512)})
        timed_scan("convnext block", fn0, args.n, p0)

    if want("istft"):
        from zipvoice_tpu.ops.stft import istft

        def istft_fn(p, key):
            k1, k2 = jax.random.split(key)
            re = jax.random.normal(k1, (Bv, Tv, 513), jnp.float32)
            im = jax.random.normal(k2, (Bv, Tv, 513), jnp.float32)
            return jnp.sum(jnp.abs(istft(re, im, 1024, 256, Tv * 256)))

        timed_scan("istft", istft_fn, args.n)

    if want("irfft"):
        def irfft_fn(p, key):
            k1, k2 = jax.random.split(key)
            spec = jax.lax.complex(
                jax.random.normal(k1, (Bv, Tv, 513), jnp.float32),
                jax.random.normal(k2, (Bv, Tv, 513), jnp.float32),
            )
            return jnp.sum(jnp.abs(jnp.fft.irfft(spec, n=1024, axis=-1)))

        timed_scan("irfft 1024", irfft_fn, args.n)

if __name__ == "__main__":
    main()
