"""Per-component BACKWARD budget of the 123M train step (VERDICT r4 #3).

train_scan_probe.py bounds the phases (fwd 25.1 / bwd 92.7 / opt ~12 ms at
round 4); this probe splits the backward per component so the top item is a
measurement, not conjecture.  For each module of the Zipformer encoder
layer at each U-Net level length (T, T/2, T/4 — the 123M stacks run 6
layers at T, 6 at T/2, 4 at T/4), it times

    fwd       scalarized forward only
    fwd+bwd   jax.value_and_grad w.r.t. params (checksummed grads)

with the relay-proof scan methodology of perf_scan_probe.py; the backward
cost is the difference.  Grad rows apply in TRAIN mode (train=True with
dropout/regularizer rngs): that is the mode the training backward runs
in, and for pallas components it is also the only differentiable path
(eval uses the fused/strided-roll kernels, which have no VJP on purpose
— training routes to the custom-VJP kernel pair).  The whole-layer
eval-fwd row is kept as the inference-cost reference.

    python bwd_scan_probe.py [--b 8] [--t 1280] [--n 6] [--pallas]
        [--only layer,attnw,selfatt,nonlin,ff,conv]

Counts to scale by for the full fm_decoder (123M: layers (2,2,4,4,4) at
ds (1,2,4,2,1), kernels (31,15,7,15,31)):
    T=1280 x6 (k=31), T=640 x6 (k=15), T=320 x4 (k=7).
"""

import argparse
import os

import jax

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from perf_scan_probe import timed_scan

DT = jnp.bfloat16
D, FF_DIM, H, QD, PD, VD = 512, 1536, 4, 32, 4, 12


def grad_of(fn):
    """fn(params, key) -> scalar  ==>  value+grad-checksum scalar."""

    def g(params, key):
        val, grads = jax.value_and_grad(lambda p: fn(p, key))(params)
        chk = sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                  for x in jax.tree.leaves(grads))
        return val + chk  # grads must stay live (no 0.0* — XLA could fold)

    return g


def module_fn(mod, shapes, B, train=False, **apply_kw):
    from bench import host_init_params

    rng = np.random.RandomState(0)
    init_kw = {
        k: jnp.zeros(s, DT) if k != "padding_mask" else jnp.zeros(s, bool)
        for k, s in shapes.items()
    }
    params = jax.device_put(host_init_params(mod, rng, **init_kw, **apply_kw))

    def fn(p, key):
        keys = jax.random.split(key, len(shapes) + 3)
        args = {
            k: (jax.random.normal(kk, s, DT) if k != "padding_mask"
                else jnp.zeros(s, bool))
            for kk, (k, s) in zip(keys, shapes.items())
        }
        kw = dict(apply_kw)
        rngs = None
        if train:
            import inspect

            kw["train"] = True
            if "dropout_rate" in inspect.signature(
                    type(mod).__call__).parameters:
                kw["dropout_rate"] = 0.1
            rngs = {"dropout": keys[-3], "reg": keys[-2], "skip": keys[-1]}
        out = mod.apply(p, **args, **kw, rngs=rngs)
        if isinstance(out, tuple):
            out = out[0]
        return jnp.sum(jnp.abs(out).astype(jnp.float32))

    return params, fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=1280)
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--pallas", action="store_true",
                    help="use the pallas attention path where the train "
                         "policy would (T >= MIN_SEQ_LEN)")
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--levels", type=str, default=None)
    ap.add_argument("--pallas-conv", action="store_true",
                    help="route ConvolutionModule through the custom-VJP "
                         "pallas depthwise kernel")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    from zipvoice_tpu.models import zipformer as zf
    from zipvoice_tpu.ops.pallas_attention import MIN_SEQ_LEN

    B = args.b
    levels = (tuple(int(x) for x in args.levels.split(","))
              if args.levels else (args.t, args.t // 2, args.t // 4))
    kernel_by_level = {
        t: k for t, k in zip(levels, (31, 15, 7))
    }

    for t_lvl in levels:
        use_pallas = args.pallas and t_lvl >= MIN_SEQ_LEN and t_lvl % 8 == 0
        k_cnn = kernel_by_level.get(t_lvl, 31)
        tag = f"T={t_lvl}" + (" (pallas)" if use_pallas else " (xla)")
        pos = zf.compact_rel_pos_encoding(t_lvl, 48).astype(DT)

        if want("layer"):
            mod = zf.ZipformerEncoderLayer(
                embed_dim=D, pos_dim=48, num_heads=H, query_head_dim=QD,
                pos_head_dim=PD, value_head_dim=VD, feedforward_dim=FF_DIM,
                cnn_module_kernel=k_cnn, dtype=DT,
                use_pallas_attention=use_pallas,
            )
            shapes = {"src": (B, t_lvl, D)}
            kw = dict(pos_emb=pos, time_emb=jnp.zeros((B, 1, D), DT))
            p0, f_fwd = module_fn(mod, shapes, B, **kw)
            timed_scan(f"layer {tag} eval fwd", f_fwd, args.n, p0)
            _, f_tr = module_fn(mod, shapes, B, train=True, **kw)
            timed_scan(f"layer {tag} train fwd", f_tr, args.n, p0)
            timed_scan(f"layer {tag} train fwd+bwd", grad_of(f_tr),
                       args.n, p0)

        if want("attnw"):
            mod = zf.RelPosAttentionWeights(
                embed_dim=D, pos_dim=48, num_heads=H, query_head_dim=QD,
                pos_head_dim=PD, dtype=DT, use_pallas=use_pallas,
            )
            p0, f0 = module_fn(mod, {"x": (B, t_lvl, D)}, B, pos_emb=pos)
            _, f0t = module_fn(mod, {"x": (B, t_lvl, D)}, B, train=True,
                               pos_emb=pos)
            timed_scan(f"attnw {tag} fwd", f0, args.n, p0)
            timed_scan(f"attnw {tag} train fwd", f0t, args.n, p0)
            timed_scan(f"attnw {tag} train fwd+bwd", grad_of(f0t),
                       args.n, p0)

        if want("selfatt"):
            mod = zf.SelfAttention(embed_dim=D, num_heads=H,
                                   value_head_dim=VD, dtype=DT)
            p0, f0 = module_fn(
                mod, {"x": (B, t_lvl, D),
                      "attn_weights": (B, H, t_lvl, t_lvl)}, B)
            _, f0t = module_fn(
                mod, {"x": (B, t_lvl, D),
                      "attn_weights": (B, H, t_lvl, t_lvl)}, B, train=True)
            timed_scan(f"selfatt {tag} fwd", f0, args.n, p0)
            timed_scan(f"selfatt {tag} train fwd+bwd", grad_of(f0t),
                       args.n, p0)

        if want("nonlin"):
            mod = zf.NonlinAttention(channels=D, hidden_channels=3 * D // 4,
                                     dtype=DT)
            p0, f0 = module_fn(
                mod, {"x": (B, t_lvl, D),
                      "attn_weights_head0": (B, t_lvl, t_lvl)}, B)
            _, f0t = module_fn(
                mod, {"x": (B, t_lvl, D),
                      "attn_weights_head0": (B, t_lvl, t_lvl)}, B, train=True)
            timed_scan(f"nonlin {tag} fwd", f0, args.n, p0)
            timed_scan(f"nonlin {tag} train fwd+bwd", grad_of(f0t),
                       args.n, p0)

        if want("ff"):
            mod = zf.FeedforwardModule(embed_dim=D, feedforward_dim=FF_DIM,
                                       dtype=DT)
            p0, f0 = module_fn(mod, {"x": (B, t_lvl, D)}, B)
            _, f0t = module_fn(mod, {"x": (B, t_lvl, D)}, B, train=True)
            timed_scan(f"ff {tag} fwd", f0, args.n, p0)
            timed_scan(f"ff {tag} train fwd+bwd", grad_of(f0t),
                       args.n, p0)

        if want("conv"):
            mod = zf.ConvolutionModule(channels=D, kernel_size=k_cnn,
                                       dtype=DT,
                                       use_pallas=args.pallas_conv)
            ctag = tag + (" pconv" if args.pallas_conv else "")
            p0, f0 = module_fn(mod, {"x": (B, t_lvl, D)}, B)
            _, f0t = module_fn(mod, {"x": (B, t_lvl, D)}, B, train=True)
            timed_scan(f"conv k={k_cnn} {ctag} fwd", f0, args.n, p0)
            timed_scan(f"conv k={k_cnn} {ctag} train fwd+bwd",
                       grad_of(f0t), args.n, p0)


if __name__ == "__main__":
    main()
